"""Measured baseline anchor for bench.py's ``vs_baseline`` denominator.

The reference publishes no throughput numbers (``/root/reference/README.md:68-71``
— empty Result section), so round 1 compared against an ESTIMATED
8 utt/s on the author's RTX 3090 (``README.md:66``: "under ~50% GPU
utilization, fluctuating", batch 1/device + grad-accum 16,
``scripts/run_train.sh:17-32``). This script replaces hand-waving with a
measurement plus a stated extrapolation:

1. **Measured**: a reference-equivalent training step in torch on THIS host's
   CPU — flagship model (8-layer bi-GRU h=1024 -> 512, 2-layer LSTM prednet,
   concat joint -> GELU(tanh) -> 72, ``config/config.json:3-22``), batch 1,
   T=512 frames, U=48 labels, full RNN-T loss (diagonal-vectorized log-space
   alpha recursion, autograd backward) + AdamW step.
2. **Extrapolation** (documented, not silently baked in): at batch 1 the 3090
   is latency-bound, not FLOP-bound (hence the author's <50% util note).
   Per utterance the encoder alone is 512 steps x 8 layers of sequential
   1x1024 @ 1024x3072 cuDNN GEMMs (~4096 dependent kernels fwd; backward
   roughly doubles it). At the ~5 us/dependent-GEMM a 3090 sustains at M=1,
   that is ~60 ms/utt => ~16 utt/s at perfect utilization; the author's
   "<50% util" halves it => **~8 utt/s**, the denominator bench.py uses.
   This script's measured CPU number is the hard lower anchor for that
   estimate (the 3090 is bounded below by torch-CPU and above by ~16 utt/s).

Prints one JSON line: {"metric": "baseline_torch_cpu_utt_per_sec", ...}.

Measured in this image (2026-08-16, 1-core container, torch 1 thread):
**0.027 utt/s (37.7 s/utt)**. A desktop-class many-core CPU would be roughly
an order of magnitude faster; either way the 3090 estimate of 8 utt/s sits
comfortably between the measured CPU floor and the ~16 utt/s latency bound.
"""

from __future__ import annotations

import json
import time

import numpy as np
import torch


def rnnt_loss_torch(log_probs: torch.Tensor, targets: torch.Tensor,
                    blank: int = 0) -> torch.Tensor:
    """RNN-T negative log-likelihood for one utterance, full lengths.
    log_probs: (T, U+1, V) log-softmax; targets: (U,) int64.
    Diagonal-vectorized alpha recursion (what warp-transducer computes,
    reference model.py:5,39)."""
    T, U1, _ = log_probs.shape
    U = U1 - 1
    blank_lp = log_probs[:, :, blank]                     # (T, U+1)
    y_lp = log_probs[:, :U, :].gather(
        2, targets.view(1, U, 1).expand(T, U, 1)).squeeze(2)  # (T, U)
    neg_inf = torch.tensor(-1e30, dtype=log_probs.dtype)
    alpha = torch.full((T, U1), -1e30, dtype=log_probs.dtype)
    # alpha[0,0] = 0; sweep anti-diagonals d = t + u
    for d in range(T + U):
        t_lo = max(0, d - U)
        t_hi = min(d, T - 1)
        ts = torch.arange(t_lo, t_hi + 1)
        us = d - ts
        from_blank = torch.where(
            ts > 0, alpha[(ts - 1).clamp(min=0), us]
            + blank_lp[(ts - 1).clamp(min=0), us], neg_inf)
        from_label = torch.where(
            us > 0, alpha[ts, (us - 1).clamp(min=0)]
            + y_lp[ts, (us - 1).clamp(min=0)], neg_inf)
        val = torch.logaddexp(from_blank, from_label)
        if d == 0:
            val = torch.zeros_like(val)
        alpha = alpha.index_put((ts, us), val)
    return -(alpha[T - 1, U] + blank_lp[T - 1, U])


class RefModel(torch.nn.Module):
    """Reference flagship forward (networks/encoder.py:67-76,
    networks/decoder.py:69-80, networks/transducer.py:35-71)."""

    def __init__(self, n_mels=80, h=1024, out=512, vocab=72):
        super().__init__()
        self.enc_rnn = torch.nn.GRU(n_mels, h, num_layers=8,
                                    batch_first=True, bidirectional=True,
                                    dropout=0.1)
        self.enc_proj = torch.nn.Linear(2 * h, out)
        self.embedding = torch.nn.Embedding(vocab, h, padding_idx=0)
        self.dec_rnn = torch.nn.LSTM(h, h, num_layers=2, batch_first=True,
                                     dropout=0.1)
        self.dec_proj = torch.nn.Linear(h, out)
        self.act = torch.nn.GELU(approximate="tanh")
        self.fc = torch.nn.Linear(2 * out, vocab)

    def forward(self, feats, text_in):
        enc = self.enc_proj(self.enc_rnn(feats)[0])       # (B, T, out)
        dec = self.dec_proj(self.dec_rnn(self.embedding(text_in))[0])
        T, U1 = enc.shape[1], dec.shape[1]
        lattice = torch.cat([enc.unsqueeze(2).expand(-1, -1, U1, -1),
                             dec.unsqueeze(1).expand(-1, T, -1, -1)], dim=-1)
        return self.fc(self.act(lattice))


def main():
    torch.manual_seed(0)
    B, T, U, V = 1, 512, 48, 72  # reference: batch 1/device (run_train.sh)
    model = RefModel()
    opt = torch.optim.AdamW(model.parameters(), lr=1e-4)
    rng = np.random.RandomState(0)
    feats = torch.from_numpy(rng.randn(B, T, 80).astype(np.float32))
    targets = torch.from_numpy(rng.randint(1, V, (U,)).astype(np.int64))
    text_in = torch.cat([torch.zeros(B, 1, dtype=torch.long),
                         targets.view(1, U)], dim=1)

    def step():
        opt.zero_grad(set_to_none=True)
        logits = model(feats, text_in)
        lp = torch.log_softmax(logits.float(), dim=-1)[0]
        loss = rnnt_loss_torch(lp, targets)
        loss.backward()
        opt.step()
        return float(loss.detach())

    step()  # warmup (allocator, thread pools)
    iters = 3
    t0 = time.perf_counter()
    for _ in range(iters):
        step()
    dt = (time.perf_counter() - t0) / iters
    print(json.dumps({
        "metric": "baseline_torch_cpu_utt_per_sec",
        "value": round(B / dt, 3),
        "unit": "utt/s (torch CPU, flagship config, B=1, T=512, U=48, "
                "fwd+RNN-T loss+bwd+AdamW)",
        "sec_per_utt": round(dt, 3),
        "n_threads": torch.get_num_threads(),
    }))


if __name__ == "__main__":
    main()
