"""Benchmark: training throughput (utterances/sec/chip) including the RNN-T
loss, on the flagship config — the BASELINE.md headline metric.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline note: the reference publishes no throughput numbers (README Result
section is empty; BASELINE.md). Its author reports <50% utilization on an
RTX 3090 at batch=1/device with the 8-layer bi-GRU config (README.md:66).
vs_baseline divides by an estimated 8 utterances/sec for that setup, bounded
on both sides rather than hand-waved (see bench_baseline_torch.py for the
measurement + derivation): a reference-equivalent torch step MEASURED in this
image gives the floor (0.027 utt/s on the 1-core container CPU), and a
latency-bound roofline for batch-1 cuDNN GEMM chains on a 3090 gives the
ceiling (~16 utt/s at perfect utilization; the author's "<50% util" note
halves it to ~8).
"""

from __future__ import annotations

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

# 3090-estimate denominator; measured anchor + derivation in
# bench_baseline_torch.py (floor: 0.027 utt/s torch-CPU measured here;
# ceiling: ~16 utt/s 3090 batch-1 latency bound; author-reported <50% util
# => ~8)
BASELINE_UTT_PER_SEC = 8.0

# Flagship step shape: ~5.1 s utterances (T=512 frames @10 ms hop), U=48
# graphemes, batch 64 per chip — the reference's model config from
# config/config.json with bf16, fused chunked joint+loss (Pallas sweep).
# RNNT_BENCH_B overrides the batch for scaling experiments; the headline
# metric is always reported at whatever B actually ran (see the JSON unit).
import os as _os
B = int(_os.environ.get("RNNT_BENCH_B", "64"))
T, U = 512, 48
WARMUP, ITERS = 3, 20

# bf16 dense peak by TPU generation (TFLOP/s) for the MFU denominator
_PEAK_BF16 = {"v5 lite": 197e12, "v5e": 197e12, "v4": 275e12,
              "v5p": 459e12, "v6": 918e12}


def _device_peak_flops() -> float:
    try:
        kind = jax.local_devices()[0].device_kind.lower()
        for k, v in _PEAK_BF16.items():
            if k in kind:
                return v
    except Exception:
        pass
    return 197e12  # assume v5e


def prednet_joint_fwd_flops(cfg, batch: int, t_enc_frames: int,
                            u_labels: int) -> float:
    """FORWARD matmul FLOPs of the prediction net + joint factors, shared
    by every encoder family's FLOPs model (bench.py for the RNN flagship,
    experiments/perf_conformer.py for the Conformer — the prednet/joint
    terms are identical because both run the SAME train_step).

    ``t_enc_frames`` is the ENCODER OUTPUT frame count (post any time
    reduction) — the joint's audio factor runs at that rate.
    """
    pn, jn = cfg.model.prednet, cfg.model.jointnet
    Hp, u1 = pn.hidden_size, u_labels + 1
    fwd = 0.0
    pg = {"gru": 3, "lstm": 4, "rnn": 1, "stateless": 0}[pn.rnn_type.lower()]
    if pg:  # recurrent prednet over U+1 tokens
        in_p = Hp  # embedding lookup emits hidden_size vectors (no GEMM)
        for _ in range(pn.num_layers):
            fwd += 2 * batch * u1 * pg * Hp * (in_p + Hp)
            in_p = Hp
    # stateless prednet: embedding gathers + combine only — no recurrent
    # GEMMs; both variants end in the output projection
    fwd += 2 * batch * u1 * Hp * pn.output_size
    # rank-decomposed concat joint (models/joint.py factors): each side
    # projects straight to V through its slice of the fc kernel — there is
    # NO (B,T,U,*) lattice GEMM at all (the lattice only sees the O(V)
    # broadcast-add inside the loss), so the model must not count one.
    V = jn.num_classes
    tn = cfg.model.transnet
    fwd += 2 * batch * t_enc_frames * tn.output_size * V
    fwd += 2 * batch * u1 * pn.output_size * V
    return fwd


def step_model_flops(cfg, batch: int, t_frames: int, u_labels: int) -> float:
    """Matmul FLOPs of one training step (fwd + bwd), from the config.

    Counts 2*m*n*k per forward GEMM and 3x forward for training (dx + dW
    each mirror a forward GEMM); elementwise gate math and the loss DP are
    negligible against these at flagship scale.
    """
    tn = cfg.model.transnet
    gates = {"gru": 3, "lstm": 4, "rnn": 1}[tn.rnn_type.lower()]
    H = tn.hidden_size
    dirs = 2 if tn.bidirectional else 1
    fwd = 0.0
    in_size = tn.input_size
    for _ in range(tn.num_layers):
        fwd += dirs * 2 * batch * t_frames * gates * H * (in_size + H)
        in_size = dirs * H
    fwd += 2 * batch * t_frames * in_size * tn.output_size  # output proj
    fwd += prednet_joint_fwd_flops(cfg, batch, t_frames, u_labels)
    return 3.0 * fwd


def main():
    import rnntransducer_tpu as rt
    from rnntransducer_tpu.config import TrainConfig
    import dataclasses
    from rnntransducer_tpu.train import TrainState, make_optimizer, train_step

    cfg = rt.base_config()
    cfg = dataclasses.replace(cfg, train=TrainConfig(
        precision="bf16", accumulate_grad_batches=1, max_steps=1000))

    from __graft_entry__ import _example_batch
    batch = _example_batch(cfg, B, T, U)
    # fixed full lengths for a stable benchmark shape
    batch["feat_lengths"] = jnp.full((B,), T, jnp.int32)

    tx = make_optimizer(cfg.train)
    state = TrainState.create(cfg)

    for _ in range(WARMUP):
        state, metrics = train_step(cfg, tx, state, batch)
    float(metrics["loss"])  # value fetch = reliable sync (block_until_ready
    # returns early through the axon TPU tunnel)

    def timed(iters):
        nonlocal state
        t0 = time.perf_counter()
        m = None
        for _ in range(iters):
            state, m = train_step(cfg, tx, state, batch)
        float(m["loss"])
        return time.perf_counter() - t0

    # slope between two run lengths cancels fixed dispatch/sync overhead
    d_small = timed(ITERS // 4)
    d_big = timed(ITERS)
    dt_per_step = (d_big - d_small) / (ITERS - ITERS // 4)
    utt_per_sec = B / dt_per_step
    mfu = step_model_flops(cfg, B, T, U) / dt_per_step / _device_peak_flops()
    print(json.dumps({
        "metric": "train_utterances_per_sec_per_chip",
        "value": round(utt_per_sec, 2),
        "unit": f"utt/s/chip (B={B}, T=512 frames, U=48, bf16, incl. RNN-T loss fwd+bwd)",
        "vs_baseline": round(utt_per_sec / BASELINE_UTT_PER_SEC, 2),
        "step_ms": round(dt_per_step * 1000, 1),
        "mfu": round(mfu, 3),
    }))


if __name__ == "__main__":
    main()
