"""Flagship-scale Conformer training throughput on the real chip.

The Conformer (``transnet.arch="conformer"``, models/conformer.py) is this
framework's second encoder family — the reference's registry is RNN-only
(``/root/reference/networks/encoder.py:48-52``), so there is no reference
baseline to beat here; the comparison that matters is against OUR OWN
flagship bi-GRU row in BASELINE.md, because it shows what the same training
stack (same prednet/joint/loss/optimizer, same rank-decomposed joint, same
fused RNN-T loss) delivers when the encoder is all GEMMs (MXU) instead of a
sequential scan.

Measured model: Conformer-L-shaped — 16 macaron blocks, d_model=512,
8 heads, ff x4, conv kernel 15, 4x frame-stacking subsampling (the paper's
front-end rate), full-context attention.  ~115M encoder params vs the
bi-GRU flagship's ~110M: a fair fight at the same step shape (B=64, T=512
input frames -> T'=128 after subsampling, U=48).

Run: python experiments/perf_conformer.py  [RNNT_BENCH_B=64]
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

B = int(os.environ.get("RNNT_BENCH_B", "64"))
T, U = 512, 48
WARMUP, ITERS = 3, 20

D_MODEL, BLOCKS, HEADS, FF, KCONV, STRIDE = 512, 16, 8, 4, 15, 4


def conformer_step_flops(cfg, batch: int, t_frames: int, u_labels: int) -> float:
    """Matmul FLOPs of one training step (fwd + bwd = 3x fwd GEMMs)."""
    tn, pn, jn = cfg.model.transnet, cfg.model.prednet, cfg.model.jointnet
    d, ff = tn.hidden_size, tn.ff_multiplier
    tp = t_frames // tn.time_reduction_stride  # post-subsampling frames
    fwd = 2 * batch * tp * (tn.input_size * tn.time_reduction_stride) * d
    per_block = (
        2 * (2 * 2 * batch * tp * d * ff * d)   # two macaron FFNs, 2 GEMMs each
        + 4 * 2 * batch * tp * d * d            # q/k/v/out projections
        + 2 * 2 * batch * tp * tp * d           # scores + values
        + 2 * batch * tp * d * 2 * d            # conv pointwise-in (GLU)
        + 2 * batch * tp * d * d                # conv pointwise-out
    )
    fwd += BLOCKS * per_block
    fwd += 2 * batch * tp * d * tn.output_size  # output projection
    pg = {"gru": 3, "lstm": 4}[pn.rnn_type.lower()]
    Hp, u1 = pn.hidden_size, u_labels + 1
    in_p = Hp
    for _ in range(pn.num_layers):
        fwd += 2 * batch * u1 * pg * Hp * (in_p + Hp)
        in_p = Hp
    fwd += 2 * batch * u1 * Hp * pn.output_size
    V = jn.num_classes
    fwd += 2 * batch * tp * tn.output_size * V
    fwd += 2 * batch * u1 * pn.output_size * V
    return 3.0 * fwd


def main():
    import rnntransducer_tpu as rt
    from rnntransducer_tpu.config import TrainConfig
    from rnntransducer_tpu.train import TrainState, make_optimizer, train_step
    from __graft_entry__ import _example_batch
    from bench import _device_peak_flops

    cfg = rt.base_config()
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(
            cfg.model,
            transnet=dataclasses.replace(
                cfg.model.transnet, arch="conformer", hidden_size=D_MODEL,
                num_layers=BLOCKS, attention_heads=HEADS, ff_multiplier=FF,
                conv_kernel_size=KCONV, time_reduction_stride=STRIDE,
                time_reduction_layer=0, bidirectional=True)),
        train=TrainConfig(precision="bf16", accumulate_grad_batches=1,
                          max_steps=1000))

    batch = _example_batch(cfg, B, T, U)
    batch["feat_lengths"] = jnp.full((B,), T, jnp.int32)

    tx = make_optimizer(cfg.train)
    state = TrainState.create(cfg)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(state.params))

    for _ in range(WARMUP):
        state, metrics = train_step(cfg, tx, state, batch)
    float(metrics["loss"])

    def timed(iters):
        nonlocal state
        t0 = time.perf_counter()
        m = None
        for _ in range(iters):
            state, m = train_step(cfg, tx, state, batch)
        float(m["loss"])
        return time.perf_counter() - t0

    d_small = timed(ITERS // 4)
    d_big = timed(ITERS)
    dt = (d_big - d_small) / (ITERS - ITERS // 4)
    mfu = conformer_step_flops(cfg, B, T, U) / dt / _device_peak_flops()
    print(json.dumps({
        "metric": "conformer_train_utterances_per_sec_per_chip",
        "value": round(B / dt, 2),
        "unit": (f"utt/s/chip (Conformer {BLOCKS}x d={D_MODEL}, {n_params/1e6:.0f}M "
                 f"params, B={B}, T={T}->{T//STRIDE}, U={U}, bf16, incl. loss)"),
        "step_ms": round(dt * 1000, 1),
        "mfu": round(mfu, 3),
    }))


if __name__ == "__main__":
    main()
