#!/usr/bin/env python
"""Throughput effect of encoder time reduction on the flagship config.

Runs bench.py's exact harness (B=64, T=512, U=48, bf16, fused loss) with
``time_reduction_stride`` in {1, 2, 3} at the standard reduction point
(after layer 1).  Time reduction is a MODEL CHANGE (the reference runs all
8 layers at the 10 ms frame rate), so the headline bench.py number stays at
stride=1; this experiment quantifies the lever for users who adopt the
production-standard reduced-rate encoder.

Why it pays beyond the FLOP count: for stride s at layer k, layers > k run
T/s sequential steps — the input-projection GEMMs keep their FLOPs (s-wide
frames), but the per-step recurrent chain (the measured wall of the step,
docs/TUNING.md round-3 breakdown) halves, and the joint lattice / loss sweep
shrink by s.

Run: python experiments/perf_time_reduction.py
"""

import dataclasses
import json
import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

B, T, U = 64, 512, 48
WARMUP, ITERS = 3, 20


def measure(stride: int, layer: int = 1) -> dict:
    import rnntransducer_tpu as rt
    from rnntransducer_tpu.config import TrainConfig
    from rnntransducer_tpu.train import TrainState, make_optimizer, train_step
    from __graft_entry__ import _example_batch

    cfg = rt.base_config()
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(cfg.model, transnet=dataclasses.replace(
            cfg.model.transnet, time_reduction_stride=stride,
            time_reduction_layer=layer)),
        train=TrainConfig(precision="bf16", accumulate_grad_batches=1,
                          max_steps=1000))
    batch = _example_batch(cfg, B, T, U)
    batch["feat_lengths"] = jnp.full((B,), T, jnp.int32)

    tx = make_optimizer(cfg.train)
    state = TrainState.create(cfg)
    m = None
    for _ in range(WARMUP):
        state, m = train_step(cfg, tx, state, batch)
    loss0 = float(m["loss"])

    def timed(iters):
        nonlocal state
        t0 = time.perf_counter()
        mm = None
        for _ in range(iters):
            state, mm = train_step(cfg, tx, state, batch)
        float(mm["loss"])
        return time.perf_counter() - t0

    d_small = timed(ITERS // 4)
    d_big = timed(ITERS)
    dt = (d_big - d_small) / (ITERS - ITERS // 4)
    return {"stride": stride, "layer": layer,
            "utt_per_sec": round(B / dt, 1),
            "step_ms": round(dt * 1000, 1),
            "loss_after_warmup": round(loss0, 2)}


def main():
    rows = [measure(1), measure(2), measure(3)]
    base = rows[0]["utt_per_sec"]
    for r in rows:
        r["speedup"] = round(r["utt_per_sec"] / base, 2)
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
