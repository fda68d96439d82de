"""Time the full flagship train step on the raw-PCM path (on-device frontend
+ SpecAugment inside the jitted step) vs the precomputed-feats path.

This is the device-only raw-PCM rate the Trainer soak is bounded by
(BASELINE.md: 153.9 utt/s steady state pre-fix vs 251.9 on feats).  Run on
the real chip, alone:  python experiments/perf_wav_step.py
"""

from __future__ import annotations

import dataclasses
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

B, T, U = 64, 512, 48
HOP = 160
S = (T - 1) * HOP
WARMUP, ITERS = 3, 16


def main():
    sys.path.insert(0, ".")
    import rnntransducer_tpu as rt
    from rnntransducer_tpu.config import TrainConfig
    from rnntransducer_tpu.train import TrainState, make_optimizer, train_step
    from __graft_entry__ import _example_batch

    cfg = rt.base_config()
    cfg = dataclasses.replace(cfg, train=TrainConfig(
        precision="bf16", accumulate_grad_batches=1, max_steps=1000))
    assert cfg.data.audio.spec_augment

    rng = np.random.RandomState(0)
    base = _example_batch(cfg, B, T, U)
    wav = rng.randn(B, S).astype(np.float32)
    scale = np.abs(wav).max(axis=1) / 32767.0
    wav_i16 = (wav / scale[:, None]).astype(np.int16)
    batch = {k: v for k, v in base.items() if k not in ("feats", "feat_lengths")}
    batch["wav"] = jnp.asarray(wav_i16)
    batch["wav_scale"] = jnp.asarray(scale.astype(np.float32))
    batch["wav_lengths"] = jnp.asarray(
        rng.randint(S // 2, S + 1, (B,)), jnp.int32)
    feats_batch = dict(base)
    feats_batch["feat_lengths"] = jnp.full((B,), T, jnp.int32)

    tx = make_optimizer(cfg.train)

    def measure(name, b):
        state = TrainState.create(cfg)
        m = None
        for _ in range(WARMUP):
            state, m = train_step(cfg, tx, state, b)
        float(m["loss"])

        def timed(iters):
            nonlocal state
            t0 = time.perf_counter()
            mm = None
            for _ in range(iters):
                state, mm = train_step(cfg, tx, state, b)
            float(mm["loss"])
            return time.perf_counter() - t0

        d_small = timed(ITERS // 4)
        d_big = timed(ITERS)
        dt = (d_big - d_small) / (ITERS - ITERS // 4)
        print(f"{name:<28s} step {dt*1e3:8.1f} ms   {B/dt:7.1f} utt/s/chip", flush=True)
        return dt

    dt_f = measure("feats path", feats_batch)
    dt_w = measure("raw-PCM path (wav int16)", batch)
    print(f"frontend overhead: {(dt_w - dt_f)*1e3:.1f} ms/step")


if __name__ == "__main__":
    main()
