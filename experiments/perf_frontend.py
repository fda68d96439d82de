"""Attribute the raw-PCM step's frontend overhead (+163 ms/step over the
precomputed-feats path at the flagship shape: 415.8 vs 251.9 ms, BASELINE.md
soak rows) to its components.

Hypothesis: the length-aware framing (`melspec.frame_signal` with lengths)
is a per-sample vmap'd gather of (B, F, n_fft) = 64x513x400 ~ 13M elements —
XLA lowers that to serial dynamic-slices on TPU — while the lengths-free
path uses the strided-reshape framing (3 shifted views, no gather).

Same two-run-length slope timing as perf_step_breakdown.py (jax.profiler
kills the axon tunnel).  Run on the real chip:
    python experiments/perf_frontend.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

B, T = 64, 512
HOP = 160
S = (T - 1) * HOP  # 81,760 samples -> 512 frames


def timed(fn, iters=12):
    """fn must return a SCALAR (device): value-fetch sync costs 4 bytes
    through the tunnel instead of shipping the full output array."""
    fn()
    float(fn())  # warm + sync

    def run(n):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = fn()
        float(out)
        return time.perf_counter() - t0

    small = max(1, iters // 4)
    d_small = run(small)
    d_big = run(iters)
    return (d_big - d_small) / (iters - small)


def main():
    sys.path.insert(0, ".")
    import rnntransducer_tpu as rt
    from rnntransducer_tpu.frontend import (
        LogMelFrontend, logmel_pallas, spec_augment,
    )
    from rnntransducer_tpu.frontend.melspec import frame_signal

    cfg = rt.base_config().data.audio
    rng = np.random.RandomState(0)
    wav = jnp.asarray(rng.randn(B, S).astype(np.float32))
    lengths = jnp.asarray(rng.randint(S // 2, S + 1, (B,)), jnp.int32)
    jax.block_until_ready((wav, lengths))

    rows = []

    def row(name, fn, iters=12):
        ms = timed(fn, iters) * 1e3
        rows.append((name, ms))
        print(f"{name:<52s} {ms:9.2f} ms")

    fs_len = jax.jit(lambda w, l: frame_signal(
        w, cfg.n_fft, cfg.hop_length, l)[:, -1, -1].sum())
    fs_full = jax.jit(lambda w: frame_signal(
        w, cfg.n_fft, cfg.hop_length)[:, -1, -1].sum())
    row("frame_signal gather (with lengths)", lambda: fs_len(wav, lengths))
    row("frame_signal strided (no lengths)", lambda: fs_full(wav))
    lm_len = jax.jit(lambda w, l: logmel_pallas(w, cfg, l)[0][:, -1, -1].sum())
    lm_full = jax.jit(lambda w: logmel_pallas(w, cfg)[0][:, -1, -1].sum())
    row("logmel_pallas (with lengths)", lambda: lm_len(wav, lengths))
    row("logmel_pallas (no lengths)", lambda: lm_full(wav))
    fe = LogMelFrontend(cfg)
    fe_len = jax.jit(lambda w, l: fe(w, l)[0][:, -1, -1].sum())
    row("LogMelFrontend XLA rfft (with lengths)",
        lambda: fe_len(wav, lengths), iters=4)

    feats, flens = logmel_pallas(wav, cfg, lengths)
    jax.block_until_ready(feats)
    key = jax.random.PRNGKey(0)
    sa = jax.jit(lambda k, f, fl: spec_augment(
        k, f, fl, freq_para=cfg.freq_mask_para, time_para=cfg.time_mask_para,
        freq_cnt=cfg.freq_mask_cnt,
        time_cnt=cfg.time_mask_cnt)[:, -1, -1].sum())
    row("spec_augment", lambda: sa(key, feats, flens))

    wav_i16 = (wav * 32767 / jnp.max(jnp.abs(wav))).astype(jnp.int16)
    scale = jnp.max(jnp.abs(wav), axis=-1) / 32767
    deq = jax.jit(lambda w, s: (w.astype(jnp.float32)
                                * s[:, None])[:, -1].sum())
    row("dequantize int16", lambda: deq(wav_i16, scale))

    print()
    for name, ms in rows:
        print(f"{name}: {ms:.2f}")


if __name__ == "__main__":
    main()
