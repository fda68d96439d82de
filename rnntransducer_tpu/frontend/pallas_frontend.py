"""Fused Pallas log-mel frontend (north star N6, SURVEY.md §2.2).

The torchaudio pipeline the reference runs offline (``datamodule.py:48-90``)
is STFT -> power -> mel -> log1p.  On TPU the FFT is the odd one out (no FFT
unit); for speech-sized windows (n_fft=400 -> 201 bins) the DFT expressed as
two real matmuls is MXU work, which lets the whole chain fuse into ONE Pallas
kernel with nothing but the (T, n_mels) output ever touching HBM:

    frames (rows, 400) --MXU--> re/im (rows, 256pad) --VPU--> power
                        --MXU--> mel (rows, 128pad)  --VPU--> log1p

* the Hann/Hamming window is folded into the DFT matrices;
* mel bins are zero-padded to the lane width (zero filterbank rows contribute
  nothing);
* framing uses a strided-reshape trick in XLA (three shifted views of the
  hop-reshaped signal concatenated), no gather.

Measured on TPU v5e (B=16 x 8s audio): 39 ms vs 888 ms for the XLA rfft
frontend (~23x) at bf16 MXU precision (error ~2 ulps of bf16 features);
high_precision=True trades the speedup for an fp32-grade DFT.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rnntransducer_tpu.config import AudioConfig
from rnntransducer_tpu.frontend.melspec import (
    WINDOWS, mean_var_normalize, mel_filterbank, num_frames,
)


def _round_up(x, m):
    return (x + m - 1) // m * m


@functools.lru_cache(maxsize=8)
def _dft_mats(n_fft: int, window: str, n_mels: int, sample_rate: int):
    """Windowed DFT cos/sin matrices (n_fft, Kp) and padded filterbank
    (Kp, Mp) as numpy constants."""
    K = n_fft // 2 + 1
    Kp = _round_up(K, 128)
    Mp = _round_up(n_mels, 128)
    win = WINDOWS[window](n_fft).astype(np.float64)
    n = np.arange(n_fft)[:, None]
    k = np.arange(K)[None, :]
    ang = 2.0 * np.pi * n * k / n_fft
    wc = np.zeros((n_fft, Kp), np.float32)
    ws = np.zeros((n_fft, Kp), np.float32)
    wc[:, :K] = (np.cos(ang) * win[:, None]).astype(np.float32)
    ws[:, :K] = (-np.sin(ang) * win[:, None]).astype(np.float32)
    fb = np.zeros((Kp, Mp), np.float32)
    fb[:K, :n_mels] = mel_filterbank(K, n_mels, sample_rate)
    return wc, ws, fb


def _frame_signal(wav, n_fft: int, hop: int, lengths=None):
    """(B, S) -> (B, F, n_fft) frames with center/reflect padding — the
    shared no-gather framing (melspec.frame_signal: strided shifted views,
    plus an exact tiny-gather fixup of the <=2 tail-crossing frames per
    utterance when per-sample lengths are given)."""
    from rnntransducer_tpu.frontend.melspec import frame_signal
    return frame_signal(wav, n_fft, hop, lengths)


def _dot3(x, w):
    """bf16x3 split-precision matmul: ~fp32 accuracy at 3 MXU passes (the
    MXU's single-pass bf16 default costs ~5e-2 absolute in the log-mel
    output; Mosaic supports neither Precision.HIGH nor fast HIGHEST here)."""
    xh = x.astype(jnp.bfloat16)
    xl = (x - xh.astype(jnp.float32)).astype(jnp.bfloat16)
    wh = w.astype(jnp.bfloat16)
    wl = (w - wh.astype(jnp.float32)).astype(jnp.bfloat16)
    d = lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32)
    return d(xh, wh) + d(xh, wl) + d(xl, wh)


def _logmel_kernel(frames_ref, wc_ref, ws_ref, fb_ref, out_ref, *,
                   high_precision: bool):
    f = frames_ref[:]
    if high_precision:
        # fp32-grade DFT (~7e-3 max diff vs rfft), ~25x slower on the MXU
        re = _dot3(f, wc_ref[:])
        im = _dot3(f, ws_ref[:])
    else:
        # single-pass bf16 MXU: ~5e-2 absolute in log-mel space == ~2 ulps of
        # the bf16 features the training step consumes — the fast default
        re = jnp.dot(f, wc_ref[:], preferred_element_type=jnp.float32)
        im = jnp.dot(f, ws_ref[:], preferred_element_type=jnp.float32)
    power = re * re + im * im
    # mel projection: positive values, fb in [0,1] — single-pass bf16 keeps
    # relative error ~1e-3, well under feature precision needs
    mel = jnp.dot(power, fb_ref[:], preferred_element_type=jnp.float32)
    out_ref[:] = jnp.log1p(mel)


@functools.partial(jax.jit, static_argnums=(1, 3))
def logmel_pallas(wav, cfg: AudioConfig, wav_lengths=None,
                  high_precision: bool = False):
    """Fused on-device log-mel: wav (B, S) float32 -> ((B, F, n_mels) feats,
    (B,) frame lengths).

    Default (bf16 MXU) matches LogMelFrontend within ~5e-2 in log-mel space —
    below bf16 feature resolution; high_precision=True uses a bf16x3
    split-precision DFT (~7e-3) at a large speed cost."""
    if cfg.normalize:
        wav = mean_var_normalize(wav, wav_lengths)
    B, S = wav.shape
    n_fft, hop = cfg.n_fft, cfg.hop_length
    frames = _frame_signal(wav, n_fft, hop, wav_lengths)  # (B, F, n_fft)
    F = frames.shape[1]
    wc, ws, fb = _dft_mats(n_fft, cfg.window, cfg.n_mels, cfg.sample_rate)
    Kp, Mp = wc.shape[1], fb.shape[1]

    rows = B * F
    TILE = 256
    rows_p = _round_up(rows, TILE)
    fr = frames.reshape(rows, n_fft)
    if rows_p != rows:
        fr = jnp.pad(fr, ((0, rows_p - rows), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_logmel_kernel, high_precision=high_precision),
        out_shape=jax.ShapeDtypeStruct((rows_p, Mp), jnp.float32),
        grid=(rows_p // TILE,),
        in_specs=[
            pl.BlockSpec((TILE, n_fft), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, Kp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, Kp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Kp, Mp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE, Mp), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=jax.default_backend() != "tpu",
    )(fr, jnp.asarray(wc), jnp.asarray(ws), jnp.asarray(fb))

    feats = out[:rows, :cfg.n_mels].reshape(B, F, cfg.n_mels)
    if wav_lengths is None:
        lengths = jnp.full((B,), F, jnp.int32)
    else:
        lengths = wav_lengths.astype(jnp.int32) // hop + 1
    return feats, lengths
