"""On-device log-mel frontend.

Capability-equivalent of the reference's offline CPU pipeline
(``datamodule.py:48-90``: per-utterance mean-var norm -> torchaudio
MelSpectrogram(sr=16000, win=400, n_fft=400, hop=160, n_mels=80) -> log1p) and
the inline inference frontend (``inference.py:32-51``) — but computed inside
the jitted step on TPU, so augmentation can be re-randomized every epoch
instead of baked into the saved dataset (SURVEY.md §3.2 note).

Numerics match what the reference actually executed: torchaudio defaults are
a periodic Hann window (the config's "hamming" is loaded but never applied,
``datamodule.py:61-63``), center=True reflect padding, power-2 spectrum, HTK
mel scale, no filterbank norm, f_min=0, f_max=sr/2.  Golden tests anchor the
STFT against torch.stft and the filterbank against the published HTK formula.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from rnntransducer_tpu.config import AudioConfig


def hz_to_mel(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f, np.float64) / 700.0)


def mel_to_hz(m):
    return 700.0 * (10.0 ** (np.asarray(m, np.float64) / 2595.0) - 1.0)


def mel_filterbank(n_freqs: int, n_mels: int, sample_rate: int,
                   f_min: float = 0.0, f_max: Optional[float] = None) -> np.ndarray:
    """(n_freqs, n_mels) triangular HTK-scale filterbank, norm=None
    (torchaudio MelScale defaults)."""
    f_max = f_max if f_max is not None else sample_rate / 2.0
    all_freqs = np.linspace(0, sample_rate // 2, n_freqs)
    m_pts = np.linspace(hz_to_mel(f_min), hz_to_mel(f_max), n_mels + 2)
    f_pts = mel_to_hz(m_pts)
    f_diff = f_pts[1:] - f_pts[:-1]                      # (n_mels+1,)
    slopes = f_pts[None, :] - all_freqs[:, None]         # (n_freqs, n_mels+2)
    down = -slopes[:, :-2] / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    fb = np.maximum(0.0, np.minimum(down, up))
    return fb.astype(np.float32)


def hann_window(win_length: int, periodic: bool = True) -> np.ndarray:
    n = win_length if periodic else win_length - 1
    t = np.arange(win_length, dtype=np.float64)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * t / n)).astype(np.float32)


def hamming_window(win_length: int, periodic: bool = True) -> np.ndarray:
    n = win_length if periodic else win_length - 1
    t = np.arange(win_length, dtype=np.float64)
    return (0.54 - 0.46 * np.cos(2.0 * np.pi * t / n)).astype(np.float32)


WINDOWS = {"hann": hann_window, "hamming": hamming_window}


def num_frames(num_samples: int, hop_length: int) -> int:
    """center=True STFT frame count."""
    return num_samples // hop_length + 1


def mean_var_normalize(wav, wav_lengths=None, eps: float = 1e-7):
    """Per-utterance (x - mean) / sqrt(var + eps) over the valid samples
    (``datamodule.py:87-90``, ``inference.py:33``). wav: (B, S)."""
    if wav_lengths is None:
        mean = wav.mean(axis=-1, keepdims=True)
        var = wav.var(axis=-1, keepdims=True)
        return (wav - mean) / jnp.sqrt(var + eps)
    S = wav.shape[-1]
    mask = (jax.lax.broadcasted_iota(jnp.int32, (wav.shape[0], S), 1)
            < wav_lengths[:, None].astype(jnp.int32))
    n = jnp.maximum(wav_lengths.astype(jnp.float32), 1.0)[:, None]
    wavm = jnp.where(mask, wav, 0.0)
    mean = wavm.sum(-1, keepdims=True) / n
    var = (jnp.where(mask, (wav - mean), 0.0) ** 2).sum(-1, keepdims=True) / n
    out = (wav - mean) / jnp.sqrt(var + eps)
    return jnp.where(mask, out, 0.0)


def _strided_frames(wav, n_fft: int, hop_length: int):
    """(B, S) -> (B, frames, n_fft) center/reflect frames with NO gather:
    concatenate shifted views of the hop-reshaped padded signal.  TPU lowers
    per-element gathers to serial dynamic-slices (measured ~100x slower than
    this at the flagship raw-PCM shape, experiments/perf_frontend.py)."""
    B, S = wav.shape
    pad = n_fft // 2
    F = num_frames(S, hop_length)
    x = jnp.pad(wav, ((0, 0), (pad, pad)), mode="reflect")
    # rows of length hop; frame i needs rows i .. i + ceil(n_fft/hop)
    n_rows = F + -(-n_fft // hop_length)
    total = n_rows * hop_length
    if x.shape[1] < total:
        x = jnp.pad(x, ((0, 0), (0, total - x.shape[1])))
    xr = x[:, :total].reshape(B, n_rows, hop_length)
    shifts = [xr[:, i:i + F] for i in range(-(-n_fft // hop_length))]
    return jnp.concatenate(shifts, axis=2)[:, :, :n_fft]


def frame_signal(wav, n_fft: int, hop_length: int, lengths=None):
    """(B, S) -> (B, frames, n_fft) frames with center/reflect padding.

    With ``lengths``, reflection happens at each utterance's TRUE tail (not
    the batch zero-padding), so the last valid frames of shorter-than-max
    utterances match the per-utterance offline/streaming pipelines exactly.
    Frames beyond an utterance's valid frame count contain garbage (batch
    padding / mirror values) and must be masked downstream (they are, via
    frame lengths).

    Implementation: the strided no-gather framing over the zero-padded batch
    is exact for every valid frame EXCEPT the <=2 per utterance whose window
    crosses its true tail (reads past L-1 must reflect at the tail, not read
    batch padding); those are recomputed with an exact tiny gather
    (B x n_fix x n_fft elements) and merged back — O(B*S) traffic instead of
    the O(B*frames*n_fft) full gather this replaces."""
    B, S = wav.shape
    pad = n_fft // 2
    n_frm = num_frames(S, hop_length)
    frames = _strided_frames(wav, n_fft, hop_length)
    if lengths is None:
        return frames
    L = jnp.maximum(lengths.astype(jnp.int32), 1)      # (B,)
    # Valid frames run to i = L//hop; a window crosses the tail when
    # i*hop + n_fft-1 - pad >= L, i.e. i >= ceil((L+1-(n_fft-pad))/hop)
    # >= L//hop - 1 for hop <= n_fft-pad < 2*hop — at most the last two
    # valid frames.  n_fix covers them with one frame of slack (the extra
    # recompute is a no-op: frames that don't cross the tail reproduce the
    # strided values exactly).
    n_fix = (n_fft - pad) // hop_length + 2
    j = jnp.arange(n_fix, dtype=jnp.int32)
    fidx = jnp.clip(L[:, None] // hop_length - j[None, :], 0, n_frm - 1)
    # exact framing for just those frames (same index math as the full
    # gather this path used to do over every frame)
    pos = (fidx[:, :, None] * hop_length
           + jnp.arange(n_fft, dtype=jnp.int32)[None, None, :] - pad)
    Lb = L[:, None, None]
    p = jnp.abs(pos)                                   # reflect at 0
    over = p - (Lb - 1)
    p = jnp.where(over > 0, Lb - 1 - over, p)          # reflect at L-1
    p = jnp.clip(p, 0, S - 1)
    fixed = jax.vmap(lambda w, idx: w[idx])(wav, p)    # (B, n_fix, n_fft)
    iota = jnp.arange(n_frm, dtype=jnp.int32)[None, :, None]
    for k in range(n_fix):
        sel = iota == fidx[:, k][:, None, None]
        frames = jnp.where(sel, fixed[:, k][:, None, :], frames)
    return frames


def stft_power(wav, n_fft: int, hop_length: int, window: jnp.ndarray,
               lengths=None):
    """Power spectrogram matching torch.stft(center=True, pad_mode='reflect',
    onesided, power=2). wav: (B, S) -> (B, frames, n_fft//2+1)."""
    frames = frame_signal(wav, n_fft, hop_length, lengths) * window[None, None, :]
    spec = jnp.fft.rfft(frames, axis=-1)
    return (spec.real ** 2 + spec.imag ** 2).astype(jnp.float32)


@partial(jax.jit, static_argnums=(0,))
def _logmel(cfg: AudioConfig, wav, wav_lengths=None):
    """Jitted module-level impl, cache-keyed on the (hashable, frozen)
    AudioConfig — NOT on a frontend instance (id-based keys would retrace per
    instance and pin dead instances in the global jit cache)."""
    window = jnp.asarray(WINDOWS[cfg.window](cfg.win_length))
    fb = jnp.asarray(mel_filterbank(cfg.n_fft // 2 + 1, cfg.n_mels,
                                    cfg.sample_rate))
    if cfg.normalize:
        wav = mean_var_normalize(wav, wav_lengths)
    power = stft_power(wav, cfg.n_fft, cfg.hop_length, window, wav_lengths)
    mel = jnp.einsum("btf,fm->btm", power, fb,
                     preferred_element_type=jnp.float32)
    feats = jnp.log1p(mel)
    if wav_lengths is None:
        lengths = jnp.full((wav.shape[0],), feats.shape[1], jnp.int32)
    else:
        lengths = wav_lengths.astype(jnp.int32) // cfg.hop_length + 1
    return feats, lengths


class LogMelFrontend:
    """Output: (B, frames, n_mels) log1p mel features + frame lengths, i.e.
    the (seq, mel) layout the reference materializes at
    ``datamodule.py:154-160``.  Instances are stateless wrappers; compiled
    computations are shared across instances with equal configs."""

    def __init__(self, cfg: AudioConfig):
        self.cfg = cfg  # _logmel derives window + filterbank from this

    def __call__(self, wav, wav_lengths=None):
        """wav: (B, S) float32 PCM at cfg.sample_rate."""
        return _logmel(self.cfg, wav, wav_lengths)
