"""On-device SpecAugment (Park et al. 2019).

Capability-equivalent of the reference's offline torchaudio
FrequencyMasking/TimeMasking maps (``datamodule.py:74-85``,
``config/config.json:33-36``: 1 x F=20 + 1 x T=40) — but applied inside the
jitted train step with fresh randomness every epoch, instead of one fixed mask
realization baked into the saved dataset (the reference quirk noted in
SURVEY.md §3.2).

Matches torchaudio _AxisMasking sampling: mask width ~ Uniform[0, para),
start ~ Uniform[0, axis_size - width), masked bins set to 0.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _axis_mask(key, size: int, para: int):
    """Returns a (size,) bool keep-mask with one random masked span."""
    k1, k2 = jax.random.split(key)
    width = jax.random.uniform(k1, (), minval=0.0, maxval=float(para))
    start = jax.random.uniform(k2, (), minval=0.0, maxval=1.0) * (size - width)
    idx = jnp.arange(size, dtype=jnp.float32)
    return ~((idx >= start) & (idx < start + width))


def _axis_mask_bounded(key, size: int, para: int, valid):
    """Keep-mask with the masked span sampled inside [0, valid)."""
    k1, k2 = jax.random.split(key)
    width = jax.random.uniform(k1, (), minval=0.0, maxval=float(para))
    width = jnp.minimum(width, valid.astype(jnp.float32))
    span = jnp.maximum(valid.astype(jnp.float32) - width, 0.0)
    start = jax.random.uniform(k2, (), minval=0.0, maxval=1.0) * span
    idx = jnp.arange(size, dtype=jnp.float32)
    return ~((idx >= start) & (idx < start + width))


@partial(jax.jit, static_argnames=("freq_para", "time_para", "freq_cnt", "time_cnt"))
def spec_augment(key, feats, feat_lengths=None, freq_para: int = 20,
                 time_para: int = 40, freq_cnt: int = 1, time_cnt: int = 1):
    """feats: (B, T, n_mels). Masks are sampled per utterance.

    With ``feat_lengths``, time-mask spans are sampled inside each
    utterance's VALID frames (matching torchaudio over the reference's
    unpadded per-utterance tensors) — sampling over the padded T would land
    most spans in padding for short utterances, silently weakening the
    augmentation.
    """
    B, T, M = feats.shape
    if feat_lengths is None:
        valid = jnp.full((B,), T, jnp.int32)
    else:
        valid = jnp.clip(feat_lengths.astype(jnp.int32), 1, T)

    def one(key, x, v):
        keys = jax.random.split(key, freq_cnt + time_cnt)
        for i in range(freq_cnt):
            keep = _axis_mask(keys[i], M, freq_para)
            x = x * keep[None, :]
        for i in range(time_cnt):
            keep = _axis_mask_bounded(keys[freq_cnt + i], T, time_para, v)
            x = x * keep[:, None]
        return x

    keys = jax.random.split(key, B)
    return jax.vmap(one)(keys, feats, valid)
