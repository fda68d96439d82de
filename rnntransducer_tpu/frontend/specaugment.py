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


@partial(jax.jit, static_argnames=("freq_para", "time_para", "freq_cnt", "time_cnt"))
def spec_augment(key, feats, feat_lengths=None, freq_para: int = 20,
                 time_para: int = 40, freq_cnt: int = 1, time_cnt: int = 1):
    """feats: (B, T, n_mels). Masks are sampled per utterance.

    Time masks are sampled over the padded T (like torchaudio over the
    reference's unpadded per-utterance tensors); spans landing in padding are
    no-ops since padding is already zero/ignored by the encoder mask.
    """
    B, T, M = feats.shape

    def one(key, x):
        keys = jax.random.split(key, freq_cnt + time_cnt)
        for i in range(freq_cnt):
            keep = _axis_mask(keys[i], M, freq_para)
            x = x * keep[None, :]
        for i in range(time_cnt):
            keep = _axis_mask(keys[freq_cnt + i], T, time_para)
            x = x * keep[:, None]
        return x

    keys = jax.random.split(key, B)
    return jax.vmap(one)(keys, feats)
