"""Static-shape masking utilities.

The reference handles variable lengths with sort/pack_padded/unsort on GPU
(``networks/encoder.py:93-102``, ``networks/decoder.py:103-120``) plus
dual-residence length tensors (``dataloader.py:45-49``) — the exact pathology
that keeps its 3090 under 50% utilization (``README.md:65-66``).  On TPU we
use static padded shapes + boolean masks; these helpers are the single source
of truth for mask semantics so "masking == pack_padded parity" is testable.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def length_mask(lengths, max_len: int, dtype=jnp.bool_):
    """(B,) lengths -> (B, max_len) validity mask."""
    pos = lax.broadcasted_iota(jnp.int32, (1, max_len), 1)
    return (pos < lengths[:, None].astype(jnp.int32)).astype(dtype)


def mask_sequence(x, lengths):
    """Zero out padded timesteps of (B, T, ...) like pad_packed_sequence does."""
    mask = length_mask(lengths, x.shape[1])
    return x * mask.reshape(mask.shape + (1,) * (x.ndim - 2)).astype(x.dtype)


def flip_sequences(x, lengths):
    """Reverse each sequence within its valid length, keeping padding in place.

    For a row with length L: out[t] = x[L-1-t] for t < L, out[t] = x[t]
    (untouched padding) for t >= L.  This is what lets a plain forward
    `lax.scan` implement the backward direction of a bidirectional RNN with
    pack_padded-equivalent semantics.
    """
    T = x.shape[1]
    idx = lax.broadcasted_iota(jnp.int32, (x.shape[0], T), 1)
    # Clamp: lengths beyond T would index out of bounds (JAX fills OOB gathers
    # with NaN), and negative lengths are treated as 0.
    L = jnp.clip(lengths[:, None].astype(jnp.int32), 0, T)
    src = jnp.where(idx < L, L - 1 - idx, idx)
    return jnp.take_along_axis(x, src.reshape(src.shape + (1,) * (x.ndim - 2)), axis=1)
