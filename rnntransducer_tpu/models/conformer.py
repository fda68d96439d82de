"""Conformer encoder (Gulati et al. 2020, arXiv:2005.08100) — the
production-standard attention+convolution "transcription network", selectable
with ``transnet.arch="conformer"``.

Beyond reference parity: the reference's encoder registry is RNN-only
(``networks/encoder.py:48-52``).  On TPU the Conformer is the natural
second family — every block is GEMMs (MXU) plus one depthwise conv (VPU),
static shapes throughout, no sequential scan.

Design notes (TPU-first):

* **Macaron block**: ``x += 1/2 FFN(LN x); x += MHSA(LN x); x += Conv(LN x);
  x += 1/2 FFN(LN x); x = LN(x)`` — pre-norm residuals, the paper's layout.
* **Relative positions via RoPE** (rotary embeddings on q/k): gives the
  relative-position inductive bias of the paper's Transformer-XL attention
  with zero extra parameters or gather tables — pure elementwise rotations
  that XLA fuses into the attention GEMMs.
* **Masking is exact**: attention excludes padded KEYS, the conv module
  zeroes padded inputs before the depthwise window, and the final output is
  zeroed past each row's length — so a padded batch produces bit-identical
  valid rows to per-utterance calls (tested), matching the masked-scan
  contract of the RNN encoder ("zeros past length").
* **BatchNorm -> LayerNorm** in the conv module: batch statistics poison
  padded batches and complicate serving; per-position LayerNorm is the
  standard masked-safe substitute.
* **Subsampling** reuses the existing frame-stacking time reduction
  (``time_reduction_stride``) on the INPUT features (``stack_frames``),
  then projects to d_model — the stacking frontend of production RNN-T
  encoders; ``output_lengths`` math is shared with the RNN family.
* **Not streamable** (full-context attention): configs must keep
  ``bidirectional=True`` so every existing streaming gate (which already
  refuses bidirectional encoders) fires unchanged; the returned carry is a
  zero-size placeholder ``RNNState``.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from rnntransducer_tpu.config import TransNetConfig
from rnntransducer_tpu.models.cells import RNNState
from rnntransducer_tpu.models.encoder import stack_frames
from rnntransducer_tpu.utils.masking import length_mask

NEG = -1e30


def rope(x: jnp.ndarray) -> jnp.ndarray:
    """Rotary position embedding over (B, H, T, hd) — rotate feature pairs
    by position-dependent angles (theta_i = 10000^(-2i/hd))."""
    B, H, T, hd = x.shape
    half = hd // 2
    inv = (10000.0 ** (-np.arange(0, half) / half)).astype(np.float32)
    pos = jnp.arange(T, dtype=jnp.float32)
    ang = pos[:, None] * jnp.asarray(inv)[None, :]          # (T, half)
    sin, cos = jnp.sin(ang).astype(x.dtype), jnp.cos(ang).astype(x.dtype)
    x1, x2 = x[..., :half], x[..., half:2 * half]
    rot = jnp.concatenate([x1 * cos - x2 * sin, x1 * sin + x2 * cos], -1)
    if hd % 2:  # odd head dim: last feature passes through unrotated
        rot = jnp.concatenate([rot, x[..., -1:]], -1)
    return rot


class FeedForward(nn.Module):
    d_model: int
    mult: int
    dropout: float

    @nn.compact
    def __call__(self, x, deterministic: bool):
        x = nn.LayerNorm()(x)
        x = nn.Dense(self.mult * self.d_model)(x)
        x = nn.swish(x)
        if self.dropout > 0:
            x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = nn.Dense(self.d_model)(x)
        if self.dropout > 0:
            x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return x


class SelfAttention(nn.Module):
    d_model: int
    num_heads: int
    dropout: float

    @nn.compact
    def __call__(self, x, key_valid, deterministic: bool):
        """x: (B, T, D); key_valid: (B, T) bool — padded keys excluded."""
        B, T, D = x.shape
        H = self.num_heads
        hd = D // H
        x = nn.LayerNorm()(x)
        qkv = nn.Dense(3 * D)(x).reshape(B, T, 3, H, hd)
        q, k, v = (jnp.moveaxis(qkv[:, :, i], 1, 2) for i in range(3))
        q, k = rope(q), rope(k)                              # (B, H, T, hd)
        # scores in fp32: softmax over T is the one numerically-sensitive op
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        logits = logits / np.sqrt(hd)
        logits = jnp.where(key_valid[:, None, None, :], logits, NEG)
        att = nn.softmax(logits, axis=-1).astype(x.dtype)
        if self.dropout > 0:
            att = nn.Dropout(self.dropout)(att, deterministic=deterministic)
        out = jnp.einsum("bhqk,bhkd->bhqd", att, v)
        out = jnp.moveaxis(out, 2, 1).reshape(B, T, D)
        out = nn.Dense(D)(out)
        if self.dropout > 0:
            out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        return out


class ConvModule(nn.Module):
    d_model: int
    kernel_size: int
    dropout: float

    @nn.compact
    def __call__(self, x, valid, deterministic: bool):
        """x: (B, T, D); valid: (B, T) bool.  Padded positions are zeroed
        BEFORE the depthwise window so they contribute exactly what SAME
        zero-padding would — per-utterance parity."""
        x = nn.LayerNorm()(x)
        x = jnp.where(valid[..., None], x, 0)
        x = nn.Dense(2 * self.d_model)(x)
        a, b = jnp.split(x, 2, axis=-1)
        x = a * nn.sigmoid(b)                                # GLU
        x = jnp.where(valid[..., None], x, 0)
        x = nn.Conv(features=self.d_model, kernel_size=(self.kernel_size,),
                    feature_group_count=self.d_model, padding="SAME")(x)
        x = nn.LayerNorm()(x)                                # masked-safe BN stand-in
        x = nn.swish(x)
        x = nn.Dense(self.d_model)(x)
        if self.dropout > 0:
            x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return x


class ConformerBlock(nn.Module):
    d_model: int
    num_heads: int
    ff_mult: int
    kernel_size: int
    dropout: float

    @nn.compact
    def __call__(self, x, valid, deterministic: bool):
        x = x + 0.5 * FeedForward(self.d_model, self.ff_mult,
                                  self.dropout)(x, deterministic)
        x = x + SelfAttention(self.d_model, self.num_heads,
                              self.dropout)(x, valid, deterministic)
        x = x + ConvModule(self.d_model, self.kernel_size,
                           self.dropout)(x, valid, deterministic)
        x = x + 0.5 * FeedForward(self.d_model, self.ff_mult,
                                  self.dropout)(x, deterministic)
        return nn.LayerNorm()(x)


class ConformerEncoder(nn.Module):
    """Drop-in encoder with the ``AudioEncoder`` interface: returns
    ((B, T', output_size), placeholder state).  T' = output_frames(T)."""

    cfg: TransNetConfig
    unroll: int = 1  # interface parity with AudioEncoder; unused

    @nn.compact
    def __call__(self, inputs, lengths=None, initial_state: Optional[RNNState] = None,
                 deterministic: bool = True) -> Tuple[jnp.ndarray, RNNState]:
        if initial_state is not None:
            raise ValueError("the Conformer encoder is full-context "
                             "(attention over the whole utterance) and does "
                             "not support streaming chunk carries")
        cfg = self.cfg
        B, T, _ = inputs.shape
        if lengths is None:
            lengths = jnp.full((B,), T, jnp.int32)
        # pad frames must not leak into a straddling reduced group / the
        # first block's conv+attention
        valid_in = length_mask(lengths, T)
        inputs = jnp.where(valid_in[..., None], inputs, 0)
        x = stack_frames(inputs, cfg.time_reduction_stride)
        red_lengths = cfg.output_lengths(lengths.astype(jnp.int32))
        valid = length_mask(red_lengths, x.shape[1])

        x = nn.Dense(cfg.hidden_size)(x)
        if cfg.dropout > 0:
            x = nn.Dropout(cfg.dropout)(x, deterministic=deterministic)
        block = ConformerBlock
        if cfg.remat:
            # static_argnums counts self as 0: (self, x, valid, deterministic)
            block = nn.remat(ConformerBlock, static_argnums=(3,))
        for i in range(cfg.num_layers):
            x = block(cfg.hidden_size, cfg.attention_heads,
                      cfg.ff_multiplier, cfg.conv_kernel_size,
                      cfg.dropout, name=f"block_{i}")(x, valid, deterministic)
        out = nn.Dense(cfg.output_size)(x)
        # masked-scan contract: zeros past each row's length
        out = jnp.where(valid[..., None], out, 0)
        # zero-size placeholder carry: callers unpack (out, state) uniformly
        state = RNNState(jnp.zeros((0, 1, B, 0), out.dtype), None)
        return out, state
