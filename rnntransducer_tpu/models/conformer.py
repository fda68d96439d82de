"""Conformer encoder (Gulati et al. 2020, arXiv:2005.08100) — the
production-standard attention+convolution "transcription network", selectable
with ``transnet.arch="conformer"``.

Beyond reference parity: the reference's encoder registry is RNN-only
(``networks/encoder.py:48-52``).  On TPU the Conformer is the natural
second family — every block is GEMMs (MXU) plus one depthwise conv (VPU),
static shapes throughout, no sequential scan.

Two context modes:

* ``attention_chunk == 0`` (default): full-context attention — offline
  only, exactly as non-streamable as a bidirectional RNN (config requires
  ``bidirectional=True`` so the streaming gates fire unchanged).
* ``attention_chunk == C > 0``: CHUNKED-CAUSAL attention — the streaming
  Conformer.  Frame t attends to its own C-frame chunk plus the previous
  ``attention_left_chunks`` chunks (block-causal mask), and the conv module
  is causal.  Training and offline decode use the masked full-sequence
  forward; streaming uses a per-block cache and is EXACT vs the offline
  forward (tested): the cache carries each block's attention-input window
  (``RNNState.h``: (L, left*C, B, d+1) — last channel is a validity flag,
  so the zero state the streaming surfaces build means "nothing cached")
  and the conv module's post-GLU tail (``RNNState.c``: (L, K-1, B, d),
  validity-zeroed).  Config requires ``bidirectional=False`` so the
  streaming gates PASS.

Design notes (TPU-first):

* **Macaron block**: ``x += 1/2 FFN(LN x); x += MHSA(LN x); x += Conv(LN x);
  x += 1/2 FFN(LN x); x = LN(x)`` — pre-norm residuals, the paper's layout.
* **Relative positions via RoPE** (rotary embeddings on q/k): gives the
  relative-position inductive bias of the paper's Transformer-XL attention
  with zero extra parameters — pure elementwise rotations XLA fuses into
  the attention GEMMs.  Because q.k depends only on the POSITION OFFSET,
  the streaming path can use window-local positions and still match the
  offline absolute-position forward exactly.
* **Masking is exact**: attention excludes padded keys, the conv module
  zeroes padded inputs before the depthwise window, and the output is
  zeroed past each row's length — a padded batch produces the same valid
  rows as per-utterance calls (tested), matching the masked-scan contract
  of the RNN encoder.
* **BatchNorm -> LayerNorm** in the conv module: batch statistics poison
  padded batches and complicate serving; per-position LayerNorm is the
  standard masked-safe substitute.
* **Subsampling** reuses the frame-stacking time reduction
  (``time_reduction_stride``) on the INPUT features (``stack_frames``),
  then projects to d_model; ``output_lengths`` math is shared with the
  RNN family.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from rnntransducer_tpu.config import TransNetConfig
from rnntransducer_tpu.models.cells import FastDropout, RNNState
from rnntransducer_tpu.models.encoder import stack_frames
from rnntransducer_tpu.utils.masking import length_mask

NEG = -1e30

# Dropout sites use cells.FastDropout (8 rbg bits/element) rather than
# flax's nn.Dropout (32 Threefry bits/element): the Conformer has ~7
# dropout sites per block x 16 blocks on (B, T', d..4d) tensors, and the
# Threefry mask generation dominated the non-GEMM step time (measured on
# v5e — see BASELINE.md round-4 Conformer row).  Same rng stream
# ('dropout'), same deterministic flag, E[output] == input exactly.


def rope(x: jnp.ndarray, offset: int = 0) -> jnp.ndarray:
    """Rotary position embedding over (B, H, T, hd) — rotate feature pairs
    by position-dependent angles (theta_i = 10000^(-2i/hd)).  ``offset``
    shifts the positions; q.k depends only on relative offsets, so any
    consistent window origin gives identical attention."""
    B, H, T, hd = x.shape
    half = hd // 2
    inv = (10000.0 ** (-np.arange(0, half) / half)).astype(np.float32)
    pos = jnp.arange(T, dtype=jnp.float32) + float(offset)
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
    def __call__(self, x, deterministic: bool = True):
        x = nn.LayerNorm()(x)
        x = nn.Dense(self.mult * self.d_model)(x)
        x = nn.swish(x)
        if self.dropout > 0:
            x = FastDropout(self.dropout)(x, deterministic)
        x = nn.Dense(self.d_model)(x)
        if self.dropout > 0:
            x = FastDropout(self.dropout)(x, deterministic)
        return x


class SelfAttention(nn.Module):
    """Pre-norm MHSA with RoPE.  ``xkv`` may extend ``xq`` on the left
    (streaming window): queries sit at positions ``k_len - q_len ..
    k_len - 1`` of the key timeline."""

    d_model: int
    num_heads: int
    dropout: float

    def setup(self):
        self.norm = nn.LayerNorm()
        self.q_proj = nn.Dense(self.d_model)
        self.k_proj = nn.Dense(self.d_model)
        self.v_proj = nn.Dense(self.d_model)
        self.out = nn.Dense(self.d_model)
        if self.dropout > 0:
            self.att_drop = FastDropout(self.dropout)
            self.out_drop = FastDropout(self.dropout)

    def __call__(self, xq, xkv, mask, deterministic: bool = True):
        """xq: (B, Tq, D) pre-norm query stream; xkv: (B, Tk, D) pre-norm
        key/value stream (Tk >= Tq, right-aligned); mask: (B, Tq, Tk) or
        (1, Tq, Tk) bool — True = may attend."""
        B, Tq, D = xq.shape
        Tk = xkv.shape[1]
        H = self.num_heads
        hd = D // H
        q_in = self.norm(xq)
        kv_in = self.norm(xkv)

        def heads(t):
            return jnp.moveaxis(t.reshape(B, -1, H, hd), 1, 2)

        q = rope(heads(self.q_proj(q_in)), offset=Tk - Tq)
        k = rope(heads(self.k_proj(kv_in)), offset=0)
        v = heads(self.v_proj(kv_in))
        # scores in fp32: softmax over T is the numerically-sensitive op
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32) / np.sqrt(hd)
        logits = jnp.where(mask[:, None], logits, NEG)
        att = nn.softmax(logits, axis=-1).astype(xq.dtype)
        if self.dropout > 0:
            att = self.att_drop(att, deterministic)
        o = jnp.einsum("bhqk,bhkd->bhqd", att, v)
        o = jnp.moveaxis(o, 2, 1).reshape(B, Tq, D)
        o = self.out(o)
        if self.dropout > 0:
            o = self.out_drop(o, deterministic)
        return o


@jax.custom_vjp
def _dwconv_valid(x, k):
    """Depthwise VALID 1-D conv as K shifted multiply-adds:
    out[:, t] = sum_i x[:, t+i] * k[i].  x (B, Tp, D), k (K, D)."""
    K = k.shape[0]
    t_out = x.shape[1] - K + 1
    out = x[:, 0:t_out] * k[0]
    for i in range(1, K):
        out = out + x[:, i:i + t_out] * k[i]
    return out


def _dwconv_valid_fwd(x, k):
    return _dwconv_valid(x, k), (x, k)


def _dwconv_valid_bwd(res, g):
    # Hand-written shift-structured VJP: autodiff's transpose of the K
    # slice-multiplies emits K pad-accumulate passes over full (B, T, D)
    # buffers, which measured ~2x the whole encoder backward at flagship
    # scale.  dx is the full correlation with the reversed kernel (K
    # slice READS of a padded g — fuses like the forward); dk is K
    # elementwise reductions.
    x, k = res
    K = k.shape[0]
    t_out = g.shape[1]
    t_in = x.shape[1]
    gp = jnp.pad(g, ((0, 0), (K - 1, K - 1), (0, 0)))
    dx = gp[:, K - 1:K - 1 + t_in] * k[0]
    for i in range(1, K):
        dx = dx + gp[:, K - 1 - i:K - 1 - i + t_in] * k[i]
    dk = jnp.stack([
        jnp.sum((g * x[:, i:i + t_out]).astype(jnp.float32), axis=(0, 1))
        for i in range(K)]).astype(k.dtype)
    return dx, dk


_dwconv_valid.defvjp(_dwconv_valid_fwd, _dwconv_valid_bwd)


class DepthwiseConv1D(nn.Module):
    """Depthwise 1-D convolution (VALID padding) as K shifted
    multiply-adds with a shift-structured custom VJP (``_dwconv_valid``).

    The obvious spelling — ``nn.Conv(feature_group_count=d_model)`` —
    routes through XLA's grouped-conv path; spelled as K shifts, forward
    AND backward are pure VPU elementwise passes XLA fuses (the naive
    shift-add's autodiff transpose was the trap: K pad-accumulates that
    doubled the encoder backward — hence the custom VJP).  Param layout
    matches ``nn.Conv`` exactly (kernel (K, 1, D), bias (D,), same
    initializer fan-in), so checkpoints are interchangeable."""

    features: int
    kernel_size: int

    @nn.compact
    def __call__(self, x):
        K = self.kernel_size
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (K, 1, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        k = kernel[:, 0].astype(x.dtype)                     # (K, D)
        return _dwconv_valid(x, k) + bias.astype(x.dtype)


class ConvModule(nn.Module):
    """LN -> pointwise(2D) -> GLU -> depthwise conv -> LN -> swish ->
    pointwise(D).  ``causal=True`` left-pads (streamable); the streaming
    path passes the previous chunk's post-GLU ``tail`` ((B, K-1, D),
    validity-zeroed) and receives the new tail back."""

    d_model: int
    kernel_size: int
    dropout: float
    causal: bool = False

    def setup(self):
        self.norm = nn.LayerNorm()
        self.pre = nn.Dense(2 * self.d_model)
        self.conv = DepthwiseConv1D(features=self.d_model,
                                    kernel_size=self.kernel_size)
        self.post_norm = nn.LayerNorm()
        self.post = nn.Dense(self.d_model)
        if self.dropout > 0:
            self.drop = FastDropout(self.dropout)

    def __call__(self, x, valid, deterministic: bool = True, tail=None):
        """x: (B, T, D); valid: (B, T) bool.  Padded positions are zeroed
        BEFORE the depthwise window so they contribute exactly what zero
        padding would — per-utterance parity.  Returns (out, new_tail);
        new_tail is None unless ``tail`` was given."""
        B, T, D = x.shape
        K = self.kernel_size
        x = self.norm(x)
        x = jnp.where(valid[..., None], x, 0)
        x = self.pre(x)
        a, b = jnp.split(x, 2, axis=-1)
        x = a * nn.sigmoid(b)                                # GLU
        x = jnp.where(valid[..., None], x, 0)                # (B, T, D)
        new_tail = None
        if tail is not None:                                 # streaming
            win = jnp.concatenate([tail.astype(x.dtype), x], axis=1)
            new_tail = win[:, -(K - 1):] if K > 1 else win[:, :0]
            x = self.conv(win)                               # VALID: (B,T,D)
        elif self.causal:
            x = self.conv(jnp.pad(x, ((0, 0), (K - 1, 0), (0, 0))))
        else:
            lp = (K - 1) // 2
            x = self.conv(jnp.pad(x, ((0, 0), (lp, K - 1 - lp), (0, 0))))
        x = self.post_norm(x)
        x = nn.swish(x)
        x = self.post(x)
        if self.dropout > 0:
            x = self.drop(x, deterministic)
        return x, new_tail


class ConformerBlock(nn.Module):
    d_model: int
    num_heads: int
    ff_mult: int
    kernel_size: int
    dropout: float
    causal: bool = False

    def setup(self):
        self.ff1 = FeedForward(self.d_model, self.ff_mult, self.dropout)
        self.attn = SelfAttention(self.d_model, self.num_heads, self.dropout)
        self.conv = ConvModule(self.d_model, self.kernel_size, self.dropout,
                               self.causal)
        self.ff2 = FeedForward(self.d_model, self.ff_mult, self.dropout)
        self.final_norm = nn.LayerNorm()

    def __call__(self, x, valid, mask, deterministic: bool = True):
        """Offline forward.  mask: (B or 1, T, T) attention mask."""
        x = x + 0.5 * self.ff1(x, deterministic)
        x = x + self.attn(x, x, mask, deterministic)
        c, _ = self.conv(x, valid, deterministic)
        x = x + c
        x = x + 0.5 * self.ff2(x, deterministic)
        return self.final_norm(x)

    def stream(self, x, valid, cache_x1, conv_tail, deterministic: bool = True):
        """One chunk with cache.  x: (B, S, D) block input; valid: (B, S);
        cache_x1: (B, ctx, D+1) — previous x1 window + validity flag;
        conv_tail: (B, K-1, D).  Returns (out, new_cache_x1, new_tail)."""
        B, S, D = x.shape
        x1 = x + 0.5 * self.ff1(x, deterministic)
        flag = valid.astype(x1.dtype)[..., None]
        x1f = jnp.concatenate([x1, flag], axis=-1)           # (B, S, D+1)
        win = jnp.concatenate([cache_x1.astype(x1f.dtype), x1f], axis=1)
        ctx = cache_x1.shape[1]
        new_cache = win[:, S:] if ctx else win[:, :0]        # keep last ctx
        key_ok = win[..., -1] > 0.5                          # (B, ctx+S)
        mask = key_ok[:, None, :]                            # every query row
        att = self.attn(x1, win[..., :D], mask, deterministic)
        x2 = x1 + att
        c, new_tail = self.conv(x2, valid, deterministic, tail=conv_tail)
        x3 = x2 + c
        x4 = x3 + 0.5 * self.ff2(x3, deterministic)
        return self.final_norm(x4), new_cache, new_tail


class _ScanConformerBlock(ConformerBlock):
    """ConformerBlock with the (carry, *broadcast) -> (carry, ys)
    signature ``nn.scan`` expects (scan-over-blocks mode)."""

    def __call__(self, x, valid, mask, deterministic: bool = True):
        return (ConformerBlock.__call__(self, x, valid, mask, deterministic),
                None)


class _ScanConformerGroup(nn.Module):
    """GROUP of unrolled ConformerBlocks as one nn.scan cell
    (``scan_block_group > 1``).  The scan iteration boundary blocks XLA's
    cross-block backward fusion (measured 84.1 -> 54.5 ms/step from
    scan-of-1 to fully unrolled at Conformer-L scale on v5e); scanning
    groups of G unrolled blocks recovers most of that at 1/(L/G) of the
    unrolled compile.  Params: ``blocks/g{j}/...`` each with a leading
    L/G axis."""

    d_model: int
    num_heads: int
    ff_mult: int
    kernel_size: int
    dropout: float
    causal: bool
    group: int

    def setup(self):
        self.blocks = [
            ConformerBlock(self.d_model, self.num_heads, self.ff_mult,
                           self.kernel_size, self.dropout,
                           causal=self.causal, name=f"g{j}")
            for j in range(self.group)]

    def __call__(self, x, valid, mask, deterministic: bool = True):
        for b in self.blocks:
            x = b(x, valid, mask, deterministic)
        return x, None


def stack_conformer_block_params(encoder_params, num_layers: int,
                                 group: int = 1):
    """Convert a per-block ConformerEncoder param subtree (``block_0`` ..
    ``block_{L-1}``) to the ``scan_blocks=True`` layout: for ``group=1``
    one ``blocks`` subtree with a leading L axis; for ``group=G`` a
    ``blocks`` subtree of ``g{j}`` members (j < G), each stacked over the
    L/G scan steps (global block s*G + j).  Inverse of
    ``unstack_conformer_block_params``; both operate on the ENCODER
    subtree (``params["encoder"]``)."""
    import jax

    out = {k: v for k, v in encoder_params.items()
           if not k.startswith("block_")}
    if group <= 1:
        blocks = [encoder_params[f"block_{i}"] for i in range(num_layers)]
        out["blocks"] = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
        return out
    if num_layers % group:
        raise ValueError(f"num_layers={num_layers} not divisible by "
                         f"scan_block_group={group}")
    steps = num_layers // group
    out["blocks"] = {
        f"g{j}": jax.tree.map(
            lambda *xs: jnp.stack(xs),
            *[encoder_params[f"block_{s * group + j}"] for s in range(steps)])
        for j in range(group)}
    return out


def unstack_conformer_block_params(encoder_params, num_layers: int,
                                   group: int = 1):
    """``scan_blocks=True`` layout -> per-block layout (e.g. to serve a
    scan-trained checkpoint through the streaming per-block path)."""
    import jax

    st = encoder_params["blocks"]
    out = {k: v for k, v in encoder_params.items() if k != "blocks"}
    if group <= 1:
        for i in range(num_layers):
            out[f"block_{i}"] = jax.tree.map(lambda x, i=i: x[i], st)
        return out
    steps = num_layers // group
    for s in range(steps):
        for j in range(group):
            out[f"block_{s * group + j}"] = jax.tree.map(
                lambda x, s=s: x[s], st[f"g{j}"])
    return out


class ConformerEncoder(nn.Module):
    """Drop-in encoder with the ``AudioEncoder`` interface: returns
    ((B, T', output_size), state).  T' = output_frames(T).  Streaming
    (``initial_state`` given) requires ``attention_chunk > 0`` and one
    C-frame (post-reduction) chunk per call."""

    cfg: TransNetConfig
    unroll: int = 1  # interface parity with AudioEncoder; unused

    def setup(self):
        cfg = self.cfg
        self.in_proj = nn.Dense(cfg.hidden_size)
        if cfg.dropout > 0:
            self.in_drop = FastDropout(cfg.dropout)
        if cfg.scan_blocks:
            G = max(1, cfg.scan_block_group)
            if cfg.num_layers % G:
                raise ValueError(
                    f"num_layers={cfg.num_layers} not divisible by "
                    f"scan_block_group={G}")
            cell = _ScanConformerBlock if G == 1 else _ScanConformerGroup
            if cfg.remat:
                # static_argnums counts self as 0: (self, x, valid, mask, det)
                cell = nn.remat(cell, static_argnums=(4,))
            scanned = nn.scan(
                cell,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                in_axes=(nn.broadcast, nn.broadcast, nn.broadcast),
                length=cfg.num_layers // G)
            if G == 1:
                self.block_stack = scanned(
                    cfg.hidden_size, cfg.attention_heads, cfg.ff_multiplier,
                    cfg.conv_kernel_size, cfg.dropout,
                    causal=cfg.attention_chunk > 0, name="blocks")
            else:
                self.block_stack = scanned(
                    cfg.hidden_size, cfg.attention_heads, cfg.ff_multiplier,
                    cfg.conv_kernel_size, cfg.dropout,
                    causal=cfg.attention_chunk > 0, group=G, name="blocks")
            self.blocks = None
        else:
            block = ConformerBlock
            if cfg.remat:
                # static_argnums counts self as 0: (self, x, valid, mask, det)
                block = nn.remat(ConformerBlock, static_argnums=(4,))
            self.blocks = [
                block(cfg.hidden_size, cfg.attention_heads, cfg.ff_multiplier,
                      cfg.conv_kernel_size, cfg.dropout,
                      causal=cfg.attention_chunk > 0, name=f"block_{i}")
                for i in range(cfg.num_layers)]
        self.out_proj = nn.Dense(cfg.output_size)

    def _chunk_mask(self, T: int):
        """(1, T, T) block-causal chunk mask (True = may attend), or None
        for full context."""
        C = self.cfg.attention_chunk
        if C <= 0:
            return None
        left = self.cfg.attention_left_chunks
        ci = np.arange(T) // C
        d = ci[:, None] - ci[None, :]                        # cq - ck
        return jnp.asarray((d >= 0) & (d <= left))[None]

    def __call__(self, inputs, lengths=None, initial_state: Optional[RNNState] = None,
                 deterministic: bool = True) -> Tuple[jnp.ndarray, RNNState]:
        cfg = self.cfg
        B, T, _ = inputs.shape
        if lengths is None:
            lengths = jnp.full((B,), T, jnp.int32)
        if initial_state is not None and initial_state.h.shape[0]:
            return self._stream(inputs, lengths, initial_state, deterministic)
        if initial_state is not None:
            raise ValueError(
                "this Conformer is full-context (attention_chunk=0) and "
                "does not support streaming chunk carries; set "
                "transnet.attention_chunk > 0 (with bidirectional=false) "
                "for the chunked-causal streaming variant")
        # pad frames must not leak into a straddling reduced group / the
        # first block's conv+attention
        valid_in = length_mask(lengths, T)
        inputs = jnp.where(valid_in[..., None], inputs, 0)
        x = stack_frames(inputs, cfg.time_reduction_stride)
        red_lengths = cfg.output_lengths(lengths.astype(jnp.int32))
        Tr = x.shape[1]
        valid = length_mask(red_lengths, Tr)

        x = self.in_proj(x)
        if cfg.dropout > 0:
            x = self.in_drop(x, deterministic)
        cm = self._chunk_mask(Tr)
        # attend only to valid keys; compose with the chunk mask
        mask = valid[:, None, :] if cm is None else (cm & valid[:, None, :])
        if self.blocks is None:  # scan_blocks: one compiled block body
            x, _ = self.block_stack(x, valid, mask, deterministic)
        else:
            for blk in self.blocks:
                x = blk(x, valid, mask, deterministic)
        out = self.out_proj(x)
        # masked-scan contract: zeros past each row's length
        out = jnp.where(valid[..., None], out, 0)
        state = (self.zero_state(B, out.dtype)
                 if cfg.attention_chunk > 0
                 else RNNState(jnp.zeros((0, 1, B, 0), out.dtype), None))
        return out, state

    def _stream(self, inputs, lengths, state: RNNState, deterministic):
        cfg = self.cfg
        C = cfg.attention_chunk
        if C <= 0:
            raise ValueError("streaming requires attention_chunk > 0")
        if self.blocks is None:
            raise ValueError(
                "streaming decode needs the per-block layout: set "
                "transnet.scan_blocks=false and convert the checkpoint "
                "with models.conformer.unstack_conformer_block_params")
        B, T, _ = inputs.shape
        S = cfg.output_frames(T)
        if S != C:
            raise ValueError(
                f"streaming Conformer consumes exactly one attention chunk "
                f"per call: got {T} input frames -> {S} reduced, expected "
                f"attention_chunk={C} (feed chunk_frames="
                f"{C * cfg.time_reduction_stride})")
        valid_in = length_mask(lengths, T)
        inputs = jnp.where(valid_in[..., None], inputs, 0)
        x = stack_frames(inputs, cfg.time_reduction_stride)
        red_lengths = cfg.output_lengths(lengths.astype(jnp.int32))
        valid = length_mask(red_lengths, S)
        x = self.in_proj(x)
        if cfg.dropout > 0:
            x = self.in_drop(x, deterministic)

        hs, cs = [], []
        for i, blk in enumerate(self.blocks):
            # state layout: h (L, ctx, B, D+1), c (L, K-1, B, D)
            cache_x1 = jnp.moveaxis(state.h[i], 1, 0)        # (B, ctx, D+1)
            conv_tail = jnp.moveaxis(state.c[i], 1, 0)       # (B, K-1, D)
            x, new_cache, new_tail = blk.stream(x, valid, cache_x1,
                                                conv_tail, deterministic)
            hs.append(jnp.moveaxis(new_cache, 1, 0))
            cs.append(jnp.moveaxis(new_tail, 1, 0))
        out = self.out_proj(x)
        out = jnp.where(valid[..., None], out, 0)
        return out, RNNState(jnp.stack(hs), jnp.stack(cs))

    def zero_state(self, batch: int, dtype=jnp.float32) -> RNNState:
        """Streaming cache zeros: validity flags start at 0, so nothing is
        attended until real chunks fill the window — identical to the
        offline forward's view of the stream start."""
        cfg = self.cfg
        ctx = cfg.attention_left_chunks * cfg.attention_chunk
        h = jnp.zeros((cfg.num_layers, ctx, batch, cfg.hidden_size + 1),
                      dtype)
        c = jnp.zeros((cfg.num_layers, cfg.conv_kernel_size - 1, batch,
                       cfg.hidden_size), dtype)
        return RNNState(h, c)
