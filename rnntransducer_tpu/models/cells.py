"""Scanned RNN cells (LSTM / GRU / vanilla RNN) — the TPU-native replacement
for the reference's cuDNN kernels (``networks/encoder.py:48-52,67-75``,
``networks/decoder.py:51-55,71-79``).

Design (vs the reference's sort -> pack_padded -> cuDNN -> pad_packed -> unsort
dance at ``networks/encoder.py:93-102``):

* Static shapes + boolean masks.  A padded timestep does not update the carry
  and emits zeros, which is exactly pack_padded/pad_packed semantics — and the
  carry after the scan is the state at t = length-1, for free.
* The input projection ``x @ W_ih`` for ALL timesteps is one large batched
  matmul hoisted out of the scan (MXU-friendly); the scan body only does the
  (B, H) x (H, G*H) recurrent matmul + elementwise gates.
* Bidirectional = forward scan + reversed scan (``reverse=True``): for the
  length-monotone masks produced by ``length_mask``, a reversed masked scan
  is mathematically identical to flip -> scan -> flip (the pads form a
  no-op prefix of the reversed processing order) and saves two gathers of
  the full sequence per layer.
* Gate order/equations match torch.nn.LSTM/GRU/RNN exactly (i,f,g,o / r,z,n)
  including the separate b_ih / b_hh biases (GRU's b_hn sits inside the
  r*(...) term, so the biases cannot be folded), so parity is testable
  against torch CPU golden values.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax import lax

from rnntransducer_tpu.ops import rnn_pallas
from rnntransducer_tpu.utils.masking import length_mask

GATES = {"lstm": 4, "gru": 3, "rnn": 1}

# use_pallas modes: "auto" = persistent-VMEM Pallas kernel on TPU for
# supported shapes (measured 2.2x the XLA scan fwd+bwd on v5e, see
# experiments/perf_rnn_scan.py), XLA scan elsewhere; "off" = always XLA scan;
# "interpret" = Pallas kernel in interpreter mode (CPU parity tests).
PALLAS_MODES = ("auto", "off", "interpret")


class RNNState(NamedTuple):
    """Stacked recurrent state: h (and c for LSTM) of shape
    (num_layers, num_directions, B, H).  ``c`` is None for GRU/RNN."""

    h: jnp.ndarray
    c: Optional[jnp.ndarray] = None


def _uniform_init(scale: float):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -scale, scale)

    return init


def _drop_thresh(rate: float) -> int:
    """Drop rate quantized to n/256 (the uint8 mask granularity)."""
    return int(round(rate * 256))


def _rbg_bits(key, shape):
    """uint8 random bits from XLA's on-chip generator (``rbg``), seeded from
    an ordinary (Threefry or raw uint32) PRNG key."""
    data = (jax.random.key_data(key)
            if jnp.issubdtype(key.dtype, jax.dtypes.prng_key) else key)
    data = data.reshape(-1).astype(jnp.uint32)
    words = jnp.concatenate([data, data])[:4] if data.size < 4 else data[:4]
    rk = jax.random.wrap_key_data(words, impl="rbg")
    return jax.random.bits(rk, shape, jnp.uint8)


def _apply_drop_bits(x, bits, rate: float):
    """Masked-rescale ``x`` with pre-drawn uint8 ``bits`` (same shape)."""
    thresh = _drop_thresh(rate)
    keep_scale = jnp.asarray(1.0 / (1.0 - thresh / 256.0), x.dtype)
    return jnp.where(bits >= jnp.uint8(thresh), x * keep_scale,
                     jnp.zeros_like(x))


class FastDropout(nn.Module):
    """Drop-in replacement for ``flax.linen.Dropout`` tuned for TPU.

    flax's Dropout draws 32 Threefry bits per element; at the flagship
    encoder shape the 7 inter-layer masks cost ~23 ms of a 252 ms training
    step (fwd+bwd, measured on v5e — dropout was 8% of the step).  This
    module draws 8 bits per element from XLA's on-chip bit generator
    (``rbg``) instead: measured 1.7 ms for the same masks.  Two deliberate
    semantic trades, both irrelevant at dropout's precision:

    * the drop rate is quantized to n/256 (e.g. 0.1 -> 26/256 ~ 0.1016);
      the kept values are rescaled by the *quantized* keep probability, so
      E[output] == input exactly;
    * the mask stream comes from the rbg generator (seeded from the
      'dropout' PRNG key), whose bit sequence is backend-dependent — masks
      are reproducible per backend+seed but not bit-identical across
      CPU/TPU, which flax's Threefry masks are.  Nothing numerical depends
      on *which* units drop.

    Callers keep passing ordinary Threefry keys via ``rngs={"dropout": k}``.

    Inside ``lax.scan`` bodies the generator cannot overlap the surrounding
    compute (measured ~0.5 ms/site extra inside the layer scan), so
    ``StackedRNN``'s scan-over-layers mode instead draws ALL inter-layer
    masks in one call outside the scan and feeds per-layer slices in as
    scanned inputs (``_call_scan``); this module is for standalone sites.
    """

    rate: float

    @nn.compact
    def __call__(self, x, deterministic: bool):
        if deterministic or self.rate <= 0.0:
            return x
        if self.rate >= 1.0:
            return jnp.zeros_like(x)
        if _drop_thresh(self.rate) == 0:  # rate < 1/512 -> keep everything
            return x
        bits = _rbg_bits(self.make_rng("dropout"), x.shape)
        return _apply_drop_bits(x, bits, self.rate)


def _lstm_step(h, c, xw, hw):
    """xw/hw: pre-activation input/recurrent projections, (B, 4H)."""
    i, f, g, o = jnp.split(xw + hw, 4, axis=-1)
    i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
    g = jnp.tanh(g)
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)
    return h_new, c_new


def _gru_step(h, xw, hw):
    """xw: x@W_ih + b_ih (B, 3H); hw: h@W_hh + b_hh (B, 3H)."""
    xr, xz, xn = jnp.split(xw, 3, axis=-1)
    hr, hz, hn = jnp.split(hw, 3, axis=-1)
    r = jax.nn.sigmoid(xr + hr)
    z = jax.nn.sigmoid(xz + hz)
    n = jnp.tanh(xn + r * hn)
    return (1.0 - z) * n + z * h


class RNNLayer(nn.Module):
    """One direction of one recurrent layer, scanned over time."""

    input_size: int
    hidden_size: int
    rnn_type: str = "lstm"
    unroll: int = 1
    use_pallas: str = "auto"
    # process t = T-1..0 (the backward direction of a bi-RNN); equivalent to
    # flip_sequences -> scan -> flip_sequences for length-monotone masks
    reverse: bool = False

    def setup(self):
        g = GATES[self.rnn_type]
        scale = 1.0 / (self.hidden_size ** 0.5)
        ini = _uniform_init(scale)
        self.w_ih = self.param("w_ih", ini, (self.input_size, g * self.hidden_size))
        self.w_hh = self.param("w_hh", ini, (self.hidden_size, g * self.hidden_size))
        self.b_ih = self.param("b_ih", ini, (g * self.hidden_size,))
        self.b_hh = self.param("b_hh", ini, (g * self.hidden_size,))

    def _cell(self, carry, xw_t, mask_t):
        """carry: (h, c); xw_t: (B, G*H) input pre-activation; mask_t: (B, 1)."""
        h, c = carry
        hw = h @ self.w_hh + self.b_hh
        if self.rnn_type == "lstm":
            h_new, c_new = _lstm_step(h, c, xw_t, hw)
            c = jnp.where(mask_t, c_new, c)
        elif self.rnn_type == "gru":
            h_new = _gru_step(h, xw_t, hw)
        else:
            h_new = jnp.tanh(xw_t + hw)
        h = jnp.where(mask_t, h_new, h)
        out = jnp.where(mask_t, h_new, jnp.zeros_like(h_new))
        return (h, c), out

    def init_state(self, batch: int, dtype=jnp.float32) -> Tuple[jnp.ndarray, jnp.ndarray]:
        h = jnp.zeros((batch, self.hidden_size), dtype)
        c = jnp.zeros((batch, self.hidden_size), dtype)  # unused for gru/rnn
        return h, c

    def __call__(self, x, mask, initial_state=None):
        """x: (B, T, input_size); mask: (B, T) bool.
        Returns (outputs (B, T, H), final (h, c))."""
        B, T = x.shape[0], x.shape[1]
        if initial_state is None:
            initial_state = self.init_state(B, x.dtype)
        # Hoisted input projection: one big MXU matmul over (B*T, in).
        xw = x @ self.w_ih + self.b_ih  # (B, T, G*H)
        xw_t = jnp.swapaxes(xw, 0, 1)  # (T, B, G*H)

        mode = self.use_pallas
        if mode == "interpret":  # CPU tests: any shape runs in the interpreter
            eligible = self.rnn_type in ("gru", "lstm")
        else:
            eligible = (rnn_pallas.supported(
                self.rnn_type, self.hidden_size, B, xw_t.dtype.itemsize,
                seq_len=T)
                and jax.default_backend() == "tpu")
        if mode != "off" and eligible:
            return self._call_pallas(xw_t, mask, initial_state,
                                     interpret=(mode == "interpret"))

        mask_t = jnp.swapaxes(mask, 0, 1)[..., None]  # (T, B, 1)

        def body(carry, inp):
            xw_i, m_i = inp
            return self._cell(carry, xw_i, m_i)

        final, outs = lax.scan(body, initial_state, (xw_t, mask_t),
                               unroll=self.unroll, reverse=self.reverse)
        return jnp.swapaxes(outs, 0, 1), final

    def _call_pallas(self, xw_t, mask, initial_state, interpret):
        """Persistent-VMEM kernel path (ops/rnn_pallas.py).  The mask from
        length_mask is monotone per row, so its row-sum recovers lengths —
        the form the kernel wants (float so its zero cotangent is valid)."""
        h0, c0 = initial_state
        dt = xw_t.dtype
        lengths_f = jnp.sum(mask, axis=1).astype(jnp.float32)
        if self.rnn_type == "gru":
            outs, h_fin = rnn_pallas.gru_scan(
                xw_t, self.w_hh, self.b_hh, h0.astype(dt), lengths_f,
                self.reverse, interpret)
            final = (h_fin.astype(h0.dtype), c0)
        else:
            outs, h_fin, c_fin = rnn_pallas.lstm_scan(
                xw_t, self.w_hh, self.b_hh, h0.astype(dt), c0.astype(dt),
                lengths_f, self.reverse, interpret)
            final = (h_fin.astype(h0.dtype), c_fin.astype(c0.dtype))
        return jnp.swapaxes(outs, 0, 1), final

    def step(self, x_t, state):
        """Single timestep (decode path). x_t: (B, input_size)."""
        xw = x_t @ self.w_ih + self.b_ih
        ones = jnp.ones((x_t.shape[0], 1), dtype=bool)
        (h, c), out = self._cell(state, xw, ones)
        return out, (h, c)


class _ScanLayer(nn.Module):
    """One uniform (bi)layer for scan-over-layers mode.  Applies dropout to
    its INPUT (== torch's dropout-on-every-output-but-the-last when stacked
    above layer 0), then the forward (and flipped backward) masked scan.

    ``drop_bits`` is this layer's slice of the pre-drawn uint8 mask bits
    (drawn ONCE for all layers outside the scan — a generator op inside the
    scan body cannot overlap the recurrent compute, measured ~0.5 ms/site;
    see ``StackedRNN._call_scan``).  A (1, 1, 1) dummy is passed when
    dropout is off or the call is deterministic, and never consumed."""

    hidden_size: int
    rnn_type: str
    bidirectional: bool
    dropout: float
    unroll: int
    use_pallas: str = "auto"

    @nn.compact
    def __call__(self, seq, layer_state, drop_bits, mask, lengths,
                 deterministic):
        """seq: (B, T, D); layer_state: (h (D_dirs,B,H), c (D_dirs,B,H))."""
        if (self.dropout > 0.0 and not deterministic
                and _drop_thresh(self.dropout) > 0):
            seq = _apply_drop_bits(seq, drop_bits, self.dropout)
        h_in, c_in = layer_state
        fwd = RNNLayer(seq.shape[-1], self.hidden_size, self.rnn_type,
                       self.unroll, self.use_pallas, name="fwd")
        f_out, (fh, fc) = fwd(seq, mask, (h_in[0], c_in[0]))
        if self.bidirectional:
            bwd = RNNLayer(seq.shape[-1], self.hidden_size, self.rnn_type,
                           self.unroll, self.use_pallas, reverse=True,
                           name="bwd")
            b_out, (bh, bc) = bwd(seq, mask, (h_in[1], c_in[1]))
            out = jnp.concatenate([f_out, b_out], axis=-1)
            h_out = jnp.stack([fh, bh])
            c_out = jnp.stack([fc, bc])
        else:
            out = f_out
            h_out, c_out = fh[None], fc[None]
        return out, (h_out, c_out)


class StackedRNN(nn.Module):
    """Multi-layer (optionally bidirectional) RNN with inter-layer dropout,
    equivalent in capability to torch.nn.{LSTM,GRU,RNN}(batch_first=True)."""

    input_size: int
    hidden_size: int
    num_layers: int
    rnn_type: str = "lstm"
    dropout: float = 0.0
    bidirectional: bool = False
    unroll: int = 1
    # rematerialize each layer in the backward pass: per-layer scan outputs
    # dominate training HBM for deep stacks; remat bounds the live set to one
    # layer at a time for ~2x layer-forward recompute
    remat: bool = False
    # scan-over-layers: compile ONE uniform layer body (layers 1..L-1 share
    # shapes) instead of L separate scans — order-of-magnitude faster XLA
    # compiles for deep stacks; param tree gains a leading (L-1) axis under
    # "stack". step() (single-token decode) requires scan_layers=False.
    scan_layers: bool = False
    use_pallas: str = "auto"

    def setup(self):
        layer_cls = nn.remat(RNNLayer) if self.remat else RNNLayer
        if self.scan_layers and self.num_layers > 1:
            self.fwd_layers = [layer_cls(
                self.input_size, self.hidden_size, self.rnn_type, self.unroll,
                self.use_pallas, name="fwd_0")]
            self.bwd_layers = [layer_cls(
                self.input_size, self.hidden_size, self.rnn_type, self.unroll,
                self.use_pallas, reverse=True,
                name="bwd_0")] if self.bidirectional else []
            # deterministic (arg 6 incl. module) must stay a static bool
            # through remat or the dropout gate's bool check sees a tracer
            target = (nn.remat(_ScanLayer, static_argnums=(6,))
                      if self.remat else _ScanLayer)
            self.stack = nn.scan(
                target,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                in_axes=(0, 0, nn.broadcast, nn.broadcast, nn.broadcast),
                out_axes=0,
                length=self.num_layers - 1,
            )(self.hidden_size, self.rnn_type, self.bidirectional,
              self.dropout, self.unroll, self.use_pallas, name="stack")
        else:
            fwd, bwd = [], []
            for layer in range(self.num_layers):
                in_size = self.input_size if layer == 0 else (
                    2 * self.hidden_size if self.bidirectional
                    else self.hidden_size)
                fwd.append(layer_cls(in_size, self.hidden_size, self.rnn_type,
                                     self.unroll, self.use_pallas,
                                     name=f"fwd_{layer}"))
                if self.bidirectional:
                    bwd.append(layer_cls(in_size, self.hidden_size,
                                         self.rnn_type, self.unroll,
                                         self.use_pallas, reverse=True,
                                         name=f"bwd_{layer}"))
            self.fwd_layers = fwd
            self.bwd_layers = bwd
        # Inter-layer dropout (torch applies it to every layer's output except
        # the last, encoder.py:73). Must be constructed here, not in __call__.
        self.drop = FastDropout(self.dropout) if self.dropout > 0.0 else None

    @property
    def output_size(self) -> int:
        return (2 if self.bidirectional else 1) * self.hidden_size

    def _pack_state(self, finals):
        """List (layers) of per-dir (h, c) tuples -> RNNState."""
        h = jnp.stack([jnp.stack([f[d][0] for d in range(len(finals[0]))])
                       for f in finals])  # (L, D, B, H)
        if self.rnn_type == "lstm":
            c = jnp.stack([jnp.stack([f[d][1] for d in range(len(finals[0]))])
                           for f in finals])
            return RNNState(h, c)
        return RNNState(h, None)

    def _layer_state(self, state: Optional[RNNState], layer: int, direction: int,
                     batch: int, dtype):
        if state is None:
            z = jnp.zeros((batch, self.hidden_size), dtype)
            return (z, z)
        h = state.h[layer, direction]
        c = state.c[layer, direction] if state.c is not None else jnp.zeros_like(h)
        return (h, c)

    def __call__(self, x, lengths=None, initial_state: Optional[RNNState] = None,
                 deterministic: bool = True):
        """x: (B, T, F); lengths: (B,) or None (= all T).
        Returns (outputs (B, T, D*H), RNNState)."""
        B, T = x.shape[0], x.shape[1]
        if lengths is None:
            lengths = jnp.full((B,), T, jnp.int32)
        mask = length_mask(lengths, T)

        if self.scan_layers and self.num_layers > 1:
            return self._call_scan(x, mask, lengths, initial_state,
                                   deterministic)
        out = x
        finals = []
        for layer in range(self.num_layers):
            dirs = []
            f_out, f_fin = self.fwd_layers[layer](
                out, mask, self._layer_state(initial_state, layer, 0, B, x.dtype))
            dirs.append(f_fin)
            if self.bidirectional:
                b_out, b_fin = self.bwd_layers[layer](
                    out, mask, self._layer_state(initial_state, layer, 1, B, x.dtype))
                out = jnp.concatenate([f_out, b_out], axis=-1)
                dirs.append(b_fin)
            else:
                out = f_out
            finals.append(tuple(dirs))
            if self.drop is not None and layer < self.num_layers - 1:
                out = self.drop(out, deterministic=deterministic)
        return out, self._pack_state(finals)

    def _call_scan(self, x, mask, lengths, initial_state, deterministic):
        """scan-over-layers forward: explicit layer 0, scanned layers 1..L-1."""
        B = x.shape[0]
        D = 2 if self.bidirectional else 1
        H = self.hidden_size
        f_out, f_fin = self.fwd_layers[0](
            x, mask, self._layer_state(initial_state, 0, 0, B, x.dtype))
        if self.bidirectional:
            b_out, b_fin = self.bwd_layers[0](
                x, mask, self._layer_state(initial_state, 0, 1, B, x.dtype))
            out = jnp.concatenate([f_out, b_out], axis=-1)
            h0 = jnp.stack([f_fin[0], b_fin[0]])[None]   # (1, D, B, H)
            c0 = jnp.stack([f_fin[1], b_fin[1]])[None]
        else:
            out = f_out
            h0, c0 = f_fin[0][None, None], f_fin[1][None, None]

        if initial_state is None:
            h_in = jnp.zeros((self.num_layers - 1, D, B, H), x.dtype)
            c_in = h_in
        else:
            h_in = initial_state.h[1:]
            c_in = (initial_state.c[1:] if initial_state.c is not None
                    else jnp.zeros_like(h_in))
        # all inter-layer dropout masks in ONE generator call, outside the
        # scan (inside the body the generator serializes against the
        # recurrent kernels — measured ~0.5 ms/site at the flagship shape)
        L1 = self.num_layers - 1
        if (self.dropout > 0.0 and not deterministic
                and _drop_thresh(self.dropout) > 0):
            drop_bits = _rbg_bits(self.make_rng("dropout"),
                                  (L1,) + out.shape)
        else:
            drop_bits = jnp.zeros((L1, 1, 1, 1), jnp.uint8)  # never consumed
        out, (h_rest, c_rest) = self.stack(out, (h_in, c_in), drop_bits,
                                           mask, lengths, deterministic)
        h = jnp.concatenate([h0, h_rest], axis=0)
        if self.rnn_type == "lstm":
            return out, RNNState(h, jnp.concatenate([c0, c_rest], axis=0))
        return out, RNNState(h, None)

    def step(self, x_t, state: Optional[RNNState]):
        """Single-step stateful mode (unidirectional only) — the decode-path
        equivalent of the reference's prev_hidden_state threading
        (``networks/decoder.py:121-123``). x_t: (B, input_size)."""
        if self.bidirectional:
            raise ValueError("step() requires a unidirectional RNN")
        if self.scan_layers and self.num_layers > 1:
            raise ValueError("step() requires scan_layers=False")
        B = x_t.shape[0]
        out = x_t
        finals = []
        for layer in range(self.num_layers):
            s = self._layer_state(state, layer, 0, B, x_t.dtype)
            out, fin = self.fwd_layers[layer].step(out, s)
            finals.append((fin,))
        return out, self._pack_state(finals)
