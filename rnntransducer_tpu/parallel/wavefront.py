"""Sequence-parallel (time-sharded) wavefront encoder for long-form audio.

The reference caps utterance length by GPU memory and offers no way to spread
ONE long recording across devices (its DDP shards utterances, never time —
``/root/reference/train.py:45``).  On TPU the idiomatic answer for a
unidirectional recurrent stack is a *wavefront* (staircase) schedule over a
1-D ``time`` mesh:

* the T frames are split into D contiguous chunks, one per device;
* at stage ``s`` device ``d`` runs layer ``l = s - d`` over its chunk and
  hands the final (h, c) carry to device ``d+1`` over ICI (``ppermute``) —
  device d+1 runs the same layer on the next chunk at stage ``s+1`` while
  device d has already moved on to layer ``l+1``;
* after ``D + L - 1`` stages every chunk has been through all L layers.

Wall-clock ≈ (D + L - 1) chunk-layer passes of T/D frames each, versus L
passes of T frames on one device: speedup ≈ L·D / (L + D - 1) (e.g. 6 layers
on 8 devices → ~3.7×), and — usually the real point — per-device activation
memory drops by D, so recordings that OOM a single chip simply fit.

Scope: unidirectional stacks only (the streaming/long-form models).  For a
bidirectional stack layer l+1 needs layer l's *backward* sweep to have
crossed the whole sequence, so chunks cannot pipeline (same structural
argument as docs/TUNING.md's staircase note).  Deterministic (no dropout),
exact by construction — each chunk's masked scan is the same op sequence as
the single-device scan, split at chunk boundaries with the carry threaded
through — and **differentiable**: the stage loop's trip count (D + L - 1)
is static, so it lowers to scan, and ppermute's transpose is the reverse
permute; param and input gradients match the single-device stack at 1e-5,
so the schedule supports sequence-parallel TRAINING of long recordings, not
just inference.  ``tests/test_wavefront.py`` asserts forward equality and
gradient parity against ``StackedRNN``/``AudioEncoder`` on the
8-virtual-device CPU mesh.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from rnntransducer_tpu.models.cells import GATES, RNNState, _gru_step, _lstm_step

TIME_AXIS = "time"


def make_time_mesh(devices=None) -> Mesh:
    """1-D mesh whose single axis shards the time dimension."""
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.asarray(devices), (TIME_AXIS,))


# ---------------------------------------------------------------------------
# param extraction: StackedRNN tree (either layout) -> dense stacked arrays
# ---------------------------------------------------------------------------


def stack_uni_params(rnn_params, num_layers: int):
    """Pull a unidirectional StackedRNN's weights into stacked arrays:

    returns (w_ih0 (F, G·H), b_ih0, w_ih_rest (L-1, H, G·H), b_ih_rest,
    w_hh (L, H, G·H), b_hh (L, G·H)).  Accepts both the per-layer layout
    (``fwd_0`` … ``fwd_{L-1}``) and the scan-over-layers layout
    (``fwd_0`` + ``stack/fwd`` with a leading L-1 axis)."""
    p0 = rnn_params["fwd_0"]
    if "stack" in rnn_params and num_layers > 1:
        rest = rnn_params["stack"]["fwd"]
        w_ih_rest, b_ih_rest = rest["w_ih"], rest["b_ih"]
        w_hh_rest, b_hh_rest = rest["w_hh"], rest["b_hh"]
    elif num_layers > 1:
        layers = [rnn_params[f"fwd_{i}"] for i in range(1, num_layers)]
        w_ih_rest = jnp.stack([q["w_ih"] for q in layers])
        b_ih_rest = jnp.stack([q["b_ih"] for q in layers])
        w_hh_rest = jnp.stack([q["w_hh"] for q in layers])
        b_hh_rest = jnp.stack([q["b_hh"] for q in layers])
    else:
        g_h = p0["w_hh"].shape[-1]
        h = p0["w_hh"].shape[0]
        w_ih_rest = jnp.zeros((0, h, g_h), p0["w_ih"].dtype)
        b_ih_rest = jnp.zeros((0, g_h), p0["b_ih"].dtype)
        w_hh_rest = jnp.zeros((0, h, g_h), p0["w_hh"].dtype)
        b_hh_rest = jnp.zeros((0, g_h), p0["b_hh"].dtype)
    w_hh = jnp.concatenate([p0["w_hh"][None], w_hh_rest], axis=0)
    b_hh = jnp.concatenate([p0["b_hh"][None], b_hh_rest], axis=0)
    return (p0["w_ih"], p0["b_ih"], w_ih_rest, b_ih_rest, w_hh, b_hh)


def pad_time_to_multiple(x: jnp.ndarray, multiple: int) -> jnp.ndarray:
    """Right-pad the time axis (axis 1) of (B, T, …) up to a multiple of
    ``multiple``.  Pad frames sit beyond every row's length, so the masked
    scans ignore them; callers keep the original ``lengths``."""
    T = x.shape[1]
    pad = (-T) % multiple
    if pad == 0:
        return x
    width = [(0, 0)] * x.ndim
    width[1] = (0, pad)
    return jnp.pad(x, width)


# ---------------------------------------------------------------------------
# the wavefront itself
# ---------------------------------------------------------------------------


def _chunk_scan(rnn_type, w_hh_l, b_hh_l, xw, mask, h0, c0):
    """Masked scan over one chunk: xw (B, Tc, G·H) pre-activations,
    mask (B, Tc) bool.  Identical step math to cells.RNNLayer._cell."""

    def step(carry, inp):
        h, c = carry
        xw_t, m_t = inp
        hw = h @ w_hh_l + b_hh_l
        if rnn_type == "lstm":
            h_new, c_new = _lstm_step(h, c, xw_t, hw)
            c = jnp.where(m_t, c_new, c)
        elif rnn_type == "gru":
            h_new = _gru_step(h, xw_t, hw)
        else:
            h_new = jnp.tanh(xw_t + hw)
        h = jnp.where(m_t, h_new, h)
        out = jnp.where(m_t, h_new, jnp.zeros_like(h_new))
        return (h, c), out

    (hf, cf), outs = lax.scan(step, (h0, c0),
                              (jnp.swapaxes(xw, 0, 1),
                               jnp.swapaxes(mask, 0, 1)[..., None]))
    return jnp.swapaxes(outs, 0, 1), hf, cf


def wavefront_scan(rnn_params, x, lengths, *, rnn_type: str,
                   num_layers: int, mesh: Mesh, dropout: float = 0.0,
                   dropout_rng=None) -> Tuple[jnp.ndarray, RNNState]:
    """Run a unidirectional StackedRNN over a time-sharded ``x`` with the
    wavefront schedule.

    ``x``: (B, T, F) with T divisible by the mesh's ``time`` width (use
    ``pad_time_to_multiple``); ``lengths``: (B,) true frame counts.
    Returns (outputs (B, T, H) sharded over time, RNNState (L, 1, B, H))
    matching ``StackedRNN.__call__(deterministic=True)`` numerically.

    The mesh may carry extra (auto) axes — e.g. the Trainer's 2-D
    (data, time) mesh: only ``time`` goes manual, so the batch stays
    data-sharded and sp composes with dp.  ``dropout > 0`` adds
    inter-layer input dropout (every layer's input except layer 0's) with
    per-(layer, chunk) keys — distribution-matched to StackedRNN's
    FastDropout, not bit-identical.
    """
    rnn_type = rnn_type.lower()
    if rnn_type not in GATES:
        raise ValueError(f"unknown rnn_type {rnn_type!r}")
    if dropout > 0.0 and dropout_rng is None:
        raise ValueError("dropout > 0 needs dropout_rng")
    D = mesh.shape[TIME_AXIS]
    B, T, _ = x.shape
    if T % D:
        raise ValueError(f"T={T} not divisible by time-mesh width {D}; "
                         "pad with pad_time_to_multiple")
    (w_ih0, b_ih0, w_ih_rest, b_ih_rest, w_hh, b_hh) = stack_uni_params(
        rnn_params, num_layers)
    H = w_hh.shape[1]
    L = num_layers
    n_stages = D + L - 1
    dt = x.dtype

    def body(weights, xd, lengths):
        # weights arrive as explicit operands (NOT closure captures: a
        # closed-over tracer would carry the outer fully-Auto mesh into
        # the manual region and fail mesh-consistency checks when only
        # 'time' is manual); replicated over 'time', auto over the rest
        (w_ih0, b_ih0, w_ih_rest, b_ih_rest, w_hh, b_hh) = weights["w"]
        rng = weights.get("rng")
        # xd: (B, Tc, F) — this device's chunk
        d = lax.axis_index(TIME_AXIS)
        Tc = xd.shape[1]
        t0 = d * Tc
        mask = (jnp.arange(Tc)[None, :] + t0) < lengths[:, None]
        xw0 = (xd @ w_ih0 + b_ih0).astype(dt)  # hoisted layer-0 projection

        # fresh zeros are replicated over the mesh axis; the loop body makes
        # them device-varying (ppermute / chunk outputs), so cast up-front to
        # keep the fori_loop/scan carry types fixed
        _vary = partial(lax.pcast, axis_name=(TIME_AXIS,), to="varying")
        buf = _vary(jnp.zeros((B, Tc, H), dt))
        h_in = _vary(jnp.zeros((B, H), dt))
        c_in = _vary(jnp.zeros((B, H), dt))
        fin_h = _vary(jnp.zeros((L, B, H), dt))
        fin_c = _vary(jnp.zeros((L, B, H), dt))

        def stage(s, carry):
            buf, h_in, c_in, fin_h, fin_c = carry
            l = s - d
            active = (l >= 0) & (l < L)
            lc = jnp.clip(l, 0, L - 1)
            if L > 1:
                li = jnp.clip(l - 1, 0, L - 2)
                w_ih_l = lax.dynamic_index_in_dim(w_ih_rest, li, keepdims=False)
                b_ih_l = lax.dynamic_index_in_dim(b_ih_rest, li, keepdims=False)
                buf_in = buf
                if dropout > 0.0:
                    # inter-layer input dropout for layers 1..L-1 (the
                    # l==0 branch below discards this path); one
                    # independent mask per (layer, time-chunk)
                    k = jax.random.fold_in(rng, lc * D + d)
                    keep = jax.random.bernoulli(k, 1.0 - dropout, buf.shape)
                    buf_in = jnp.where(
                        keep, buf / jnp.asarray(1.0 - dropout, dt),
                        jnp.zeros((), dt)).astype(dt)
                xw_rest = (buf_in @ w_ih_l + b_ih_l).astype(dt)
                xw = jnp.where(l == 0, xw0, xw_rest)
            else:
                xw = xw0
            w_hh_l = lax.dynamic_index_in_dim(w_hh, lc, keepdims=False)
            b_hh_l = lax.dynamic_index_in_dim(b_hh, lc, keepdims=False)
            outs, hf, cf = _chunk_scan(rnn_type, w_hh_l, b_hh_l, xw, mask,
                                       h_in, c_in)
            buf = jnp.where(active, outs, buf)
            # layer-final states live on the LAST device: its carry after
            # running layer l IS the state at t = length-1 for that layer
            stash = active & (d == D - 1)
            fin_h = jnp.where(
                stash, lax.dynamic_update_index_in_dim(fin_h, hf, lc, 0),
                fin_h)
            fin_c = jnp.where(
                stash, lax.dynamic_update_index_in_dim(fin_c, cf, lc, 0),
                fin_c)
            # hand the carry to the right neighbour (it runs layer l at
            # stage s+1); device 0 receives nothing -> zeros, which is
            # exactly the sequence-start initial state
            perm = [(i, i + 1) for i in range(D - 1)]
            h_in = lax.ppermute(jnp.where(active, hf, h_in), TIME_AXIS, perm)
            c_in = lax.ppermute(jnp.where(active, cf, c_in), TIME_AXIS, perm)
            return buf, h_in, c_in, fin_h, fin_c

        buf, _, _, fin_h, fin_c = lax.fori_loop(
            0, n_stages, stage, (buf, h_in, c_in, fin_h, fin_c))
        # only device D-1's stash is real; sum-broadcast it to every device.
        # (CPU + bf16: manual fp32 promotion — XLA:CPU's AllReducePromotion
        # pass crashes on bf16 all-reduce; exact round-trip, see pipeline.py)
        keep = (d == D - 1).astype(dt)
        if jax.default_backend() == "cpu" and dt == jnp.bfloat16:
            fin_h = lax.psum((fin_h * keep).astype(jnp.float32),
                             TIME_AXIS).astype(dt)
            fin_c = lax.psum((fin_c * keep).astype(jnp.float32),
                             TIME_AXIS).astype(dt)
        else:
            fin_h = lax.psum(fin_h * keep, TIME_AXIS)
            fin_c = lax.psum(fin_c * keep, TIME_AXIS)
        return buf, fin_h, fin_c

    # only 'time' goes manual: any other mesh axes (the Trainer's 'data')
    # stay auto, so GSPMD keeps the batch sharded across them
    weights = {"w": (w_ih0, b_ih0, w_ih_rest, b_ih_rest, w_hh, b_hh)}
    if dropout > 0.0:
        weights["rng"] = dropout_rng
    mapped = shard_map(
        body, mesh=mesh, axis_names=frozenset({TIME_AXIS}),
        in_specs=(P(), P(None, TIME_AXIS, None), P()),
        out_specs=(P(None, TIME_AXIS, None), P(), P()))
    outs, fin_h, fin_c = mapped(weights, x, lengths)
    state = RNNState(fin_h[:, None],  # (L, 1, B, H): one direction
                     fin_c[:, None] if rnn_type == "lstm" else None)
    return outs, state


def wavefront_encode(encoder_params, cfg, x, lengths, mesh: Mesh,
                     dropout: float = 0.0, dropout_rng=None,
                     ) -> Tuple[jnp.ndarray, RNNState]:
    """AudioEncoder forward (rnn stack + output projection) over a time
    mesh.  ``encoder_params``: the ``params["encoder"]`` subtree;
    ``cfg``: TransNetConfig (must be unidirectional); ``x``: (B, T, n_mels)
    log-mel frames, T divisible by the mesh width.

    Returns ((B, T, output_size) sharded over time, RNNState) — numerically
    equal to ``AudioEncoder.__call__(deterministic=True)``.
    """
    if cfg.bidirectional:
        raise ValueError(
            "wavefront sequence parallelism needs a unidirectional encoder: "
            "a bidirectional layer's successor consumes the full backward "
            "sweep, so time chunks cannot pipeline (docs/TUNING.md)")
    if cfg.time_reduction_stride > 1:
        raise ValueError(
            "wavefront sequence parallelism does not support time reduction "
            "(the layer split + per-chunk frame stacking is not implemented "
            "for the staircase schedule); use time_reduction_stride=1")
    outs, state = wavefront_scan(
        encoder_params["rnn"], x, lengths, rnn_type=cfg.rnn_type,
        num_layers=cfg.num_layers, mesh=mesh, dropout=dropout,
        dropout_rng=dropout_rng)
    proj = encoder_params["out_proj"]
    # pointwise over time: runs pre-sharded, no resharding
    return outs @ proj["kernel"] + proj["bias"], state
