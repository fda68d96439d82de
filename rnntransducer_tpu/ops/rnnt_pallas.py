"""Pallas TPU kernel for the RNN-T lattice sweep.

This is the performance tier of the loss stack (SURVEY.md §7 hard-part 1),
replacing the reference's warp-transducer CUDA forward-backward
(``model.py:5,39,57,74``).  It implements the same column-sweep recurrence as
the pure-JAX tier (``rnnt_loss._sweep``):

    alpha[t, u] = logaddexp(alpha[t-1, u] + be[t-1, u], alpha[t, u-1] + le[t, u-1])

solved per label-column u in closed form with two Hillis-Steele prefix scans
along the time axis (an exclusive cumsum of the blank edges and a running
logsumexp), so the kernel does U+1 sequential column steps, each a handful of
fully-vectorized (G, T) VPU ops — versus the T+U-step wavefront a naive port
of warp-transducer would do, and versus the XLA tier's per-column kernel
launches.

Layout: edges come in as (B, U+1, T) — time on lanes, so each column is a
contiguous (G, T) tile and the prefix scans are lane-axis rolls.  The batch is
processed in groups of G chosen so all live buffers fit VMEM; the grid runs
over batch groups.  Both the alpha and beta passes of the loss call this same
kernel (beta via the length-aware flipped lattice, see rnnt_loss._alpha_beta).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30


def _shift_right(x, s, fill):
    """x shifted right by s along the lane (last) axis; first s lanes = fill."""
    rolled = pltpu.roll(x, s, axis=1)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(lane >= s, rolled, fill)


def _logaddexp(a, b):
    m = jnp.maximum(a, b)
    d = jnp.abs(a - b)
    return m + jnp.log1p(jnp.exp(-d))


def _exclusive_cumsum_lanes(x):
    """Exclusive prefix sum along lanes (Hillis-Steele, log2(T) rounds)."""
    T = x.shape[-1]
    y = _shift_right(x, 1, 0.0)
    s = 1
    while s < T:
        y = y + _shift_right(y, s, 0.0)
        s *= 2
    return y


def _cumlogsumexp_lanes(x):
    """Inclusive running logsumexp along lanes."""
    T = x.shape[-1]
    y = x
    s = 1
    while s < T:
        y = _logaddexp(y, _shift_right(y, s, NEG))
        s *= 2
    return y


def _sweep_kernel(be_ref, le_ref, alpha_ref):
    """be/le/alpha refs: (G, U1, T) fp32 in VMEM."""
    U1 = be_ref.shape[1]
    col0 = _exclusive_cumsum_lanes(be_ref[:, 0, :])
    alpha_ref[:, 0, :] = col0

    def body(u, prev_col):
        d = prev_col + le_ref[:, u - 1, :]
        cb = _exclusive_cumsum_lanes(be_ref[:, u, :])
        new_col = cb + _cumlogsumexp_lanes(d - cb)
        alpha_ref[:, u, :] = new_col
        return new_col

    jax.lax.fori_loop(1, U1, body, col0)


def _round_up(x, m):
    return (x + m - 1) // m * m


@functools.partial(jax.jit, static_argnames=("interpret",))
def sweep_pallas(blank_edge, label_edge, interpret: bool = False):
    """Pallas equivalent of rnnt_loss._sweep.

    blank_edge/label_edge: (B, T, U+1) fp32 log edge weights (same convention
    as the XLA tier).  Returns alpha (B, T, U+1) fp32.
    """
    B, T, U1 = blank_edge.shape
    Tp = _round_up(max(T, 128), 128)
    # time-on-lanes layout; pad T so lane rolls stay inside the block
    be = jnp.swapaxes(blank_edge.astype(jnp.float32), 1, 2)
    le = jnp.swapaxes(label_edge.astype(jnp.float32), 1, 2)
    if Tp != T:
        # zero fill: padded lanes sit to the RIGHT and prefix scans only move
        # values rightward, so they never contaminate valid lanes (and zeros,
        # unlike -1e30, cannot create inf/NaN in the running logsumexp)
        pad = ((0, 0), (0, 0), (0, Tp - T))
        be = jnp.pad(be, pad)
        le = jnp.pad(le, pad)

    # batch group size: 3 live (G, U1, Tp) fp32 buffers within ~12 MB VMEM
    budget = 12 * 1024 * 1024 // (3 * 4 * U1 * Tp)
    G = max(1, min(B, budget))
    Bp = _round_up(B, G)
    if Bp != B:
        be = jnp.pad(be, ((0, Bp - B), (0, 0), (0, 0)))
        le = jnp.pad(le, ((0, Bp - B), (0, 0), (0, 0)))

    alpha = pl.pallas_call(
        _sweep_kernel,
        out_shape=jax.ShapeDtypeStruct((Bp, U1, Tp), jnp.float32),
        grid=(Bp // G,),
        in_specs=[
            pl.BlockSpec((G, U1, Tp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, U1, Tp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((G, U1, Tp), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(be, le)
    return jnp.swapaxes(alpha[:B, :, :T], 1, 2)
