"""Persistent Pallas recurrent-scan kernels (GRU / LSTM) — the speed-of-light
path for the reference's cuDNN RNN stacks (``networks/encoder.py:48-52``,
``networks/decoder.py:51-55``).

Why this exists: the XLA ``lax.scan`` cell re-fetches the recurrent weight
matrix from HBM every timestep (6.3 MB for the flagship GRU, ~7.7 us at v5e
bandwidth) and its autodiff accumulates dW_hh in HBM per step.  Measured on
v5e (experiments/perf_rnn_scan.py): 18.7 us/step forward, 32.9 us/step
fwd+bwd, against a ~4 us MXU roofline for the (64, 1024) x (1024, 3072)
recurrent GEMM.

This kernel keeps W_hh resident in VMEM across the whole time grid (constant
BlockSpec index -> fetched once), carries h in VMEM scratch, and streams only
the per-step input projection / outputs through HBM.  Each grid step
processes a BLOCK of ``k`` consecutive timesteps (k chosen per shape to fill
the VMEM budget): the k recurrent GEMMs are inherently sequential, but one
grid step amortizes the per-step grid/DMA overhead k-fold and moves k-times
larger stream blocks per DMA — the dominant cost at the flagship shape, where
the per-step GEMM is ~1.6 us against ~8 us/step measured at k=1.

* forward: k x (MXU GEMM + VPU gates) per grid step.  GRU writes only
  ``h_all``; LSTM writes ``h_all`` + the cell-state carry ``c_all`` (H, not
  the 4H pre-activations) — in both, the recurrent pre-activations ``hw``
  are recomputed in the backward rather than saved.
* backward (custom VJP): opposite-order grid.  Both kernels recompute
  ``hw = h_prev @ W_hh + b_hh`` in-kernel (W_hh is already resident and the
  GEMM is off the sequential dh dependency chain — trading ~2 us of MXU for
  a (k, B, G*H) HBM round-trip), rebuild gates from the streamed
  predecessors, run one MXU GEMM per step for the dh chain, and stream the
  gate grads: LSTM ``dxw`` (== dhw, all gates additive); GRU ``dxw`` plus
  only the n-gate third of ``dhw`` (``dnr``) — the r/z thirds are identical
  to ``dxw``'s.  Predecessor streams are precomputed outside the kernel
  (``_prev_all`` — also needed for the dW reduction).  dW_hh / db_hh then
  reduce OUTSIDE the loop as large (H, T*B) x (T*B, .) MXU GEMMs instead of
  a 12.6 MB fp32 HBM accumulator touched every step.

Masking semantics are identical to ``models/cells.py`` (pack_padded parity):
a padded step (t >= length) leaves the carry unchanged and emits zeros.
Masks must be monotone (length-style) — guaranteed by taking ``lengths``,
not a free-form mask.

The wrapper falls back to shapes the kernel does not support; callers
(``models/cells.py``) additionally gate on platform.
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# ---------------------------------------------------------------------------
# gate math (shared by fwd kernel and bwd recompute)
# ---------------------------------------------------------------------------


def _gru_gates(xw, hw, h_prev):
    """xw/hw: (B, 3H) f32 pre-activations (hw includes b_hh). Returns
    (h_new, (r, z, n)) with torch gate order r,z,n (cells.py:61-68)."""
    H = h_prev.shape[-1]
    xr, xz, xn = xw[:, :H], xw[:, H : 2 * H], xw[:, 2 * H :]
    hr, hz, hn = hw[:, :H], hw[:, H : 2 * H], hw[:, 2 * H :]
    r = jax.nn.sigmoid(xr + hr)
    z = jax.nn.sigmoid(xz + hz)
    n = jnp.tanh(xn + r * hn)
    return (1.0 - z) * n + z * h_prev, (r, z, n)


def _lstm_gates(xw, hw, c_prev):
    """Gate order i,f,g,o (cells.py:51-58). Returns (h_new, c_new, acts)."""
    H = c_prev.shape[-1]
    s = xw + hw
    i = jax.nn.sigmoid(s[:, :H])
    f = jax.nn.sigmoid(s[:, H : 2 * H])
    g = jnp.tanh(s[:, 2 * H : 3 * H])
    o = jax.nn.sigmoid(s[:, 3 * H :])
    c_new = f * c_prev + i * g
    h_new = o * jnp.tanh(c_new)
    return h_new, c_new, (i, f, g, o)


# ---------------------------------------------------------------------------
# forward kernels (k timesteps per grid step)
# ---------------------------------------------------------------------------


def _gru_fwd_kernel(reverse, k, len_ref, xw_ref, w_ref, b_ref, h0_ref,
                    hall_ref, hfin_ref, hstate):
    i = pl.program_id(0)
    nb = pl.num_programs(0)
    blk = nb - 1 - i if reverse else i  # memory block this grid step covers

    @pl.when(i == 0)
    def _():
        hstate[:] = h0_ref[:].astype(jnp.float32)

    h = hstate[:]
    for s in range(k):
        jj = k - 1 - s if reverse else s  # in-block row, processing order
        t = blk * k + jj
        hw = jnp.dot(h.astype(w_ref.dtype), w_ref[:],
                     preferred_element_type=jnp.float32)
        hw = hw + b_ref[:].astype(jnp.float32)
        xw = xw_ref[jj].astype(jnp.float32)
        h_new, _ = _gru_gates(xw, hw, h)
        m = len_ref[:] > t  # (B, 1) bool
        h = jnp.where(m, h_new, h)
        hall_ref[jj] = jnp.where(m, h_new, 0.0).astype(hall_ref.dtype)
    hstate[:] = h

    @pl.when(i == nb - 1)
    def _():
        hfin_ref[:] = hstate[:].astype(hfin_ref.dtype)


def _lstm_fwd_kernel(reverse, k, len_ref, xw_ref, w_ref, b_ref, h0_ref,
                     c0_ref, hall_ref, call_ref, hfin_ref, cfin_ref,
                     hstate, cstate):
    i = pl.program_id(0)
    nb = pl.num_programs(0)
    blk = nb - 1 - i if reverse else i

    @pl.when(i == 0)
    def _():
        hstate[:] = h0_ref[:].astype(jnp.float32)
        cstate[:] = c0_ref[:].astype(jnp.float32)

    h, c = hstate[:], cstate[:]
    for s in range(k):
        jj = k - 1 - s if reverse else s
        t = blk * k + jj
        hw = jnp.dot(h.astype(w_ref.dtype), w_ref[:],
                     preferred_element_type=jnp.float32)
        hw = hw + b_ref[:].astype(jnp.float32)
        xw = xw_ref[jj].astype(jnp.float32)
        h_new, c_new, _ = _lstm_gates(xw, hw, c)
        m = len_ref[:] > t
        h = jnp.where(m, h_new, h)
        c = jnp.where(m, c_new, c)
        hall_ref[jj] = jnp.where(m, h_new, 0.0).astype(hall_ref.dtype)
        # carry (not zeroed): the backward's _prev_all gather needs the
        # predecessor cell state at every valid step
        call_ref[jj] = c.astype(call_ref.dtype)
    hstate[:] = h
    cstate[:] = c

    @pl.when(i == nb - 1)
    def _():
        hfin_ref[:] = hstate[:].astype(hfin_ref.dtype)
        cfin_ref[:] = cstate[:].astype(cfin_ref.dtype)


# ---------------------------------------------------------------------------
# backward kernels (opposite-order grid; predecessor states streamed in)
# ---------------------------------------------------------------------------


def _gru_bwd_kernel(reverse, k, len_ref, xw_ref, hprev_ref,
                    w_ref, b_ref, gout_ref, gfin_ref,
                    dxw_ref, dnr_ref, dh0_ref, dh_s):
    i = pl.program_id(0)
    nb = pl.num_programs(0)
    desc = not reverse  # backward walks time opposite to the forward
    blk = nb - 1 - i if desc else i

    @pl.when(i == 0)
    def _():
        dh_s[:] = gfin_ref[:].astype(jnp.float32)

    dh = dh_s[:]
    B, H = dh.shape
    # Recompute the recurrent pre-activations instead of streaming a saved
    # (k, B, 3H) block from HBM: W_hh is already VMEM-resident and the GEMM
    # is off the sequential dh dependency chain — so it batches over the
    # whole block as ONE (k*B, H) x (H, 3H) GEMM (M = k*B fills the MXU's
    # 128 rows at k=2, where a per-step variant runs M=B=64 at half
    # utilization).  Cuts the forward's hw_save write AND this kernel's read.
    hp_blk = hprev_ref[...].astype(w_ref.dtype).reshape(k * B, H)
    hw_blk = jnp.dot(hp_blk, w_ref[:], preferred_element_type=jnp.float32)
    hw_blk = (hw_blk + b_ref[:].astype(jnp.float32)).reshape(k, B, 3 * H)
    for s in range(k):
        jj = k - 1 - s if desc else s
        t = blk * k + jj
        xw = xw_ref[jj].astype(jnp.float32)
        # predecessor state, precomputed outside (_prev_all): exact at every
        # valid step; garbage rows only where the step is masked, where every
        # gate grad below is zeroed by m anyway.
        h_prev = hprev_ref[jj].astype(jnp.float32)
        hw = hw_blk[jj]
        hn = hw[:, 2 * H :]
        _, (r, z, n) = _gru_gates(xw, hw, h_prev)

        m = len_ref[:] > t
        g_new = (dh + gout_ref[jj].astype(jnp.float32)) * m  # grad into h_new
        dz_pre = g_new * (h_prev - n) * z * (1.0 - z)
        dn = g_new * (1.0 - z)
        dn_pre = dn * (1.0 - n * n)
        dr_pre = dn_pre * hn * r * (1.0 - r)
        dnr = dn_pre * r
        dxw = jnp.concatenate([dr_pre, dz_pre, dn_pre], axis=1)
        # dhw = [dr_pre, dz_pre, dnr] differs from dxw only in the n third;
        # stream just that (k, B, H) slice and let the off-loop dW GEMM
        # reassemble — saves a full (k, B, 2H) HBM write + re-read.
        dhw = jnp.concatenate([dr_pre, dz_pre, dnr], axis=1)
        # dh chain: through the recurrent GEMM + the z*h_prev passthrough; at
        # masked steps everything above is zero and dh carries through.
        chain = jax.lax.dot_general(
            dhw.astype(w_ref.dtype), w_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        dh = chain + g_new * z + jnp.where(m, 0.0, dh)
        dxw_ref[jj] = dxw.astype(dxw_ref.dtype)
        dnr_ref[jj] = dnr.astype(dnr_ref.dtype)
    dh_s[:] = dh

    @pl.when(i == nb - 1)
    def _():
        dh0_ref[:] = dh_s[:].astype(dh0_ref.dtype)


def _lstm_bwd_kernel(reverse, k, len_ref, xw_ref, hprev_ref,
                     cprev_ref, w_ref, b_ref, gout_ref, ghfin_ref, gcfin_ref,
                     dxw_ref, dh0_ref, dc0_ref, dh_s, dc_s):
    i = pl.program_id(0)
    nb = pl.num_programs(0)
    desc = not reverse
    blk = nb - 1 - i if desc else i

    @pl.when(i == 0)
    def _():
        dh_s[:] = ghfin_ref[:].astype(jnp.float32)
        dc_s[:] = gcfin_ref[:].astype(jnp.float32)

    dh, dc = dh_s[:], dc_s[:]
    B, H = dh.shape
    # hw recompute batched over the block — one (k*B, H) x (H, 4H) MXU GEMM
    # off the sequential dh/dc chain (see the GRU backward for rationale)
    hp_blk = hprev_ref[...].astype(w_ref.dtype).reshape(k * B, H)
    hw_blk = jnp.dot(hp_blk, w_ref[:], preferred_element_type=jnp.float32)
    hw_blk = (hw_blk + b_ref[:].astype(jnp.float32)).reshape(k, B, 4 * H)
    for s in range(k):
        jj = k - 1 - s if desc else s
        t = blk * k + jj
        xw = xw_ref[jj].astype(jnp.float32)
        hw = hw_blk[jj]
        c_prev = cprev_ref[jj].astype(jnp.float32)
        _, c_new, (ig, fg, gg, og) = _lstm_gates(xw, hw, c_prev)
        tc = jnp.tanh(c_new)

        m = len_ref[:] > t
        g_h = (dh + gout_ref[jj].astype(jnp.float32)) * m  # grad into h_new
        g_c = dc * m                                       # grad into c_new
        do_pre = g_h * tc * og * (1.0 - og)
        dc_new = g_c + g_h * og * (1.0 - tc * tc)
        di_pre = dc_new * gg * ig * (1.0 - ig)
        df_pre = dc_new * c_prev * fg * (1.0 - fg)
        dg_pre = dc_new * ig * (1.0 - gg * gg)
        dgates = jnp.concatenate([di_pre, df_pre, dg_pre, do_pre], axis=1)
        chain = jax.lax.dot_general(
            dgates.astype(w_ref.dtype), w_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        dh = chain + jnp.where(m, 0.0, dh)
        dc = dc_new * fg + jnp.where(m, 0.0, dc)
        dxw_ref[jj] = dgates.astype(dxw_ref.dtype)
    dh_s[:] = dh
    dc_s[:] = dc

    @pl.when(i == nb - 1)
    def _():
        dh0_ref[:] = dh_s[:].astype(dh0_ref.dtype)
        dc0_ref[:] = dc_s[:].astype(dc0_ref.dtype)


# ---------------------------------------------------------------------------
# pallas_call wrappers
# ---------------------------------------------------------------------------


def _stream(block, nblocks, desc=False):
    """Per-grid-step time-block stream: grid step i touches memory block i
    ascending, or nblocks-1-i when processing time-descending."""
    if desc:
        return pl.BlockSpec(block, lambda i: (nblocks - 1 - i, 0, 0),
                            memory_space=pltpu.VMEM)
    return pl.BlockSpec(block, lambda i: (i, 0, 0), memory_space=pltpu.VMEM)


def _const(shape):
    nd = len(shape)
    zero = (0,) * nd
    return pl.BlockSpec(shape, lambda t: zero, memory_space=pltpu.VMEM)


_VMEM_BUDGET = 14 * 1024 * 1024  # ~16 MB physical minus compiler slack
# The backward kernel tolerates a tighter fit than the estimate suggests (the
# estimate double-buffers every stream; Mosaic does not for all of them).
# Measured on v5e at the flagship GRU shape: bwd k=2 (est. 15.7 MB) compiles
# and trains ~8% faster than k=1, while fwd k=4 (same estimate) compiles but
# runs SLOWER than k=2 — so only the bwd phase gets the relaxed budget.
# The relaxation is validated only on v5e; on other generations (or when
# detection fails) stay with the conservative budget so a Mosaic that DOES
# double-buffer those streams never sees a k whose real footprint overflows.
_VMEM_BUDGET_BWD_V5E = 16 * 1024 * 1024
_RELAXED_BWD_KINDS = ("v5 lite", "v5e", "v5litepod")


def _vmem_budget_bwd() -> int:
    global _BWD_BUDGET_CACHE
    if _BWD_BUDGET_CACHE is None:
        budget = _VMEM_BUDGET
        try:
            kind = jax.local_devices()[0].device_kind.lower()
            if any(k in kind for k in _RELAXED_BWD_KINDS):
                budget = _VMEM_BUDGET_BWD_V5E
        except Exception:
            pass  # no devices / backend init failure: conservative
        _BWD_BUDGET_CACHE = budget
    return _BWD_BUDGET_CACHE


_BWD_BUDGET_CACHE: int | None = None

GATES = {"gru": 3, "lstm": 4}

# HBM-streamed H-sized units per timestep row (double-buffered), by kernel:
# fwd GRU: xw 3H in, hall H out (hw recomputed in bwd, not saved)  -> 4
# bwd GRU: xw 3H, hprev H, gout H in; dxw 3H + dnr H out           -> 9
# fwd LSTM: xw 4H in, hall H + call H out (hw recomputed in bwd)   -> 6
# bwd LSTM: xw 4H, hprev H, cprev H, gout H in; dxw 4H out         -> 11
_STREAM_UNITS = {("gru", "fwd"): 4, ("gru", "bwd"): 9,
                 ("lstm", "fwd"): 6, ("lstm", "bwd"): 11}

def _kernel_vmem(rnn_type: str, phase: str, hidden: int, batch: int,
                 k: int, itemsize: int) -> int:
    # Model the batch as padded to 64 rows: Mosaic's real scoped allocation
    # for these kernels is near-B-independent between 48 and 64 rows at equal
    # k (measured on v5e, GRU bwd H=1024: B=48 k=4 -> 16.08 MiB real vs
    # B=64 k=4 -> 16.77; B=96 k=1 -> 16.61 ~= the B=128 model) — sub-64-row
    # batches do NOT buy VMEM headroom, and modeling them as if they did
    # picked k's that failed AOT compile with scoped-VMEM overflows.
    b_eff = -(-batch // 64) * 64
    g = GATES[rnn_type]
    w = hidden * g * hidden * itemsize
    streams = 2 * k * b_eff * _STREAM_UNITS[(rnn_type, phase)] * hidden * itemsize
    scalars = 8 * b_eff * hidden * 4  # h0/c0/fin/grad consts + f32 scratch
    return w + streams + scalars


# Largest per-kernel batch.  B=64 is the validated operating point at the
# flagship shape (H=1024): the VMEM stream model tracks reality there
# (bwd k=4 measured 16.77 MB vs 17.8 modeled).  Above 64 the model breaks
# down the OTHER way — Mosaic's real allocation at B=96 GRU bwd k=1 is
# 16.61 MB against 12.98 modeled (B=96 pays padded-to-128 register/stream
# costs), which overflows scoped VMEM and fails AOT compile.  Larger global
# batches are therefore split into <=64-row chunks, one pallas_call each:
# the sequential dh-chain GEMM stays at M<=64, but the off-loop dx/dW GEMMs
# and all per-step glue still see the full batch.
_MAX_KERNEL_BATCH = 64


def _batch_slices(B: int):
    """(offset, size) chunks of <= _MAX_KERNEL_BATCH rows, sizes multiple-of-8
    where possible so every chunk keeps whole sublane groups."""
    if B <= _MAX_KERNEL_BATCH:
        return [(0, B)]
    n = -(-B // _MAX_KERNEL_BATCH)
    per = min(_MAX_KERNEL_BATCH, -(-(-(-B // n)) // 8) * 8)
    out = []
    off = 0
    while off < B:
        size = min(per, B - off)
        out.append((off, size))
        off += size
    return out


def _block_k(rnn_type: str, phase: str, T: int, hidden: int, batch: int,
             itemsize: int, ctx_over: bool = False) -> int:
    """Largest timesteps-per-grid-step that divides T and fits VMEM.

    ``RNNT_TPU_RNN_K_FWD`` / ``RNNT_TPU_RNN_K_BWD`` env vars force a k for
    that phase (tuning escape hatch; bypasses the VMEM budget — a k whose
    real footprint overflows fails the pallas_call compile loudly).  The
    forced k is clamped to the largest divisor of T it admits."""
    forced = os.environ.get(f"RNNT_TPU_RNN_K_{phase.upper()}")
    if forced:
        kf = int(forced)
        while kf > 1 and T % kf:
            kf //= 2
        return max(kf, 1)
    budget = _vmem_budget_bwd() if phase == "bwd" else _VMEM_BUDGET
    if ctx_over:
        # Oversubscribed context: the global batch exceeded
        # _MAX_KERNEL_BATCH, so several kernel chunks live in ONE HLO.
        # XLA then places extra operand/result buffers in VMEM and
        # Mosaic's real scoped allocation inflates several MB past the
        # stream model (measured v5e, GRU fwd H=1024 T=512 global B=128:
        # 18.9 MiB real vs 12.5 modeled at k=4 -- the round-3 "B>64
        # fails to compile" bug, docs/DESIGN.md). Shave the budget so
        # the chooser steps down one k per phase (bwd k=2 really
        # allocates 18.9 MiB in this context -> k=1; fwd similarly one
        # step); validated end-to-end by the B=128 bench row
        # (BASELINE.md round 4).
        budget -= (5 * 1024 * 1024 if phase == "bwd"
                   else 3 * 1024 * 1024)
    if phase == "bwd" and 64 < T < 512:
        # Measured (v5e, flagship H=1024 B=64 bf16): in this T range XLA can
        # additionally place kernel outputs in VMEM (S(1) layouts in the
        # failing HLO) DEPENDING ON THE SURROUNDING PROGRAM, inflating
        # Mosaic's real scoped allocation several MB past the stream model
        # and overflowing the 16 MB limit at the model's k.  First seen at
        # T=96/128 (k=2: ~16.05 MiB real); later the time-reduced flagship
        # (stride 2 -> post-stack T=256) hit it too (k=2: 18.42 MiB real in
        # the train_step HLO, while the SAME kernel standalone compiles at
        # k=2) — so the window is not a property of T alone.  Shave the
        # budget so the chooser steps down one k anywhere in the range;
        # k=1 compiles and runs in every observed context (T=96/128/256 on
        # the real chip).  T>=512 keeps the full budget: the flagship k=2
        # operating point is validated end-to-end there.
        budget -= 4 * 1024 * 1024
    for k in (8, 4, 2, 1):
        if T % k == 0 and _kernel_vmem(rnn_type, phase, hidden, batch, k,
                                       itemsize) <= budget:
            return k
    return 1


def _gru_fwd_call(xw, w_hh, b_hh, h0, lengths, reverse, interpret,
                  ctx_over=False):
    T, B, G3H = xw.shape
    H = h0.shape[-1]
    dt = xw.dtype
    k = _block_k("gru", "fwd", T, H, B, dt.itemsize, ctx_over)
    nb = T // k
    len_col = lengths.astype(jnp.int32).reshape(B, 1)
    return pl.pallas_call(
        functools.partial(_gru_fwd_kernel, reverse, k),
        grid=(nb,),
        in_specs=[
            _const((B, 1)),                       # lengths
            _stream((k, B, G3H), nb, reverse),    # xw
            _const((H, G3H)),                     # w_hh (resident)
            _const((1, G3H)),                     # b_hh
            _const((B, H)),                       # h0
        ],
        out_specs=[
            _stream((k, B, H), nb, reverse),      # h_all
            _const((B, H)),                       # h_final
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, H), dt),
            jax.ShapeDtypeStruct((B, H), dt),
        ],
        scratch_shapes=[pltpu.VMEM((B, H), jnp.float32)],
        interpret=interpret,
    )(len_col, xw, w_hh, b_hh.reshape(1, G3H), h0)


def _prev_all(h_all, h0, lengths, reverse):
    """Per-step predecessor states (for both the in-kernel gate recompute and
    the off-loop dW GEMM).  Forward: h0 then h_all[:-1].  Reversed: h_all[t+1]
    where step t+1 is valid, else h0 (masked steps form a prefix of reversed
    processing order and leave the carry at h0)."""
    T = h_all.shape[0]
    if not reverse:
        return jnp.concatenate([h0[None], h_all[:-1]], axis=0)
    shifted = jnp.concatenate([h_all[1:], jnp.zeros_like(h_all[:1])], axis=0)
    valid = (lengths.astype(jnp.int32)[None, :, None]
             > jnp.arange(1, T + 1, dtype=jnp.int32)[:, None, None])
    return jnp.where(valid, shifted, h0[None].astype(h_all.dtype))


def _gru_bwd_call(residuals, cotangents, reverse, interpret,
                  ctx_over=False):
    xw, h_all, w_hh, b_hh, h0, lengths = residuals
    g_hall, g_hfin = cotangents
    T, B, G3H = xw.shape
    H = h0.shape[-1]
    dt = xw.dtype
    k = _block_k("gru", "bwd", T, H, B, dt.itemsize, ctx_over)
    nb = T // k
    len_col = lengths.astype(jnp.int32).reshape(B, 1)
    # the backward pass walks time in the opposite order of the forward
    desc = not reverse
    h_prev_all = _prev_all(h_all, h0, lengths, reverse)
    dxw, dnr, dh0 = pl.pallas_call(
        functools.partial(_gru_bwd_kernel, reverse, k),
        grid=(nb,),
        in_specs=[
            _const((B, 1)),
            _stream((k, B, G3H), nb, desc),       # xw
            _stream((k, B, H), nb, desc),         # h predecessor (precomputed)
            _const((H, G3H)),    # w_hh (resident; contracted on both dims)
            _const((1, G3H)),    # b_hh (for the in-kernel hw recompute)
            _stream((k, B, H), nb, desc),         # g_out
            _const((B, H)),            # g_final
        ],
        out_specs=[
            _stream((k, B, G3H), nb, desc),
            _stream((k, B, H), nb, desc),
            _const((B, H)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, G3H), dt),
            jax.ShapeDtypeStruct((T, B, H), dt),
            jax.ShapeDtypeStruct((B, H), dt),
        ],
        scratch_shapes=[pltpu.VMEM((B, H), jnp.float32)],
        interpret=interpret,
    )(len_col, xw, h_prev_all, w_hh, b_hh.reshape(1, G3H), g_hall, g_hfin)

    # Off-loop reductions: one big MXU GEMM each instead of per-step HBM
    # accumulation (the measured 30+ us/step pathology of scan autodiff).
    # dhw = [dxw[:, :, :2H], dnr]: reassemble inside the GEMMs instead of
    # materializing the (T, B, 3H) tensor.
    hp = h_prev_all.reshape(T * B, H)
    dw_rz = jax.lax.dot_general(
        hp, dxw[:, :, : 2 * H].reshape(T * B, 2 * H),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dw_n = jax.lax.dot_general(
        hp, dnr.reshape(T * B, H),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dw = jnp.concatenate([dw_rz, dw_n], axis=1).astype(w_hh.dtype)
    db = jnp.concatenate([
        jnp.sum(dxw[:, :, : 2 * H].astype(jnp.float32), axis=(0, 1)),
        jnp.sum(dnr.astype(jnp.float32), axis=(0, 1))]).astype(dt)
    return dxw, dw, db, dh0, jnp.zeros_like(lengths)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _gru_scan_one(xw, w_hh, b_hh, h0, lengths, reverse=False,
                  interpret=False, ctx_over=False):
    out, _ = _gru_fwd_res(xw, w_hh, b_hh, h0, lengths, reverse, interpret,
                          ctx_over)
    return out


def _gru_fwd_res(xw, w_hh, b_hh, h0, lengths, reverse, interpret,
                 ctx_over=False):
    h_all, h_fin = _gru_fwd_call(xw, w_hh, b_hh, h0, lengths,
                                 reverse, interpret, ctx_over)
    return (h_all, h_fin), (xw, h_all, w_hh, b_hh, h0, lengths)


def _gru_bwd(reverse, interpret, ctx_over, residuals, cotangents):
    return _gru_bwd_call(residuals, cotangents, reverse, interpret,
                         ctx_over)


_gru_scan_one.defvjp(_gru_fwd_res, _gru_bwd)


def gru_scan(xw, w_hh, b_hh, h0, lengths, reverse=False, interpret=False):
    """Persistent-weight GRU scan.

    Args:
      xw: (T, B, 3H) hoisted input pre-activations (x @ W_ih + b_ih).
      w_hh: (H, 3H); b_hh: (3H,); h0: (B, H); lengths: (B,) float or int.
      reverse: process t = T-1..0 — equivalent to
        flip_sequences(scan(flip_sequences(x))) for length-monotone masks,
        without the two gathers (the backward direction of a bi-RNN).
    Returns:
      (h_all (T, B, H), h_final (B, H)) with cells.py masking semantics.

    Batches above _MAX_KERNEL_BATCH run as independent <=64-row kernel
    chunks (see the constant's comment); gradients compose per chunk.
    """
    B = xw.shape[1]
    slices = _batch_slices(B)
    if len(slices) == 1:
        return _gru_scan_one(xw, w_hh, b_hh, h0, lengths, reverse, interpret)
    h_alls, h_fins = [], []
    for off, size in slices:
        ha, hf = _gru_scan_one(xw[:, off:off + size], w_hh, b_hh,
                               h0[off:off + size], lengths[off:off + size],
                               reverse, interpret, True)
        h_alls.append(ha)
        h_fins.append(hf)
    return (jnp.concatenate(h_alls, axis=1),
            jnp.concatenate(h_fins, axis=0))


def _lstm_fwd_call(xw, w_hh, b_hh, h0, c0, lengths, reverse, interpret,
                   ctx_over=False):
    T, B, G4H = xw.shape
    H = h0.shape[-1]
    dt = xw.dtype
    k = _block_k("lstm", "fwd", T, H, B, dt.itemsize, ctx_over)
    nb = T // k
    len_col = lengths.astype(jnp.int32).reshape(B, 1)
    return pl.pallas_call(
        functools.partial(_lstm_fwd_kernel, reverse, k),
        grid=(nb,),
        in_specs=[
            _const((B, 1)),
            _stream((k, B, G4H), nb, reverse),
            _const((H, G4H)),
            _const((1, G4H)),
            _const((B, H)),
            _const((B, H)),
        ],
        out_specs=[
            _stream((k, B, H), nb, reverse),
            _stream((k, B, H), nb, reverse),      # c_all (carry)
            _const((B, H)),
            _const((B, H)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, H), dt),
            jax.ShapeDtypeStruct((T, B, H), dt),
            jax.ShapeDtypeStruct((B, H), dt),
            jax.ShapeDtypeStruct((B, H), dt),
        ],
        scratch_shapes=[pltpu.VMEM((B, H), jnp.float32),
                        pltpu.VMEM((B, H), jnp.float32)],
        interpret=interpret,
    )(len_col, xw, w_hh, b_hh.reshape(1, G4H), h0, c0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def _lstm_scan_one(xw, w_hh, b_hh, h0, c0, lengths, reverse=False,
                   interpret=False, ctx_over=False):
    out, _ = _lstm_fwd_res(xw, w_hh, b_hh, h0, c0, lengths, reverse,
                           interpret, ctx_over)
    return out


def _lstm_fwd_res(xw, w_hh, b_hh, h0, c0, lengths, reverse, interpret,
                  ctx_over=False):
    h_all, c_all, h_fin, c_fin = _lstm_fwd_call(
        xw, w_hh, b_hh, h0, c0, lengths, reverse, interpret, ctx_over)
    # The forward saves the (T, B, H) cell-state carry instead of the
    # (T, B, 4H) pre-activations: the backward recomputes hw from the
    # predecessor h (W_hh resident, GEMM off the dh chain), so c is the only
    # stream the gates can't rebuild locally.
    return ((h_all, h_fin, c_fin),
            (xw, h_all, c_all, w_hh, b_hh, h0, c0, lengths))


def _lstm_bwd(reverse, interpret, ctx_over, residuals, cotangents):
    xw, h_all, c_all, w_hh, b_hh, h0, c0, lengths = residuals
    g_hall, g_hfin, g_cfin = cotangents
    T, B, G4H = xw.shape
    H = h0.shape[-1]
    dt = xw.dtype
    k = _block_k("lstm", "bwd", T, H, B, dt.itemsize, ctx_over)
    nb = T // k
    len_col = lengths.astype(jnp.int32).reshape(B, 1)

    c_prev_all = _prev_all(c_all, c0, lengths, reverse)
    h_prev_all = _prev_all(h_all, h0, lengths, reverse)

    desc = not reverse
    dxw, dh0, dc0 = pl.pallas_call(
        functools.partial(_lstm_bwd_kernel, reverse, k),
        grid=(nb,),
        in_specs=[
            _const((B, 1)),
            _stream((k, B, G4H), nb, desc),
            _stream((k, B, H), nb, desc),   # h predecessor (precomputed)
            _stream((k, B, H), nb, desc),   # c predecessor (precomputed)
            _const((H, G4H)),
            _const((1, G4H)),    # b_hh (for the in-kernel hw recompute)
            _stream((k, B, H), nb, desc),
            _const((B, H)),
            _const((B, H)),
        ],
        out_specs=[
            _stream((k, B, G4H), nb, desc),
            _const((B, H)),
            _const((B, H)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, G4H), dt),
            jax.ShapeDtypeStruct((B, H), dt),
            jax.ShapeDtypeStruct((B, H), dt),
        ],
        scratch_shapes=[pltpu.VMEM((B, H), jnp.float32),
                        pltpu.VMEM((B, H), jnp.float32)],
        interpret=interpret,
    )(len_col, xw, h_prev_all, c_prev_all, w_hh, b_hh.reshape(1, G4H),
      g_hall, g_hfin, g_cfin)

    dw = jax.lax.dot_general(
        h_prev_all.reshape(T * B, H), dxw.reshape(T * B, G4H),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(w_hh.dtype)
    db = jnp.sum(dxw.astype(jnp.float32), axis=(0, 1)).astype(dt)
    # LSTM gates are all additive in (xw + hw), so dxw == dhw.
    return dxw, dw, db, dh0, dc0, jnp.zeros_like(lengths)


_lstm_scan_one.defvjp(_lstm_fwd_res, _lstm_bwd)


def lstm_scan(xw, w_hh, b_hh, h0, c0, lengths, reverse=False,
              interpret=False):
    """Persistent-weight LSTM scan; see gru_scan. xw: (T, B, 4H).
    Returns (h_all, h_final, c_final).  Batch-chunked like gru_scan."""
    B = xw.shape[1]
    slices = _batch_slices(B)
    if len(slices) == 1:
        return _lstm_scan_one(xw, w_hh, b_hh, h0, c0, lengths, reverse,
                              interpret)
    h_alls, h_fins, c_fins = [], [], []
    for off, size in slices:
        ha, hf, cf = _lstm_scan_one(
            xw[:, off:off + size], w_hh, b_hh, h0[off:off + size],
            c0[off:off + size], lengths[off:off + size], reverse, interpret,
            True)
        h_alls.append(ha)
        h_fins.append(hf)
        c_fins.append(cf)
    return (jnp.concatenate(h_alls, axis=1),
            jnp.concatenate(h_fins, axis=0),
            jnp.concatenate(c_fins, axis=0))


# ---------------------------------------------------------------------------
# eligibility
# ---------------------------------------------------------------------------


def supported(rnn_type: str, hidden: int, batch: int,
              itemsize: int = 2, seq_len: int | None = None) -> bool:
    """Shapes the compiled TPU kernel handles well: lane-aligned hidden dims,
    a batch that fills MXU sublanes, a VMEM-resident weight + stream set
    at k=1 (larger k is an automatic per-call upgrade), and — when the
    caller passes it — a time grid of whole k=8 blocks.  Others use the XLA
    scan.

    The seq_len gate is empirical: at odd/tiny T (e.g. a prediction
    network's U+1=49) Mosaic's real backward allocation exceeds this
    module's stream model by ~2x and the pallas_call fails AOT compile with
    a scoped-vmem overflow, while the kernel's per-grid-step overhead makes
    it a poor trade there anyway (observed on the round-3 prednet shape:
    18.8 MB actual vs 13.4 MB modeled, T=49 k=1 LSTM bwd)."""
    return (rnn_type in ("gru", "lstm") and hidden % 128 == 0 and batch >= 8
            and (seq_len is None or (seq_len % 8 == 0 and seq_len >= 64))
            and _kernel_vmem(rnn_type, "bwd", hidden,
                             min(batch, _MAX_KERNEL_BATCH), 1,
                             itemsize) <= _VMEM_BUDGET)
