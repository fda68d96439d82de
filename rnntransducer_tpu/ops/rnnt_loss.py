"""RNN-T loss, TPU-native (pure-JAX tier).

Capability-equivalent of BOTH native loss backends the reference imports —
warp-transducer (``model.py:5,39``, fp32) and torchaudio RNNTLoss
(``model.py:6,31``, fp16) — as one bf16/fp32-capable implementation with a
custom VJP, validated against the NumPy oracle (``rnnt_numpy.py``) at 1e-5.

Algorithm
---------
Instead of the classic anti-diagonal wavefront (T+U sequential steps), we
sweep *label columns*: within column u the recurrence

    alpha[t, u] = logaddexp(alpha[t-1, u] + bl[t-1, u], D[t]),
    D[t] = alpha[t, u-1] + lb[t, u-1]

is a first-order linear recurrence in log space, solved in closed form with
an exclusive cumsum ``cb`` of the blank log-probs and one ``cumlogsumexp``:

    alpha[t, u] = cb[t] + logcumsumexp(D - cb)[t]

so the whole lattice needs only U+1 sequential steps (U ~ 100) of fully
vectorized O(B*T) work — instead of T+U (~1000+) steps — and XLA maps the
inner prefix ops onto the VPU.  The beta pass reuses the same sweep on the
length-aware flipped lattice (graph reversal), and gradients are the standard
occupancy form:

    d/d bl[t,u] = -exp(alpha[t,u] + bl[t,u] + beta[t+1,u] - logZ)
    d/d lb[t,u] = -exp(alpha[t,u] + lb[t,u] + beta[t,u+1] - logZ)

The custom VJP sits at the (bl, lb) level: the log-softmax + label gather that
produce bl/lb stay in plain JAX, so autodiff provides the (well-fused) chain
back to the raw (B, T, U+1, V) logits.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

NEG = -1e30  # large-negative stand-in for -inf (NaN-safe under arithmetic)


def _exclusive_cumsum(x, axis):
    # shift-then-cumsum, NOT cumsum(x) - x: the latter catastrophically
    # cancels when x contains the -1e30 fill values ((finite + NEG) - NEG = 0).
    pad = [(0, 0)] * x.ndim
    pad[axis] = (1, 0)
    sl = [slice(None)] * x.ndim
    sl[axis] = slice(None, -1)
    return jnp.cumsum(jnp.pad(x, pad)[tuple(sl)], axis=axis)


def _sweep(blank_edge, label_edge):
    """Generic lattice sweep. blank_edge[b,t,u] = log-weight of (t,u)->(t+1,u);
    label_edge[b,t,u] = log-weight of (t,u)->(t,u+1); alpha[0,0] = 0.
    Returns alpha (B, T, U+1) where the edge arrays are (B, T, U+1) (their
    last column / last row of fills is never read)."""
    B, T, U1 = blank_edge.shape
    # column 0: pure blank chain
    col0 = _exclusive_cumsum(blank_edge[:, :, 0], axis=1)

    be = jnp.moveaxis(blank_edge[:, :, 1:], 2, 0)   # (U, B, T)
    le = jnp.moveaxis(label_edge[:, :, :-1], 2, 0)  # (U, B, T)

    def step(carry, edges):
        b_col, l_col = edges
        D = carry + l_col                            # arrive from the left
        cb = _exclusive_cumsum(b_col, axis=1)
        new = cb + jax.lax.cumlogsumexp(D - cb, axis=1)
        return new, new

    _, cols = jax.lax.scan(step, col0, (be, le))
    alpha = jnp.concatenate([col0[None], cols], axis=0)  # (U+1, B, T)
    return jnp.moveaxis(alpha, 0, 2)                     # (B, T, U+1)


def _flip2d(x, t_len, u1_len):
    """Flip (B, T, U1) within per-sample valid extents along both axes."""
    B, T, U1 = x.shape
    ti = jax.lax.broadcasted_iota(jnp.int32, (B, T), 1)
    tl = jnp.clip(t_len[:, None].astype(jnp.int32), 0, T)
    tsrc = jnp.where(ti < tl, tl - 1 - ti, ti)
    x = jnp.take_along_axis(x, tsrc[:, :, None], axis=1)
    ui = jax.lax.broadcasted_iota(jnp.int32, (B, U1), 1)
    ul = jnp.clip(u1_len[:, None].astype(jnp.int32), 0, U1)
    usrc = jnp.where(ui < ul, ul - 1 - ui, ui)
    return jnp.take_along_axis(x, usrc[:, None, :], axis=2)


def _shift_up(x, axis, fill=NEG):
    """x shifted by -1 along axis (x[i] = x_in[i+1]), last slot = fill."""
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, 1)
    sl = [slice(None)] * x.ndim
    sl[axis] = slice(1, None)
    return jnp.pad(x[tuple(sl)], pad, constant_values=fill)


def _pick_sweep(backend: str):
    if backend == "auto":
        backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    if backend == "pallas":
        from rnntransducer_tpu.ops.rnnt_pallas import sweep_pallas
        return sweep_pallas
    if backend == "pallas_interpret":
        from rnntransducer_tpu.ops.rnnt_pallas import sweep_pallas
        return partial(sweep_pallas, interpret=True)
    if backend == "xla":
        return _sweep
    raise ValueError(f"unknown rnnt_loss backend: {backend}")


def _alpha_beta(bl, lb, t_len, u_len, backend: str = "xla"):
    """Returns (alpha, beta, logZ) for the compacted lattice.
    bl/lb: (B, T, U+1) float32; beta includes the final-blank emission."""
    B, T, U1 = bl.shape
    sweep = _pick_sweep(backend)
    alpha = sweep(bl, lb)

    bidx = jnp.arange(B)
    t_last = jnp.clip(t_len.astype(jnp.int32) - 1, 0, T - 1)
    u_last = jnp.clip(u_len.astype(jnp.int32), 0, U1 - 1)
    final_bl = bl[bidx, t_last, u_last]
    logZ = alpha[bidx, t_last, u_last] + final_bl

    # beta via graph reversal on the flipped lattice:
    #   beta_excl(flipped) = sweep(shifted flipped edges); beta = beta_excl + final_bl
    u1_len = jnp.clip(u_len.astype(jnp.int32), 0, U1 - 1) + 1
    blf = _flip2d(bl, t_len, u1_len)
    lbf = _flip2d(lb, t_len, u1_len)
    # reversed-graph blank edge (t,u)->(t+1,u) in flipped coords uses the
    # destination cell's original emission: shift flipped bl by one along t
    be_rev = _shift_up(blf, axis=1)
    le_rev = _shift_up(lbf, axis=2)
    beta_excl_f = sweep(be_rev, le_rev)
    beta = _flip2d(beta_excl_f, t_len, u1_len) + final_bl[:, None, None]
    return alpha, beta, logZ


def _core_fwd_impl(backend, bl, lb, t_len, u_len):
    alpha, beta, logZ = _alpha_beta(bl, lb, t_len, u_len, backend)
    return -logZ, (alpha, beta, logZ)


@partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _rnnt_core(backend, fastemit_lambda, bl, lb, t_len, u_len):
    """Per-sample negative log-likelihood (B,) from compacted log-probs.

    ``fastemit_lambda``: FastEmit streaming regularization
    (arXiv:2010.11148 eq. 9-10): the backward scales the label-arc
    occupancy gradient by (1 + lambda) — blank arcs keep their gradient —
    biasing training toward earlier label emission (lower first-token
    latency) at a small accuracy cost.  The forward value stays the
    unregularized -logZ, exactly the paper's gradient surrogate (also how
    warp-rnnt / NeMo implement it).  0.0 = off (identical to the plain
    loss, gradient-exact)."""
    return _core_fwd_impl(backend, bl, lb, t_len, u_len)[0]


def _core_fwd(backend, fastemit_lambda, bl, lb, t_len, u_len):
    loss, (alpha, beta, logZ) = _core_fwd_impl(backend, bl, lb, t_len, u_len)
    return loss, (bl, lb, t_len, u_len, alpha, beta, logZ)


def _core_bwd(backend, fastemit_lambda, res, g):
    bl, lb, t_len, u_len, alpha, beta, logZ = res
    B, T, U1 = bl.shape
    ti = jax.lax.broadcasted_iota(jnp.int32, (B, T, U1), 1)
    ui = jax.lax.broadcasted_iota(jnp.int32, (B, T, U1), 2)
    tl = t_len.astype(jnp.int32)[:, None, None]
    ul = u_len.astype(jnp.int32)[:, None, None]
    valid = (ti < tl) & (ui <= ul)
    # beta outside the valid region holds finite flip garbage, which the
    # shifted reads below would pick up at t+1 == T_b / u+1 > U_b; mask first.
    beta = jnp.where(valid, beta, NEG)

    # blank: (t,u) -> (t+1,u); the final blank at (T-1, U) exits the lattice
    beta_up = _shift_up(beta, axis=1)
    beta_up = jnp.where((ti == tl - 1) & (ui == ul), 0.0, beta_up)
    g_bl = alpha + bl + beta_up - logZ[:, None, None]
    d_bl = -jnp.exp(jnp.where(valid, g_bl, NEG))

    # label: (t,u) -> (t,u+1), defined for u < U; FastEmit scales this
    # arc family by (1 + lambda) (blank arcs untouched — see _rnnt_core)
    beta_right = _shift_up(beta, axis=2)
    g_lb = alpha + lb + beta_right - logZ[:, None, None]
    d_lb = -(1.0 + fastemit_lambda) * jnp.exp(
        jnp.where(valid & (ui < ul), g_lb, NEG))

    # core returns -logZ, so d(-logZ)/d(bl) = -occupancy == d_bl already
    scale = g[:, None, None]
    zeros_t = np.zeros(t_len.shape, dtype=jax.dtypes.float0)
    zeros_u = np.zeros(u_len.shape, dtype=jax.dtypes.float0)
    return d_bl * scale, d_lb * scale, zeros_t, zeros_u


_rnnt_core.defvjp(_core_fwd, _core_bwd)


def compact_lattice(logits, labels, blank: int = 0):
    """(B,T,U+1,V) raw logits + (B,U) labels -> (bl, lb): blank / label
    log-probs (B,T,U+1), the only lattice values the recursion needs.

    Note: out-of-range label ids are clamped by the gather (jit code cannot
    raise); use utils.debugging.checked_rnnt_loss to turn a vocab/tokenizer
    mismatch into a hard error."""
    lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    bl = lp[..., blank]
    U1 = logits.shape[2]
    lab = jnp.pad(labels.astype(jnp.int32), ((0, 0), (0, U1 - labels.shape[1])),
                  constant_values=blank)
    lb = jnp.take_along_axis(lp, lab[:, None, :, None], axis=-1)[..., 0]
    return bl, lb


@partial(jax.jit, static_argnames=("blank", "reduction", "backend",
                                   "fastemit_lambda"))
def rnnt_loss(logits, labels, logit_lengths, label_lengths, blank: int = 0,
              reduction: str = "mean", backend: str = "auto",
              fastemit_lambda: float = 0.0):
    """Drop-in equivalent of warp-transducer / torchaudio RNNTLoss
    (called at reference ``model.py:57,74``).

    logits: (B, T, U+1, V) raw (unnormalized); labels: (B, U) int;
    logit_lengths/label_lengths: (B,) int. bf16 logits are upcast to fp32 for
    the log-softmax and recursion (warp-transducer is fp32-only; torchaudio
    exists in the reference purely to cover fp16 — one implementation covers
    both here, SURVEY.md §2.2 N1/N2).

    ``fastemit_lambda``: FastEmit low-latency regularization (see
    ``_rnnt_core``); 0.0 = plain RNN-T loss.
    """
    bl, lb = compact_lattice(logits, labels, blank)
    losses = _rnnt_core(backend, fastemit_lambda, bl, lb, logit_lengths,
                        label_lengths)
    if reduction == "mean":
        return losses.mean()
    if reduction == "sum":
        return losses.sum()
    return losses


def rnnt_loss_fused(joint_fn, enc, dec, labels, enc_lengths, label_lengths,
                    blank: int = 0, reduction: str = "mean",
                    backend: str = "auto", chunk_frames: int = 64,
                    fastemit_lambda: float = 0.0):
    """Memory-lean fused path: never materializes the full (B, T, U+1, V)
    logits lattice (SURVEY.md hard-part 3 — the reference materializes it at
    ``networks/transducer.py:58-62`` and pays for it in HBM).

    The joint + log-softmax + label-gather run per T-chunk under
    ``jax.checkpoint`` inside a sequential ``lax.map``: forward emits only the
    compacted (B, T, U+1) blank/label log-probs; backward rebuilds one chunk
    of the lattice at a time, accumulating the joint/encoder/decoder grads
    chunk by chunk.  Numerically identical to the unfused path (log-softmax is
    row-wise).

    joint_fn: (enc_chunk (B, Tc, De), dec (B, U+1, Dd)) -> (B, Tc, U+1, V)
    raw logits (typically a closure over the joint params).
    """
    B, T, De = enc.shape
    U1 = dec.shape[1]
    Tc = min(chunk_frames, T)
    nT = -(-T // Tc)
    if nT * Tc != T:
        enc = jnp.pad(enc, ((0, 0), (0, nT * Tc - T), (0, 0)))
    lab = jnp.pad(labels.astype(jnp.int32),
                  ((0, 0), (0, U1 - labels.shape[1])), constant_values=blank)

    def chunk(enc_chunk):
        logits = joint_fn(enc_chunk, dec)
        lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        bl_c = lp[..., blank]
        lb_c = jnp.take_along_axis(lp, lab[:, None, :, None], axis=-1)[..., 0]
        return bl_c, lb_c

    enc_chunks = jnp.reshape(enc, (B, nT, Tc, De)).transpose(1, 0, 2, 3)
    bl_c, lb_c = jax.lax.map(jax.checkpoint(chunk), enc_chunks)  # (nT,B,Tc,U1)
    bl = bl_c.transpose(1, 0, 2, 3).reshape(B, nT * Tc, U1)[:, :T]
    lb = lb_c.transpose(1, 0, 2, 3).reshape(B, nT * Tc, U1)[:, :T]

    losses = _rnnt_core(backend, fastemit_lambda, bl, lb, enc_lengths,
                        label_lengths)
    if reduction == "mean":
        return losses.mean()
    if reduction == "sum":
        return losses.sum()
    return losses


def factored_compact_lattice(A, C, labels, blank: int = 0):
    """GEMM-form compact lattice for a rank-decomposed joint.

    A: (B, T, V) encoder logit factor (fc bias folded in), C: (B, U+1, V)
    decoder factor, with ``logits[b, t, u, :] == A[b, t, :] + C[b, u, :]``
    (``JointNetwork.factors``).  Returns (bl, lb) blank / label log-probs
    (B, T, U+1) — the same contract as ``compact_lattice`` — WITHOUT ever
    forming the (B, T, U+1, V) lattice, even per chunk:

        LSE[b,t,u] = logsumexp_v(A + C)
                   = maxA[b,t] + maxC[b,u] + log( (EA @ EC^T)[b,t,u] ),
        EA = exp(A - maxA),  EC = exp(C - maxC)

    so the per-lattice-point log-softmax collapses into one batched
    (B,T,V)x(B,V,U+1) matmul on the MXU, and the label gather becomes a
    second matmul against the one-hot label matrix (exact: one-hot rows
    multiply by 1.0/0.0).  The max shifts analytically cancel in LSE, so they
    are stop_gradient'ed and plain autodiff yields the exact softmax
    backward — also as two GEMMs (dS @ EC and dS^T @ EA).

    Numerics: computed in fp32.  EA/EC entries are <= 1 and the V-term dot
    products cannot overflow; total underflow (S -> 0) needs the two factors'
    peaks anti-aligned by ~ -log(tiny) nats, which only near-zero-mass
    lattice points can reach — those rows clamp to the fp32 tiny floor
    (their log-probs saturate near -88 - maxA - maxC instead of -inf, and
    their gradient contribution vanishes).
    """
    A = A.astype(jnp.float32)
    C = C.astype(jnp.float32)
    U1 = C.shape[1]
    maxA = jax.lax.stop_gradient(jnp.max(A, axis=-1))    # (B, T)
    maxC = jax.lax.stop_gradient(jnp.max(C, axis=-1))    # (B, U+1)
    EA = jnp.exp(A - maxA[..., None])
    EC = jnp.exp(C - maxC[..., None])
    # precision=HIGHEST: TPU matmuls default to bf16 operand truncation
    # (preferred_element_type only widens the accumulator), which would
    # silently degrade the training loss/grads to ~2e-3 — measured — while
    # this docstring promises fp32.  HIGHEST keeps fp32 operands; the GEMMs
    # are ~2 ms of a 256 ms flagship step, so the cost is noise.
    S = jnp.einsum("btv,buv->btu", EA, EC,
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    S = jnp.maximum(S, jnp.float32(np.finfo(np.float32).tiny))
    lse = maxA[:, :, None] + maxC[:, None, :] + jnp.log(S)

    lab = jnp.pad(labels.astype(jnp.int32),
                  ((0, 0), (0, U1 - labels.shape[1])), constant_values=blank)
    onehot = jax.nn.one_hot(lab, A.shape[-1], dtype=jnp.float32)  # (B,U+1,V)
    a_lab = jnp.einsum("btv,buv->btu", A, onehot,
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
    c_lab = jnp.sum(C * onehot, axis=-1)                 # (B, U+1)

    bl = A[..., blank][:, :, None] + C[..., blank][:, None, :] - lse
    lb = a_lab + c_lab[:, None, :] - lse
    return bl, lb


def rnnt_loss_factored(A, C, labels, logit_lengths, label_lengths,
                       blank: int = 0, reduction: str = "mean",
                       backend: str = "auto", fastemit_lambda: float = 0.0):
    """RNN-T loss straight from the rank-decomposed joint's (A, C) factors.

    Replaces ``rnnt_loss_fused`` for ``combine="concat"`` models: where the
    fused path rebuilds (B, Tc, U+1, V) logit chunks (and re-does so in the
    backward under ``jax.checkpoint``), this path never builds the lattice at
    all — forward and backward are a handful of (B,T,V)-sized GEMMs plus the
    (B,T,U+1) recursion, with no rematerialization.  Numerically it matches
    the unfused path to fp32 logsumexp-reassociation tolerance (~1e-6)."""
    bl, lb = factored_compact_lattice(A, C, labels, blank)
    losses = _rnnt_core(backend, fastemit_lambda, bl, lb, logit_lengths,
                        label_lengths)
    if reduction == "mean":
        return losses.mean()
    if reduction == "sum":
        return losses.sum()
    return losses
