"""GPipe-style pipeline parallelism (pp) for the encoder stack.

The reference scales only by replicating the whole model per GPU
(``/root/reference/train.py:45`` — DDP); a model too big for one device
simply does not train.  The TPU-native complement to this repo's dp/tp/sp
axes is *layer pipelining*: shard the L stacked layers over a 1-D ``stage``
mesh (D stages of L/D layers each) and stream M microbatches through the
stages — stage ``s`` runs microbatch ``m`` at tick ``t = s + m``, handing
its activations to stage ``s+1`` over ICI (``ppermute``).  After
``M + D - 1`` ticks every microbatch has crossed every layer; the bubble
fraction is ``(D-1)/(M+D-1)``, so throughput approaches ideal as M grows.

Unlike the sequence-parallel wavefront (``parallel/wavefront.py``), this
schedule is exact for BIDIRECTIONAL stacks: each stage runs its layers over
the microbatch's full T frames (forward scan + reversed scan), so no layer
ever needs a sweep another device still holds.  The two compose naturally:
uni/streaming models time-shard via the wavefront, offline bi models
layer-shard via this pipeline.

Uniform-stage SPMD: shard_map compiles ONE program for all stages, so every
stage must run identically-shaped layers.  Layer 0's input projection
``(input_size, G·H)`` differs from the rest ``(dirs·H, G·H)``; it is
zero-padded on the input dim to ``dirs·H`` and the (B, T, input_size)
frames are zero-padded to match — padded rows/columns contribute exactly
nothing, so the result equals the unpadded stack (asserted in
``tests/test_pipeline.py`` against ``StackedRNN``/``AudioEncoder``,
forward AND parameter gradients, on the 8-virtual-device CPU mesh).

Deterministic (no dropout) and fresh-state (no ``initial_state``
threading): the schedule targets training/offline-eval of models whose
layer stack exceeds one device's HBM, where neither applies to the hot
path.  Differentiable by construction — the tick loop is a static-length
``lax.scan``, ``ppermute``'s transpose is the reverse permute, and the
parameter stacking/padding happens inside the traced function so gradients
flow back to the original parameter tree.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from rnntransducer_tpu.models.cells import GATES
from rnntransducer_tpu.parallel.wavefront import _chunk_scan

STAGE_AXIS = "stage"


def make_stage_mesh(devices=None) -> Mesh:
    """1-D mesh whose single axis shards the layer stack into stages."""
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.asarray(devices), (STAGE_AXIS,))


def _pad_rows(w, rows):
    """Zero-pad a (r, c) matrix up to (rows, c)."""
    return jnp.pad(w, ((0, rows - w.shape[0]), (0, 0)))


def _collect_direction(rnn_params, num_layers, prefix):
    """Per-direction per-layer param dicts, accepting both StackedRNN
    layouts (``fwd_0``…``fwd_{L-1}``, or ``fwd_0`` + ``stack/fwd`` with a
    leading L-1 axis)."""
    out = [rnn_params[f"{prefix}_0"]]
    if "stack" in rnn_params and num_layers > 1:
        rest = rnn_params["stack"][prefix]
        for i in range(num_layers - 1):
            out.append({k: rest[k][i] for k in ("w_ih", "b_ih",
                                                "w_hh", "b_hh")})
    else:
        for i in range(1, num_layers):
            out.append(rnn_params[f"{prefix}_{i}"])
    return out


def stack_pipeline_params(rnn_params, num_layers: int, bidirectional: bool):
    """Uniform stacked weights for the stage pipeline: per direction,
    ``w_ih (L, D_in, G·H)`` (layer 0 zero-padded on the input dim to
    ``D_in = dirs·H``), ``b_ih (L, G·H)``, ``w_hh (L, H, G·H)``,
    ``b_hh (L, G·H)``.  Returns (fwd, bwd-or-None, d_in)."""
    dirs = ["fwd", "bwd"] if bidirectional else ["fwd"]
    per_dir = {d: _collect_direction(rnn_params, num_layers, d)
               for d in dirs}
    h = per_dir["fwd"][0]["w_hh"].shape[0]
    d_in = len(dirs) * h
    f = per_dir["fwd"][0]["w_ih"].shape[0]
    if f > d_in:
        raise ValueError(
            f"pipeline stages need input_size ({f}) <= dirs*hidden "
            f"({d_in}): layer 0's projection is padded UP to the uniform "
            "layer width")

    def stack_dir(layers):
        return {
            "w_ih": jnp.stack([_pad_rows(q["w_ih"], d_in) for q in layers]),
            "b_ih": jnp.stack([q["b_ih"] for q in layers]),
            "w_hh": jnp.stack([q["w_hh"] for q in layers]),
            "b_hh": jnp.stack([q["b_hh"] for q in layers]),
        }

    fwd = stack_dir(per_dir["fwd"])
    bwd = stack_dir(per_dir["bwd"]) if bidirectional else None
    return fwd, bwd, d_in


def pipeline_scan(rnn_params, x, lengths, *, rnn_type: str, num_layers: int,
                  bidirectional: bool, mesh: Mesh, num_microbatches: int,
                  dropout: float = 0.0, dropout_rng=None) -> jnp.ndarray:
    """Run a StackedRNN forward over a ``stage`` mesh with the GPipe
    schedule.  ``x``: (B, T, F); ``lengths``: (B,).  B must divide into
    ``num_microbatches`` and L into the mesh width.  Returns the stack
    output (B, T, dirs·H), numerically equal to
    ``StackedRNN.__call__(deterministic=True)``'s sequence output.

    The mesh may carry extra (auto) axes — e.g. the Trainer's 2-D
    (data, stage) mesh: only ``stage`` goes manual in the shard_map, so
    the batch stays data-sharded by GSPMD and pp composes with dp.

    ``dropout > 0`` (training product path) applies inter-layer input
    dropout — torch semantics: every layer's input except layer 0's —
    with per-(layer, microbatch) keys folded from ``dropout_rng``.
    Distribution-matched to StackedRNN's FastDropout, not bit-identical
    (masks are schedule-local draws; dropout is stochastic
    regularization, so only the distribution is contract).
    """
    rnn_type = rnn_type.lower()
    if rnn_type not in GATES:
        raise ValueError(f"unknown rnn_type {rnn_type!r}")
    if dropout > 0.0 and dropout_rng is None:
        raise ValueError("dropout > 0 needs dropout_rng")
    D = mesh.shape[STAGE_AXIS]
    L, M = num_layers, num_microbatches
    if L % D:
        raise ValueError(f"num_layers={L} not divisible by stage-mesh "
                         f"width {D}")
    B, T, F = x.shape
    if B % M:
        raise ValueError(f"batch {B} not divisible by num_microbatches {M}")
    lps = L // D
    bm = B // M
    fwd, bwd, d_in = stack_pipeline_params(rnn_params, L, bidirectional)
    # (L, ...) -> (D, lps, ...): stage s holds layers [s*lps, (s+1)*lps)
    reshard = lambda a: a.reshape((D, lps) + a.shape[1:])  # noqa: E731
    fwd = jax.tree_util.tree_map(reshard, fwd)
    if bwd is not None:
        bwd = jax.tree_util.tree_map(reshard, bwd)
    dt = x.dtype
    h = fwd["w_hh"].shape[-2]
    xin = jnp.pad(x, ((0, 0), (0, 0), (0, d_in - F))).reshape(M, bm, T, d_in)
    len_mb = lengths.reshape(M, bm)
    n_ticks = M + D - 1

    def body(fwd_s, bwd_s, xin, len_mb, extras):
        # all traced values arrive as explicit operands (NOT closure
        # captures: a closed-over tracer would carry the outer fully-Auto
        # mesh into the manual region when only 'stage' is manual);
        # extras holds the dropout rng when training
        rng = extras.get("rng")
        # fwd_s/bwd_s arrive as (1, lps, ...) shards (shard_map keeps the
        # sharded axis at local size 1); squeeze to this stage's layers
        squeeze = lambda a: a[0]  # noqa: E731
        fwd_s = jax.tree_util.tree_map(squeeze, fwd_s)
        if bwd_s is not None:
            bwd_s = jax.tree_util.tree_map(squeeze, bwd_s)
        d = lax.axis_index(STAGE_AXIS)
        # fresh zeros are replicated over the mesh axis; every consumer mixes
        # them with device-varying values, so cast up-front to keep scan
        # carry types fixed (same recipe as the wavefront)
        _vary = lambda a: lax.pcast(  # noqa: E731
            a, axis_name=(STAGE_AXIS,), to="varying")

        def run_stage(xs, mask, mb):
            y = xs
            h0 = _vary(jnp.zeros((bm, h), dt))
            c0 = _vary(jnp.zeros((bm, h), dt))
            for j in range(lps):  # static unroll over this stage's layers
                if dropout > 0.0:
                    # inter-layer input dropout: global layer l = d*lps+j,
                    # applied to every layer's input except layer 0's; one
                    # independent mask per (layer, microbatch)
                    l_glob = d * lps + j
                    k = jax.random.fold_in(
                        rng, l_glob * num_microbatches + mb)
                    keep = jax.random.bernoulli(k, 1.0 - dropout, y.shape)
                    dropped = jnp.where(
                        keep, y / jnp.asarray(1.0 - dropout, dt),
                        jnp.zeros((), dt)).astype(dt)
                    y = jnp.where(l_glob > 0, dropped, y)
                xw_f = (y @ fwd_s["w_ih"][j] + fwd_s["b_ih"][j]).astype(dt)
                f_out, _, _ = _chunk_scan(rnn_type, fwd_s["w_hh"][j],
                                          fwd_s["b_hh"][j], xw_f, mask,
                                          h0, c0)
                if bwd_s is not None:
                    # reversed masked scan == flip -> scan -> flip: the pads
                    # become a carry-preserving zero-emitting prefix
                    xw_b = (y @ bwd_s["w_ih"][j]
                            + bwd_s["b_ih"][j]).astype(dt)
                    b_out, _, _ = _chunk_scan(rnn_type, bwd_s["w_hh"][j],
                                              bwd_s["b_hh"][j],
                                              jnp.flip(xw_b, 1),
                                              jnp.flip(mask, 1), h0, c0)
                    y = jnp.concatenate([f_out, jnp.flip(b_out, 1)],
                                        axis=-1)
                else:
                    y = f_out
            return y

        x_cur = _vary(jnp.zeros((bm, T, d_in), dt))
        out_buf = _vary(jnp.zeros((M, bm, T, d_in), dt))
        perm = [(i, i + 1) for i in range(D - 1)]

        def tick(carry, i):
            x_cur, out_buf = carry
            # stage d processes microbatch i - d this tick
            mb = jnp.clip(i - d, 0, M - 1)
            feed = lax.dynamic_index_in_dim(xin, jnp.clip(i, 0, M - 1),
                                            keepdims=False)
            xs = jnp.where(d == 0, feed, x_cur)
            mask = (jnp.arange(T)[None, :]
                    < lax.dynamic_index_in_dim(len_mb, mb,
                                               keepdims=False)[:, None])
            y = run_stage(xs, mask, mb)
            emit = (d == D - 1) & (i >= D - 1)
            out_buf = jnp.where(
                emit,
                lax.dynamic_update_index_in_dim(
                    out_buf, y, jnp.clip(i - (D - 1), 0, M - 1), 0),
                out_buf)
            x_cur = lax.ppermute(y, STAGE_AXIS, perm)
            return (x_cur, out_buf), None

        (x_cur, out_buf), _ = lax.scan(tick, (x_cur, out_buf),
                                       jnp.arange(n_ticks))
        # only the last stage's buffer is real; sum-broadcast it.
        # XLA:CPU's AllReducePromotion pass crashes cloning a bf16
        # all-reduce ("Invalid binary instruction opcode copy", observed on
        # the virtual test mesh) — promote manually there; bf16 values
        # round-trip fp32 exactly, so this is a semantic no-op.
        keep = (d == D - 1).astype(dt)
        masked = out_buf * keep
        if jax.default_backend() == "cpu" and dt == jnp.bfloat16:
            return lax.psum(masked.astype(jnp.float32),
                            STAGE_AXIS).astype(dt)
        return lax.psum(masked, STAGE_AXIS)

    # only 'stage' goes manual: any other mesh axes (the Trainer's 'data')
    # stay auto, so GSPMD keeps the batch sharded across them
    manual = frozenset({STAGE_AXIS})
    extras = {"rng": dropout_rng} if dropout > 0.0 else {}
    if bwd is not None:
        mapped = shard_map(
            body, mesh=mesh, axis_names=manual,
            in_specs=(P(STAGE_AXIS), P(STAGE_AXIS), P(), P(), P()),
            out_specs=P())
        out = mapped(fwd, bwd, xin, len_mb, extras)
    else:
        mapped = shard_map(
            lambda f, xi, lm, ex: body(f, None, xi, lm, ex), mesh=mesh,
            axis_names=manual,
            in_specs=(P(STAGE_AXIS), P(), P(), P()),
            out_specs=P())
        out = mapped(fwd, xin, len_mb, extras)
    return out.reshape(B, T, d_in)


def pipeline_encode(encoder_params, cfg, x, lengths, mesh: Mesh,
                    num_microbatches: int, dropout: float = 0.0,
                    dropout_rng=None) -> jnp.ndarray:
    """AudioEncoder forward (rnn stack + output projection) over a
    ``stage`` mesh.  ``encoder_params``: the ``params["encoder"]`` subtree;
    ``cfg``: TransNetConfig; ``x``: (B, T, n_mels) log-mel frames.

    Returns (B, T, output_size) — numerically equal to
    ``AudioEncoder.__call__(deterministic=True)``'s sequence output
    (``dropout > 0`` adds training-mode inter-layer dropout, see
    pipeline_scan).
    """
    if cfg.time_reduction_stride > 1:
        raise ValueError(
            "stage pipelining does not support time reduction (the "
            "mid-stack width change breaks the uniform-stage SPMD program);"
            " use time_reduction_stride=1")
    outs = pipeline_scan(
        encoder_params["rnn"], x, lengths, rnn_type=cfg.rnn_type,
        num_layers=cfg.num_layers, bidirectional=cfg.bidirectional,
        mesh=mesh, num_microbatches=num_microbatches,
        dropout=dropout, dropout_rng=dropout_rng)
    proj = encoder_params["out_proj"]
    return outs @ proj["kernel"] + proj["bias"]
