"""Device mesh + sharding helpers.

Capability-equivalent of the reference's NCCL/DDP layer (``train.py:4,45``,
``scripts/run_train.sh:9``, SURVEY.md §2.2 N4) — but as a jax.sharding Mesh,
and extended past the reference's DP-only stance with an optional tensor-
parallel ``model`` axis:

* ``data`` axis: the batch's leading dim is sharded; params are replicated
  across it and XLA inserts the gradient/metric psums over ICI.
* ``model`` axis (optional, ``make_mesh(model_parallel=k)``): the joint
  network's vocabulary dimension is sharded Megatron-column-style — the fc
  kernel's V columns, and with them the rank factors A (B,T,V/k) and
  C (B,U+1,V/k) that the factored RNN-T loss consumes
  (``ops.rnnt_loss_factored``).  Every V-dependent op in that loss is a
  reduction over V (the EA@EC^T logsumexp GEMM, the row max, the one-hot
  label gather), so GSPMD turns each into a local GEMM + one psum over
  ``model``; the (B,T,U+1) lattice recursion itself is V-free and runs
  data-sharded.  This is the memory/FLOP lever for large-vocab (BPE)
  models, where the (B,T,V)/(B,U,V) factors and the V-wide classifier
  dominate the joint's footprint — at the reference's V=72 it is exercised
  for correctness (tests + driver dryrun), not speed.

None of the reference's CUDA-residency workarounds (``model.py:96-103``)
exist here: collectives compile into the step.  Tensor-parallel callers must
trace their steps under ``jax.set_mesh(mesh)`` so the loss's PartitionSpec
constraints can bind (the Trainer and ``dryrun_multichip`` do).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"
# non-data axes owned by the parallel schedules (mirrored by
# pipeline.STAGE_AXIS / wavefront.TIME_AXIS — defined here too so the mesh
# builder has no import cycle with the schedule modules)
STAGE_AXIS = "stage"
TIME_AXIS = "time"


def make_mesh(devices: Optional[Sequence] = None, axis: str = DATA_AXIS,
              model_parallel: int = 1, pipeline_stages: int = 1,
              sequence_parallel: int = 1) -> Mesh:
    """1-D data mesh by default.  Extra axes (each optional, ordered so
    the chattiest collective rides adjacent-device ICI links innermost):

    * ``sequence_parallel=k``: a ``time`` axis for the wavefront encoder
      (per-stage carry ppermute) — mutually exclusive with ``stage``;
    * ``pipeline_stages=k``: a ``stage`` axis for the GPipe encoder
      pipeline (per-tick activation ppermute);
    * ``model_parallel=k``: a ``model`` axis for the vocab-sharded joint
      classifier (per-step V psum — innermost).
    """
    devices = list(devices if devices is not None else jax.devices())
    if pipeline_stages > 1 and sequence_parallel > 1:
        raise ValueError(
            "pipeline_stages and sequence_parallel are mutually exclusive "
            "(layer pipelining targets bidirectional stacks, the time "
            "wavefront unidirectional ones — one encoder uses one schedule)")
    extra = []
    if sequence_parallel > 1:
        extra.append((TIME_AXIS, sequence_parallel))
    if pipeline_stages > 1:
        extra.append((STAGE_AXIS, pipeline_stages))
    if model_parallel > 1:
        extra.append((MODEL_AXIS, model_parallel))
    if not extra:
        return Mesh(np.asarray(devices), (axis,))
    denom = int(np.prod([s for _, s in extra]))
    if len(devices) % denom:
        raise ValueError(f"{len(devices)} devices not divisible by "
                         f"{' x '.join(f'{n}={s}' for n, s in extra)}")
    grid = np.asarray(devices).reshape((-1,) + tuple(s for _, s in extra))
    if jax.process_count() > 1:
        # Non-data axes must stay intra-process: the input pipeline slices
        # the global batch by process (loop.py idxs[pi::pc]), which assumes
        # every process owns exactly one data shard — a model/stage/time
        # axis spanning processes would hand two processes the same data
        # shard.  (It is also the right perf choice: the per-step
        # collectives ride intra-host ICI.)
        for row in grid.reshape(grid.shape[0], -1):
            owners = {d.process_index for d in row}
            if len(owners) > 1:
                raise ValueError(
                    f"model/stage/time axes ({denom} devices) exceed the "
                    "per-process device count: a non-data axis would span "
                    "processes; keep those axes on local devices")
    return Mesh(grid, (axis,) + tuple(n for n, _ in extra))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading batch axis split over the data axis (replicated over model)."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host batch so its leading axis is split across the mesh.

    Multi-host: the host batch holds only this process's rows (the strided
    local slice, train/loop.py _host_batches); the global array is assembled
    from the per-process shards.  Single host: a plain sharded device_put."""
    s = batch_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(s, x), batch)
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)


def replicate(mesh: Mesh, tree):
    r = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, r), tree)


# ---------------------------------------------------------------------------
# tensor-parallel param placement
# ---------------------------------------------------------------------------

# (path-suffix, PartitionSpec) rules for the vocab-sharded joint classifier.
# Applied to any tree that embeds the param tree (TrainState, optimizer
# moments): suffix matching keys them off the flax module path wherever it
# appears.  fc kernel (De+Dd, V): V columns over 'model'; fc bias (V,): same.
_TP_RULES = (
    (("joint", "fc", "kernel"), P(None, MODEL_AXIS)),
    (("joint", "fc", "bias"), P(MODEL_AXIS)),
)


def _path_keys(path) -> tuple:
    out = []
    for k in path:
        out.append(getattr(k, "key", getattr(k, "name", str(k))))
    return tuple(str(k) for k in out)


def _tp_spec(keys: tuple, ndim: int, tp: bool):
    """TP suffix rule for this leaf, else fully-replicated P()."""
    if tp:
        for suffix, spec in _TP_RULES:
            if keys[-len(suffix):] == suffix and ndim == len(spec):
                return spec
    return P()


def _is_adam_moment(keys: tuple) -> bool:
    """True for param-shaped optimizer-moment leaves inside a
    TrainState-shaped tree (path: opt_state -> <chain idx> -> mu|nu ->
    <param path>).  Covers AdamW and Lion ("mu"/"nu") and SGD momentum
    ("trace"); Adafactor's factored v_row/v_col are row/col sums — already
    ~1/dim the size — and deliberately stay replicated."""
    return bool(keys) and keys[0] == "opt_state" and (
        "mu" in keys or "nu" in keys or "trace" in keys)


def _zero_spec(spec, shape: tuple, data_n: int):
    """Add DATA_AXIS to ``spec`` on the largest free dim divisible by the
    data-axis width (ZeRO-1 moment placement). Leaves whose dims don't
    divide stay as-is — correctness never depends on a leaf being sharded."""
    used = list(spec) + [None] * (len(shape) - len(spec))
    best = None
    for i, d in enumerate(shape):
        if used[i] is None and d % data_n == 0 and d > 0:
            if best is None or d > shape[best]:
                best = i
    if best is None:
        return spec
    used[best] = DATA_AXIS
    return P(*used)


def _leaf_spec(path, leaf, tp: bool, zero_data_n: int):
    """Canonical PartitionSpec for one leaf of a TrainState-shaped tree (or
    any tree that embeds the param tree): TP suffix rules for the
    vocab-sharded joint classifier wherever the param path appears, plus —
    when ``zero_data_n > 1`` — the Adam mu/nu moments split over 'data'
    (ZeRO-1: optimizer memory / data-parallel width; params replicated).

    TP-ruled moments keep the pure TP placement (no extra 'data' split):
    they are already divided model_parallel-fold alongside their param, the
    extra factor is negligible, and the 2-D (data, model) moment resharding
    it would force emits independent collective-permutes whose cross-
    partition ordering races in jaxlib's in-process CPU collective runtime
    (observed as a flaky 8-way rendezvous deadlock on the virtual mesh)."""
    keys = _path_keys(path)
    spec = _tp_spec(keys, np.ndim(leaf), tp)
    if (zero_data_n > 1 and spec == P() and _is_adam_moment(keys)
            and np.ndim(leaf) >= 1
            and np.issubdtype(np.dtype(leaf.dtype), np.floating)):
        spec = _zero_spec(spec, np.shape(leaf), zero_data_n)
    return spec


def tree_shardings(mesh: Mesh, tree, shard_opt_over_data: bool = False):
    """NamedSharding tree for ``tree``: vocab-sharded joint classifier when
    the mesh has a 'model' axis, Adam moments split over 'data' when
    ``shard_opt_over_data`` (ZeRO-1), everything else replicated.  Works on
    the bare param tree AND on trees that nest it (TrainState with Adam
    moments), because the rules match on path suffix."""
    tp = MODEL_AXIS in mesh.axis_names
    data_n = (mesh.shape[DATA_AXIS] if DATA_AXIS in mesh.axis_names else 1)
    zero_n = data_n if shard_opt_over_data else 1

    def one(path, leaf):
        return NamedSharding(mesh, _leaf_spec(path, leaf, tp, zero_n))

    return jax.tree_util.tree_map_with_path(one, tree)


def shard_tree(mesh: Mesh, tree, shard_opt_over_data: bool = False):
    """device_put ``tree`` with ``tree_shardings`` placement — the
    tensor-parallel counterpart of ``replicate`` (identical to it on a 1-D
    data mesh unless ZeRO moment sharding is requested)."""
    return jax.tree.map(jax.device_put, tree,
                        tree_shardings(mesh, tree, shard_opt_over_data))


def constrain_replicated(tree):
    """Pin every array leaf of ``tree`` fully-replicated inside a jitted
    computation traced under ``jax.set_mesh`` (no-op otherwise).

    Used on the gradients between autodiff and the optimizer update when the
    Adam moments are ZeRO-sharded: without the pin, GSPMD propagates the
    moments' 'data' sharding backward through the gradient graph INTO the
    RNN backward scans, materializing per-timestep collective-permutes
    inside the while-loop bodies — catastrophic for the sequential scans on
    any backend, and a deadlock on jaxlib's in-process CPU collective
    runtime where two independent backward scans race their permutes.  The
    pin makes the backward identical to the replicated-optimizer program
    (batch-sharded compute + one final grad reduction); the
    replicated->sharded moment transition is then a local slice."""
    from jax.sharding import get_abstract_mesh

    mesh = get_abstract_mesh()
    if mesh is None or not tuple(getattr(mesh, "axis_names", ()) or ()):
        return tree
    return jax.tree.map(
        lambda x: (x if np.ndim(x) == 0
                   else jax.lax.with_sharding_constraint(x, P())), tree)


def constrain_state(state, shard_opt_over_data: bool = False):
    """Pin a TrainState's leaves to their canonical shardings inside a jitted
    step traced under ``jax.set_mesh``: params replicated (or TP-sharded per
    the suffix rules), Adam moments ZeRO-split over 'data' when requested.
    Without the pin GSPMD may legally all-gather the moments back to
    replicated (correct but defeating the memory split) or leave the fresh
    params sharded (surprising eval/decode callers that expect replicated
    params).  No-op when no mesh is set (single-device / plain-DP traces are
    byte-identical to older rounds)."""
    from jax.sharding import get_abstract_mesh

    mesh = get_abstract_mesh()
    names = tuple(getattr(mesh, "axis_names", ()) or ())
    if mesh is None or not names:
        return state
    tp = MODEL_AXIS in names
    data_n = mesh.shape[DATA_AXIS] if DATA_AXIS in names else 1
    zero_n = data_n if shard_opt_over_data else 1

    def one(path, leaf):
        if np.ndim(leaf) == 0:
            return leaf  # scalars (step counter, schedule count)
        return jax.lax.with_sharding_constraint(
            leaf, _leaf_spec(path, leaf, tp, zero_n))

    return jax.tree_util.tree_map_with_path(one, state)
