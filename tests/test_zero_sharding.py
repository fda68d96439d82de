"""ZeRO-1 optimizer-state sharding: the Adam mu/nu moments split over the
'data' mesh axis (cfg.train.shard_optimizer_state, parallel/mesh.py).
Exactness is the contract — the sharded-moment step must reproduce the
replicated step bit-for-bit-close — plus placement assertions that the
moments actually stay split across steps and survive a checkpoint
round-trip.  The reference has no analogue (DDP replicates optimizer
state on every rank, /root/reference/train.py:45).
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from rnntransducer_tpu.parallel import (
    DATA_AXIS, MODEL_AXIS, make_mesh, shard_batch, shard_tree,
    tree_shardings,
)
from rnntransducer_tpu.train import TrainState, make_optimizer, train_step

from test_train_step import _batch, _tiny_cfg


def _zero_cfg(**kw):
    cfg = _tiny_cfg(**kw)
    return dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, shard_optimizer_state=True))


def _splittable(value_leaf, data_n: int) -> bool:
    """True when the ZeRO rule can split this moment (some dim divides the
    data-axis width); non-divisible leaves legally stay replicated."""
    return any(d % data_n == 0 and d > 0 for d in np.shape(value_leaf))


def _moment_leaves(opt_state):
    """(path-keys, leaf) for every Adam mu/nu entry — works on value trees
    AND sharding/spec trees (mu/nu subtrees are param-shaped: every leaf is
    a param-sized array / its sharding, never a scalar)."""
    out = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(opt_state)[0]:
        keys = [str(getattr(k, "key", getattr(k, "name", getattr(k, "idx", k))))
                for k in path]
        if "mu" in keys or "nu" in keys:
            out.append((keys, leaf))
    return out


def test_zero_shardings_rules():
    """Moments get DATA_AXIS on a divisible dim; params stay replicated;
    scalar counts stay replicated; on a 2-D mesh the TP-ruled fc moments
    carry BOTH axes."""
    cfg = _zero_cfg()
    tx = make_optimizer(cfg.train)
    state = TrainState.create(cfg, tx=tx)

    mesh = make_mesh()  # 1-D data mesh, 8 devices
    sh = tree_shardings(mesh, state, shard_opt_over_data=True)
    vals = dict((tuple(k), v) for k, v in _moment_leaves(state.opt_state))
    n_split = 0
    for keys, s in _moment_leaves(sh.opt_state):
        if _splittable(vals[tuple(keys)], 8):
            assert DATA_AXIS in tuple(s.spec), (keys, s.spec)
            n_split += 1
        else:
            assert s.spec == P(), (keys, s.spec)
    assert n_split >= 30  # the bulk of the moments actually split
    # params and scalars replicated
    assert all(s.spec == P() for s in jax.tree.leaves(sh.params))
    assert sh.step.spec == P()
    # off-switch: identical to the plain rules
    sh_off = tree_shardings(mesh, state, shard_opt_over_data=False)
    assert all(s.spec == P()
               for _, s in _moment_leaves(sh_off.opt_state))

    # TP x ZeRO: TP-ruled moments keep the pure TP placement (already split
    # model_parallel-fold; a 2-D (data, model) moment reshard would race in
    # jaxlib's in-process CPU collective runtime — see _leaf_spec)
    mesh2 = make_mesh(model_parallel=2)
    sh2 = tree_shardings(mesh2, state, shard_opt_over_data=True)
    fc_mu = [s for keys, s in _moment_leaves(sh2.opt_state)
             if keys[-2:] == ["fc", "kernel"]]
    assert fc_mu and all(s.spec == P(None, MODEL_AXIS) for s in fc_mu)
    # non-TP moments still ZeRO-split over data on the 2-D mesh
    enc_mu = [s for keys, s in _moment_leaves(sh2.opt_state)
              if keys[-1] == "w_hh" and "encoder" in keys]
    assert enc_mu and all(DATA_AXIS in tuple(s.spec) for s in enc_mu)
    # and the fc kernel PARAM keeps the pure TP spec
    assert sh2.params["joint"]["fc"]["kernel"].spec == P(None, MODEL_AXIS)


def test_zero_step_matches_replicated():
    """3 steps with ZeRO-sharded moments on the 8-device data mesh must
    reproduce the replicated baseline, and the output moments must stay
    split (GSPMD not silently all-gathering them back)."""
    assert len(jax.devices()) == 8
    cfg_base = _tiny_cfg()
    cfg_zero = _zero_cfg()
    tx = make_optimizer(cfg_base.train)
    mesh = make_mesh()

    sa = TrainState.create(cfg_base)
    sb = shard_tree(mesh, TrainState.create(cfg_zero),
                    shard_opt_over_data=True)
    for _, leaf in _moment_leaves(sb.opt_state):
        if _splittable(leaf, 8):
            assert DATA_AXIS in tuple(leaf.sharding.spec)

    for i in range(3):
        batch = _batch(cfg_base, B=16, seed=i)
        sa, ma = train_step(cfg_base, tx, sa, batch)
        with jax.set_mesh(mesh):
            sb, mb = train_step(cfg_zero, tx, sb, shard_batch(mesh, batch))
        np.testing.assert_allclose(float(ma["loss"]), float(mb["loss"]),
                                   rtol=1e-6)
    d = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                     sa.params, sb.params)
    assert max(jax.tree.leaves(d)) < 1e-6, d
    # placement pinned across steps: moments split, params replicated
    for keys, leaf in _moment_leaves(sb.opt_state):
        if _splittable(leaf, 8):
            assert DATA_AXIS in tuple(leaf.sharding.spec), keys
    for leaf in jax.tree.leaves(sb.params):
        assert leaf.sharding.is_fully_replicated


@pytest.fixture(autouse=True, scope="module")
def no_compilation_cache():
    """Disable jax's persistent compilation cache for this module.

    The sharded-optimizer steps here deadlock FLAKILY on the CPU backend
    (jaxlib 0.8.x) when multi-partition executables are deserialized from
    the persistent cache into a process that has already run other
    collective programs: partitions rendezvous on mismatched
    collective-permute op ids (half at one op, half at another, all
    expecting 8 participants) and the 40 s rendezvous timeout SIGABRTs the
    whole process.  Evidence: every observed crash had warm-cache
    multi-partition programs in a multi-test process; the same tests pass
    3/3 in isolation (cold or warm) and pass in-process when nothing is
    cache-deserialized.  Two mitigations: TP-ruled moments keep their pure
    TP placement so the 2-D moment reshard that amplified the race never
    exists (parallel/mesh.py:_leaf_spec), and this module compiles fresh —
    ~30 s extra, bounded.  Real-TPU runs compile collectives into the step
    (no host rendezvous) and are unaffected (docs/PRODUCTION.md)."""
    old = jax.config.jax_enable_compilation_cache
    jax.config.update("jax_enable_compilation_cache", False)
    yield
    jax.config.update("jax_enable_compilation_cache", old)


def test_zero_composes_with_tp_and_accum():
    """(data=4, model=2) mesh + grad accumulation + ZeRO moments still
    reproduces the unsharded step."""
    cfg_base = _tiny_cfg(accum=2)
    cfg_zero = _zero_cfg(accum=2)
    tx = make_optimizer(cfg_base.train)
    batch = _batch(cfg_base, B=16)

    sa, ma = train_step(cfg_base, tx, TrainState.create(cfg_base), batch)

    mesh = make_mesh(model_parallel=2)
    sb = shard_tree(mesh, TrainState.create(cfg_zero),
                    shard_opt_over_data=True)
    with jax.set_mesh(mesh):
        sb, mb = train_step(cfg_zero, tx, sb, shard_batch(mesh, batch))
    np.testing.assert_allclose(float(ma["loss"]), float(mb["loss"]),
                               rtol=1e-5)
    d = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                     sa.params, sb.params)
    assert max(jax.tree.leaves(d)) < 1e-5
    assert sb.params["joint"]["fc"]["kernel"].sharding.spec == \
        P(None, MODEL_AXIS)


def test_zero_checkpoint_roundtrip(tmp_path):
    """Save a ZeRO-sharded state, restore into a fresh sharded template:
    values equal, moment placement preserved."""
    from rnntransducer_tpu.train.checkpoint import CheckpointManager

    cfg = _zero_cfg()
    tx = make_optimizer(cfg.train)
    mesh = make_mesh()
    state = shard_tree(mesh, TrainState.create(cfg), shard_opt_over_data=True)
    with jax.set_mesh(mesh):
        state, _ = train_step(cfg, tx, state, _batch(cfg, B=16))

    ckpt = CheckpointManager(str(tmp_path / "ckpt"))
    ckpt.save(int(state.step), state, config=cfg)
    template = shard_tree(mesh, TrainState.create(cfg),
                          shard_opt_over_data=True)
    restored = ckpt.restore(template)
    ckpt.close()

    d = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                     state.params, restored.params)
    assert max(jax.tree.leaves(d)) == 0.0
    for keys, leaf in _moment_leaves(restored.opt_state):
        if _splittable(leaf, 8):
            assert DATA_AXIS in tuple(leaf.sharding.spec), keys
    dm = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                      state.opt_state, restored.opt_state)
    assert max(jax.tree.leaves(dm)) == 0.0


def test_trainer_fit_with_zero_sharding(tmp_path):
    """Trainer wiring: shard_optimizer_state threads through shard_tree and
    the set_mesh context; a short fit runs, moments end up split, and the
    multi-process guard message exists for the unsupported path."""
    from test_trainer_loop import _cfg, _ds
    from rnntransducer_tpu.train import Trainer

    cfg = _cfg(tmp_path, max_steps=2)
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, shard_optimizer_state=True,
                                       per_device_train_batch_size=1))
    trainer = Trainer(cfg, _ds(10), val_dataset=None)
    state = trainer.fit()
    assert int(state.step) == 2
    split = [leaf for _, leaf in _moment_leaves(state.opt_state)
             if DATA_AXIS in tuple(leaf.sharding.spec)]
    assert split, "no Adam moment ended up data-sharded after fit()"
