"""Tensor parallelism: the joint classifier's vocab dim sharded over the
mesh's 'model' axis (Megatron column-parallel), consumed by the factored
RNN-T loss whose V-ops all reduce over V (parallel/mesh.py).  Exactness is
the contract: a (data x model) 2-D mesh must reproduce the unsharded step.
"""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from rnntransducer_tpu.parallel import (
    MODEL_AXIS, make_mesh, shard_batch, shard_tree, tree_shardings,
)
from rnntransducer_tpu.train import TrainState, make_optimizer, train_step

from test_train_step import _batch, _tiny_cfg


def test_make_mesh_2d_shape():
    mesh = make_mesh(model_parallel=2)
    assert mesh.axis_names == ("data", "model")
    assert mesh.devices.shape == (4, 2)
    mesh1 = make_mesh()
    assert mesh1.axis_names == ("data",)


def test_tree_shardings_rules():
    """fc kernel/bias get the vocab spec wherever the param path appears —
    bare params AND nested optimizer moments; 1-D meshes stay replicated."""
    cfg = _tiny_cfg()
    tx = make_optimizer(cfg.train)
    state = TrainState.create(cfg, tx=tx)
    mesh = make_mesh(model_parallel=2)
    sh = tree_shardings(mesh, state)
    assert sh.params["joint"]["fc"]["kernel"].spec == P(None, MODEL_AXIS)
    assert sh.params["joint"]["fc"]["bias"].spec == P(MODEL_AXIS)
    assert sh.params["joint"]["fc"]["kernel"].mesh.shape["model"] == 2
    # Adam moments follow the same rule (path suffix match inside opt_state)
    mus = [s for path, s in
           jax.tree_util.tree_flatten_with_path(sh.opt_state)[0]
           if any(getattr(k, "key", None) == "kernel" for k in path)
           and any(getattr(k, "key", None) == "fc" for k in path)]
    assert mus and all(m.spec == P(None, MODEL_AXIS) for m in mus)
    # encoder params replicated
    enc_leaf = jax.tree.leaves(sh.params["encoder"])[0]
    assert enc_leaf.spec == P()
    # 1-D mesh: everything replicated
    sh1 = tree_shardings(make_mesh(), state)
    assert sh1.params["joint"]["fc"]["kernel"].spec == P()


def test_tensor_parallel_train_step_matches_single():
    """(data=4, model=2) mesh: vocab-sharded classifier + factored loss must
    reproduce the unsharded loss/params (GSPMD inserts the V psums)."""
    assert len(jax.devices()) == 8
    cfg = _tiny_cfg()
    tx = make_optimizer(cfg.train)
    batch = _batch(cfg, B=16)

    sa, ma = train_step(cfg, tx, TrainState.create(cfg), batch)

    mesh = make_mesh(model_parallel=2)
    state = shard_tree(mesh, TrainState.create(cfg))
    k = state.params["joint"]["fc"]["kernel"]
    assert k.sharding.spec == P(None, MODEL_AXIS)
    with jax.set_mesh(mesh):
        sb, mb = train_step(cfg, tx, state, shard_batch(mesh, batch))
    np.testing.assert_allclose(float(ma["loss"]), float(mb["loss"]), rtol=1e-5)
    d = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), sa.params,
                     sb.params)
    assert max(jax.tree.leaves(d)) < 1e-5
    # the updated classifier stays vocab-sharded across steps
    assert sb.params["joint"]["fc"]["kernel"].sharding.spec == P(None, MODEL_AXIS)


def test_tensor_parallel_grad_accum_and_bf16():
    """TP composes with the scanned-microbatch accumulation and bf16 cast."""
    cfg = _tiny_cfg(accum=2)
    object.__setattr__(cfg.train, "precision", "bf16")
    tx = make_optimizer(cfg.train)
    batch = _batch(cfg, B=16)
    mesh = make_mesh(model_parallel=2)
    state = shard_tree(mesh, TrainState.create(cfg))
    with jax.set_mesh(mesh):
        state, m = train_step(cfg, tx, state, shard_batch(mesh, batch))
    assert np.isfinite(float(m["loss"]))
    assert int(state.step) == 1


def test_factored_loss_vocab_sharded_values():
    """The factored compact lattice itself under a model-sharded V axis:
    bl/lb from V-sharded (A, C) match the replicated computation."""
    from rnntransducer_tpu.ops.rnnt_loss import factored_compact_lattice

    B, T, U1, V = 4, 6, 5, 16
    rng = np.random.RandomState(0)
    A = jnp.asarray(rng.randn(B, T, V).astype(np.float32))
    C = jnp.asarray(rng.randn(B, U1, V).astype(np.float32))
    labels = jnp.asarray(rng.randint(1, V, (B, U1 - 1)).astype(np.int32))

    want_bl, want_lb = jax.jit(factored_compact_lattice)(A, C, labels)

    mesh = make_mesh(model_parallel=2)
    sh = jax.NamedSharding(mesh, P(None, None, MODEL_AXIS))
    with jax.set_mesh(mesh):
        got_bl, got_lb = jax.jit(factored_compact_lattice)(
            jax.device_put(A, sh), jax.device_put(C, sh), labels)
    np.testing.assert_allclose(np.asarray(got_bl), np.asarray(want_bl),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_lb), np.asarray(want_lb),
                               atol=1e-5)


def test_checkpoint_cross_topology_dp_to_tp(tmp_path):
    """A checkpoint saved replicated (DP mesh) restores into a TP-sharded
    template: same values, vocab-sharded placement (PRODUCTION.md claim)."""
    from rnntransducer_tpu.train.checkpoint import CheckpointManager

    cfg = _tiny_cfg()
    tx = make_optimizer(cfg.train)
    state = TrainState.create(cfg, tx=tx)
    dp_state, _ = train_step(cfg, tx, state, _batch(cfg, B=8))

    ckpt = CheckpointManager(str(tmp_path), save_top_k=1)
    ckpt.save(1, dp_state, metrics={"val_cer": 0.5}, config=cfg)
    ckpt.wait()

    mesh = make_mesh(model_parallel=2)
    template = shard_tree(mesh, TrainState.create(cfg, tx=tx))
    restored = ckpt.restore(template)
    ckpt.close()
    k = restored.params["joint"]["fc"]["kernel"]
    assert k.sharding.spec == P(None, MODEL_AXIS)
    d = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                     dp_state.params, restored.params)
    assert max(jax.tree.leaves(d)) == 0.0


def test_trainer_fit_model_parallel(tmp_path):
    """Trainer wiring: cfg.train.model_parallel=2 builds the (4,2) mesh,
    shards the classifier, fits + validates under jax.set_mesh, and the
    global batch follows the DATA shard count (not total devices)."""
    import dataclasses

    from rnntransducer_tpu.config import AudioConfig, DataConfig
    from rnntransducer_tpu.data import SyntheticAudioDataset
    from rnntransducer_tpu.train import Trainer

    cfg = _tiny_cfg()
    cfg = dataclasses.replace(
        cfg,
        data=DataConfig(audio=AudioConfig(spec_augment=False),
                        audio_buckets=(64, 128), label_buckets=(16, 24)),
        model=dataclasses.replace(
            cfg.model,
            transnet=dataclasses.replace(cfg.model.transnet, input_size=80),
            prednet=dataclasses.replace(cfg.model.prednet, embedding_size=72),
            jointnet=dataclasses.replace(cfg.model.jointnet, num_classes=72)),
        train=dataclasses.replace(
            cfg.train, max_steps=2, per_device_train_batch_size=1,
            per_device_eval_batch_size=1, model_parallel=2,
            log_every_steps=1, val_every_steps=100,
            checkpoint_dir=str(tmp_path / "ckpt")),
    )
    ds = SyntheticAudioDataset(8, AudioConfig(), min_sec=0.3, max_sec=0.8,
                               min_labels=3, max_labels=8, seed=0)
    trainer = Trainer(cfg, ds, val_dataset=SyntheticAudioDataset(
        4, AudioConfig(), min_sec=0.3, max_sec=0.8, min_labels=3,
        max_labels=8, seed=9))
    assert trainer.mesh.axis_names == ("data", "model")
    assert trainer.n_data_shards == 4
    assert trainer._global_batch() == 4  # 1 per device x 4 data shards
    k = trainer.state.params["joint"]["fc"]["kernel"]
    assert k.sharding.spec == P(None, MODEL_AXIS)
    state = trainer.fit()
    assert int(state.step) == 2
    assert state.params["joint"]["fc"]["kernel"].sharding.spec == \
        P(None, MODEL_AXIS)
    val = trainer.validate(max_batches=1)
    assert np.isfinite(val["val_loss"])
    trainer.ckpt.close()


def test_model_axis_must_stay_intra_process(monkeypatch):
    """A model axis spanning processes would hand two processes the same
    data shard (loop.py slices the host batch by process) — make_mesh must
    reject it before anything deadlocks."""
    import pytest

    class FakeDev:
        def __init__(self, pi):
            self.process_index = pi

    monkeypatch.setattr(jax, "process_count", lambda: 2)
    with pytest.raises(ValueError, match="span"):
        make_mesh([FakeDev(0), FakeDev(1)], model_parallel=2)
    # intra-process rows are fine (guard passes; Mesh() itself may reject
    # fakes, so only assert the guard does not trip)
    try:
        make_mesh([FakeDev(0), FakeDev(0), FakeDev(1), FakeDev(1)],
                  model_parallel=2)
    except ValueError as e:
        assert "span" not in str(e)
    except TypeError:
        pass  # jax Mesh rejecting the fake devices is acceptable
