"""Train step: loss decreases on a synthetic overfit task, grad accumulation
equivalence, data-parallel sharding over the 8-virtual-device CPU mesh, and
schedule/metric/checkpoint units."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import rnntransducer_tpu as rt
from rnntransducer_tpu.config import (
    Config, JointNetConfig, ModelConfig, PredNetConfig, TrainConfig,
    TransNetConfig,
)
from rnntransducer_tpu.parallel import make_mesh, replicate, shard_batch
from rnntransducer_tpu.train import (
    TrainState, char_error_rate, eval_step, make_optimizer, train_step,
    word_error_rate,
)


def _tiny_cfg(accum=1, batch=8, spec_augment=False):
    # spec_augment off by default so rng-dependent masking doesn't break
    # exact-equivalence tests (accum vs big batch, sharded vs unsharded)
    from rnntransducer_tpu.config import AudioConfig, DataConfig
    return Config(
        data=DataConfig(audio=AudioConfig(spec_augment=spec_augment)),
        model=ModelConfig(
            transnet=TransNetConfig(input_size=8, hidden_size=16, output_size=12,
                                    num_layers=1, rnn_type="lstm", dropout=0.0,
                                    bidirectional=True),
            prednet=PredNetConfig(embedding_size=16, hidden_size=16,
                                  output_size=12, num_layers=1,
                                  rnn_type="lstm", dropout=0.0),
            jointnet=JointNetConfig(num_classes=16),
        ),
        train=TrainConfig(learning_rate=3e-3, max_steps=200, precision="fp32",
                          accumulate_grad_batches=accum,
                          per_device_train_batch_size=batch),
    )


def _batch(cfg, B=8, T=12, U=4, seed=0):
    rng = np.random.RandomState(seed)
    V = cfg.model.jointnet.num_classes
    targets = rng.randint(1, V, size=(B, U)).astype(np.int32)
    text_in = np.concatenate([np.zeros((B, 1), np.int32), targets], axis=1)
    return {
        "feats": jnp.asarray(rng.randn(B, T, 8).astype(np.float32)),
        "feat_lengths": jnp.asarray(rng.randint(T // 2, T + 1, (B,)), jnp.int32),
        "text_in": jnp.asarray(text_in),
        "text_lengths": jnp.full((B,), U + 1, jnp.int32),
        "targets": jnp.asarray(targets),
        "target_lengths": jnp.full((B,), U, jnp.int32),
    }


def test_loss_decreases():
    cfg = _tiny_cfg()
    object.__setattr__(cfg.train, "max_steps", 80)
    tx = make_optimizer(cfg.train)
    state = TrainState.create(cfg)
    batch = _batch(cfg)
    first = None
    for i in range(60):
        state, metrics = train_step(cfg, tx, state, batch)
        if first is None:
            first = float(metrics["loss"])
    last = float(metrics["loss"])
    assert np.isfinite(first) and np.isfinite(last)
    assert last < first * 0.6, (first, last)
    assert int(state.step) == 60


def test_grad_accum_matches_big_batch():
    """accum=4 over a batch of 8 must match accum=1 on the same data (same
    grads averaged), modulo dropout rng (disabled here)."""
    cfg1 = _tiny_cfg(accum=1)
    cfg4 = _tiny_cfg(accum=4)
    tx1, tx4 = make_optimizer(cfg1.train), make_optimizer(cfg4.train)
    s1 = TrainState.create(cfg1)
    s4 = TrainState.create(cfg4)  # same seed -> same init
    batch = _batch(cfg1)
    s1b, m1 = train_step(cfg1, tx1, s1, batch)
    s4b, m4 = train_step(cfg4, tx4, s4, batch)
    np.testing.assert_allclose(float(m1["loss"]), float(m4["loss"]), rtol=1e-5)
    d = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                     s1b.params, s4b.params)
    assert max(jax.tree.leaves(d)) < 1e-5


def test_data_parallel_8_devices_matches_single():
    """Sharding the batch across the 8-device CPU mesh must produce the same
    loss/params as unsharded execution (XLA inserts the psums)."""
    assert len(jax.devices()) == 8
    cfg = _tiny_cfg()
    tx = make_optimizer(cfg.train)
    batch = _batch(cfg, B=16)

    state_a = TrainState.create(cfg)
    sa, ma = train_step(cfg, tx, state_a, batch)

    mesh = make_mesh()
    state_b = replicate(mesh, TrainState.create(cfg))
    sharded = shard_batch(mesh, batch)
    sb, mb = train_step(cfg, tx, state_b, sharded)
    np.testing.assert_allclose(float(ma["loss"]), float(mb["loss"]), rtol=1e-5)
    d = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), sa.params, sb.params)
    assert max(jax.tree.leaves(d)) < 1e-5


def test_eval_step_and_bf16():
    cfg = _tiny_cfg()
    object.__setattr__(cfg.train, "precision", "bf16")
    state = TrainState.create(cfg)
    batch = _batch(cfg)
    loss = eval_step(cfg, state.params, batch)
    assert np.isfinite(float(loss))


def test_onecycle_schedule_shape():
    from rnntransducer_tpu.train import onecycle_schedule
    cfg = _tiny_cfg().train
    s = onecycle_schedule(cfg)
    lr0 = float(s(0))
    peak = float(s(int(cfg.max_steps * cfg.warmup_ratio)))
    end = float(s(cfg.max_steps))
    np.testing.assert_allclose(lr0, cfg.learning_rate / cfg.div_factor, rtol=1e-5)
    np.testing.assert_allclose(peak, cfg.learning_rate, rtol=1e-3)
    assert end < lr0 / 10  # final_div_factor crush


def test_wer_cer():
    preds = ["a b c", "x y"]
    refs = ["a b d", "x y"]
    assert word_error_rate(preds, refs) == pytest.approx(1 / 5)
    assert char_error_rate(["abc"], ["abd"]) == pytest.approx(1 / 3)
    assert word_error_rate([""], ["a b"]) == pytest.approx(1.0)
    assert char_error_rate(["abc"], ["abc"]) == 0.0


def test_checkpoint_roundtrip(tmp_path):
    from rnntransducer_tpu.train import CheckpointManager
    cfg = _tiny_cfg()
    tx = make_optimizer(cfg.train)
    state = TrainState.create(cfg)
    batch = _batch(cfg)
    state, _ = train_step(cfg, tx, state, batch)

    mgr = CheckpointManager(str(tmp_path / "ckpt"), save_top_k=2)
    mgr.save(1, state, metrics={"val_cer": 0.5}, config=cfg)
    state2, _ = train_step(cfg, tx, state, batch)
    mgr.save(2, state2, metrics={"val_cer": 0.3})
    mgr.save(3, state2.replace(step=state2.step + 1), metrics={"val_cer": 0.9})
    assert mgr.best_step() == 2

    template = TrainState.create(cfg)
    restored = mgr.restore(template, step=2)
    d = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                     restored.params, state2.params)
    assert max(jax.tree.leaves(d)) == 0.0
    # saved config loads back
    from rnntransducer_tpu.train import load_config
    cfg2 = load_config(str(tmp_path / "ckpt"))
    assert cfg2.model == cfg.model
    mgr.close()


def test_onecycle_no_nan_at_tiny_max_steps():
    """Regression: max_steps*warmup_ratio < 1 used to yield NaN lr."""
    from rnntransducer_tpu.train import onecycle_schedule
    s = onecycle_schedule(TrainConfig(max_steps=4, warmup_ratio=0.2))
    vals = [float(s(i)) for i in range(5)]
    assert all(np.isfinite(v) for v in vals), vals


def test_train_step_from_raw_waveform():
    """On-device frontend path: train on raw PCM (wav in the batch)."""
    cfg = _tiny_cfg()
    from rnntransducer_tpu.config import (AudioConfig, DataConfig, ModelConfig,
                                          PredNetConfig, JointNetConfig,
                                          TransNetConfig)
    cfg = Config(
        data=DataConfig(audio=AudioConfig(spec_augment=False)),
        model=ModelConfig(
            transnet=TransNetConfig(input_size=80, hidden_size=16,
                                    output_size=12, num_layers=1,
                                    rnn_type="lstm", dropout=0.0,
                                    bidirectional=True),
            prednet=PredNetConfig(embedding_size=16, hidden_size=16,
                                  output_size=12, num_layers=1,
                                  rnn_type="lstm", dropout=0.0),
            jointnet=JointNetConfig(num_classes=16),
        ),
        train=TrainConfig(precision="fp32", max_steps=100),
    )
    rng = np.random.RandomState(0)
    B, S, U = 2, 4800, 3
    targets = rng.randint(1, 16, size=(B, U)).astype(np.int32)
    text_in = np.concatenate([np.zeros((B, 1), np.int32), targets], axis=1)
    batch = {
        "wav": jnp.asarray(rng.randn(B, S).astype(np.float32)),
        "wav_lengths": jnp.array([S, 3200], jnp.int32),
        "text_in": jnp.asarray(text_in),
        "text_lengths": jnp.full((B,), U + 1, jnp.int32),
        "targets": jnp.asarray(targets),
        "target_lengths": jnp.full((B,), U, jnp.int32),
    }
    tx = make_optimizer(cfg.train)
    state = TrainState.create(cfg)
    state, m = train_step(cfg, tx, state, batch)
    assert np.isfinite(float(m["loss"]))


def test_long_form_audio_trains():
    """North-star config 5 shape check: long-form (T=2048) bidirectional
    training step with remat + fused loss on the CPU mesh (tiny dims)."""
    import dataclasses
    cfg = _tiny_cfg()
    tn = dataclasses.replace(cfg.model.transnet, remat=True, scan_layers=True,
                             num_layers=3)
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, transnet=tn),
        train=dataclasses.replace(cfg.train, joint_chunk_frames=128))
    batch = _batch(cfg, B=2, T=2048, U=64)
    tx = make_optimizer(cfg.train)
    state = TrainState.create(cfg)
    state, m = train_step(cfg, tx, state, batch)
    assert np.isfinite(float(m["loss"]))


def test_skip_nonfinite_grads_guards_params_and_moments():
    """With skip_nonfinite_grads, a NaN-producing batch leaves params AND
    optimizer state bit-identical (step still advances); without the flag the
    NaN poisons the params. Finite batches update identically either way."""
    import dataclasses

    import numpy as np

    import jax
    import jax.numpy as jnp

    from rnntransducer_tpu.train import TrainState, make_optimizer, train_step

    cfg = _tiny_cfg()
    cfg_guard = dataclasses.replace(cfg, train=dataclasses.replace(
        cfg.train, skip_nonfinite_grads=True))
    batch = _batch(cfg)
    bad = dict(batch)
    bad["feats"] = batch["feats"].at[0, 0, 0].set(jnp.nan)

    for c in (cfg, cfg_guard):
        tx = make_optimizer(c.train)
        state = TrainState.create(c)
        p0 = jax.tree.map(np.asarray, state.params)
        o0 = jax.tree.map(np.asarray, state.opt_state)
        new_state, m = train_step(c, tx, state, bad)
        assert int(m["nonfinite_grad"]) == 1
        assert int(new_state.step) == 1
        leaves_same = all(
            np.array_equal(a, b) for a, b in zip(
                jax.tree_util.tree_leaves(
                    jax.tree.map(np.asarray, new_state.params)),
                jax.tree_util.tree_leaves(p0)))
        if c.train.skip_nonfinite_grads:
            assert leaves_same, "guarded step must not touch params"
            opt_same = all(
                np.array_equal(a, b) for a, b in zip(
                    jax.tree_util.tree_leaves(
                        jax.tree.map(np.asarray, new_state.opt_state)),
                    jax.tree_util.tree_leaves(o0)))
            assert opt_same, "guarded step must not touch optimizer moments"
        else:
            assert not leaves_same, "unguarded NaN should poison params"

    # finite batch: guarded == unguarded update
    tx = make_optimizer(cfg.train)
    s1, m1 = train_step(cfg, tx, TrainState.create(cfg), batch)
    tx2 = make_optimizer(cfg_guard.train)
    s2, m2 = train_step(cfg_guard, tx2, TrainState.create(cfg_guard), batch)
    assert int(m1["nonfinite_grad"]) == int(m2["nonfinite_grad"]) == 0
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_async_save(tmp_path):
    """wait=False saves: state is host-copied before save() returns (safe to
    donate/mutate after), latest_step() counts the in-flight save, retention
    bookkeeping (ledger + top-k pruning) lands at the deferred wait(), and
    restore()/best_step() drain the pending save first."""
    from rnntransducer_tpu.train import CheckpointManager

    cfg = _tiny_cfg()
    tx = make_optimizer(cfg.train)
    state = TrainState.create(cfg)
    batch = _batch(cfg)
    state, _ = train_step(cfg, tx, state, batch)

    mgr = CheckpointManager(str(tmp_path / "ckpt"), save_top_k=1)
    mgr.save(1, state, metrics={"val_cer": 0.5}, config=cfg, wait=False)
    assert mgr.latest_step() == 1  # pending counts as existing
    # mutate the live state as the next train steps would (donation)
    state2, _ = train_step(cfg, tx, state, batch)
    mgr.save(2, state2, metrics={"val_cer": 0.1}, wait=False)
    mgr.save(3, state2.replace(step=state2.step + 1),
             metrics={"val_cer": 0.9}, wait=False)
    assert mgr.latest_step() == 3

    # restore drains the in-flight save; step-2 params survive intact
    template = TrainState.create(cfg)
    restored = mgr.restore(template, step=2)
    d = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                     restored.params, state2.params)
    assert max(jax.tree.leaves(d)) == 0.0
    assert mgr.best_step() == 2
    # retention ran: top-1 {2} union latest {3}; step 1 pruned
    import os
    assert not os.path.isdir(str(tmp_path / "ckpt" / "1"))
    mgr.close()


def test_checkpoint_averaging(tmp_path):
    """average_checkpoint_params: exact fp32-accumulated mean of the best-k
    params by val_cer; integer leaves pass through; Recognizer.from_checkpoint
    accepts average_k and the averaged model decodes."""
    from rnntransducer_tpu.train import (
        CheckpointManager, average_checkpoint_params,
    )

    cfg = _tiny_cfg()
    tx = make_optimizer(cfg.train)
    state = TrainState.create(cfg)
    batch = _batch(cfg)

    mgr = CheckpointManager(str(tmp_path / "ckpt"), save_top_k=3)
    saved_params = []  # numpy snapshots: train_step donates its input state
    for step, cer in ((1, 0.5), (2, 0.2), (3, 0.9), (4, 0.3)):
        state, _ = train_step(cfg, tx, state, batch)
        saved_params.append(jax.tree.map(lambda x: np.array(x), state.params))
        mgr.save(step, state, metrics={"val_cer": cer}, config=cfg)
    mgr.close()

    template = jax.eval_shape(lambda: TrainState.create(cfg))
    avg, used = average_checkpoint_params(str(tmp_path / "ckpt"), template,
                                          k=2)
    assert used == [2, 4]  # best two by val_cer (0.2, 0.3), sorted by step
    want = jax.tree.map(lambda a, b: (np.asarray(a, np.float32)
                                      + np.asarray(b, np.float32)) / 2,
                        saved_params[1], saved_params[3])
    err = jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a, np.float32) - b).max()),
        avg, want)
    assert max(jax.tree.leaves(err)) < 1e-6

    # explicit steps + dtype preservation (step 3, worst val_cer, was pruned
    # by top-k retention — the retained set is {1, 2, 4})
    avg3, used3 = average_checkpoint_params(str(tmp_path / "ckpt"), template,
                                            steps=[1, 2, 4])
    assert used3 == [1, 2, 4]
    flat_a = jax.tree.leaves(avg3)
    flat_p = jax.tree.leaves(saved_params[0])
    assert all(a.dtype == p.dtype for a, p in zip(flat_a, flat_p))

    # step and average_k are mutually exclusive at the serving entry point
    # (full Recognizer decode with average_k is covered in test_serve.py,
    # where the checkpoint has a speech-shaped config)
    from rnntransducer_tpu.serve import Recognizer
    import pytest as _pytest
    with _pytest.raises(ValueError, match="not both"):
        Recognizer.from_checkpoint(str(tmp_path / "ckpt"), step=2,
                                   average_k=2)

    # k < 1 must error, not silently average every retained checkpoint
    # (with_metric[:0] is empty and all_steps[-0:] is the WHOLE list)
    with _pytest.raises(ValueError, match="average_k"):
        average_checkpoint_params(str(tmp_path / "ckpt"), template, k=0)

    # non-float leaves pass the first checkpoint's value through (never the
    # k-fold SUM): average a tree with an int leaf via the accumulation path
    import rnntransducer_tpu.train.checkpoint as _ckpt_mod

    class _FakeState:
        def __init__(self, params):
            self.params = params

    class _FakeMgr:
        def __init__(self, *a, **kw):
            self._by_step = {
                1: {"w": np.full((2,), 1.0, np.float32),
                    "idx": np.array([7, 8], np.int32)},
                2: {"w": np.full((2,), 3.0, np.float32),
                    "idx": np.array([7, 8], np.int32)},
            }
        def restore(self, template, step):
            return _FakeState(self._by_step[step])
        def close(self):
            pass

    real = _ckpt_mod.CheckpointManager
    _ckpt_mod.CheckpointManager = _FakeMgr
    try:
        avg_mixed, used_m = average_checkpoint_params("ignored", None,
                                                      steps=[1, 2])
    finally:
        _ckpt_mod.CheckpointManager = real
    assert used_m == [1, 2]
    np.testing.assert_allclose(np.asarray(avg_mixed["w"]), [2.0, 2.0])
    np.testing.assert_array_equal(np.asarray(avg_mixed["idx"]), [7, 8])
    assert avg_mixed["idx"].dtype == jnp.int32
