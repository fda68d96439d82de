"""EMA (Polyak) parameter averaging (train/state.py): the shadow tree must
follow ema <- d*ema + (1-d)*params exactly, stay absent (None) when
disabled so older-round state pytrees are unchanged, round-trip through
checkpoints, and reach the decode surface via use_ema.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import rnntransducer_tpu as rt
from rnntransducer_tpu.config import TrainConfig
from rnntransducer_tpu.train import TrainState, make_optimizer, train_step


def _setup(ema_decay, seed=0):
    cfg = rt.tiny_config()
    cfg = dataclasses.replace(cfg, train=TrainConfig(
        precision="fp32", max_steps=10, ema_decay=ema_decay, seed=seed))
    from __graft_entry__ import _example_batch
    batch = _example_batch(cfg, B=2, T=16, U=5)
    tx = make_optimizer(cfg.train)
    return cfg, tx, TrainState.create(cfg), batch


def test_ema_matches_manual_recurrence():
    d = 0.5
    cfg, tx, state, batch = _setup(d)
    manual = jax.tree.map(lambda p: np.asarray(p), state.params)
    for _ in range(3):
        state, _ = train_step(cfg, tx, state, batch)
        params = jax.tree.map(np.asarray, state.params)
        manual = jax.tree.map(lambda e, p: d * e + (1 - d) * p,
                              manual, params)
    got = jax.tree.map(np.asarray, state.ema_params)
    for a, b in zip(jax.tree_util.tree_leaves(got),
                    jax.tree_util.tree_leaves(manual)):
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)
    # EMA must lag the live params (not alias them)
    diffs = [np.abs(a - b).max() for a, b in
             zip(jax.tree_util.tree_leaves(got),
                 jax.tree_util.tree_leaves(
                     jax.tree.map(np.asarray, state.params)))]
    assert max(diffs) > 0


def test_ema_disabled_leaves_state_unchanged():
    cfg, tx, state, batch = _setup(0.0)
    assert state.ema_params is None
    state, _ = train_step(cfg, tx, state, batch)
    assert state.ema_params is None


def test_ema_checkpoint_roundtrip_and_use_ema(tmp_path):
    from rnntransducer_tpu.train import CheckpointManager

    cfg, tx, state, batch = _setup(0.9)
    state, _ = train_step(cfg, tx, state, batch)
    want = jax.tree.map(np.asarray, state.ema_params)
    mgr = CheckpointManager(str(tmp_path), save_top_k=2)
    mgr.save(1, state, metrics={"val_cer": 0.5})
    mgr.close()
    mgr = CheckpointManager(str(tmp_path), save_top_k=2)
    template = jax.eval_shape(lambda: TrainState.create(cfg))
    got = mgr.restore(template, step=1)
    mgr.close()
    for a, b in zip(jax.tree_util.tree_leaves(
                        jax.tree.map(np.asarray, got.ema_params)),
                    jax.tree_util.tree_leaves(want)):
        np.testing.assert_array_equal(a, b)


def test_use_ema_requires_ema_run(tmp_path):
    """Recognizer.from_checkpoint(use_ema=True) on a non-EMA run must fail
    loudly, and succeed with the shadow params on an EMA run."""
    import os

    from rnntransducer_tpu.serve import Recognizer
    from rnntransducer_tpu.train import CheckpointManager

    cfg, tx, state, batch = _setup(0.9)
    state, _ = train_step(cfg, tx, state, batch)
    d = str(tmp_path / "ema_run")
    mgr = CheckpointManager(d, save_top_k=2)
    mgr.save(1, state, metrics={"val_cer": 0.5})
    mgr.close()
    cfg.to_json(os.path.join(d, "config.json"))
    rec = Recognizer.from_checkpoint(d, use_ema=True)
    for a, b in zip(jax.tree_util.tree_leaves(
                        jax.tree.map(np.asarray, rec.variables["params"])),
                    jax.tree_util.tree_leaves(
                        jax.tree.map(np.asarray, state.ema_params))):
        np.testing.assert_array_equal(a, b)

    cfg0, tx0, state0, _ = _setup(0.0)
    d0 = str(tmp_path / "plain_run")
    mgr = CheckpointManager(d0, save_top_k=2)
    mgr.save(1, state0, metrics={"val_cer": 0.5})
    mgr.close()
    cfg0.to_json(os.path.join(d0, "config.json"))
    with pytest.raises(ValueError, match="no EMA shadow"):
        Recognizer.from_checkpoint(d0, use_ema=True)
