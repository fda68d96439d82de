"""Optimizer / LR-schedule selection (train/optim.py): every
``train.optimizer`` x ``train.lr_schedule`` choice must build, warm up from
lr/div_factor to the peak, decay per its shape, and actually train a step
(params move, loss finite).  AdamW+onecycle is reference parity
(``/root/reference/model.py:110-126``); the rest are production knobs the
reference lacks.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import rnntransducer_tpu as rt
from rnntransducer_tpu.config import TrainConfig
from rnntransducer_tpu.train import (
    TrainState, make_optimizer, make_schedule, train_step,
)


def _cfg(**kw):
    return TrainConfig(learning_rate=1e-3, max_steps=100, warmup_ratio=0.2,
                       div_factor=25.0, **kw)


@pytest.mark.parametrize("kind", ["onecycle", "cosine", "linear",
                                  "constant"])
def test_schedule_shapes(kind):
    cfg = _cfg(lr_schedule=kind)
    sched = make_schedule(cfg)
    lr0 = float(sched(0))
    peak = max(float(sched(s)) for s in range(0, 100, 5))
    end = float(sched(99))
    assert lr0 <= cfg.learning_rate / 5, lr0  # warmup starts low
    assert peak == pytest.approx(cfg.learning_rate, rel=0.05), peak
    if kind == "constant":
        assert end == pytest.approx(cfg.learning_rate, rel=1e-6)
    else:
        assert end < 0.1 * cfg.learning_rate, (kind, end)
    assert all(np.isfinite(float(sched(s))) for s in range(100))


def test_unknown_choices_raise():
    with pytest.raises(ValueError, match="lr_schedule"):
        make_schedule(_cfg(lr_schedule="step"))
    with pytest.raises(ValueError, match="optimizer"):
        make_optimizer(_cfg(optimizer="rmsprop"))


@pytest.mark.parametrize("kind", ["adamw", "adafactor", "lion", "sgd"])
def test_optimizer_trains_a_step(kind):
    cfg = rt.tiny_config()
    cfg = dataclasses.replace(cfg, train=TrainConfig(
        precision="fp32", max_steps=10, optimizer=kind,
        grad_clip_norm=1.0))
    from __graft_entry__ import _example_batch
    batch = _example_batch(cfg, B=2, T=16, U=5)
    tx = make_optimizer(cfg.train)
    state = TrainState.create(cfg)
    # train_step donates the state: materialize the before-value first
    before = np.asarray(jax.tree_util.tree_leaves(state.params)[0])
    new_state, metrics = train_step(cfg, tx, state, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert int(new_state.step) == 1
    after = np.asarray(jax.tree_util.tree_leaves(new_state.params)[0])
    assert np.abs(after - before).max() > 0, kind


def test_adafactor_state_is_factored():
    """The point of adafactor: no param-shaped second moment for big
    matrices (>=128 on both dims) — v_row/v_col sums instead."""
    cfg = rt.tiny_config()
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(
            cfg.model, transnet=dataclasses.replace(
                cfg.model.transnet, hidden_size=128)),
        train=TrainConfig(precision="fp32", max_steps=10,
                          optimizer="adafactor"))
    state = TrainState.create(cfg)
    n_params = sum(p.size for p in jax.tree_util.tree_leaves(state.params))
    n_opt = sum(np.size(leaf) for leaf in
                jax.tree_util.tree_leaves(state.opt_state)
                if hasattr(leaf, "size"))
    # AdamW would hold 2x params; factored state must be well under 1x
    assert n_opt < 0.8 * n_params, (n_opt, n_params)
