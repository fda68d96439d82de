"""Optimizer + LR schedule.

Capability-equivalent of the reference's ``configure_optimizers``
(``model.py:110-126``): AdamW with a per-step OneCycleLR schedule
(max_lr=learning_rate, pct_start=warmup_ratio, final_div_factor), built on
optax (whose cosine_onecycle_schedule matches torch.optim.lr_scheduler.
OneCycleLR's default cosine annealing strategy).
"""

from __future__ import annotations

import optax

from rnntransducer_tpu.config import TrainConfig


def onecycle_schedule(cfg: TrainConfig) -> optax.Schedule:
    # optax divides by int(transition_steps * pct_start); if that truncates
    # to zero every lr of the run is NaN — hit by tiny max_steps AND by
    # warmup_ratio == 0 ("no warmup": int(N*0.0) == 0 for any N).  Pin the
    # warmup phase to an exact whole number of steps >= 1 instead: the +0.5
    # makes int(steps * pct) == warmup regardless of float rounding, and the
    # schedule still completes within the run (no stretching).
    steps = max(cfg.max_steps, 2)
    warmup = min(max(int(steps * cfg.warmup_ratio), 1), steps - 1)
    return optax.cosine_onecycle_schedule(
        transition_steps=steps,
        peak_value=cfg.learning_rate,
        pct_start=(warmup + 0.5) / steps,
        div_factor=cfg.div_factor,
        final_div_factor=cfg.final_div_factor,
    )


def make_schedule(cfg: TrainConfig) -> optax.Schedule:
    """LR schedule per ``cfg.lr_schedule`` (all warm up for
    ``warmup_ratio`` of the run; "onecycle" is reference parity)."""
    kind = cfg.lr_schedule.lower()
    if kind == "onecycle":
        return onecycle_schedule(cfg)
    steps = max(cfg.max_steps, 2)
    warmup = min(max(int(steps * cfg.warmup_ratio), 1), steps - 1)
    if kind == "cosine":
        return optax.warmup_cosine_decay_schedule(
            init_value=cfg.learning_rate / cfg.div_factor,
            peak_value=cfg.learning_rate, warmup_steps=warmup,
            decay_steps=steps, end_value=0.0)
    if kind == "linear":
        return optax.join_schedules(
            [optax.linear_schedule(cfg.learning_rate / cfg.div_factor,
                                   cfg.learning_rate, warmup),
             optax.linear_schedule(cfg.learning_rate, 0.0, steps - warmup)],
            [warmup])
    if kind == "constant":
        return optax.join_schedules(
            [optax.linear_schedule(cfg.learning_rate / cfg.div_factor,
                                   cfg.learning_rate, warmup),
             optax.constant_schedule(cfg.learning_rate)],
            [warmup])
    raise ValueError(f"unknown lr_schedule {cfg.lr_schedule!r} "
                     "(onecycle | cosine | linear | constant)")


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    schedule = make_schedule(cfg)
    kind = getattr(cfg, "optimizer", "adamw").lower()
    if kind == "adamw":
        tx = optax.adamw(learning_rate=schedule,
                         weight_decay=cfg.weight_decay)
    elif kind == "adafactor":
        # factored second moment: optimizer memory ~ row+col sums instead
        # of 2x params fp32 — the standard lever when Adam moments dominate
        # HBM (they are the largest replicated tensors in a DP run).
        # min_dim_size_to_factor=128 keeps small tensors unfactored.
        tx = optax.adafactor(learning_rate=schedule,
                             min_dim_size_to_factor=128,
                             multiply_by_parameter_scale=False,
                             weight_decay_rate=cfg.weight_decay or None)
    elif kind == "lion":
        tx = optax.lion(learning_rate=schedule,
                        weight_decay=cfg.weight_decay)
    elif kind == "sgd":
        tx = optax.sgd(learning_rate=schedule, momentum=0.9)
    else:
        raise ValueError(f"unknown optimizer {cfg.optimizer!r} "
                         "(adamw | adafactor | lion | sgd)")
    if cfg.grad_clip_norm is not None:
        tx = optax.chain(optax.clip_by_global_norm(cfg.grad_clip_norm), tx)
    return tx
