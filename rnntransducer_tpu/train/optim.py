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


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    schedule = onecycle_schedule(cfg)
    tx = optax.adamw(learning_rate=schedule, weight_decay=cfg.weight_decay)
    if cfg.grad_clip_norm is not None:
        tx = optax.chain(optax.clip_by_global_norm(cfg.grad_clip_norm), tx)
    return tx
