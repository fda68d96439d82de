"""Checkpointing: save/restore params + optimizer state + step, with
top-k retention by validation CER.

Capability-equivalent of the reference's Lightning ModelCheckpoint
(``train.py:31-37``: ``save_top_k=3, mode="min", monitor="val_cer"``) and
``load_from_checkpoint`` restore (``inference.py:19-25``), built on Orbax.
One restore API serves both train-resume and inference.
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional

import orbax.checkpoint as ocp

from rnntransducer_tpu.config import Config


class CheckpointManager:
    def __init__(self, directory: str, save_top_k: int = 3,
                 monitor: str = "val_cer"):
        self.directory = os.path.abspath(directory)
        self.monitor = monitor
        options = ocp.CheckpointManagerOptions(
            max_to_keep=save_top_k,
            best_fn=(lambda metrics: metrics.get(monitor, float("inf"))),
            best_mode="min",
        )
        self._mgr = ocp.CheckpointManager(self.directory, options=options)

    def save(self, step: int, state: Any, metrics: Optional[dict] = None,
             config: Optional[Config] = None):
        if config is not None:
            os.makedirs(self.directory, exist_ok=True)
            cfg_path = os.path.join(self.directory, "config.json")
            if not os.path.exists(cfg_path):
                config.to_json(cfg_path)
        self._mgr.save(step, args=ocp.args.StandardSave(state),
                       metrics=metrics or {})
        self._mgr.wait_until_finished()

    def restore(self, state_template: Any, step: Optional[int] = None) -> Any:
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        return self._mgr.restore(step, args=ocp.args.StandardRestore(state_template))

    def best_step(self) -> Optional[int]:
        return self._mgr.best_step()

    def best_or_latest_step(self) -> Optional[int]:
        """Best-by-metric step, else latest (step 0 is a valid best — never
        use `best_step() or latest_step()`, which drops a falsy 0)."""
        best = self._mgr.best_step()
        return best if best is not None else self._mgr.latest_step()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def close(self):
        self._mgr.close()


def load_config(checkpoint_dir: str) -> Config:
    with open(os.path.join(os.path.abspath(checkpoint_dir), "config.json")) as f:
        return Config.from_dict(json.load(f))
