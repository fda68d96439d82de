"""Metrics logging: stdout + JSONL file.

Capability-equivalent of the reference's observability stack (WandbLogger +
LearningRateMonitor + self.log(sync_dist=True), ``train.py:15,27,38``,
``model.py:59,99-108``) without the external service: every record lands in
``metrics.jsonl`` for any dashboard to tail, and cross-replica reduction
happens in-step via the mesh (no sync flags).
"""

from __future__ import annotations

import json
import os
import sys
import time
from typing import Optional


class MetricsLogger:
    def __init__(self, log_dir: Optional[str] = None, name: str = "metrics",
                 stdout: bool = True, wandb_project: Optional[str] = None):
        self.stdout = stdout
        self._fh = None
        if log_dir:
            os.makedirs(log_dir, exist_ok=True)
            self._fh = open(os.path.join(log_dir, f"{name}.jsonl"), "a")
        self._t0 = time.time()
        # optional W&B mirror (the reference's WandbLogger, train.py:15);
        # gated: wandb isn't a dependency of this framework
        self._wandb = None
        if wandb_project:
            try:
                import wandb
                self._wandb = wandb
                wandb.init(project=wandb_project)
            except ImportError:
                print("wandb not installed; jsonl/stdout logging only")

    def log(self, step: int, **metrics):
        rec = {"step": int(step), "time": round(time.time() - self._t0, 3)}
        for k, v in metrics.items():
            try:
                rec[k] = float(v)
            except (TypeError, ValueError):
                rec[k] = v
        if self._fh:
            self._fh.write(json.dumps(rec) + "\n")
            self._fh.flush()
        if self._wandb is not None:
            self._wandb.log({k: v for k, v in rec.items() if k != "step"},
                            step=rec["step"])
        if self.stdout:
            parts = " ".join(
                f"{k}={v:.5g}" if isinstance(v, float) else f"{k}={v}"
                for k, v in rec.items() if k not in ("time",))
            print(f"[{rec['time']:9.1f}s] {parts}", file=sys.stderr)

    def close(self):
        if self._fh:
            self._fh.close()
