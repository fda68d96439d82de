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
        # multi-host: metrics are identical on every process (losses psum,
        # eval stats allgathered), and log_dir is a shared FS by the same
        # assumption checkpointing makes — so only process 0 writes the
        # jsonl / wandb mirror, or every record lands N times, interleaved.
        # stdout keeps printing everywhere (per-process logs are per-file).
        primary = True
        try:
            import jax
            primary = jax.process_index() == 0
        except Exception:
            pass
        self.stdout = stdout
        self._fh = None
        self._hist_fh = None
        self._log_dir = log_dir if primary else None
        if self._log_dir:
            os.makedirs(self._log_dir, exist_ok=True)
            self._fh = open(os.path.join(self._log_dir, f"{name}.jsonl"),
                            "a")
        self._t0 = time.time()
        # optional W&B mirror (the reference's WandbLogger, train.py:15);
        # gated: wandb isn't a dependency of this framework
        self._wandb = None
        if wandb_project and primary:
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

    def log_histograms(self, step: int, hists: dict):
        """Param/grad histograms from ``train.state.watch_step`` — the
        wandb.watch(model, log="all") equivalent (reference train.py:27).
        Written to ``histograms.jsonl`` (kept out of metrics.jsonl: records
        are O(tensors x bins)); mirrored to W&B as native histograms."""
        rec = {"step": int(step)}
        for group, tensors in hists.items():  # "params" / "grads"
            rec[group] = {
                name: {"counts": [int(c) for c in counts],
                       "edges": [float(e) for e in edges]}
                for name, (counts, edges) in tensors.items()}
        if self._hist_fh is None and self._log_dir:
            self._hist_fh = open(
                os.path.join(self._log_dir, "histograms.jsonl"), "a")
        if self._hist_fh:
            self._hist_fh.write(json.dumps(rec) + "\n")
            self._hist_fh.flush()
        if self._wandb is not None:
            self._wandb.log(
                {f"{group}/{name}": self._wandb.Histogram(
                    np_histogram=(h["counts"], h["edges"]))
                 for group in ("params", "grads")
                 for name, h in rec.get(group, {}).items()},
                step=rec["step"])

    def close(self):
        if self._fh:
            self._fh.close()
        if self._hist_fh:
            self._hist_fh.close()
