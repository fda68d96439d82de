"""Checkpointing: save/restore params + optimizer state + step, with
top-k retention by validation CER PLUS the latest checkpoint.

Capability-equivalent of the reference's Lightning ModelCheckpoint
(``train.py:31-37``: ``save_top_k=3, mode="min", monitor="val_cer"``) and
``load_from_checkpoint`` restore (``inference.py:19-25``), built on Orbax.
One restore API serves both train-resume and inference.

Retention is managed here, not by orbax's ``best_fn`` pruning: pure
top-k-by-metric would delete the LATEST checkpoint whenever it is not among
the best, silently losing training progress on resume (and evicting the
explicit end-of-fit save). We always keep {top-k by metric} UNION {latest},
with metrics recorded in a JSON ledger.
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
        self.save_top_k = save_top_k
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=None))
        # (step, metrics) of async saves whose commit + retention bookkeeping
        # is still outstanding (at most one: save() drains before dispatching)
        self._pending: list = []

    # -- metrics ledger --------------------------------------------------
    def _ledger_path(self) -> str:
        return os.path.join(self.directory, "checkpoint_metrics.json")

    def _read_ledger(self) -> dict:
        try:
            with open(self._ledger_path()) as f:
                return {int(k): v for k, v in json.load(f).items()}
        except (FileNotFoundError, json.JSONDecodeError):
            return {}

    def _write_ledger(self, ledger: dict) -> None:
        os.makedirs(self.directory, exist_ok=True)
        # atomic replace: a crash (or another reader) mid-write must never
        # observe a truncated ledger (read_ledger would silently reset it)
        tmp = f"{self._ledger_path()}.tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump({str(k): v for k, v in ledger.items()}, f, indent=1)
        os.replace(tmp, self._ledger_path())

    def _retained(self, ledger: dict, current: int) -> set:
        """Steps to keep: top-k by metric + the latest + the just-saved step
        (which may be LOWER than an existing step after restoring from best
        and fine-tuning — it must survive its own save call)."""
        steps = sorted(ledger)
        if not steps:
            return set()
        with_metric = [s for s in steps if self.monitor in ledger[s]]
        best = sorted(with_metric,
                      key=lambda s: ledger[s][self.monitor])[:self.save_top_k]
        return set(best) | {steps[-1], int(current)}

    # -- public API -------------------------------------------------------
    def save(self, step: int, state: Any, metrics: Optional[dict] = None,
             config: Optional[Config] = None, wait: bool = True):
        """Save a checkpoint.

        ``wait=False`` returns as soon as the state is copied off-device
        (orbax's async contract: device buffers are safe to donate/mutate
        after ``save()`` returns) and defers the commit wait plus retention
        bookkeeping (ledger write, top-k pruning) to the next save / an
        explicit ``wait()`` / ``close()`` — overlapping the serialization and
        filesystem write with further training steps. Crash consistency: the
        ledger is only written after the commit, so it never names a step
        that is not durable on disk."""
        self.wait()  # at most one async save in flight
        if config is not None:
            os.makedirs(self.directory, exist_ok=True)
            cfg_path = os.path.join(self.directory, "config.json")
            if not os.path.exists(cfg_path):
                config.to_json(cfg_path)
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        self._pending.append((int(step), metrics or {}))
        if wait:
            self.wait()

    def wait(self):
        """Block until any in-flight async save is durable, then run its
        deferred retention bookkeeping. No-op when nothing is pending."""
        if not self._pending:
            return
        self._mgr.wait_until_finished()
        pending, self._pending = self._pending, []
        import jax

        # EVERY process must run the delete loop: orbax's delete() ends in a
        # multihost sync_global_processes barrier, so a process-0-only call
        # would leave the other processes' coordination service waiting on a
        # barrier they never join.  The pruning decision is deterministic
        # across processes — the ledger file is read after the
        # wait_until_finished() global sync (which orders it after process
        # 0's previous atomic write), and val metrics are allgathered, so
        # every process computes the same `keep` set.  Only process 0
        # mutates the ledger file (shared FS).
        ledger = self._read_ledger()
        for step, metrics in pending:
            ledger[int(step)] = {k: float(v) for k, v in metrics.items()}
        keep = self._retained(ledger, pending[-1][0])
        for s in list(ledger):
            if s not in keep:
                try:
                    self._mgr.delete(s)
                except FileNotFoundError:
                    pass  # files already gone (crash between a past delete
                    # and its ledger write): dropping the entry IS the retry
                except Exception:
                    continue  # transient FS error: keep the entry, retry
                del ledger[s]
        if jax.process_index() == 0:
            self._write_ledger(ledger)

    def restore(self, state_template: Any, step: Optional[int] = None) -> Any:
        self.wait()  # an in-flight save may be the step being restored
        step = step if step is not None else self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        # Abstract templates (jax.eval_shape — the inference/serve restore
        # path) carry no sharding, and orbax then refuses to deserialize when
        # the current device topology differs from save time (train on an
        # N-device mesh -> infer on one device).  Attach a concrete
        # single-device sharding so restore is topology-independent; concrete
        # templates (the Trainer's live state) keep their own shardings.
        import jax

        dev = jax.devices()[0]
        one = jax.sharding.SingleDeviceSharding(dev)

        def _concrete(x):
            if isinstance(x, jax.ShapeDtypeStruct) and x.sharding is None:
                return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=one)
            return x

        state_template = jax.tree.map(_concrete, state_template)
        return self._mgr.restore(step,
                                 args=ocp.args.StandardRestore(state_template))

    def best_step(self) -> Optional[int]:
        self.wait()  # a pending save's metrics may win
        ledger = self._read_ledger()
        with_metric = [s for s in ledger if self.monitor in ledger[s]]
        if not with_metric:
            return None
        return min(with_metric, key=lambda s: ledger[s][self.monitor])

    def best_or_latest_step(self) -> Optional[int]:
        """Best-by-metric step, else latest (step 0 is a valid best — never
        use `best_step() or latest_step()`, which drops a falsy 0)."""
        best = self.best_step()
        return best if best is not None else self.latest_step()

    def latest_step(self) -> Optional[int]:
        latest = self._mgr.latest_step()
        if self._pending:  # in-flight async saves count as existing
            newest = max(s for s, _ in self._pending)
            latest = newest if latest is None else max(latest, newest)
        return latest

    def close(self):
        self.wait()
        self._mgr.close()


def load_config(checkpoint_dir: str) -> Config:
    with open(os.path.join(os.path.abspath(checkpoint_dir), "config.json")) as f:
        return Config.from_dict(json.load(f))


def average_checkpoint_params(checkpoint_dir: str, state_template: Any,
                              steps: Optional[list] = None,
                              k: Optional[int] = None,
                              monitor: str = "val_cer"):
    """Stochastic-weight-style checkpoint averaging: the element-wise mean of
    the PARAMS of several retained checkpoints (optimizer state/step are not
    averaged — the result is an inference artifact, not a resume point).

    A standard production-ASR accuracy lever the reference lacks (its
    ModelCheckpoint keeps top-3 by val_cer, ``/root/reference/train.py:31-37``,
    but offers no way to combine them); averaging the last/best few
    checkpoints typically recovers a few relative percent of WER for free.

    ``steps``: explicit checkpoint steps to average; or ``k``: the best k by
    ``monitor`` from the retention ledger (falling back to the k most recent
    steps when no metrics were recorded).  Returns ``(params, used_steps)``.
    Averaging accumulates in fp32 regardless of the stored dtype and casts
    back, so bf16-trained checkpoints don't lose the mean to rounding.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    if k is not None and k < 1:
        raise ValueError(f"average_k must be >= 1, got {k}")
    mgr = CheckpointManager(checkpoint_dir, monitor=monitor)
    try:
        if steps is None:
            n = k if k is not None else 3
            ledger = mgr._read_ledger()
            with_metric = sorted((s for s in ledger if monitor in ledger[s]),
                                 key=lambda s: ledger[s][monitor])
            steps = with_metric[:n]
            if not steps:  # no metrics recorded: most recent n
                steps = sorted(mgr._mgr.all_steps())[-n:]
        if not steps:
            raise FileNotFoundError(f"no checkpoints in {checkpoint_dir}")
        steps = sorted(set(int(s) for s in steps))

        def _f32(x):
            # np.array COPIES: np.asarray of a jax CPU array can be a
            # zero-copy view whose device buffer dies with the jax array
            if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating):
                return np.array(x, dtype=np.float32)
            return np.array(x)

        acc = None
        dtypes = None
        for s in steps:
            params = mgr.restore(state_template, step=s).params
            p32 = jax.tree.map(_f32, params)
            if acc is None:
                acc = p32
                dtypes = jax.tree.map(lambda x: x.dtype, params)
            else:
                # only float leaves accumulate; integer/bool leaves (index
                # buffers etc.) pass the FIRST checkpoint's value through —
                # summing them k times would silently corrupt the result
                acc = jax.tree.map(
                    lambda a, x: np.add(a, x) if a.dtype.kind == "f" else a,
                    acc, p32)
        inv = 1.0 / len(steps)

        def _finish(a, dt):
            if jnp.issubdtype(dt, jnp.floating):
                return jnp.asarray(a * inv, dtype=dt)
            return jnp.asarray(a)  # non-float: first checkpoint's value

        return jax.tree.map(_finish, acc, dtypes), steps
    finally:
        mgr.close()


def load_decode_params(checkpoint_dir: str, cfg: Config, *,
                       step: Optional[int] = None,
                       average_k: Optional[int] = None,
                       use_ema: bool = False):
    """Resolve the params a decode entry point should run with — the single
    policy shared by ``inference.py`` and ``evaluate.py`` (the reference's
    ``load_from_checkpoint`` at ``/root/reference/inference.py:19-25``, plus
    this framework's averaging/EMA inference artifacts).

    Exactly one of the selection modes applies: an explicit ``step``, the
    best-k SWA-style average (``average_k``), or the default
    best-by-val_cer-else-latest single checkpoint; ``use_ema`` swaps in the
    Polyak shadow params of the selected checkpoint.  Restores through an
    abstract ``eval_shape`` template so nothing is initialized just to be
    overwritten.  Returns ``(params, description)`` where ``description``
    says which artifact was picked (for logs/reports).
    """
    import jax

    from rnntransducer_tpu.train.state import TrainState

    template = jax.eval_shape(lambda: TrainState.create(cfg))
    if average_k is not None:
        if step is not None:
            raise ValueError("pass either step or average_k, not both")
        if use_ema:
            raise ValueError("pass either use_ema or average_k, not both")
        params, used = average_checkpoint_params(checkpoint_dir, template,
                                                 k=average_k)
        return params, f"average of steps {used}"
    mgr = CheckpointManager(checkpoint_dir, save_top_k=cfg.train.save_top_k)
    try:
        if step is None:
            step = mgr.best_or_latest_step()
        state = mgr.restore(template, step=step)
    finally:
        mgr.close()
    if use_ema:
        if state.ema_params is None:
            raise ValueError(
                "use_ema: this checkpoint holds no EMA shadow (the run "
                "trained with train.ema_decay == 0)")
        return state.ema_params, f"step {step} (EMA shadow)"
    return state.params, f"step {step}"
