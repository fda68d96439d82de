"""The trainer: the capability-equivalent of pytorch-lightning's Trainer as
the reference uses it (``train.py:14-49``) plus the LightningModule loop logic
(``model.py:52-108``):

* epoch loop over length-bucketed batches (one compile per bucket shape),
  host->HBM prefetch, data-parallel mesh sharding;
* periodic validation: loss + batched greedy decode -> corpus WER/CER
  (``model.py:62-79,94-95``), logged alongside train loss and lr;
* top-k checkpoints by val_cer + resume (``train.py:31-37``);
* deterministic seeding (``train.py:17`` seed_everything equivalent).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.profiler
import numpy as np

from rnntransducer_tpu.config import Config
from rnntransducer_tpu.data import (
    DevicePrefetcher, LengthBucketSampler, collate, collate_waveforms,
)
from rnntransducer_tpu.decode import greedy_decode
from rnntransducer_tpu.parallel import (
    DATA_AXIS, MODEL_AXIS, make_mesh, shard_tree,
)
from rnntransducer_tpu.tokenizer import GraphemeTokenizer
from rnntransducer_tpu.train.checkpoint import CheckpointManager
from rnntransducer_tpu.train.metrics import error_counts
from rnntransducer_tpu.train.optim import make_optimizer
from rnntransducer_tpu.train.state import (
    TrainState, build_model, eval_step, learning_rate_at, train_step,
    watch_step,
)
from rnntransducer_tpu.utils.logging import MetricsLogger
from rnntransducer_tpu.utils.profiling import StepTimer


def _local_rows(arr) -> dict:
    """{global_row: numpy row} for every row of a (B, ...) device array held
    on THIS process's devices.  Works for row-sharded outputs (each global
    row appears on one process) and replicated ones (every process sees all
    rows — callers filter to the rows they own via the _pos marker)."""
    out = {}
    for s in arr.addressable_shards:
        start = 0
        if s.index and s.index[0].start is not None:
            start = int(s.index[0].start)
        data = np.asarray(s.data)
        for i in range(data.shape[0]):
            out.setdefault(start + i, data[i])
    return out


def _eval_frontend(cfg: Config, wav, wav_lengths):
    """On-device log-mel for raw-PCM eval batches — the SAME dispatch the
    train loss path uses (train/state.py device_frontend), so val metrics
    are computed on the features training saw."""
    from rnntransducer_tpu.train.state import device_frontend
    return device_frontend(cfg.data.audio, wav, wav_lengths)


class Trainer:
    def __init__(self, cfg: Config, train_dataset, val_dataset=None,
                 tokenizer: Optional[GraphemeTokenizer] = None,
                 log_dir: Optional[str] = None, mesh=None,
                 loss_backend: str = "auto",
                 profile_dir: Optional[str] = None,
                 profile_steps: tuple = (10, 15)):
        self.cfg = cfg
        self.train_ds = train_dataset
        self.val_ds = val_dataset
        self.tokenizer = tokenizer or (
            GraphemeTokenizer.from_file(cfg.vocab_path) if cfg.vocab_path
            else GraphemeTokenizer.default(cfg.model.jointnet.num_classes))
        self.mesh = mesh if mesh is not None else make_mesh(
            model_parallel=cfg.train.model_parallel,
            pipeline_stages=cfg.train.pipeline_stages,
            sequence_parallel=cfg.train.sequence_parallel)
        self.n_devices = len(self.mesh.devices.ravel())
        # batches shard over the data axis only (replicated over 'model')
        self.n_data_shards = (self.mesh.shape[DATA_AXIS]
                              if DATA_AXIS in self.mesh.axis_names
                              else self.n_devices)
        self.loss_backend = loss_backend
        self.logger = MetricsLogger(log_dir or cfg.train.checkpoint_dir)
        self.ckpt = CheckpointManager(cfg.train.checkpoint_dir,
                                      save_top_k=cfg.train.save_top_k)
        self.tx = make_optimizer(cfg.train)
        self.model = build_model(cfg)
        # replicated on a 1-D data mesh; vocab-sharded joint classifier (+
        # matching Adam moments) when the mesh carries a 'model' axis; Adam
        # moments ZeRO-1-split over 'data' when shard_optimizer_state (works
        # across processes too — TrainState.create is seed-deterministic so
        # every process holds the same host values, and orbax saves/restores
        # the process-spanning moment shards; validated by the real
        # 2-process run in tests/_multihost_worker.py)
        self.state = shard_tree(
            self.mesh, TrainState.create(cfg, tx=self.tx),
            shard_opt_over_data=cfg.train.shard_optimizer_state)
        # tracing/profiling subsystem (SURVEY.md §5): jax.profiler trace of
        # steps [profile_steps) written to profile_dir when set
        self.profile_dir = profile_dir
        self.profile_steps = profile_steps
        self.timer = StepTimer(warmup=2)
        # host-side step mirror (prefetch-thread-safe; see _host_batches)
        self._host_step = int(self.state.step)

    def _mesh_context(self):
        """jax.set_mesh over a tensor-parallel mesh (binds the loss's
        PartitionSpec constraints, train/state.py), over a pipeline/
        wavefront mesh (binds the pp/sp encoder's shard_map,
        train/state.py _parallel_encode), and over any mesh when the Adam
        moments are ZeRO-sharded (binds constrain_state's pins); no-op
        otherwise so the plain-DP trace is byte-identical to older
        rounds."""
        if (MODEL_AXIS in self.mesh.axis_names
                or self.cfg.train.pipeline_stages > 1
                or self.cfg.train.sequence_parallel > 1
                or self.cfg.train.shard_optimizer_state):
            return jax.set_mesh(self.mesh)
        import contextlib
        return contextlib.nullcontext()

    # ------------------------------------------------------------- batching
    def _global_batch(self) -> int:
        return (self.cfg.train.per_device_train_batch_size *
                self.n_data_shards *
                self.cfg.train.accumulate_grad_batches)

    def _label_bucket_for(self, max_label_len: int) -> int:
        """Smallest configured label bucket covering the batch (labels must
        never be silently truncated — that would corrupt supervision).
        Compiled shapes stay bounded: |audio_buckets| x |label_buckets|."""
        for lb in self.cfg.data.label_buckets:
            if max_label_len <= lb:
                return lb
        return self.cfg.data.label_buckets[-1]

    def _schedule_position(self, step: int):
        """Exact (epoch, batches_consumed_within_epoch) for a global step
        count. The sampler is seed+epoch deterministic (data/bucketing.py),
        so every epoch's batch list — and therefore its length — is
        reproducible index arithmetic (no IO): walking the cumulative
        counts locates the step precisely even though counts vary slightly
        across epochs (shuffle moves utterances between partial batches).
        Must construct the sampler EXACTLY like _host_batches does, or the
        counts (label-overlong drops!) diverge from the real schedule."""
        if step <= 0:
            return 0, 0
        label_lens = (self.train_ds.label_lengths()
                      if hasattr(self.train_ds, "label_lengths") else None)
        sampler = LengthBucketSampler(
            self.train_ds.lengths(), self.cfg.data.audio_buckets,
            self._global_batch(), seed=self.cfg.train.seed, shuffle=True,
            label_lengths=label_lens,
            max_label_length=self.cfg.data.label_buckets[-1])
        consumed, epoch = 0, 0
        while True:
            n = len(sampler.epoch_batches(epoch))
            if n == 0:
                # empty schedule (dataset empty / everything dropped): the
                # epoch loop will raise its no-batches error downstream
                return epoch, 0
            if consumed + n > step:
                return epoch, step - consumed
            consumed += n
            epoch += 1

    def _host_batches(self, dataset, epoch: int, batch_size: int,
                      shuffle: bool = True, with_counts: bool = False,
                      skip: int = 0):
        """Yields collated batches (runs inside the prefetch thread: must not
        touch self.state — its buffers are donated on the main thread).

        ``skip`` drops the first N batches of the epoch's deterministic
        schedule — the resume fast-forward: a run preempted mid-epoch
        already consumed those batches, so replaying them would train them
        twice (and push the epoch tail past max_steps).

        Multi-host: every process computes the IDENTICAL global batch
        sequence (same seed, no rank striding — all processes must dispatch
        the same bucket shapes in lockstep), then collates only its
        process-local slice of each batch; the prefetcher assembles the
        global array from the per-process shards."""
        pi, pc = jax.process_index(), jax.process_count()
        label_lens = (dataset.label_lengths()
                      if hasattr(dataset, "label_lengths") else None)
        sampler = LengthBucketSampler(
            dataset.lengths(), self.cfg.data.audio_buckets, batch_size,
            seed=self.cfg.train.seed, shuffle=shuffle,
            label_lengths=label_lens,
            max_label_length=self.cfg.data.label_buckets[-1])
        batches = sampler.epoch_batches(epoch)[skip:]
        step = self._host_step  # plain-int snapshot, thread-safe to read
        if sampler.last_dropped:
            self.logger.log(step, event="overlong_dropped",
                            count=sampler.last_dropped,
                            max_frames=self.cfg.data.audio_buckets[-1])
        if sampler.last_label_dropped:
            self.logger.log(step, event="overlong_label_dropped",
                            count=sampler.last_label_dropped,
                            max_labels=self.cfg.data.label_buckets[-1])
        # batched row fetch when the dataset supports it (one Arrow take +
        # numpy conversion per batch instead of B python row reads — ~7x
        # cheaper host CPU on this image's single core; see docs/TUNING.md)
        get_batch = getattr(dataset, "get_batch", None)

        def fetch_thunk(idxs):
            local = idxs[pi::pc] if pc > 1 else idxs
            if get_batch is not None:
                return lambda: get_batch(local)
            return lambda: [dataset[i] for i in local]

        # shard-parallel feed: upcoming batches' Arrow fetches overlap on
        # reader threads (cold mmap page faults are IO waits, not CPU);
        # results arrive strictly in schedule order, so bucketing, the
        # collate below, and mid-epoch resume skip counts are unchanged
        from rnntransducer_tpu.data.prefetch import ordered_readahead
        fetched = ordered_readahead(
            (fetch_thunk(idxs) for _, idxs, _ in batches),
            workers=self.cfg.train.feed_reader_threads,
            depth=self.cfg.train.feed_read_ahead)
        for (b_idx, idxs, n_valid), items in zip(batches, fetched):
            # label bucket must come from the FULL batch so every process
            # picks the same static shape (local max would diverge)
            if label_lens is not None:
                max_u = int(max(label_lens[i] for i in idxs))
            else:
                max_u = max(len(it["labels"]) for it in items)
            label_bucket = self._label_bucket_for(max_u)
            if max_u > label_bucket:
                # reachable only when the dataset exposes no label_lengths()
                # (the sampler could not pre-filter) — refuse to cut
                # supervision; the user must widen label_buckets or expose
                # label lengths so overlong utterances are dropped whole
                raise ValueError(
                    f"batch max label length {max_u} exceeds the largest "
                    f"label bucket {label_bucket}; truncating labels would "
                    "corrupt supervision. Widen cfg.data.label_buckets or "
                    "give the dataset a label_lengths() method so overlong "
                    "utterances are dropped (like overlong audio).")
            if "wav" in items[0]:
                # raw-PCM path: collate waveforms; log-mel (+SpecAugment) runs
                # on-device inside the step (train/state.py loss_fn). Sample
                # bucket = largest S with num_frames(S) <= frame bucket
                # (= frames_b*hop - 1, since num_frames = S//hop + 1), so
                # frame buckets and wav buckets compile to the same shapes
                # and no utterance admitted to the bucket loses samples.
                frames_b = self.cfg.data.audio_buckets[b_idx]
                hop = self.cfg.data.audio.hop_length
                batch = collate_waveforms(
                    items, max_samples=frames_b * hop - 1,
                    max_labels=label_bucket,
                    pad_id=self.cfg.data.text.pad_token_id,
                    transfer_dtype=self.cfg.train.wav_transfer_dtype)
            else:
                batch = collate(items,
                                max_frames=self.cfg.data.audio_buckets[b_idx],
                                max_labels=label_bucket,
                                pad_id=self.cfg.data.text.pad_token_id)
            yield (batch, n_valid) if with_counts else batch

    # ----------------------------------------------------------------- fit
    def fit(self, resume: bool = False) -> TrainState:
        with self._mesh_context():
            return self._fit(resume)

    def _fit(self, resume: bool = False) -> TrainState:
        cfg = self.cfg
        if resume and self.ckpt.latest_step() is not None:
            self.state = self.ckpt.restore(self.state)
            self.logger.log(int(self.state.step), event="resumed")

        # host-side step counter: state.step increments by exactly 1 per
        # train_step, and reading int(self.state.step) every iteration would
        # force a device sync, defeating async dispatch + prefetch overlap
        step = int(self.state.step)
        self._host_step = step
        # resumed runs continue the data schedule EXACTLY: walk the
        # deterministic per-epoch batch counts to the (epoch, offset) this
        # step count sits at, then fast-forward past the batches the
        # preempted run already consumed. Replaying an epoch from index 0
        # (the pre-round-4 behavior) trained its head twice and pushed its
        # tail past max_steps — exact-once consumption is asserted by
        # tests/test_trainer_loop.py::test_resume_consumes_each_batch_once.
        epoch, skip = self._schedule_position(step)
        profiling = False
        import time as _time
        last_log_t, last_log_step = _time.perf_counter(), step
        self._install_preemption_handler()
        while step < cfg.train.max_steps and not self._preempted:
            batches = DevicePrefetcher(
                self._host_batches(self.train_ds, epoch, self._global_batch(),
                                   skip=skip),
                mesh=self.mesh)
            skip = 0  # only the resume epoch fast-forwards
            made_progress = False
            for batch in batches:
                if step >= cfg.train.max_steps or self._preempted:
                    # abandoning the iterator early: release the worker and
                    # its queued device batches (HBM) before val/save run
                    batches.close()
                    break
                made_progress = True
                if (self.profile_dir and not profiling
                        and step >= self.profile_steps[0]
                        and step < self.profile_steps[1]):
                    jax.profiler.start_trace(self.profile_dir)
                    profiling = True
                if (cfg.train.watch_every_steps
                        and step % cfg.train.watch_every_steps == 0):
                    # before train_step: its buffers are donated
                    hists = watch_step(
                        cfg, self.state.params, batch,
                        jax.random.fold_in(self.state.rng, self.state.step),
                        loss_backend=self.loss_backend)
                    self.logger.log_histograms(step, jax.device_get(hists))
                self.state, metrics = train_step(
                    cfg, self.tx, self.state, batch,
                    loss_backend=self.loss_backend)
                step += 1
                self._host_step = step
                if step % cfg.train.log_every_steps == 0 or step == 1:
                    # steps run async; the loss fetch below syncs the queue,
                    # so per-step time = wall time since the last log divided
                    # by the steps in between (a per-step sync would serialize
                    # dispatch against the input pipeline)
                    loss = float(metrics["loss"])
                    now = _time.perf_counter()
                    step_ms = (now - last_log_t) / max(step - last_log_step, 1)
                    last_log_t, last_log_step = now, step
                    extra = {}
                    if int(metrics.get("nonfinite_grad", 0)):
                        extra["nonfinite_grad"] = 1
                    self.logger.log(step, split="train", loss=loss,
                                    grad_norm=float(metrics["grad_norm"]),
                                    lr=learning_rate_at(cfg, step),
                                    step_ms=round(step_ms * 1e3, 1),
                                    epoch=epoch, **extra)
                if profiling and step >= self.profile_steps[1]:
                    jax.profiler.stop_trace()
                    profiling = False
                    self.logger.log(step, event="profile_written",
                                    dir=self.profile_dir)
                if self.val_ds is not None and step % cfg.train.val_every_steps == 0:
                    val = self.validate()
                    # async: the commit + top-k bookkeeping overlap with the
                    # next training steps (state is host-copied before save
                    # returns, so donation of the device buffers is safe)
                    self.ckpt.save(step, self.state, metrics=val, config=cfg,
                                   wait=False)
            if not made_progress and not self._preempted:
                raise RuntimeError(
                    "training epoch produced no batches — dataset empty or "
                    "every utterance exceeds the largest audio bucket "
                    f"({cfg.data.audio_buckets[-1]} frames)")
            epoch += 1
        if profiling:
            jax.profiler.stop_trace()
        if self._preempted:
            self.logger.log(step, event="preempted",
                            signal=self._preempted)
        # final save — unless this exact step was already checkpointed by the
        # in-loop validation branch. On preemption skip validation: the save
        # must beat the supervisor's kill grace period; fit(resume=True)
        # continues from here.
        if self.ckpt.latest_step() != step:
            val = ({} if self._preempted else
                   self.validate() if self.val_ds is not None else {})
            self.ckpt.save(step, self.state, metrics=val, config=cfg)
        self.ckpt.wait()  # drain any in-flight async save before returning
        self._remove_preemption_handler()
        return self.state

    # ------------------------------------------------- preemption handling
    # SIGTERM (the preemption notice of every scheduler: k8s, borg, GKE spot
    # VMs) checkpoints the current step and exits fit() cleanly instead of
    # dying mid-epoch — the TPU-native analogue of the reference's only
    # resilience mechanism (a 30-day DDP timeout, train.py:45). The handler
    # sets a flag; the step loop is the only interruption point, so the
    # saved state is always a consistent (params, opt_state, step) triple.
    def _install_preemption_handler(self):
        import signal
        import threading

        self._preempted = None
        self._prev_handlers = {}
        if threading.current_thread() is not threading.main_thread():
            return  # signals only reach the main thread; tests call direct

        def handler(signum, frame):
            self._preempted = signal.Signals(signum).name

        for sig in (signal.SIGTERM,):
            try:
                self._prev_handlers[sig] = signal.signal(sig, handler)
            except (ValueError, OSError):
                pass

    def _remove_preemption_handler(self):
        import signal

        for sig, prev in getattr(self, "_prev_handlers", {}).items():
            try:
                signal.signal(sig, prev)
            except (ValueError, OSError):
                pass
        self._prev_handlers = {}

    # ------------------------------------------------------------ evaluate
    def test(self, datasets: dict, max_batches: Optional[int] = None) -> dict:
        """Evaluate named test sets (the reference's eval_clean/eval_other
        test_dataloader pair, datamodule.py:222-243). Returns
        {name: {loss, wer, cer}} and logs each."""
        results = {}
        for name, ds in datasets.items():
            out = self._evaluate(ds, max_batches)
            results[name] = out
            self.logger.log(self._host_step, split=f"test/{name}", **out)
        return results

    def validate(self, max_batches: Optional[int] = None) -> dict:
        out = self._evaluate(self.val_ds, max_batches)
        out = {"val_loss": out["loss"], "val_wer": out["wer"],
               "val_cer": out["cer"]}
        self.logger.log(self._host_step, split="val", **out)
        return out

    def _evaluate(self, dataset, max_batches: Optional[int] = None) -> dict:
        with self._mesh_context():
            return self._evaluate_inner(dataset, max_batches)

    def _evaluate_inner(self, dataset,
                        max_batches: Optional[int] = None) -> dict:
        cfg = self.cfg
        pi, pc = jax.process_index(), jax.process_count()
        loss_sum, loss_n = 0.0, 0
        preds, refs = [], []  # this process's utterances only
        n = 0
        for batch, n_valid in self._host_batches(
                dataset, epoch=0,
                batch_size=(cfg.train.per_device_eval_batch_size *
                            self.n_data_shards),
                shuffle=False, with_counts=True):
            # shard over the data mesh like training (unsharded device_put
            # would replicate the whole eval batch on every device).  The
            # host batch holds only this process's rows (the strided local
            # slice); a _pos marker rides through the same placement so each
            # locally-held GLOBAL row maps back to its collation position —
            # exact whatever device order or output sharding XLA picks.
            from rnntransducer_tpu.parallel import shard_batch
            n_local = len(batch["target_lengths"])
            batch_dev = shard_batch(self.mesh, dict(
                batch, _pos=np.asarray(pi + np.arange(n_local) * pc,
                                       np.int32)))
            pos_rows = _local_rows(batch_dev.pop("_pos"))
            # owned = rows this process collated, excluding the wrap-padding
            # duplicates the static batch shape requires
            owned = {g: int(p) // pc for g, p in pos_rows.items()
                     if int(p) % pc == pi and int(p) < n_valid}
            if "feats" not in batch_dev:
                # raw-PCM eval: run the on-device frontend once, decode from
                # the resulting features (no SpecAugment at eval)
                from rnntransducer_tpu.train.state import dequantize_wav
                feats, feat_lengths = _eval_frontend(
                    cfg, dequantize_wav(batch_dev), batch_dev["wav_lengths"])
                batch_dev = dict(batch_dev, feats=feats,
                                 feat_lengths=feat_lengths)
            # per-sample losses so the padding duplicates don't bias metrics
            per_sample = _local_rows(eval_step(
                cfg, self.state.params, batch_dev,
                loss_backend=self.loss_backend, reduction="none"))
            for g in owned:
                loss_sum += float(per_sample[g])
                loss_n += 1
            if cfg.train.val_decoder == "beam":
                from rnntransducer_tpu.decode import batched_beam_decode
                toks, lens, _ = batched_beam_decode(
                    self.model, {"params": self.state.params},
                    batch_dev["feats"], batch_dev["feat_lengths"],
                    blank_id=cfg.data.text.pad_token_id,
                    beam_width=cfg.train.val_beam_width,
                    max_symbols=cfg.train.greedy_max_symbols,
                    max_output_len=max(cfg.data.label_buckets))
                toks = {g: r[0] for g, r in _local_rows(toks).items()}
                lens = {g: r[0] for g, r in _local_rows(lens).items()}
            else:
                toks, lens = greedy_decode(
                    self.model, {"params": self.state.params},
                    batch_dev["feats"], batch_dev["feat_lengths"],
                    blank_id=cfg.data.text.pad_token_id,
                    max_symbols=cfg.train.greedy_max_symbols,
                    max_output_len=max(cfg.data.label_buckets))
                toks, lens = _local_rows(toks), _local_rows(lens)
            for g, j in owned.items():
                k = int(lens[g])
                preds.append(self.tokenizer.decode(toks[g][:k],
                                                   group_tokens=False))
                u = int(batch["target_lengths"][j])
                refs.append(self.tokenizer.decode(batch["targets"][j, :u],
                                                  group_tokens=False))
            n += 1
            if max_batches is not None and n >= max_batches:
                break
        # corpus-level reduction: sum sufficient statistics over processes
        we, wt, ce, ct = error_counts(preds, refs)
        stats = np.asarray([loss_sum, loss_n, we, wt, ce, ct], np.float64)
        if pc > 1:
            from jax.experimental import multihost_utils
            stats = np.asarray(
                multihost_utils.process_allgather(stats)).sum(axis=0)
        return {
            "loss": (float(stats[0] / stats[1]) if stats[1]
                     else float("nan")),
            "wer": float(stats[2] / max(stats[3], 1)),
            "cer": float(stats[4] / max(stats[5], 1)),
        }
