"""Sustained flagship Trainer soak (round-2 verdict item 2).

Drives the REAL ``train/loop.py`` Trainer — bucketing, prefetch thread,
logging, periodic val, checkpointing — on the raw-PCM path (on-device
log-mel + SpecAugment) for ``--steps`` steps, SIGTERMs itself mid-run to
exercise the preemption checkpoint, relaunches, resumes, and reports:

  sustained utt/s, step_ms p50/p99 (steady-state), loss continuity across
  the resume, and the host-pipeline share (sustained vs bench.py's
  device-resident-batch microbenchmark).

Run on the real chip:   python experiments/trainer_soak.py --steps 1000
Harness check on CPU:   python experiments/trainer_soak.py --tiny

The driver process forks a child (the actual training run) so the SIGTERM
lands on a real separate process, exactly like a preemption notice.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run_child(args):
    """The actual training run (one process per launch, resume via orbax)."""
    import jax

    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    import rnntransducer_tpu as rt
    from rnntransducer_tpu.config import AudioConfig, TrainConfig
    from rnntransducer_tpu.data import ArrowWaveformDataset, SyntheticAudioDataset
    from rnntransducer_tpu.train import Trainer

    if args.tiny:
        cfg = rt.tiny_config()
        audio = AudioConfig(spec_augment=False)
        cfg = dataclasses.replace(
            cfg, data=dataclasses.replace(cfg.data, audio=audio,
                                          audio_buckets=(64, 128),
                                          label_buckets=(16,)))
        train = TrainConfig(
            max_steps=args.steps, per_device_train_batch_size=2,
            precision="fp32", log_every_steps=1,
            val_every_steps=max(args.steps // 2, 1),
            checkpoint_dir=args.ckpt_dir)
        ds = SyntheticAudioDataset(64, audio, min_sec=0.3, max_sec=0.6,
                                   min_labels=3, max_labels=6, seed=0,
                                   as_waveform=True)
        val = SyntheticAudioDataset(8, audio, min_sec=0.3, max_sec=0.6,
                                    min_labels=3, max_labels=6, seed=1,
                                    as_waveform=True)
    else:
        cfg = rt.base_config()
        audio = cfg.data.audio  # flagship audio config incl. SpecAugment
        cfg = dataclasses.replace(
            cfg, data=dataclasses.replace(cfg.data,
                                          audio_buckets=(512,),
                                          label_buckets=(48,)))
        train = TrainConfig(
            max_steps=args.steps, per_device_train_batch_size=64,
            precision="bf16", log_every_steps=10,
            val_every_steps=args.steps // 2,
            checkpoint_dir=args.ckpt_dir,
            # ship raw PCM as peak-scaled int16 + per-utterance scale —
            # half the host->device bytes (data/collate.py)
            wav_transfer_dtype="int16",
            # round-5 shard-parallel feed (data/prefetch.ordered_readahead):
            # overlaps cold Arrow page-fault waits — the measured 100k-scale
            # feed ceiling (BASELINE.md); 1 = the serial pre-round-5 feed
            feed_reader_threads=args.feed_readers)
        # ~5.1 s utterances, ~48 graphemes: the bench.py flagship shape.
        # The corpus is materialized ONCE to Arrow shards (the parent does
        # it before launch 1) and read back through ArrowWaveformDataset —
        # the framework's real ingestion path (batched Arrow takes), not
        # per-step numpy synthesis. Log-mel + SpecAugment run on-device
        # inside the step (the raw-PCM path).
        ds = ArrowWaveformDataset([args.corpus_dir], "train", audio)
        val = ArrowWaveformDataset([args.corpus_dir], "val", audio)
    cfg = dataclasses.replace(cfg, train=train)
    trainer = Trainer(cfg, ds, val_dataset=val, log_dir=args.ckpt_dir)
    # resume=True: launch 1 starts fresh (no checkpoint yet); launch 2 must
    # restore the preemption checkpoint.  Without this, launch 2 silently
    # replays from step 1 and — with a deterministic data schedule — produces
    # bit-identical losses, so the continuity check would pass vacuously.
    trainer.fit(resume=True)
    trainer.ckpt.close()


def prepare_corpus(args):
    """Materialize the synthetic flagship corpus to Arrow shards once
    (idempotent via _SUCCESS markers) so the soak trains through the real
    ingestion path: Arrow batched reads -> native collate -> device."""
    from rnntransducer_tpu.config import AudioConfig
    from rnntransducer_tpu.data import SyntheticAudioDataset, save_waveform_dataset
    import rnntransducer_tpu as rt

    audio = rt.base_config().data.audio
    ds = SyntheticAudioDataset(args.utts, audio, min_sec=4.9, max_sec=5.1,
                               min_labels=40, max_labels=47, seed=0,
                               as_waveform=True)
    val = SyntheticAudioDataset(128, audio, min_sec=4.9, max_sec=5.1,
                                min_labels=40, max_labels=47, seed=1,
                                as_waveform=True)
    # total= streams shard-by-shard: the 100k corpus is ~33 GB of PCM
    save_waveform_dataset((ds[i] for i in range(len(ds))), args.corpus_dir,
                          "train", hop_length=audio.hop_length,
                          num_shards=args.shards, total=len(ds))
    save_waveform_dataset((val[i] for i in range(len(val))), args.corpus_dir,
                          "val", hop_length=audio.hop_length, num_shards=1,
                          total=len(val))


def parse_metrics(log_dir):
    rows = []
    path = os.path.join(log_dir, "metrics.jsonl")
    with open(path) as f:
        for line in f:
            try:
                rows.append(json.loads(line))
            except json.JSONDecodeError:
                pass
    return [r for r in rows if r.get("split") == "train"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--ckpt_dir", default="/tmp/soak_ckpt")
    ap.add_argument("--corpus_dir", default="/tmp/soak_corpus_flagship")
    ap.add_argument("--child", action="store_true")
    ap.add_argument("--sigterm_after_frac", type=float, default=0.35,
                    help="SIGTERM the first launch after this fraction of "
                         "steps have logged")
    ap.add_argument("--utts", type=int, default=4096,
                    help="training corpus size (utterances); the round-4 "
                         "10x soak uses --utts 100000 --steps 10000 "
                         "(~33 GB of PCM, streamed to 20 Arrow shards; "
                         "B=64 -> ~1562 steps/epoch -> ~6 epoch "
                         "boundaries over the run)")
    ap.add_argument("--shards", type=int, default=8)
    ap.add_argument("--feed_readers", type=int, default=2)
    args = ap.parse_args()
    if args.tiny and args.steps == 1000:
        args.steps = 8

    if args.child:
        run_child(args)
        return

    import shutil
    shutil.rmtree(args.ckpt_dir, ignore_errors=True)
    os.makedirs(args.ckpt_dir, exist_ok=True)
    if not args.tiny:
        prepare_corpus(args)  # untimed: the soak measures training, not prep

    base_cmd = [sys.executable, os.path.abspath(__file__),
                "--child", "--steps", str(args.steps),
                "--ckpt_dir", args.ckpt_dir,
                "--corpus_dir", args.corpus_dir] + \
        (["--tiny"] if args.tiny else [])

    def child_rss_mb(pid):
        try:
            with open(f"/proc/{pid}/statm") as f:
                return int(f.read().split()[1]) * os.sysconf("SC_PAGE_SIZE") \
                    / 2**20
        except (OSError, IndexError, ValueError):
            return None

    rss_samples = []  # (logged_step, rss_mb) of whichever child is alive

    # ---- launch 1: run until ~sigterm_after_frac, then SIGTERM ----------
    t0 = time.time()
    child = subprocess.Popen(base_cmd, cwd=REPO)
    target = max(2, int(args.steps * args.sigterm_after_frac))
    while child.poll() is None:
        time.sleep(2)
        try:
            rows = parse_metrics(args.ckpt_dir)
        except OSError:
            rows = []
        r = child_rss_mb(child.pid)
        if r and rows:
            rss_samples.append((rows[-1].get("step", 0), r))
        if rows and rows[-1].get("step", 0) >= target:
            print(f"[soak] SIGTERM at step {rows[-1]['step']}", flush=True)
            child.send_signal(signal.SIGTERM)
            break
    rc1 = child.wait()
    rows1 = parse_metrics(args.ckpt_dir)
    last1 = rows1[-1] if rows1 else {}
    print(f"[soak] launch 1 exited rc={rc1} at step {last1.get('step')}",
          flush=True)

    # ---- launch 2: resume to completion ---------------------------------
    child = subprocess.Popen(base_cmd, cwd=REPO)
    while child.poll() is None:
        time.sleep(5)
        r = child_rss_mb(child.pid)
        if r:
            try:
                rows = parse_metrics(args.ckpt_dir)
                rss_samples.append((rows[-1].get("step", 0) if rows else 0, r))
            except OSError:
                pass
    rc2 = child.wait()
    wall = time.time() - t0
    rows = parse_metrics(args.ckpt_dir)
    print(f"[soak] launch 2 exited rc={rc2}; total wall {wall:.0f}s", flush=True)
    assert rc2 == 0, "resume run failed"

    # ---- report ---------------------------------------------------------
    steps = [r["step"] for r in rows]
    assert max(steps) >= args.steps, (max(steps), args.steps)
    # A resumed launch must CONTINUE the step counter.  A step regression in
    # file order means launch 2 replayed from scratch instead of restoring
    # (deterministic data schedule -> bit-identical losses, so the loss
    # continuity fields alone cannot catch that failure).
    for a, b in zip(rows, rows[1:]):
        assert b["step"] > a["step"], (
            f"step regressed {a['step']} -> {b['step']}: "
            "launch 2 did not resume from the checkpoint")
    resume_step = last1.get("step", 0)
    before = [r for r in rows if r["step"] <= resume_step][-3:]
    after = [r for r in rows if r["step"] > resume_step][:3]
    step_ms = sorted(r["step_ms"] for r in rows
                     if r.get("step_ms") and r["step"] > max(steps) * 0.1)
    p50 = step_ms[len(step_ms) // 2] if step_ms else float("nan")
    p99 = step_ms[min(len(step_ms) - 1, int(len(step_ms) * 0.99))] \
        if step_ms else float("nan")
    bsz = 2 if args.tiny else 64
    # mean includes every host stall and the val/ckpt pauses that land in a
    # logged step's wall delta — the honest "sustained" number; p50 is the
    # steady-state step.
    mean_ms = sum(step_ms) / len(step_ms) if step_ms else float("nan")
    report = {
        "metric": "trainer_soak",
        "steps": args.steps,
        "batch": bsz,
        "sustained_utt_per_sec": round(bsz / (mean_ms / 1000), 1),
        "steady_state_utt_per_sec": round(bsz / (p50 / 1000), 1),
        "step_ms_p50": round(p50, 1),
        "step_ms_p99": round(p99, 1),
        "resume_at_step": resume_step,
        "loss_before_resume": [r["loss"] for r in before],
        "loss_after_resume": [r["loss"] for r in after],
        "wall_s": round(wall, 1),
    }
    # host-RSS trajectory of the training process (memory-leak tripwire:
    # compare early-steady-state vs final) and checkpoint-directory growth
    # under top-k retention
    if rss_samples:
        steady = [r for s_, r in rss_samples if s_ >= max(steps) * 0.1]
        report["rss_mb_steady_start"] = round(steady[0], 0) if steady else None
        report["rss_mb_end"] = round(rss_samples[-1][1], 0)
        report["rss_mb_peak"] = round(max(r for _, r in rss_samples), 0)
    ckpt_bytes = 0
    n_ckpts = 0
    for root, dirs, files in os.walk(args.ckpt_dir):
        for f in files:
            try:
                ckpt_bytes += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    try:
        from rnntransducer_tpu.train import CheckpointManager
        mgr = CheckpointManager(args.ckpt_dir, save_top_k=3)
        n_ckpts = len(list(mgr._mgr.all_steps()))
        mgr.close()
    except Exception:
        pass
    report["ckpt_dir_gb"] = round(ckpt_bytes / 2**30, 2)
    report["ckpts_retained"] = n_ckpts
    # epoch-transition stalls: the worst logged step deltas (epoch
    # boundaries rebuild the prefetcher; they should hide in p99)
    report["worst_step_ms_top5"] = [round(x, 1) for x in step_ms[-5:]]
    print(json.dumps(report))


if __name__ == "__main__":
    main()
