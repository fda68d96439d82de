#!/usr/bin/env python
"""Training CLI.

Capability-equivalent of the reference's ``train.py`` + ``scripts/run_train.sh``
(argparse over a JSON model/data config, ``train.py:14-58``) — but one process
drives every chip in the slice via the data mesh, so there is no torchrun rank
spawn, no 30-day DDP timeout workaround (``train.py:41-45``), and
preprocessing runs (idempotently) before the mesh is touched.

Examples:
  # smoke-train on synthetic data (any backend, incl. CPU)
  python train.py --synthetic 64 --max_steps 20 --checkpoint_dir /tmp/ckpt

  # preprocess raw HF-dataset shards into log-mel shards, then train
  python train.py --config configs/base.json \
      --hf_data_dirs /data/raw --pl_data_dir /data/logmel \
      --checkpoint_dir ckpts --max_steps 100000
"""

from __future__ import annotations

import argparse
import dataclasses

from rnntransducer_tpu.config import Config, TrainConfig


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", type=str, default=None,
                   help="JSON config (reference config/config.json schema)")
    p.add_argument("--vocab_path", type=str, default=None)
    # data (mirrors utils/lightningmodule_args.py surface)
    p.add_argument("--hf_data_dirs", type=str, nargs="*", default=None,
                   help="raw HF-dataset roots to preprocess")
    p.add_argument("--pl_data_dir", type=str, default=None,
                   help="preprocessed log-mel shard root")
    p.add_argument("--num_shards", type=int, default=20)
    p.add_argument("--num_proc", type=int, default=None)
    p.add_argument("--synthetic", type=int, default=0,
                   help="train on N synthetic utterances instead of real data")
    # train overrides
    p.add_argument("--learning_rate", type=float, default=None)
    p.add_argument("--weight_decay", type=float, default=None)
    p.add_argument("--warmup_ratio", type=float, default=None)
    p.add_argument("--max_steps", type=int, default=None)
    p.add_argument("--per_device_train_batch_size", type=int, default=None)
    p.add_argument("--per_device_eval_batch_size", type=int, default=None)
    p.add_argument("--accumulate_grad_batches", type=int, default=None)
    p.add_argument("--model_parallel", type=int, default=None,
                   help="shard the joint classifier's vocab dim over a "
                        "'model' mesh axis of N devices (1 = pure DP)")
    p.add_argument("--shard_optimizer_state", action="store_true",
                   default=None,
                   help="ZeRO-1: split the Adam moments over the data axis "
                        "(optimizer memory / DP width; works across hosts)")
    p.add_argument("--precision", type=str, default=None,
                   choices=["bf16", "fp32"])
    p.add_argument("--optimizer", type=str, default=None,
                   choices=["adamw", "adafactor", "lion", "sgd"],
                   help="adamw = reference parity; adafactor = factored "
                        "second moment (optimizer HBM ~ row+col sums)")
    p.add_argument("--lr_schedule", type=str, default=None,
                   choices=["onecycle", "cosine", "linear", "constant"])
    p.add_argument("--ema_decay", type=float, default=None,
                   help="Polyak/EMA shadow of the params (0 = off; typical "
                        "0.999-0.9999); decode it with inference.py "
                        "--use_ema")
    p.add_argument("--fastemit_lambda", type=float, default=None,
                   help="FastEmit (arXiv:2010.11148): scale the label-arc "
                        "loss gradient by (1+lambda) to train earlier "
                        "emission / lower streaming latency (0 = off; "
                        "typical 1e-3..1e-2)")
    p.add_argument("--weight_noise_std", type=float, default=None,
                   help="variational weight noise std (Graves 2012, the "
                        "RNN-T paper's regularizer): fresh gaussian param "
                        "noise each forward (0 = off)")
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--val_every_steps", type=int, default=None)
    p.add_argument("--log_every_steps", type=int, default=None)
    p.add_argument("--watch_every_steps", type=int, default=None,
                   help="param/grad histograms every N steps "
                        "(wandb.watch equivalent; 0 = off)")
    p.add_argument("--checkpoint_dir", type=str, default=None)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--loss_backend", type=str, default="auto",
                   choices=["auto", "pallas", "xla", "pallas_interpret"])
    p.add_argument("--eval_only", action="store_true",
                   help="restore the best checkpoint and evaluate "
                        "eval_clean/eval_other instead of training")
    p.add_argument("--profile_dir", type=str, default=None,
                   help="write a jax.profiler trace of steps 10-15 here")
    p.add_argument("--debug_nans", action="store_true")
    p.add_argument("--coordinator_address", type=str, default=None,
                   help="multi-host: jax.distributed coordinator host:port")
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    return p.parse_args()


def build_config(args) -> Config:
    cfg = Config.from_json(args.config) if args.config else Config()
    overrides = {k: getattr(args, k) for k in (
        "learning_rate", "weight_decay", "warmup_ratio", "max_steps",
        "per_device_train_batch_size", "per_device_eval_batch_size",
        "accumulate_grad_batches", "model_parallel",
        "shard_optimizer_state", "precision", "optimizer", "lr_schedule",
        "ema_decay", "fastemit_lambda", "weight_noise_std", "seed",
        "val_every_steps", "log_every_steps",
        "watch_every_steps", "checkpoint_dir")
        if getattr(args, k) is not None}
    train = dataclasses.replace(cfg.train, **overrides)
    return dataclasses.replace(cfg, train=train,
                               vocab_path=args.vocab_path or cfg.vocab_path)


def main():
    args = parse_args()
    cfg = build_config(args)

    import jax
    # restore standard JAX_PLATFORMS env semantics: third-party PJRT plugins
    # (e.g. the axon TPU tunnel) can ignore the env var, so pin it via
    # config before backend init — JAX_PLATFORMS=cpu must mean cpu
    import os as _os
    if _os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    if args.debug_nans:
        from rnntransducer_tpu.utils.debugging import debug_nans
        debug_nans(True)
    from rnntransducer_tpu.parallel.distributed import initialize
    topo = initialize(args.coordinator_address, args.num_processes,
                      args.process_id)
    print(f"[topology] {topo}")

    from rnntransducer_tpu.data import (
        ArrowAudioDataset, SyntheticAudioDataset, prepare_logmel_dataset,
    )
    from rnntransducer_tpu.train import Trainer

    if args.synthetic:
        train_ds = SyntheticAudioDataset(
            args.synthetic, cfg.data.audio,
            vocab_size=cfg.model.jointnet.num_classes, seed=cfg.train.seed)
        val_ds = SyntheticAudioDataset(
            max(args.synthetic // 8, 2), cfg.data.audio,
            vocab_size=cfg.model.jointnet.num_classes,
            seed=cfg.train.seed + 1)
    else:
        assert args.pl_data_dir, "--pl_data_dir (or --synthetic N) required"
        if args.hf_data_dirs:
            # offline preprocessing (datamodule.prepare_data equivalent):
            # idempotent via per-split _SUCCESS markers; in multi-host runs
            # only process 0 preprocesses (a bare isdir check would race on a
            # shared filesystem), others poll for the markers
            import time as _time
            import os as _os
            splits = ("train", "dev", "eval_clean", "eval_other")
            # the all-splits marker, not per-split _SUCCESS: waiting on
            # train/_SUCCESS alone would release the other processes while
            # process 0 is still writing the dev shards they load next
            done_marker = _os.path.join(args.pl_data_dir, "_PREPARED")
            if jax.process_index() == 0:
                if not _os.path.exists(done_marker):
                    for split in splits:
                        try:
                            prepare_logmel_dataset(
                                args.hf_data_dirs, args.pl_data_dir, split,
                                cfg.data.audio, num_shards=(
                                    args.num_shards if split == "train"
                                    else 1),
                                num_proc=args.num_proc or 1)
                        except FileNotFoundError:
                            print(f"[prepare] no source for split "
                                  f"'{split}', skipping")
                    _os.makedirs(args.pl_data_dir, exist_ok=True)
                    with open(done_marker, "w") as f:
                        f.write("ok\n")
            else:
                waited = 0
                while not _os.path.exists(done_marker):
                    _time.sleep(10)  # the reference used a 30-day DDP
                    # timeout for the same wait (train.py:41-45); log so a
                    # crashed process 0 is diagnosable, not a silent hang
                    waited += 10
                    if waited % 600 == 0:
                        print(f"[prepare] waiting on process 0 "
                              f"({waited // 60} min): {done_marker}",
                              flush=True)
        train_ds = ArrowAudioDataset([args.pl_data_dir], "train")
        val_ds = ArrowAudioDataset([args.pl_data_dir], "dev")

    trainer = Trainer(cfg, train_ds, val_dataset=val_ds,
                      loss_backend=args.loss_backend,
                      profile_dir=args.profile_dir)
    if args.eval_only:
        step = trainer.ckpt.best_or_latest_step()
        trainer.state = trainer.ckpt.restore(trainer.state, step=step)
        tests = {}
        if args.synthetic:
            tests["synthetic"] = val_ds
        else:
            for split in ("eval_clean", "eval_other"):
                try:
                    tests[split] = ArrowAudioDataset([args.pl_data_dir], split)
                except FileNotFoundError:
                    print(f"[eval] no shards for '{split}', skipping")
        results = trainer.test(tests)
        for name, r in results.items():
            print(f"{name}: loss={r['loss']:.4f} wer={r['wer']:.4f} "
                  f"cer={r['cer']:.4f}")
        return
    state = trainer.fit(resume=args.resume)
    print(f"done at step {int(state.step)}; checkpoints in "
          f"{cfg.train.checkpoint_dir}")


if __name__ == "__main__":
    main()
