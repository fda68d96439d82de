#!/usr/bin/env python
"""FLAGSHIP-config accuracy run: train the reference's trained model config
(8-layer bi-GRU-1024 encoder, 2-layer LSTM-1024 prediction net, 72-class
concat joint — /root/reference/config/config.json) through the real Trainer
on the patterned-synthetic generalization testbed, and report held-out CER
with greedy AND batched beam decoding.

The round-3 soak proved the flagship trains at speed through the full
pipeline (loss continuity across preemption); this demo closes the loop on
ACCURACY at flagship scale: the exact production-size model, bf16, Pallas
kernels, bucketing/prefetch/val/checkpoints — learning a held-out-general
task end to end. (Real corpora are not available in this image; the
patterned testbed is the stand-in, see data/dataset.py.)

Run (real TPU): python examples/flagship_accuracy_demo.py --steps 3000
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--train_utts", type=int, default=4096)
    ap.add_argument("--ckpt", type=str, default="/tmp/flagship_acc_ckpt")
    ap.add_argument("--learning_rate", type=float, default=4e-4)
    ap.add_argument("--time_reduction_stride", type=int, default=1,
                    help="frame-stacking stride after layer 1 (the reduced-"
                         "rate production encoder; see BASELINE.md)")
    args = ap.parse_args()
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    import dataclasses

    import rnntransducer_tpu as rt
    from rnntransducer_tpu.config import TrainConfig
    from rnntransducer_tpu.data.dataset import PatternedSyntheticDataset
    from rnntransducer_tpu.train import Trainer

    cfg = rt.base_config()  # the reference's flagship model config
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(cfg.model, transnet=dataclasses.replace(
            cfg.model.transnet,
            time_reduction_stride=args.time_reduction_stride,
            time_reduction_layer=1)),
        data=dataclasses.replace(cfg.data, audio_buckets=(64, 128),
                                 label_buckets=(16,)),
        train=TrainConfig(learning_rate=args.learning_rate,
                          max_steps=args.steps,
                          per_device_train_batch_size=args.batch,
                          per_device_eval_batch_size=32,
                          precision="bf16", log_every_steps=50,
                          val_every_steps=max(args.steps // 3, 1),
                          checkpoint_dir=args.ckpt, warmup_ratio=0.1,
                          save_top_k=1))

    train_ds = PatternedSyntheticDataset(args.train_utts, seed=0)
    heldout = PatternedSyntheticDataset(128, seed=10_000)

    trainer = Trainer(cfg, train_ds, val_dataset=heldout)
    before = trainer.validate()
    t0 = time.perf_counter()
    trainer.fit()
    wall = time.perf_counter() - t0
    after_greedy = trainer.validate()
    # beam validation: the decoder choice is a config knob (val_decoder)
    trainer.cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, val_decoder="beam",
                                       val_beam_width=4))
    after_beam = trainer.validate()

    utts = args.steps * args.batch
    print(f"\nflagship {args.steps} steps, {wall:.0f}s wall "
          f"({utts / wall:.1f} utt/s sustained incl. val/ckpt)")
    print(f"held-out CER greedy: {before['val_cer']:.3f} -> "
          f"{after_greedy['val_cer']:.3f}")
    print(f"held-out CER beam-4: {after_beam['val_cer']:.3f}")
    print(f"held-out WER greedy: {after_greedy['val_wer']:.3f}  "
          f"beam-4: {after_beam['val_wer']:.3f}")
    assert after_greedy["val_cer"] < before["val_cer"] * 0.5, (
        before["val_cer"], after_greedy["val_cer"])
    print("OK — the flagship config learns a held-out-general task "
          "end to end")


if __name__ == "__main__":
    main()
