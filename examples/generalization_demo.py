#!/usr/bin/env python
"""End-to-end learning + GENERALIZATION demo: train a small RNN-T on
patterned synthetic utterances and verify CER drops on a HELD-OUT set drawn
from the same generative process (the closest possible stand-in for real
corpora in this image). Exercises the full Trainer: bucketing, prefetch,
bf16 fused loss, validation decode, checkpoints.

Run (TPU recommended): python examples/generalization_demo.py [--steps 400]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=5000)
    ap.add_argument("--ckpt", type=str, default="/tmp/gen_demo_ckpt")
    ap.add_argument("--time_reduction_stride", type=int, default=1,
                    help="frame-stacking stride (accuracy check for the "
                         "reduced-rate encoder: stride 2 should land in the "
                         "same held-out CER regime as stride 1)")
    ap.add_argument("--time_reduction_layer", type=int, default=1)
    ap.add_argument("--arch", default="rnn", choices=["rnn", "conformer"],
                    help="encoder family: the reference's RNN stack or the "
                         "Conformer (models/conformer.py)")
    args = ap.parse_args()
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    from rnntransducer_tpu.config import (
        AudioConfig, Config, DataConfig, JointNetConfig, ModelConfig,
        PredNetConfig, TrainConfig, TransNetConfig,
    )
    from rnntransducer_tpu.data.dataset import PatternedSyntheticDataset
    from rnntransducer_tpu.train import Trainer

    cfg = Config(
        data=DataConfig(audio=AudioConfig(spec_augment=False),
                        audio_buckets=(64, 128), label_buckets=(16,)),
        model=ModelConfig(
            transnet=TransNetConfig(
                input_size=80, hidden_size=256, output_size=160, num_layers=2,
                rnn_type="lstm", dropout=0.0, bidirectional=True,
                arch=args.arch, attention_heads=4,
                time_reduction_stride=args.time_reduction_stride,
                time_reduction_layer=args.time_reduction_layer),
            prednet=PredNetConfig(embedding_size=72, hidden_size=256,
                                  output_size=160, num_layers=1,
                                  rnn_type="lstm", dropout=0.0),
            jointnet=JointNetConfig(num_classes=72),
        ),
        train=TrainConfig(learning_rate=3e-3, max_steps=args.steps,
                          per_device_train_batch_size=32, precision="fp32",
                          log_every_steps=50, val_every_steps=args.steps,
                          checkpoint_dir=args.ckpt, warmup_ratio=0.1),
    )
    train_ds = PatternedSyntheticDataset(512, seed=0)
    heldout = PatternedSyntheticDataset(64, seed=10_000)  # disjoint utterances

    trainer = Trainer(cfg, train_ds, val_dataset=heldout)
    before = trainer.validate()
    trainer.fit()
    after = trainer.validate()
    print(f"\nheld-out CER: {before['val_cer']:.3f} -> {after['val_cer']:.3f}")
    print(f"held-out WER: {before['val_wer']:.3f} -> {after['val_wer']:.3f}")
    # the synthetic task plateaus around CER ~0.19 (val_loss ~1.9) — the
    # demo's claim is end-to-end learning that GENERALIZES, not task mastery
    assert after["val_cer"] < 0.3, (
        f"failed to generalize (held-out CER {after['val_cer']:.3f})")
    print("OK — learning generalizes to held-out data "
          f"(CER {before['val_cer']:.2f} -> {after['val_cer']:.2f})")


if __name__ == "__main__":
    main()
