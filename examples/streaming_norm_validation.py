#!/usr/bin/env python
"""Streaming-normalization validation (VERDICT r1 weak item 8 / next item 6).

The reference trains on per-utterance mean-var-normalized waveforms
(``/root/reference/datamodule.py:87-90``) — a statistic that streaming cannot
know until the utterance ends.  This experiment quantifies the CER cost of
each causal substitute on the waveform testbed (label-specific waveform
snippets + per-utterance random gain/offset, so the norm is load-bearing):

1. train a unidirectional (streamable) RNN-T on offline-normalized features;
2. decode held-out utterances four ways:
   offline  — whole-utterance norm + batch greedy decode (upper bound);
   running  — streaming, causal running mean/var;
   fixed    — streaming, corpus-calibrated global mean/var (global CMVN);
   none     — streaming, no normalization (the mismatch floor).

Run: python examples/streaming_norm_validation.py [--steps 4000]
Results land in BASELINE.md's streaming rows.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=5000)
    ap.add_argument("--ckpt", type=str, default="/tmp/stream_norm_ckpt")
    ap.add_argument("--n_eval", type=int, default=48)
    args = ap.parse_args()
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    from rnntransducer_tpu.config import (
        AudioConfig, Config, DataConfig, JointNetConfig, ModelConfig,
        PredNetConfig, TrainConfig, TransNetConfig,
    )
    from rnntransducer_tpu.data import PatternedWaveformDataset
    from rnntransducer_tpu.decode.streaming import StreamingRecognizer
    from rnntransducer_tpu.train import Trainer
    from rnntransducer_tpu.train.metrics import edit_distance

    audio = AudioConfig(spec_augment=False, normalize=True)
    cfg = Config(
        data=DataConfig(audio=audio, audio_buckets=(128,), label_buckets=(16,)),
        model=ModelConfig(
            transnet=TransNetConfig(input_size=80, hidden_size=256,
                                    output_size=160, num_layers=2,
                                    rnn_type="lstm", dropout=0.0,
                                    bidirectional=False),
            prednet=PredNetConfig(embedding_size=72, hidden_size=256,
                                  output_size=160, num_layers=1,
                                  rnn_type="lstm", dropout=0.0),
            jointnet=JointNetConfig(num_classes=72),
        ),
        train=TrainConfig(learning_rate=3e-3, max_steps=args.steps,
                          per_device_train_batch_size=32, precision="fp32",
                          log_every_steps=100, val_every_steps=args.steps,
                          checkpoint_dir=args.ckpt, warmup_ratio=0.1),
    )
    train_ds = PatternedWaveformDataset(4096, audio, seed=0)
    heldout = PatternedWaveformDataset(args.n_eval, audio, seed=10_000)

    trainer = Trainer(cfg, train_ds, val_dataset=heldout)
    trainer.fit()
    offline = trainer.validate()
    print(f"\noffline (per-utterance norm) held-out CER: "
          f"{offline['val_cer']:.3f}")

    # corpus calibration for "fixed" (global CMVN over the training audio)
    tot = n = 0.0
    sq = 0.0
    for i in range(64):
        w, _ = train_ds.waveform(i)
        tot += float(w.sum()); sq += float((w ** 2).sum()); n += len(w)
    cal_mean = tot / n
    cal_var = sq / n - cal_mean ** 2
    print(f"calibrated stats: mean={cal_mean:.4f} var={cal_var:.4f}")

    variables = {"params": trainer.state.params}
    model = trainer.model
    sr = audio.sample_rate

    def stream_cer(mode):
        errs = total = 0
        for i in range(len(heldout)):
            wav, labels = heldout.waveform(i)
            rec = StreamingRecognizer(
                model, variables, audio, normalize=mode, chunk_frames=32,
                norm_mean=cal_mean, norm_var=cal_var)
            hyp = []
            chunk = sr // 10  # 100 ms chunks
            for s in range(0, len(wav), chunk):
                hyp += rec.feed(wav[s:s + chunk])
            hyp += rec.flush()
            errs += edit_distance(list(labels), hyp)
            total += len(labels)
        return errs / max(total, 1)

    rows = [("offline", offline["val_cer"])]
    for mode in ("running", "fixed", "none"):
        cer = stream_cer(mode)
        rows.append((mode, cer))
        print(f"streaming normalize={mode!r}: held-out CER {cer:.3f}",
              flush=True)

    print("\nmode      CER    delta vs offline")
    base = rows[0][1]
    for name, cer in rows:
        print(f"{name:8s}  {cer:.3f}  {cer - base:+.3f}")
    assert rows[1][1] <= base + 0.05, (
        "running-norm streaming should track the offline norm closely "
        f"(offline {base:.3f}, running {rows[1][1]:.3f})")
    print("OK — running norm tracks the offline per-utterance norm")


if __name__ == "__main__":
    main()
