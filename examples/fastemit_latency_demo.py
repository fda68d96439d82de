#!/usr/bin/env python
"""FastEmit latency demo: train the same streaming (unidirectional) RNN-T
twice — plain loss vs ``fastemit_lambda > 0`` (arXiv:2010.11148) — and
measure TOKEN EMISSION DELAY on held-out utterances with
``greedy_decode_with_times``.

The patterned-synthetic testbed has a known monotonic alignment (label u
owns frames [u*fpl, (u+1)*fpl)), so each correctly-decoded token's delay is
``emitted_frame - u*fpl``: how long after its segment STARTED the model
committed to it.  FastEmit scales the label-arc loss gradient by
(1 + lambda), which trains the model to move emissions earlier — the
mechanism behind production streaming-ASR latency cuts; this demo shows
the same effect end to end through the real Trainer, plus the CER cost.

The model uses the STATELESS prediction network (bigram context,
``prednet.rnn_type="stateless"``) — measured on this exact setup, the
1-layer-LSTM prednet memorizes the 3072 training label sequences and
generalizes at held-out CER 0.40 after 3000 steps, while the stateless
bigram prednet (which cannot memorize sequences) reaches **CER 0.028**
with 51/64 exact transcripts — the Ghodsi et al. 2020 argument made
concrete on a causal encoder.

Run (TPU recommended):
    python examples/fastemit_latency_demo.py [--steps 3000] [--lam 0.01]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def build_cfg(steps: int, lam: float, ckpt: str):
    from rnntransducer_tpu.config import (
        AudioConfig, Config, DataConfig, JointNetConfig, ModelConfig,
        PredNetConfig, TrainConfig, TransNetConfig,
    )
    return Config(
        data=DataConfig(audio=AudioConfig(spec_augment=False),
                        audio_buckets=(64, 128), label_buckets=(16,)),
        model=ModelConfig(
            # unidirectional: emission latency only means something causal
            transnet=TransNetConfig(
                input_size=80, hidden_size=256, output_size=160,
                num_layers=2, rnn_type="lstm", dropout=0.0,
                bidirectional=False),
            # stateless bigram prednet: cannot memorize label sequences
            # (see module docstring; the LSTM prednet fails this task)
            prednet=PredNetConfig(embedding_size=72, hidden_size=256,
                                  output_size=160, num_layers=1,
                                  rnn_type="stateless", dropout=0.0),
            jointnet=JointNetConfig(num_classes=72),
        ),
        train=TrainConfig(learning_rate=3e-3, max_steps=steps,
                          per_device_train_batch_size=32, precision="fp32",
                          log_every_steps=100, val_every_steps=steps,
                          checkpoint_dir=ckpt, warmup_ratio=0.1,
                          fastemit_lambda=lam),
    )


def emission_stats(model, variables, heldout, fpl: int):
    """Mean per-token emission delay (encoder frames past segment start)
    over exactly-decoded held-out utterances, plus exact-match count."""
    from rnntransducer_tpu.decode.greedy import greedy_decode_with_times

    delays, exact = [], 0
    items = [heldout[i] for i in range(len(heldout))]
    T = max(it["feats"].shape[0] for it in items)
    for it in items:
        f = it["feats"]
        feats = np.zeros((1, T, f.shape[1]), np.float32)
        feats[0, :f.shape[0]] = f
        toks, lens, times = greedy_decode_with_times(
            model, variables, jax.numpy.asarray(feats),
            jax.numpy.asarray([f.shape[0]]), max_output_len=64)
        n = int(np.asarray(lens)[0])
        hyp = list(np.asarray(toks)[0, :n])
        ref = list(it["labels"])
        if hyp != ref:
            continue
        exact += 1
        tms = np.asarray(times)[0, :n]
        delays.extend(float(tms[u]) - u * fpl for u in range(n))
    return (float(np.mean(delays)) if delays else float("nan")), exact


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--lam", type=float, default=0.01)
    ap.add_argument("--ckpt", type=str, default="/tmp/fastemit_demo")
    args = ap.parse_args()
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    from rnntransducer_tpu.data.dataset import PatternedSyntheticDataset
    from rnntransducer_tpu.train import Trainer

    train_ds = PatternedSyntheticDataset(3072, seed=0)
    heldout = PatternedSyntheticDataset(64, seed=10_000)
    fpl = train_ds.frames_per_label

    results = {}
    for lam in (0.0, args.lam):
        cfg = build_cfg(args.steps, lam, f"{args.ckpt}_{lam}")
        trainer = Trainer(cfg, train_ds, val_dataset=heldout)
        trainer.fit()
        val = trainer.validate()
        delay, exact = emission_stats(
            trainer.model, {"params": trainer.state.params}, heldout, fpl)
        results[lam] = (delay, exact, val["val_cer"])
        print(f"lambda={lam}: held-out CER {val['val_cer']:.3f}, "
              f"exact {exact}/64, mean emission delay {delay:.2f} frames")

    d0, _, cer0 = results[0.0]
    d1, _, cer1 = results[args.lam]
    print(f"\nFastEmit lambda={args.lam}: delay {d0:.2f} -> {d1:.2f} frames "
          f"({(d0 - d1) * 10:.0f} ms earlier at a 10 ms hop), "
          f"CER {cer0:.3f} -> {cer1:.3f}")
    assert d1 < d0, "FastEmit should move emissions earlier"
    print("OK — FastEmit trains earlier emission")


if __name__ == "__main__":
    main()
