#!/usr/bin/env python
"""End-to-end learning demo: overfit a tiny RNN-T on a handful of synthetic
utterances until greedy decode reproduces the labels (CER -> ~0).

This is the framework's "minimum end-to-end slice" proof (SURVEY.md §7 build
step 5): frontend-shaped features -> scanned encoder/prednet -> fused joint +
Pallas RNN-T loss -> AdamW/OneCycle -> batched greedy decode -> CER.

Run (TPU or CPU): python examples/overfit_demo.py [--steps 300]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

import rnntransducer_tpu as rt
from rnntransducer_tpu.config import (
    Config, JointNetConfig, ModelConfig, PredNetConfig, TrainConfig,
    TransNetConfig,
)
from rnntransducer_tpu.decode import greedy_decode
from rnntransducer_tpu.train import (
    TrainState, build_model, char_error_rate, make_optimizer, train_step,
)
from rnntransducer_tpu.tokenizer import GraphemeTokenizer


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    args = ap.parse_args()

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    cfg = Config(
        model=ModelConfig(
            transnet=TransNetConfig(input_size=80, hidden_size=128,
                                    output_size=96, num_layers=2,
                                    rnn_type="lstm", dropout=0.0,
                                    bidirectional=True),
            prednet=PredNetConfig(embedding_size=72, hidden_size=128,
                                  output_size=96, num_layers=1,
                                  rnn_type="lstm", dropout=0.0),
            jointnet=JointNetConfig(num_classes=72),
        ),
        train=TrainConfig(learning_rate=3e-3, max_steps=args.steps,
                          precision="fp32", warmup_ratio=0.1,
                          joint_chunk_frames=0),
    )
    tok = GraphemeTokenizer.default(72)

    B, T, U = 4, 64, 10
    rng = np.random.RandomState(0)
    targets = rng.randint(5, 56, size=(B, U)).astype(np.int32)
    # no consecutive duplicates (greedy decode dedups them by design)
    for b in range(B):
        for u in range(1, U):
            while targets[b, u] == targets[b, u - 1]:
                targets[b, u] = rng.randint(5, 56)
    # "speech-like" features: each label occupies a contiguous frame segment
    # and stamps a label-specific noise pattern — learnable with a monotonic
    # alignment, like real audio (pure-noise features let the model smear
    # probability across alignments, which greedy cannot follow)
    patterns = rng.randn(72, 80).astype(np.float32)
    feats = np.zeros((B, T, 80), np.float32)
    seg = T // U
    for b in range(B):
        for u in range(U):
            feats[b, u * seg:(u + 1) * seg] = patterns[targets[b, u]]
    feats += 0.1 * rng.randn(B, T, 80).astype(np.float32)
    feats = jnp.asarray(feats)
    text_in = np.concatenate([np.zeros((B, 1), np.int32), targets], axis=1)
    batch = {
        "feats": feats,
        "feat_lengths": jnp.full((B,), T, jnp.int32),
        "text_in": jnp.asarray(text_in),
        "text_lengths": jnp.full((B,), U + 1, jnp.int32),
        "targets": jnp.asarray(targets),
        "target_lengths": jnp.full((B,), U, jnp.int32),
    }

    tx = make_optimizer(cfg.train)
    state = TrainState.create(cfg)
    model = build_model(cfg)

    def cer_now(params):
        # symbol budget = U: with a fully-overfit marginal the model is free
        # to emit many labels on one frame, and a small per-frame cap (the
        # reference uses 3) would truncate the output
        toks, lens = greedy_decode(model, {"params": params}, feats,
                                   batch["feat_lengths"], max_symbols=U,
                                   max_output_len=32)
        toks, lens = np.asarray(toks), np.asarray(lens)
        preds = [tok.decode(toks[b, :lens[b]], group_tokens=False)
                 for b in range(B)]
        refs = [tok.decode(targets[b], group_tokens=False) for b in range(B)]
        return char_error_rate(preds, refs), preds, refs

    for i in range(args.steps):
        state, m = train_step(cfg, tx, state, batch)
        if (i + 1) % max(args.steps // 6, 1) == 0:
            cer, _, _ = cer_now(state.params)
            print(f"step {i+1:4d}  loss={float(m['loss']):8.3f}  cer={cer:.3f}")

    cer, preds, refs = cer_now(state.params)
    print(f"\nfinal CER: {cer:.3f}")
    print("ref :", refs[0])
    print("pred:", preds[0])
    assert cer < 0.15, f"failed to overfit (CER {cer})"
    print("OK — end-to-end learning verified")


if __name__ == "__main__":
    main()
