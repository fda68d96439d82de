#!/usr/bin/env python
"""Beam-option A/B on the hard-testbed rungs (VERDICT r4 item 2).

Round 4 measured the reference-faithful beam LOSING to greedy on noisy
audio (stress rung: greedy CER 0.169 vs device beam-4 0.311) — the
reference ranking (score normalized by len(y_star) including the seed
blank, per-path scoring) amplifies noise-induced ties.  Round 5 added
principled options behind flags (decode/beam_batched.py docstring):
``length_norm_alpha`` (rank by score / max(len,1)**alpha over emitted
tokens; alpha=0 = raw-score, greedy-consistent) and ``merge_duplicates``
(logsumexp over identical token sequences at frame boundaries).

This experiment restores a trained testbed system and evaluates greedy
plus every beam variant on the FULL stress and OOV eval sets (device
batched beam — no 12-utt host-search subsets), printing one JSON row per
cell.  The recommendation lands in docs/TUNING.md.

Run (real chip):  python experiments/beam_search_ab.py --system bi
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--system", default="bi",
                    choices=["uni", "bi", "conformer", "streaming"])
    ap.add_argument("--eval_n", type=int, default=96)
    ap.add_argument("--beam_width", type=int, default=4)
    ap.add_argument("--ckpt", type=str, default=None)
    args = ap.parse_args()
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    # the ladder's exact system/dataset construction (hard_testbed.py) so
    # rows are comparable with BASELINE.md; training is never repeated —
    # the checkpoint the ladder run left in /tmp is restored
    from rnntransducer_tpu.config import (
        AudioConfig, Config, DataConfig, JointNetConfig, ModelConfig,
        PredNetConfig, TrainConfig, TransNetConfig,
    )
    from rnntransducer_tpu.data.dataset import HardPatternedWaveformDataset
    from rnntransducer_tpu.eval import evaluate_corpus
    from rnntransducer_tpu.tokenizer import load_tokenizer
    from rnntransducer_tpu.train import build_model
    from rnntransducer_tpu.train.checkpoint import load_decode_params

    acfg = AudioConfig(spec_augment=True, freq_mask_cnt=1, time_mask_cnt=1,
                       freq_mask_para=12, time_mask_para=16)
    mk = lambda n, seed, oov, **kw: HardPatternedWaveformDataset(
        n, acfg, seed=seed, oov_fraction=oov, **kw)
    eval_stress = mk(args.eval_n, 70_000, 0.0, snr_db_range=(0.0, 5.0),
                     tempo_range=(0.7, 1.4), speaker_range=(0.85, 1.2))
    eval_oov = mk(args.eval_n, 60_000, 0.25)

    if args.system == "uni":
        tn = TransNetConfig(input_size=80, hidden_size=384, output_size=256,
                            num_layers=3, rnn_type="lstm", dropout=0.1,
                            bidirectional=False)
    elif args.system == "bi":
        tn = TransNetConfig(input_size=80, hidden_size=384, output_size=256,
                            num_layers=3, rnn_type="gru", dropout=0.1,
                            bidirectional=True)
    elif args.system == "conformer":
        tn = TransNetConfig(input_size=80, hidden_size=256, output_size=256,
                            num_layers=4, rnn_type="lstm", dropout=0.1,
                            bidirectional=True, arch="conformer",
                            attention_heads=4, scan_blocks=False)
    else:
        tn = TransNetConfig(input_size=80, hidden_size=256, output_size=256,
                            num_layers=4, rnn_type="lstm", dropout=0.1,
                            bidirectional=False, arch="conformer",
                            attention_heads=4, attention_chunk=8,
                            attention_left_chunks=2, scan_blocks=False)
    pn_type = "stateless" if args.system == "streaming" else "lstm"
    cfg = Config(
        data=DataConfig(audio=acfg, audio_buckets=(128, 192, 256),
                        label_buckets=(32,)),
        model=ModelConfig(
            transnet=tn,
            prednet=PredNetConfig(embedding_size=72, hidden_size=256,
                                  output_size=256, num_layers=1,
                                  rnn_type=pn_type, dropout=0.0),
            jointnet=JointNetConfig(num_classes=72),
        ),
        train=TrainConfig(checkpoint_dir=(
            args.ckpt or f"/tmp/hard_testbed_{args.system}")),
    )
    tok = load_tokenizer(cfg.vocab_path, cfg.model.jointnet.num_classes)
    params, _ = load_decode_params(cfg.train.checkpoint_dir, cfg)
    model = build_model(cfg)
    variables = {"params": params}

    variants = [
        ("greedy", dict(decoder="greedy")),
        ("beam_ref", dict(decoder="beam_batched")),           # transducer.py:360
        ("beam_a0", dict(decoder="beam_batched", length_norm_alpha=0.0)),
        ("beam_a0.5", dict(decoder="beam_batched", length_norm_alpha=0.5)),
        ("beam_a1", dict(decoder="beam_batched", length_norm_alpha=1.0)),
        ("beam_merge", dict(decoder="beam_batched", merge_duplicates=True)),
        ("beam_a0_merge", dict(decoder="beam_batched", length_norm_alpha=0.0,
                               merge_duplicates=True)),
        ("beam_a0.5_merge", dict(decoder="beam_batched",
                                 length_norm_alpha=0.5,
                                 merge_duplicates=True)),
    ]
    for name, ds in (("heldout_stress", eval_stress), ("heldout_oov",
                                                       eval_oov)):
        items = [dict(feats=ds[i]["feats"], labels=ds[i]["labels"])
                 for i in range(len(ds))]
        for label, kw in variants:
            r = evaluate_corpus(model, variables, tok, acfg, items,
                                beam_width=args.beam_width,
                                frame_bucket=256, **kw)
            s = r.summary()
            print(json.dumps({"system": args.system, "eval": name,
                              "variant": label,
                              "cer": round(s["cer"], 4),
                              "wer": round(s["wer"], 4),
                              "utts": len(items)}), flush=True)


if __name__ == "__main__":
    main()
