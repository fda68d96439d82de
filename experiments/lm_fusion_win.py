#!/usr/bin/env python
"""Make LM fusion WIN (VERDICT r4 item 3) — the confusable testbed.

Every LM surface in this framework was correctness-tested but
value-unproven: on the round-4 hard testbed fusion is monotonically
harmful because the synthetic graphemes are acoustically distinct
(BASELINE.md LM-weight sweep).  ``ConfusableWaveformDataset`` closes
that gap with TRUE homophones + a trigger grammar (data/dataset.py):
the audio cannot distinguish homophone twins, the preceding trigger word
can — exactly the structure that makes the reference integrate KenLM
(``/root/reference/inference.py:29``).

The system under test is the STREAMING stack (chunked-causal Conformer +
stateless bigram prednet): its one-grapheme prediction context provably
cannot carry the trigger word across the delimiter, so any homophone
resolution must come from the LM — the measured upside is structural.

Protocol: train on 4096 confusable utterances; build a word-bigram ARPA
from the TRAIN transcripts; evaluate held-out (96 utts, full set — the
DEVICE word-LM makes the weight sweep cheap) with greedy, no-LM beam,
and device word-LM fusion across weights; report overall CER/WER plus
accuracy ON the homophone slots; cross-check device-vs-host fusion token
agreement on a subset.

Run (real chip):  python experiments/lm_fusion_win.py [--steps 3000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from experiments.hard_testbed import build_bigram_arpa


def homophone_accuracy(ds, per_utt, n):
    """Fraction of homophone word slots transcribed exactly (hyp word at
    the same position == ref word; a slot beyond the hyp's word count is
    wrong).  The delimiter token renders as whitespace in decoded text, so
    words split on whitespace — same convention as the WER metric."""
    ok = tot = 0
    for i in range(n):
        ref_words = per_utt[i]["ref"].split()
        hyp_words = per_utt[i]["hyp"].split()
        for s in ds.homophone_slots(i):
            tot += 1
            if s < len(hyp_words) and s < len(ref_words) \
                    and hyp_words[s] == ref_words[s]:
                ok += 1
    return ok / max(tot, 1), tot


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=4000)
    ap.add_argument("--beta", type=float, default=1.5,
                    help="word-insertion bonus (pyctcdecode's default): "
                         "offsets the deletion pressure fusion otherwise "
                         "exerts — every word boundary pays an LM cost that "
                         "a silent hypothesis never does")
    ap.add_argument("--lr", type=float, default=1e-3,
                    help="2e-3 destabilized the 2-block model on this "
                         "corpus (val CER 0.32 -> 0.66 after step 1000)")
    # 4x the hard-testbed corpus: homophone slots cannot be fit honestly,
    # so a small corpus lets the encoder buy loss by memorizing noise
    # (measured: 4096 utts -> train loss 0.29 / val 21.5 at 3000 steps)
    ap.add_argument("--train_n", type=int, default=16384)
    ap.add_argument("--beam_width", type=int, default=4)
    ap.add_argument("--eval_n", type=int, default=96)
    ap.add_argument("--weights", type=float, nargs="+",
                    default=[0.3, 0.6, 1.0, 1.5])
    ap.add_argument("--ckpt", type=str, default="/tmp/lm_fusion_win")
    ap.add_argument("--eval_only", action="store_true")
    ap.add_argument("--host_check_n", type=int, default=8,
                    help="subset for the host-fusion token-agreement "
                         "cross-check (host A/B beam decodes one utt at a "
                         "time over the tunnel)")
    args = ap.parse_args()
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    from rnntransducer_tpu.config import (
        AudioConfig, Config, DataConfig, JointNetConfig, ModelConfig,
        PredNetConfig, TrainConfig, TransNetConfig,
    )
    from rnntransducer_tpu.data.dataset import ConfusableWaveformDataset
    from rnntransducer_tpu.decode.device_word_lm import build_device_word_lm
    from rnntransducer_tpu.decode.ngram_lm import NGramLM
    from rnntransducer_tpu.eval import evaluate_corpus
    from rnntransducer_tpu.train import Trainer, build_model

    acfg = AudioConfig(spec_augment=True, freq_mask_cnt=1, time_mask_cnt=1,
                       freq_mask_para=12, time_mask_para=16)
    # GENTLER non-homophone axes than the hard testbed: this experiment
    # isolates the LM's upside, so the only thing the acoustics should
    # underdetermine is the homophone choice.  (With hard-testbed noise
    # the AM's base error dominates, every near-miss word walks the
    # lexicon trie to OOV, and fusion can only add deletion pressure —
    # measured in the first round-5 run: w=0.3 CER 0.378 vs 0.336 no-LM.)
    #
    # gap_segments=6 (480 ms of silence per word boundary) puts the
    # trigger word's AUDIO beyond the encoder's total receptive field
    # (2 blocks x (one 80 ms left attention chunk + 60 ms causal conv)
    # ~= 280 ms): measured at the default 80 ms gap, the encoder relays
    # trigger acoustics across blocks and resolves homophones itself
    # (0.92 accuracy, no LM) — at which point its residual errors are not
    # in the beam and fusion can only hurt.  With the gap, NO component
    # of the AM can reach the trigger; only the word LM can.
    mk = lambda n, seed: ConfusableWaveformDataset(
        n, acfg, seed=seed, snr_db_range=(15.0, 30.0),
        tempo_range=(0.92, 1.08), speaker_range=(0.96, 1.06),
        gap_segments=6, words_per_utt=(3, 5))
    train_ds = mk(args.train_n, 0)
    heldout = mk(args.eval_n, 50_000)

    cfg = Config(
        data=DataConfig(audio=acfg, audio_buckets=(256, 320, 384),
                        label_buckets=(32,)),
        model=ModelConfig(
            # short-reach streaming encoder (see the gap_segments note):
            # graphemes are locally realized, so the small window costs
            # nothing on non-homophone words
            transnet=TransNetConfig(
                input_size=80, hidden_size=256, output_size=256,
                num_layers=2, rnn_type="lstm", dropout=0.1,
                bidirectional=False, arch="conformer", attention_heads=4,
                attention_chunk=8, attention_left_chunks=1,
                conv_kernel_size=7, scan_blocks=False),
            prednet=PredNetConfig(embedding_size=72, hidden_size=256,
                                  output_size=256, num_layers=1,
                                  rnn_type="stateless", dropout=0.0),
            jointnet=JointNetConfig(num_classes=72),
        ),
        train=TrainConfig(learning_rate=args.lr, max_steps=args.steps,
                          per_device_train_batch_size=32, precision="bf16",
                          log_every_steps=100,
                          val_every_steps=min(500, args.steps // 2),
                          checkpoint_dir=args.ckpt, warmup_ratio=0.1),
    )
    if args.eval_only:
        from rnntransducer_tpu.tokenizer import load_tokenizer
        from rnntransducer_tpu.train.checkpoint import load_decode_params
        tok = load_tokenizer(cfg.vocab_path, cfg.model.jointnet.num_classes)
        params, _ = load_decode_params(cfg.train.checkpoint_dir, cfg)
    else:
        trainer = Trainer(cfg, train_ds, val_dataset=heldout)
        trainer.fit()
        tok = trainer.tokenizer
        # BEST-val checkpoint, not the final step: homophone slots cannot
        # be fit honestly, so late training buys loss only by memorizing
        # per-utterance noise — the top-k-by-val_cer retention exists for
        # exactly this
        from rnntransducer_tpu.train.checkpoint import load_decode_params
        params, desc = load_decode_params(cfg.train.checkpoint_dir, cfg)
        print(f"# decoding with {desc}", flush=True)
    model = build_model(cfg)
    variables = {"params": params}

    word_texts = ["".join(tok.ids_to_tokens[g] for g in w)
                  for w in train_ds.lexicon]
    lm_path = os.path.join(cfg.train.checkpoint_dir, "word_bigram.arpa")
    build_bigram_arpa(word_texts,
                      [train_ds.word_sequences(i)
                       for i in range(len(train_ds))], lm_path)

    items = [dict(feats=heldout[i]["feats"], labels=heldout[i]["labels"])
             for i in range(args.eval_n)]

    def run(label, **kw):
        r = evaluate_corpus(model, variables, tok, acfg, items,
                            beam_width=args.beam_width, frame_bucket=256,
                            **kw)
        s = r.summary()
        hacc, htot = homophone_accuracy(heldout, r.per_utt, args.eval_n)
        row = {"testbed": "confusable", "variant": label,
               "cer": round(s["cer"], 4), "wer": round(s["wer"], 4),
               "homophone_acc": round(hacc, 4), "homophone_slots": htot,
               "utts": args.eval_n}
        if s.get("oracle_cer") is not None:
            row["oracle_cer"] = round(s["oracle_cer"], 4)
        print(json.dumps(row), flush=True)
        return r

    run("greedy", decoder="greedy")
    run("beam4", decoder="beam_batched", oracle_nbest=True)
    dev_results = {}
    for w in args.weights:
        lm_w = NGramLM.load(lm_path, weight=w, beta=args.beta)
        wlm = build_device_word_lm(lm_w, tok, word_texts)
        dev_results[w] = run(f"beam4+device_word_lm w={w}",
                             decoder="beam_batched", word_lm=wlm)

    # host-fusion cross-check on a subset: same weight, host A/B beam
    w = args.weights[len(args.weights) // 2]
    lm_w = NGramLM.load(lm_path, weight=w, beta=args.beta)
    sub = items[:args.host_check_n]
    r_host = evaluate_corpus(model, variables, tok, acfg, sub,
                             decoder="beam", beam_width=args.beam_width,
                             frame_bucket=256, lm=lm_w)
    dev_sub = dev_results[w].per_utt[:args.host_check_n]
    agree = sum(dev_sub[i]["hyp"] == r_host.per_utt[i]["hyp"]
                for i in range(args.host_check_n))
    print(json.dumps({
        "testbed": "confusable", "variant": f"host_vs_device w={w}",
        "host_cer": round(r_host.cer, 4),
        "device_cer": round(float(np.mean([u["cer"] for u in dev_sub])), 4),
        "token_agreement": f"{agree}/{args.host_check_n}"}), flush=True)


if __name__ == "__main__":
    main()
