#!/usr/bin/env python
"""The round-4 accuracy LADDER on the hard testbed — a benchmark that can
say no (VERDICT r3 item 4).

The round-3 testbeds saturated (streaming Conformer at CER 0.000 —
BASELINE.md), so they stopped ranking systems.  This experiment trains a
system on ``HardPatternedWaveformDataset`` (additive noise at 5-20 dB SNR,
per-utterance tempo jitter 0.8-1.25x, speaker frequency warp 0.9-1.12x,
gain/offset, word-structured transcripts over a closed lexicon) and
publishes held-out CER/WER for greedy and beam-4, plus word-LM shallow
fusion (bigram ARPA built from the TRAIN transcripts) on an in-vocabulary
eval set and on one with 25% OOV words — so LM fusion has a measurable
upside and a measurable failure surface.

Run (real chip):  python experiments/hard_testbed.py --system uni|bi|conformer
Each run prints one JSON line per (eval set, decoder) cell.
"""

from __future__ import annotations

import argparse
import collections
import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def build_bigram_arpa(word_texts, sentences, path):
    """Count-based bigram ARPA (Katz-free: simple add-one backoff weights)
    over the TRAIN word sequences — the in-image stand-in for a kenlm
    build (not installable here).  ``sentences``: lists of word indices."""
    uni = collections.Counter()
    bi = collections.Counter()
    for s in sentences:
        toks = ["<s>"] + [word_texts[w] for w in s] + ["</s>"]
        for t in toks:
            uni[t] += 1
        for a, b in zip(toks, toks[1:]):
            bi[(a, b)] += 1
    uni["<unk>"] = 1
    total = sum(uni.values())
    lines = ["\\data\\", f"ngram 1={len(uni)}", f"ngram 2={len(bi)}", "",
             "\\1-grams:"]
    for w, c in sorted(uni.items()):
        logp = math.log10(c / total)
        lines.append(f"{logp:.6f}\t{w}\t-0.30103")
    lines += ["", "\\2-grams:"]
    for (a, b), c in sorted(bi.items()):
        logp = math.log10(c / uni[a])
        lines.append(f"{logp:.6f}\t{a} {b}")
    lines += ["", "\\end\\", ""]
    with open(path, "w") as f:
        f.write("\n".join(lines))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--system", default="uni",
                    choices=["uni", "bi", "conformer", "streaming"])
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--train_n", type=int, default=4096)
    ap.add_argument("--eval_n", type=int, default=96)
    ap.add_argument("--ckpt", type=str, default=None)
    ap.add_argument("--lm_weight", type=float, default=0.5)
    ap.add_argument("--skip_lm", action="store_true")
    ap.add_argument("--eval_only", action="store_true",
                    help="skip training; restore the latest checkpoint from "
                         "--ckpt (default /tmp/hard_testbed_<system>)")
    ap.add_argument("--lm_eval_n", type=int, default=24,
                    help="eval subset for the host beam+word-LM rows (the "
                         "host A/B search decodes one utterance at a time "
                         "over the tunnel RPC floor — BASELINE.md; greedy "
                         "and beam_batched rows use the full --eval_n)")
    args = ap.parse_args()
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    from rnntransducer_tpu.config import (
        AudioConfig, Config, DataConfig, JointNetConfig, ModelConfig,
        PredNetConfig, TrainConfig, TransNetConfig,
    )
    from rnntransducer_tpu.data.dataset import HardPatternedWaveformDataset
    from rnntransducer_tpu.eval import evaluate_corpus
    from rnntransducer_tpu.tokenizer import GraphemeTokenizer
    from rnntransducer_tpu.train import Trainer, build_model

    acfg = AudioConfig(spec_augment=True, freq_mask_cnt=1, time_mask_cnt=1,
                       freq_mask_para=12, time_mask_para=16)
    mk = lambda n, seed, oov, **kw: HardPatternedWaveformDataset(
        n, acfg, seed=seed, oov_fraction=oov, **kw)
    train_ds = mk(args.train_n, 0, 0.0)
    eval_iv = mk(args.eval_n, 50_000, 0.0)    # held out, in-vocab words
    eval_oov = mk(args.eval_n, 60_000, 0.25)  # held out, 25% OOV words
    # mismatched "stress" set: SNR below the training range and wider
    # tempo/speaker jitter — the condition ladder real ASR evals use when
    # the matched set saturates (a strong system CAN reach CER 0.000 on
    # matched; this rung stays non-zero and keeps ranking systems)
    eval_stress = mk(args.eval_n, 70_000, 0.0, snr_db_range=(0.0, 5.0),
                     tempo_range=(0.7, 1.4), speaker_range=(0.85, 1.2))

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
        # the STREAMING product stack (VERDICT r4 item 5): chunked-causal
        # Conformer (80 ms chunks + 2 left chunks of context, causal conv)
        # + stateless bigram prednet + FastEmit — the configuration the
        # streaming decode path would actually ship, on the same ladder
        # and budget as the offline systems
        tn = TransNetConfig(input_size=80, hidden_size=256, output_size=256,
                            num_layers=4, rnn_type="lstm", dropout=0.1,
                            bidirectional=False, arch="conformer",
                            attention_heads=4, attention_chunk=8,
                            attention_left_chunks=2, scan_blocks=False)
    streaming = args.system == "streaming"
    pn_type = "stateless" if streaming else "lstm"
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
        train=TrainConfig(learning_rate=2e-3, max_steps=args.steps,
                          per_device_train_batch_size=32, precision="bf16",
                          log_every_steps=100, val_every_steps=args.steps // 2,
                          checkpoint_dir=(args.ckpt or
                                          f"/tmp/hard_testbed_{args.system}"),
                          warmup_ratio=0.1,
                          fastemit_lambda=0.01 if streaming else 0.0),
    )
    if args.eval_only:
        from rnntransducer_tpu.tokenizer import load_tokenizer
        from rnntransducer_tpu.train.checkpoint import load_decode_params
        tok = load_tokenizer(cfg.vocab_path,
                             cfg.model.jointnet.num_classes)
        params, _ = load_decode_params(cfg.train.checkpoint_dir, cfg)
    else:
        trainer = Trainer(cfg, train_ds, val_dataset=eval_iv)
        trainer.fit()
        tok = trainer.tokenizer
        params = trainer.state.params
    model = build_model(cfg)
    variables = {"params": params}

    lm = None
    lm_path = None
    if not args.skip_lm:
        word_texts = ["".join(tok.ids_to_tokens[g] for g in w)
                      for w in train_ds.lexicon]
        lm_path = os.path.join(cfg.train.checkpoint_dir, "word_bigram.arpa")
        # the LM sees only IN-VOCAB words (train draws none from the OOV
        # slice), so eval_oov stresses its failure surface
        build_bigram_arpa(word_texts,
                          [train_ds.word_sequences(i)
                           for i in range(len(train_ds))], lm_path)
        from rnntransducer_tpu.decode.ngram_lm import NGramLM
        lm = NGramLM.load(lm_path, weight=args.lm_weight, beta=0.0)

    def run(name, ds, decoder, n=None, **kw):
        items = [dict(feats=ds[i]["feats"], labels=ds[i]["labels"])
                 for i in range(n or len(ds))]
        r = evaluate_corpus(model, variables, tok, acfg, items,
                            decoder=decoder, beam_width=4,
                            frame_bucket=256, **kw)
        s = r.summary()
        print(json.dumps({"system": args.system, "eval": name,
                          "decoder": decoder + ("+lm" if kw.get("lm") else ""),
                          "cer": round(s["cer"], 4),
                          "wer": round(s["wer"], 4),
                          "utts": len(items)}), flush=True)

    run("heldout_iv", eval_iv, "greedy")
    run("heldout_iv", eval_iv, "beam_batched")
    run("heldout_stress", eval_stress, "greedy")
    run("heldout_oov", eval_oov, "greedy")

    if args.system in ("uni", "streaming"):
        # emission latency (causal systems only — the streaming rung's
        # second axis, VERDICT r4 item 5): the testbed's alignment is
        # known per utterance (label u owns input frames
        # [u*fpl_i, (u+1)*fpl_i), fpl_i tempo-scaled), so each
        # correctly-decoded token's delay is emitted_frame - u*fpl_i
        import numpy as np
        from rnntransducer_tpu.decode.greedy import greedy_decode_with_times
        items = [eval_iv[i] for i in range(args.eval_n)]
        tpad = max(it["feats"].shape[0] for it in items)
        tpad = ((tpad + 127) // 128) * 128
        fe = np.zeros((len(items), tpad, 80), np.float32)
        fl = np.zeros((len(items),), np.int32)
        for r, it in enumerate(items):
            fe[r, :it["feats"].shape[0]] = it["feats"]
            fl[r] = it["feats"].shape[0]
        toks, lens, times = greedy_decode_with_times(
            model, variables, jax.numpy.asarray(fe), jax.numpy.asarray(fl),
            max_output_len=64)
        toks, lens, times = map(np.asarray, (toks, lens, times))
        stride = cfg.model.transnet.time_reduction_stride
        delays, exact = [], 0
        for r in range(len(items)):
            hyp = list(toks[r, :lens[r]])
            if hyp != list(items[r]["labels"]):
                continue
            exact += 1
            fpl = eval_iv._samples_per_label(r) / acfg.hop_length
            tms = times[r, :lens[r]] * stride
            delays.extend(float(tms[u]) - u * fpl for u in range(lens[r]))
        print(json.dumps({
            "system": args.system, "eval": "heldout_iv",
            "metric": "emission_delay_frames",
            "mean_delay": (round(float(np.mean(delays)), 2) if delays
                           else None),
            "mean_delay_ms": (round(float(np.mean(delays)) * 10, 1)
                              if delays else None),
            "exact_utts": exact, "utts": len(items)}), flush=True)
    if lm is not None:
        # LM-fusion delta: the no-LM anchor is the DEVICE batched beam on
        # the same subset (cheap), the fused row is the host A/B beam with
        # the word bigram — paired on identical utterances so the delta is
        # the measured quantity.  Subset size bounds the host search, which
        # decodes one utterance at a time over the tunnel RPC floor.
        # Measured on the stress set (where acoustics are ambiguous and an
        # LM has something to resolve) and the OOV set (its failure
        # surface: the LM never saw those words).
        run("heldout_stress", eval_stress, "beam_batched", n=args.lm_eval_n)
        run("heldout_stress", eval_stress, "beam", n=args.lm_eval_n, lm=lm)
        run("heldout_oov", eval_oov, "beam_batched", n=args.lm_eval_n)
        run("heldout_oov", eval_oov, "beam", n=args.lm_eval_n, lm=lm)


if __name__ == "__main__":
    main()
