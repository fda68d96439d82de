"""Corpus evaluation (rnntransducer_tpu/eval.py + evaluate.py CLI): metric
correctness (self-decode scores zero), order preservation through
length-sorted batching, wav==feats-path parity, decoder/fusion validation,
and an end-to-end CLI run from a checkpoint + TSV manifest.

Reference analogue: the Lightning `trainer.test` path over
eval_clean/eval_other (/root/reference/train.py:40-58) — here a standalone
subsystem.
"""

import dataclasses
import json
import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import rnntransducer_tpu as rt
from rnntransducer_tpu.eval import (EvalResult, evaluate_corpus,
                                    load_dataset_items, load_manifest_items,
                                    write_per_utt_jsonl)
from rnntransducer_tpu.frontend import LogMelFrontend
from rnntransducer_tpu.tokenizer import GraphemeTokenizer

from tests.test_beam_batched import _make_model


def _tok():
    # 8-id vocab matching the tiny test models' num_classes (the
    # build_default_vocab layout shrunk to its first 8 entries)
    return GraphemeTokenizer({"<pad>": 0, "<unk>": 1, "<s>": 2, "</s>": 3,
                              "|": 4, "a": 5, "b": 6, "c": 7})


def _feat_items(n=5, n_mels=6, seed=0, V=8):
    rng = np.random.RandomState(seed)
    items = []
    for i in range(n):
        T = int(rng.randint(8, 40))
        U = int(rng.randint(1, 5))
        items.append({
            "feats": (rng.randn(T, n_mels) * 2).astype(np.float32),
            "labels": rng.randint(4, V, size=(U,)).astype(np.int32)})
    return items


def test_self_decode_scores_zero_and_order_preserved():
    """Using the model's own greedy hyps as refs must give CER == WER == 0,
    with per-utt records in INPUT order despite length-sorted batching."""
    model, variables = _make_model(seed=1)
    tok = _tok()
    items = _feat_items(n=7, seed=3)

    first = evaluate_corpus(model, variables, tok, rt.config.AudioConfig(),
                            items, decoder="greedy", batch_size=3,
                            frame_bucket=16)
    assert first.n_utts == 7 and len(first.per_utt) == 7
    # feed the hyps back as refs
    items2 = [dict(it, labels=np.asarray(tok.encode(rec["hyp"]), np.int32))
              for it, rec in zip(items, first.per_utt)]
    again = evaluate_corpus(model, variables, tok, rt.config.AudioConfig(),
                            items2, decoder="greedy", batch_size=3,
                            frame_bucket=16)
    assert again.cer == 0.0 and again.wer == 0.0
    for rec, rec2 in zip(first.per_utt, again.per_utt):
        assert rec2["ref"] == rec["hyp"] == rec2["hyp"]
        assert rec2["cer"] == 0.0
    # order: per-utt audio seconds must match the input item, not the
    # length-sorted batch position
    stride = rt.config.AudioConfig().window_stride_sec
    for it, rec in zip(items, first.per_utt):
        assert rec["audio_sec"] == pytest.approx(len(it["feats"]) * stride,
                                                 abs=1e-6)
    assert first.rtf > 0 and "rtf" in first.summary()


def test_wav_items_match_feats_items():
    """Evaluating raw-PCM items must equal evaluating the same utterances'
    precomputed log-mel features (the on-device frontend is the only
    difference)."""
    model, variables = _make_model(seed=2, n_mels=80, uni=False)
    tok = _tok()
    acfg = rt.config.AudioConfig(normalize=False)
    rng = np.random.RandomState(7)
    frontend = LogMelFrontend(acfg)
    wav_items, feat_items = [], []
    for i in range(3):
        wav = (rng.randn(3200 + 1600 * i) * 0.3).astype(np.float32)
        labels = rng.randint(4, 8, size=(3,)).astype(np.int32)
        feats, lens = frontend(jnp.asarray(wav[None]))
        wav_items.append({"wav": wav, "labels": labels})
        feat_items.append({"feats": np.asarray(feats[0, :int(lens[0])]),
                           "labels": labels})
    a = evaluate_corpus(model, variables, tok, acfg, wav_items,
                        decoder="beam_batched", beam_width=2, batch_size=2,
                        frame_bucket=8)
    b = evaluate_corpus(model, variables, tok, acfg, feat_items,
                        decoder="beam_batched", beam_width=2, batch_size=2,
                        frame_bucket=8)
    assert [r["hyp"] for r in a.per_utt] == [r["hyp"] for r in b.per_utt]


def test_host_beam_decoder_runs():
    model, variables = _make_model(seed=4)
    tok = _tok()
    items = _feat_items(n=2, seed=5)
    res = evaluate_corpus(model, variables, tok, rt.config.AudioConfig(),
                          items, decoder="beam", beam_width=2,
                          frame_bucket=16)
    assert res.n_utts == 2
    assert all(isinstance(r["hyp"], str) for r in res.per_utt)


def test_fusion_validation():
    model, variables = _make_model()
    tok = _tok()
    items = _feat_items(n=1)
    acfg = rt.config.AudioConfig()
    with pytest.raises(ValueError, match="beam_batched"):
        evaluate_corpus(model, variables, tok, acfg, items,
                        decoder="greedy", device_lm=object())
    with pytest.raises(ValueError, match="decoder='beam'"):
        evaluate_corpus(model, variables, tok, acfg, items,
                        decoder="greedy", hotwords=["ab"])
    with pytest.raises(ValueError, match="empty"):
        evaluate_corpus(model, variables, tok, acfg, [])


def test_device_lm_changes_eval_hyps():
    """--device_lm wiring: a strongly biased char LM must change the
    evaluation hypotheses vs the unfused run."""
    from rnntransducer_tpu.decode.device_lm import DeviceCharLM

    model, variables = _make_model(seed=6)
    tok = _tok()
    items = _feat_items(n=3, seed=8)
    acfg = rt.config.AudioConfig()
    lm = DeviceCharLM(
        (np.random.RandomState(1).randn(8, 8, 8) * 3).astype(np.float32),
        weight=1.0)
    plain = evaluate_corpus(model, variables, tok, acfg, items,
                            decoder="beam_batched", beam_width=3,
                            frame_bucket=16)
    fused = evaluate_corpus(model, variables, tok, acfg, items,
                            decoder="beam_batched", beam_width=3,
                            device_lm=lm, frame_bucket=16)
    assert ([r["hyp"] for r in plain.per_utt] !=
            [r["hyp"] for r in fused.per_utt])


def test_dataset_items_waveform(tmp_path):
    """load_dataset_items auto-detects the raw-PCM flavour from the ledger."""
    from rnntransducer_tpu.data.dataset import save_waveform_dataset

    acfg = rt.config.AudioConfig()
    rng = np.random.RandomState(0)
    rows = [{"wav": rng.randn(3200).astype(np.float32),
             "labels": np.array([5, 6], np.int32)} for _ in range(3)]
    root = str(tmp_path / "ds")
    save_waveform_dataset(rows, root, "eval_clean", acfg.hop_length)
    items, ids = load_dataset_items([root], "eval_clean", acfg, max_utts=2)
    assert len(items) == 2 and len(ids) == 2
    assert "wav" in items[0] and items[0]["labels"].tolist() == [5, 6]


@pytest.mark.slow
def test_evaluate_cli_end_to_end(tmp_path, capsys, monkeypatch):
    """Full CLI: tiny checkpoint + 2-utterance TSV manifest -> one JSON
    summary line + per-utterance dump."""
    from rnntransducer_tpu.train import CheckpointManager, TrainState
    from rnntransducer_tpu.utils.audio_io import write_wav
    import evaluate as evaluate_cli

    cfg = rt.tiny_config()
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(
            cfg.model,
            transnet=dataclasses.replace(cfg.model.transnet, hidden_size=16,
                                         output_size=16),
            prednet=dataclasses.replace(cfg.model.prednet, hidden_size=16,
                                        output_size=16)))
    ckpt = str(tmp_path / "ckpts")
    mgr = CheckpointManager(ckpt, save_top_k=1)
    mgr.save(1, TrainState.create(cfg), metrics={"val_cer": 0.4})
    mgr.close()
    cfg.to_json(os.path.join(ckpt, "config.json"))

    rng = np.random.RandomState(3)
    manifest = str(tmp_path / "eval.tsv")
    with open(manifest, "w") as f:
        for i in range(2):
            p = str(tmp_path / f"u{i}.wav")
            write_wav(p, rng.randn(3200).astype(np.float32) * 0.1,
                      cfg.data.audio.sample_rate)
            f.write(f"{p}\t가나\n")

    dump = str(tmp_path / "per_utt.jsonl")
    monkeypatch.setattr(sys, "argv", [
        "evaluate.py", "--checkpoint_dir", ckpt, "--manifest", manifest,
        "--decoder", "greedy", "--batch_size", "2", "--frame_bucket", "32",
        "--dump", dump])
    evaluate_cli.main()
    out = capsys.readouterr().out.strip().splitlines()[-1]
    summary = json.loads(out)
    assert summary["n_utts"] == 2
    assert 0.0 <= summary["cer"]
    assert summary["decoder"] == "greedy" and summary["rtf"] > 0
    recs = [json.loads(l) for l in open(dump)]
    assert len(recs) == 2 and all("hyp" in r and "ref" in r for r in recs)
    # the manifest's Hangul transcript round-trips through jamo
    # decomposition -> grapheme ids -> detok as the scored reference
    assert all(len(r["ref"]) > 0 for r in recs)


def test_oracle_nbest_bounds_top1():
    """oracle_nbest: per-utt and corpus oracle CER can never exceed the
    top-1 CER (the top-1 hypothesis is IN the n-best list), and the records
    carry the oracle hypothesis."""
    model, variables = _make_model(seed=9)
    tok = _tok()
    items = _feat_items(n=4, seed=10)
    acfg = rt.config.AudioConfig()
    res = evaluate_corpus(model, variables, tok, acfg, items,
                          decoder="beam_batched", beam_width=4,
                          frame_bucket=16, oracle_nbest=True)
    assert res.oracle_cer is not None
    assert res.oracle_cer <= res.cer + 1e-9
    for r in res.per_utt:
        assert "oracle_hyp" in r and r["oracle_cer"] <= r["cer"] + 1e-9
    assert "oracle_cer" in res.summary()
    # host beam path too
    res2 = evaluate_corpus(model, variables, tok, acfg, items[:2],
                           decoder="beam", beam_width=2, frame_bucket=16,
                           oracle_nbest=True)
    assert res2.oracle_cer is not None and res2.oracle_cer <= res2.cer + 1e-9
    with pytest.raises(ValueError, match="n-best"):
        evaluate_corpus(model, variables, tok, acfg, items,
                        decoder="greedy", oracle_nbest=True)
