"""Subword (BPE) tokenizer: training determinism, encode/decode round trip,
compression vs characters, save/load + format sniffing, decode-surface
contract (blank == pad == 0), and the host word-LM fusion guard.

Beyond-reference: the reference is grapheme-only
(/root/reference/model.py:24, 72-entry vocab.json)."""

import json

import numpy as np
import pytest

from rnntransducer_tpu.tokenizer import (GraphemeTokenizer, SubwordTokenizer,
                                         decompose_hangul, load_tokenizer,
                                         train_bpe)

CORPUS = [
    "안녕하세요 세상 안녕 안녕하세요",
    "세상 세상 하세요 안녕",
    "안녕 하세요 세상 안녕하세요",
]


def _tok(vocab_size=64):
    return train_bpe(CORPUS, vocab_size)


def test_training_is_deterministic():
    a, b = _tok(), _tok()
    assert a.vocab == b.vocab and a.merges == b.merges


def test_round_trip_and_compression():
    tok = _tok()
    for line in CORPUS:
        ids = tok.encode(line)
        assert tok.decode(ids, group_tokens=False) == decompose_hangul(line)
        # subwords must beat characters (that is their point)
        n_chars = len(decompose_hangul(line).replace(" ", ""))
        assert len(ids) < n_chars
    # frequent whole words collapse to single pieces
    assert len(tok.encode("안녕")) == 1


def test_contract_blank_pad_zero_and_specials():
    tok = _tok()
    assert tok.blank_token_id == tok.pad_token_id == 0
    assert tok.unk_token_id == 1
    assert tok.word_delimiter_token_id is None
    # specials never surface in decoded text
    ids = [0, 1, 2, 3] + tok.encode("세상")
    assert tok.decode(ids, group_tokens=False) == "세상" or \
        tok.decode(ids, group_tokens=False) == decompose_hangul("세상")


def test_group_tokens_dedup():
    tok = _tok()
    ids = tok.encode("안녕")
    assert tok.decode(ids + ids) != tok.decode(ids + ids, group_tokens=False)


def test_jamo_normalize_idempotent():
    tok = _tok()
    assert tok.encode("안녕 세상") == tok.encode(decompose_hangul("안녕 세상"))


def test_unknown_chars_fall_back():
    tok = _tok()
    ids = tok.encode("xyz")
    assert len(ids) == 3 and all(i == tok.unk_token_id for i in ids)


def test_save_load_and_sniffing(tmp_path):
    tok = _tok()
    p = str(tmp_path / "bpe.json")
    tok.save(p)
    again = SubwordTokenizer.from_file(p)
    assert again.encode("안녕하세요 세상") == tok.encode("안녕하세요 세상")
    # load_tokenizer sniffs the format: merges -> subword, plain -> grapheme
    assert isinstance(load_tokenizer(p), SubwordTokenizer)
    g = str(tmp_path / "vocab.json")
    GraphemeTokenizer.default(72).save(g)
    assert isinstance(load_tokenizer(g), GraphemeTokenizer)
    assert isinstance(load_tokenizer(None, 72), GraphemeTokenizer)
    with pytest.raises(ValueError, match="merges"):
        SubwordTokenizer.from_file(g)


def test_vocab_size_cap_respected():
    tok = _tok(vocab_size=30)
    assert len(tok) <= 30


def test_host_lm_fusion_refuses_subword():
    from rnntransducer_tpu.decode.beam import BeamSearchDecoder
    from tests.test_beam_batched import _make_model

    model, variables = _make_model()
    tok = _tok(vocab_size=8)

    class _FakeLM:  # never called: the constructor must already refuse
        pass

    with pytest.raises(ValueError, match="word-delimiter"):
        BeamSearchDecoder(model, variables, tokenizer=tok, lm=_FakeLM())


def test_evaluate_with_subword_tokenizer():
    """The evaluation subsystem runs end-to-end on a subword vocab: the
    model's num_classes just matches len(tok)."""
    import rnntransducer_tpu as rt
    from rnntransducer_tpu.eval import evaluate_corpus
    from tests.test_beam_batched import _make_model

    tok = _tok(vocab_size=16)
    model, variables = _make_model(V=len(tok))
    rng = np.random.RandomState(0)
    items = [{"feats": (rng.randn(12, 6) * 2).astype(np.float32),
              "labels": np.asarray(tok.encode("안녕 세상"), np.int32)}
             for _ in range(2)]
    res = evaluate_corpus(model, variables, tok, rt.config.AudioConfig(),
                          items, decoder="beam_batched", beam_width=2,
                          frame_bucket=8)
    assert res.n_utts == 2
    assert all(isinstance(r["hyp"], str) for r in res.per_utt)
    assert all(r["ref"] == decompose_hangul("안녕 세상")
               for r in res.per_utt)
