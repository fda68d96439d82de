import json

import numpy as np
import jax.numpy as jnp

from rnntransducer_tpu.config import Config, base_config, tiny_config
from rnntransducer_tpu.tokenizer import GraphemeTokenizer, build_default_vocab
from rnntransducer_tpu.utils.masking import flip_sequences, length_mask, mask_sequence


def test_config_loads_reference_schema(tmp_path):
    """The reference config/config.json schema must load unchanged."""
    ref = {
        "model": {
            "transnet": {"input_size": 80, "hidden_size": 1024, "output_size": 512,
                         "num_layers": 8, "rnn_type": "gru", "dropout": 0.2,
                         "bidirectional": True},
            "prednet": {"embedding_size": 72, "hidden_size": 1024, "output_size": 512,
                        "num_layers": 2, "rnn_type": "lstm", "dropout": 0.2},
            "jointnet": {"num_classes": 72},
        },
        "data": {
            "audio": {"window_stride_sec": 0.01, "window_size_sec": 0.025,
                      "sample_rate": 16000, "window": "hamming", "normalize": True,
                      "spec_augment": True, "n_mels": 80, "time_mask_para": 40,
                      "freq_mask_para": 20, "time_mask_cnt": 1, "freq_mask_cnt": 1,
                      "pad_token_id": 0},
            "text": {"pad_token_id": 0, "bos_token_id": 2, "eos_token_id": 3},
        },
    }
    p = tmp_path / "config.json"
    p.write_text(json.dumps(ref))
    cfg = Config.from_json(str(p))
    assert cfg.model.transnet.num_layers == 8
    assert cfg.model.transnet.rnn_type == "gru"
    assert cfg.model.prednet.rnn_type == "lstm"
    assert cfg.model.jointnet.num_classes == 72
    assert cfg.data.audio.win_length == 400          # ceil(16000*0.025)
    assert cfg.data.audio.hop_length == 160          # 16000*0.01
    assert cfg.data.audio.n_fft == 400
    # round trip
    cfg.to_json(str(tmp_path / "rt.json"))
    cfg2 = Config.from_json(str(tmp_path / "rt.json"))
    assert cfg2.model == cfg.model


def test_config_presets():
    assert tiny_config().model.transnet.hidden_size == 320
    assert base_config().model.transnet.hidden_size == 1024


def test_tokenizer_roundtrip(tmp_path):
    tok = GraphemeTokenizer.default(72)
    assert len(tok) == 72
    assert tok.pad_token_id == 0 and tok.blank_token_id == 0
    assert tok.bos_token_id == 2 and tok.eos_token_id == 3
    text = "ㄱㅏ ㄴㅏㄷㅏ"
    ids = tok.encode(text)
    assert tok.word_delimiter_token_id in ids
    assert tok.decode(ids, group_tokens=False) == text
    # save/load Wav2Vec2-style vocab.json
    tok.save(str(tmp_path / "vocab.json"))
    tok2 = GraphemeTokenizer.from_file(str(tmp_path / "vocab.json"))
    assert tok2.vocab == tok.vocab


def test_tokenizer_decode_semantics():
    tok = GraphemeTokenizer.default(72)
    a, b = tok.encode("ㄱ")[0], tok.encode("ㄴ")[0]
    # consecutive duplicates grouped, pad/blank skipped
    assert tok.decode([a, a, 0, b, b, b]) == "ㄱㄴ"
    assert tok.decode([a, a, b], group_tokens=False) == "ㄱㄱㄴ"
    assert tok.decode([0, 0, 0]) == ""


def test_length_mask_and_mask_sequence():
    m = length_mask(jnp.array([3, 0, 5]), 5)
    np.testing.assert_array_equal(
        np.asarray(m),
        [[1, 1, 1, 0, 0], [0, 0, 0, 0, 0], [1, 1, 1, 1, 1]],
    )
    x = jnp.ones((3, 5, 2))
    y = mask_sequence(x, jnp.array([3, 0, 5]))
    assert float(y.sum()) == (3 + 0 + 5) * 2


def test_flip_sequences():
    x = jnp.arange(10).reshape(2, 5).astype(jnp.float32)[..., None]
    out = flip_sequences(x, jnp.array([3, 5]))
    np.testing.assert_array_equal(
        np.asarray(out[..., 0]),
        [[2, 1, 0, 3, 4], [9, 8, 7, 6, 5]],
    )
    # double flip is identity
    out2 = flip_sequences(out, jnp.array([3, 5]))
    np.testing.assert_array_equal(np.asarray(out2), np.asarray(x))


def test_default_vocab_has_jamo():
    v = build_default_vocab(72)
    assert "ㄱ" in v and "ㅣ" in v and "|" in v
    assert v["<pad>"] == 0


def test_flip_sequences_overlong_and_negative_lengths():
    """Regression: lengths > T used to produce NaN via OOB gather fill."""
    x = jnp.arange(10, dtype=jnp.float32).reshape(2, 5, 1)
    out = flip_sequences(x, jnp.array([999, -3]))
    assert bool(jnp.isfinite(out).all())
    # length > T behaves as full-length flip; negative as length 0
    np.testing.assert_array_equal(np.asarray(out[0, :, 0]), [4, 3, 2, 1, 0])
    np.testing.assert_array_equal(np.asarray(out[1, :, 0]), [5, 6, 7, 8, 9])


def test_hangul_decompose_compose_roundtrip():
    from rnntransducer_tpu.tokenizer import compose_jamo, decompose_hangul
    for text in ["간다", "안녕하세요", "값", "닭과 삶", "한국어 music 123",
                 "뷁", "가"]:
        jamo = decompose_hangul(text)
        # decomposition produced only jamo/pass-through (no syllables left)
        assert not any(0xAC00 <= ord(c) <= 0xD7A3 for c in jamo), jamo
        assert compose_jamo(jamo) == text, (text, jamo, compose_jamo(jamo))


def test_hangul_tokenizer_end_to_end():
    from rnntransducer_tpu.tokenizer import compose_jamo, decompose_hangul
    tok = GraphemeTokenizer.default(72)
    text = "안녕하세요 세계"
    ids = tok.encode(decompose_hangul(text))
    assert all(i != tok.unk_token_id for i in ids)
    back = compose_jamo(tok.decode(ids, group_tokens=False))
    assert back == text


def test_config_json_round_trip_stays_hashable(tmp_path):
    """Regression: a Config serialized with to_json and reloaded must remain
    hashable — it is a jit static argument, and JSON turns tuples (e.g.
    inference.hotwords) into lists. A round-tripped config broke train.py
    with 'unhashable type: list'."""
    import dataclasses

    from rnntransducer_tpu.config import Config, InferenceConfig

    cfg = Config()
    cfg = dataclasses.replace(cfg, inference=InferenceConfig(
        hotwords=("foo", "bar")))
    path = str(tmp_path / "cfg.json")
    cfg.to_json(path)
    back = Config.from_json(path)
    assert hash(back) == hash(cfg)
    assert back == cfg


def test_embedding_smaller_than_vocab_rejected():
    """embedding_size is the VOCAB size (reference decoder.py:28,69); a
    table smaller than num_classes used to NaN silently via out-of-range
    gathers — it must fail at config construction instead."""
    import pytest

    from rnntransducer_tpu.config import (
        JointNetConfig, ModelConfig, PredNetConfig,
    )

    with pytest.raises(ValueError, match="embedding_size"):
        ModelConfig(prednet=PredNetConfig(embedding_size=16),
                    jointnet=JointNetConfig(num_classes=72))
