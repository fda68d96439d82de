"""Inference precision policy (utils/precision.py): bf16 decode across the
offline, streaming, batched-serving and corpus-eval surfaces.

The reference has no inference-precision control (its eval runs whatever
Lightning left behind, ``/root/reference/inference.py:13-66``); here bf16
decode is a first-class serving knob — small-batch decode is HBM-bandwidth
bound, so halving the weight bytes per tick is the cheap TPU win.  Beam
scores must stay fp32 regardless (``decode/beam*.py``).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import rnntransducer_tpu as rt
from rnntransducer_tpu.config import AudioConfig
from rnntransducer_tpu.decode import batched_beam_decode, greedy_decode
from rnntransducer_tpu.decode.beam import BeamSearchDecoder
from rnntransducer_tpu.decode.streaming import StreamingRecognizer
from rnntransducer_tpu.frontend import LogMelFrontend
from rnntransducer_tpu.models import RNNTransducer
from rnntransducer_tpu.utils.precision import (cast_float_leaves,
                                               decode_dtype,
                                               match_param_dtype,
                                               param_dtype)

from tests.test_streaming import _uni_model


def test_cast_float_leaves_and_param_dtype():
    tree = {"w": jnp.ones((2, 2), jnp.float32),
            "step": jnp.array(7, jnp.int32),
            "flag": np.array([True]),
            "np_w": np.ones((3,), np.float32)}
    out = cast_float_leaves(tree, jnp.bfloat16)
    assert out["w"].dtype == jnp.bfloat16
    assert out["np_w"].dtype == jnp.bfloat16      # numpy leaf, no device trip
    assert isinstance(out["np_w"], np.ndarray)
    assert out["step"].dtype == jnp.int32          # int leaves untouched
    assert out["flag"].dtype == np.bool_
    assert param_dtype(out) == jnp.bfloat16
    assert param_dtype({"i": jnp.array(1)}) == jnp.float32  # default
    with pytest.raises(ValueError, match="unknown precision"):
        decode_dtype("fp16")


def test_match_param_dtype_casts_floats_only():
    v = {"params": {"w": jnp.ones((2,), jnp.bfloat16)}}
    x = jnp.ones((3,), jnp.float32)
    assert match_param_dtype(v, x).dtype == jnp.bfloat16
    ix = jnp.ones((3,), jnp.int32)
    assert match_param_dtype(v, ix).dtype == jnp.int32


def _bf16(variables):
    return cast_float_leaves(variables, jnp.bfloat16)


def test_greedy_decode_bf16_runs_and_encoder_is_bf16():
    model, variables = _uni_model(seed=3)
    vb = _bf16(variables)
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(2, 24, 80).astype(np.float32))
    lengths = jnp.array([24, 17])
    # fp32 features are cast to the params' dtype at the decode boundary
    enc, _ = model.apply(vb, match_param_dtype(vb, feats), lengths,
                         method=model.encode)
    assert enc.dtype == jnp.bfloat16
    toks, lens = greedy_decode(model, vb, feats, lengths, max_output_len=64)
    toks, lens = np.asarray(toks), np.asarray(lens)
    V = model.cfg.jointnet.num_classes
    assert toks.shape == (2, 64) and np.all(lens <= 64)
    assert np.all((toks >= 0) & (toks < V))


def test_batched_beam_bf16_scores_fp32_finite_and_ranked():
    model, variables = _uni_model(seed=4)
    vb = _bf16(variables)
    rng = np.random.RandomState(1)
    feats = jnp.asarray(rng.randn(2, 20, 80).astype(np.float32))
    lengths = jnp.array([20, 13])
    toks, lens, scores = batched_beam_decode(model, vb, feats, lengths,
                                             beam_width=4, max_output_len=48)
    scores, lens = np.asarray(scores), np.asarray(lens)
    assert scores.dtype == np.float32          # ranking never in bf16
    assert np.all(np.isfinite(scores))
    # rank order is by length-normalized score (rank_beam length_norm=True
    # ranks by scores / (lens + 1))
    norm = scores / (lens + 1)
    assert np.all(np.diff(norm, axis=1) <= 1e-5)  # best-first


def test_streaming_bf16_matches_offline_bf16_exactly():
    """Chunked carry streaming is a sequential scan — same dtype in, same
    tokens out, bit-for-bit, even at 8-bit mantissa."""
    model, variables = _uni_model(seed=2)
    vb = _bf16(variables)
    acfg = AudioConfig(normalize=False)
    wav = (np.random.RandomState(5).randn(12000) * 2).astype(np.float32)

    feats, lengths = LogMelFrontend(acfg)(jnp.asarray(wav[None]))
    toks, lens = greedy_decode(model, vb, feats, lengths, max_output_len=256)
    want = list(np.asarray(toks)[0, :int(lens[0])])

    rec = StreamingRecognizer(model, variables, acfg, chunk_frames=16,
                              normalize="none", precision="bf16")
    assert param_dtype(rec.variables) == jnp.bfloat16
    out = []
    for s in range(0, len(wav), 1600):
        out.extend(rec.feed(wav[s:s + 1600]))
    out.extend(rec.flush())
    assert out == want


def test_host_beam_bf16_decodes():
    model, variables = _uni_model(seed=6)
    dec = BeamSearchDecoder(model, _bf16(variables), beam_width=2)
    rng = np.random.RandomState(2)
    feats = jnp.asarray(rng.randn(1, 12, 80).astype(np.float32))
    nbest = dec.decode(feats, jnp.array([12]))
    assert len(nbest) >= 1
    V = model.cfg.jointnet.num_classes
    assert all(0 <= t < V for t in nbest[0])


def test_session_batch_precision_bf16_tick():
    from rnntransducer_tpu.decode.session_batch import BatchedStreamingRunner
    model, variables = _uni_model(seed=7)
    acfg = AudioConfig(normalize=False)
    runner = BatchedStreamingRunner(model, variables, acfg, max_sessions=2,
                                    chunk_frames=16, precision="bf16")
    assert param_dtype(runner.variables) == jnp.bfloat16
    assert runner._enc_state.h.dtype == jnp.bfloat16  # carry matches params
    sess = runner.open(normalize="none")
    wav = (np.random.RandomState(8).randn(6400) * 2).astype(np.float32)
    sess.feed(wav)
    toks = sess.flush()
    V = model.cfg.jointnet.num_classes
    assert all(0 <= t < V for t in toks)


def test_evaluate_corpus_precision_bf16():
    from rnntransducer_tpu.eval import evaluate_corpus
    from rnntransducer_tpu.tokenizer import GraphemeTokenizer
    from tests.test_beam_batched import _make_model
    model, variables = _make_model(seed=11)
    tok = GraphemeTokenizer({"<pad>": 0, "<unk>": 1, "<s>": 2, "</s>": 3,
                             "|": 4, "a": 5, "b": 6, "c": 7})
    rng = np.random.RandomState(3)
    items = [{"feats": (rng.randn(24, 6) * 2).astype(np.float32),
              "labels": rng.randint(4, 8, size=3).astype(np.int32)}
             for _ in range(3)]
    res = evaluate_corpus(model, variables, tok, rt.config.AudioConfig(),
                          items, decoder="greedy", frame_bucket=16,
                          precision="bf16")
    assert res.n_utts == 3 and np.isfinite(res.cer)
