"""Deployment bundles (utils/export.py): jax.export-serialized greedy
transcription programs round-trip through disk and reproduce the live
decode exactly.  The reference has no deployment artifact beyond a
code-coupled Lightning ckpt (/root/reference/inference.py:19-25)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rnntransducer_tpu.tokenizer import GraphemeTokenizer, compose_jamo
from rnntransducer_tpu.train import TrainState, build_model
from rnntransducer_tpu.utils.export import (
    ExportedTranscriber, export_transcriber,
)

from test_trainer_loop import _cfg


@pytest.fixture(scope="module")
def tiny_model(tmp_path_factory):
    cfg = _cfg(tmp_path_factory.mktemp("cfg"))
    params = TrainState.create(cfg).params
    return cfg, params


def _direct_text(cfg, params, feats, feat_lengths, max_output_len):
    from rnntransducer_tpu.decode.greedy import greedy_decode

    model = build_model(cfg)
    toks, n = greedy_decode(model, {"params": params},
                            jnp.asarray(feats), jnp.asarray(feat_lengths),
                            blank_id=cfg.data.text.pad_token_id,
                            max_output_len=max_output_len)
    tok = GraphemeTokenizer.default(cfg.model.jointnet.num_classes)
    out = []
    for i in range(feats.shape[0]):
        ids = np.asarray(toks[i, :int(n[i])]).tolist()
        out.append(compose_jamo(tok.decode(ids, group_tokens=False)))
    return out


def test_logmel_bundle_roundtrip(tiny_model, tmp_path):
    cfg, params = tiny_model
    out = export_transcriber(cfg, params, str(tmp_path / "bundle"),
                             batch=2, frame_buckets=(32, 64),
                             input_kind="logmel", platforms=("cpu",),
                             max_output_len=64)
    t = ExportedTranscriber(out)
    assert sorted(p["frames"] for p in t.manifest["programs"]) == [32, 64]

    rng = np.random.RandomState(0)
    # three utterances of different lengths -> two batch groups, and the
    # 50-frame one must pick the 64 bucket while the short ones pick 32
    feats = [rng.randn(n, 80).astype(np.float32) for n in (20, 31, 50)]
    got = t.transcribe_batch(feats)
    assert len(got) == 3

    # exact parity vs the live decode at each utterance's bucket shape
    for f, text in zip(feats, got):
        bucket = 32 if f.shape[0] <= 32 else 64
        padded = np.zeros((2, bucket, 80), np.float32)
        padded[0, :f.shape[0]] = f
        want = _direct_text(cfg, params, padded,
                            np.asarray([f.shape[0], 1], np.int32), 64)[0]
        assert text == want


def test_wav_bundle_matches_live_frontend_decode(tiny_model, tmp_path):
    cfg, params = tiny_model
    out = export_transcriber(cfg, params, str(tmp_path / "wbundle"),
                             batch=1, frame_buckets=(64,),
                             input_kind="wav", platforms=("cpu",),
                             max_output_len=64)
    t = ExportedTranscriber(out)
    hop = cfg.data.audio.hop_length
    rng = np.random.RandomState(1)
    wav = (rng.randn(40 * hop).astype(np.float32) * 0.1)

    got = t.transcribe(wav)

    from rnntransducer_tpu.frontend import LogMelFrontend
    width = 63 * hop
    padded = np.zeros((1, width), np.float32)
    padded[0, :len(wav)] = wav
    feats, flens = LogMelFrontend(cfg.data.audio)(
        jnp.asarray(padded), jnp.asarray([len(wav)], np.int32))
    want = _direct_text(cfg, params, feats, flens, 64)[0]
    assert got == want


def test_bundle_rejects_oversize_and_bad_version(tiny_model, tmp_path):
    cfg, params = tiny_model
    out = export_transcriber(cfg, params, str(tmp_path / "b2"),
                             batch=1, frame_buckets=(32,),
                             input_kind="logmel", platforms=("cpu",),
                             max_output_len=32)
    t = ExportedTranscriber(out)
    with pytest.raises(ValueError, match="largest exported bucket"):
        t.transcribe_batch([np.zeros((100, 80), np.float32)])

    import json, os
    mpath = os.path.join(out, "bundle.json")
    m = json.load(open(mpath))
    m["format_version"] = 999
    json.dump(m, open(mpath, "w"))
    with pytest.raises(ValueError, match="unsupported bundle format"):
        ExportedTranscriber(out)


def test_multiplatform_export_serializes(tiny_model, tmp_path):
    """The default cpu+tpu multi-platform lowering produces a loadable
    artifact (executed here on cpu)."""
    cfg, params = tiny_model
    out = export_transcriber(cfg, params, str(tmp_path / "mp"),
                             batch=1, frame_buckets=(32,),
                             input_kind="logmel",
                             max_output_len=32)
    t = ExportedTranscriber(out)
    assert t.manifest["platforms"] == ["cpu", "tpu"]
    text = t.transcribe(np.random.RandomState(2)
                        .randn(20, 80).astype(np.float32))
    assert isinstance(text, str)


def test_beam_bundle_matches_live_batched_beam(tiny_model, tmp_path):
    """decoder="beam" bakes the device-batched beam; the bundle's top-1
    matches the live batched_beam_decode rank."""
    cfg, params = tiny_model
    out = export_transcriber(cfg, params, str(tmp_path / "beam_bundle"),
                             batch=2, frame_buckets=(32,),
                             input_kind="logmel", decoder="beam",
                             beam_width=3, platforms=("cpu",),
                             max_output_len=32)
    t = ExportedTranscriber(out)
    assert t.manifest["decoder"] == "beam"
    assert t.manifest["beam_width"] == 3

    rng = np.random.RandomState(3)
    feats = [rng.randn(n, 80).astype(np.float32) for n in (24, 30)]
    got = t.transcribe_batch(feats)

    from rnntransducer_tpu.decode.beam_batched import batched_beam_decode
    model = build_model(cfg)
    padded = np.zeros((2, 32, 80), np.float32)
    for i, f in enumerate(feats):
        padded[i, :f.shape[0]] = f
    toks, lens, _ = batched_beam_decode(
        model, {"params": params}, jnp.asarray(padded),
        jnp.asarray([24, 30], np.int32),
        blank_id=cfg.data.text.pad_token_id, beam_width=3, max_output_len=32)
    tok = GraphemeTokenizer.default(cfg.model.jointnet.num_classes)
    for i in range(2):
        ids = np.asarray(toks[i, 0, :int(lens[i, 0])]).tolist()
        assert got[i] == compose_jamo(tok.decode(ids, group_tokens=False))


def test_streaming_bundle_matches_live_streaming(tmp_path):
    """A bundle exported with streaming_chunk_frames streams PCM through
    the opaque-carry program and reproduces the live StreamingRecognizer
    token-for-token (which itself equals offline greedy)."""
    import dataclasses

    from rnntransducer_tpu.decode.streaming import StreamingRecognizer
    from rnntransducer_tpu.utils.export import ExportedStreamingSession

    cfg = _cfg(tmp_path)
    m = cfg.model
    m = dataclasses.replace(
        m, transnet=dataclasses.replace(m.transnet, bidirectional=False))
    cfg = dataclasses.replace(cfg, model=m)
    params = TrainState.create(cfg).params

    out = export_transcriber(cfg, params, str(tmp_path / "sbundle"),
                             batch=1, frame_buckets=(64,),
                             input_kind="wav", platforms=("cpu",),
                             max_output_len=64, streaming_chunk_frames=16)
    sess = ExportedStreamingSession(out)

    hop = cfg.data.audio.hop_length
    rng = np.random.RandomState(7)
    wav = rng.randn(45 * hop).astype(np.float32) * 0.1

    got = []
    for i in range(0, len(wav), 4000):  # uneven PCM chunking
        got.extend(sess.feed(wav[i:i + 4000]))
    got.extend(sess.flush())
    assert got == sess.tokens
    assert isinstance(sess.text(), str)

    live = StreamingRecognizer(build_model(cfg), {"params": params},
                               cfg.data.audio,
                               blank_id=cfg.data.text.pad_token_id,
                               chunk_frames=16, max_output_len=64)
    want = []
    for i in range(0, len(wav), 4000):
        want.extend(live.feed(wav[i:i + 4000]))
    want.extend(live.flush())
    assert got == want


def test_streaming_export_rejects_bidirectional(tiny_model, tmp_path):
    cfg, params = tiny_model  # trainer-loop cfg: bidirectional GRU
    with pytest.raises(ValueError, match="unidirectional"):
        export_transcriber(cfg, params, str(tmp_path / "x"),
                           frame_buckets=(32,), input_kind="logmel",
                           platforms=("cpu",), streaming_chunk_frames=8)
