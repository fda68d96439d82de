"""Per-token emission timestamps in greedy decode: offline, chunked
(cross-chunk frame offset), streaming property, and the Recognizer surface.
The reference's decoders carry no timing at all
(``networks/transducer.py:95-145``)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import rnntransducer_tpu as rt
from rnntransducer_tpu.config import AudioConfig
from rnntransducer_tpu.decode import greedy_decode, greedy_decode_with_times
from rnntransducer_tpu.decode.greedy import (
    greedy_decode_frames, init_greedy_carry,
)
from rnntransducer_tpu.models import RNNTransducer


def _uni_model(stride=1, seed=0):
    cfg = rt.config.ModelConfig(
        transnet=rt.config.TransNetConfig(
            input_size=80, hidden_size=16, output_size=12, num_layers=2,
            rnn_type="lstm", dropout=0.0, bidirectional=False,
            time_reduction_stride=stride, time_reduction_layer=1),
        prednet=rt.config.PredNetConfig(embedding_size=32, hidden_size=16,
                                        output_size=12, num_layers=1,
                                        rnn_type="lstm", dropout=0.0),
        jointnet=rt.config.JointNetConfig(num_classes=32),
    )
    model = RNNTransducer(cfg)
    variables = model.init(jax.random.PRNGKey(seed), jnp.zeros((1, 4, 80)),
                           jnp.array([4]), jnp.zeros((1, 2), jnp.int32),
                           jnp.array([2]))
    return model, variables


@pytest.mark.parametrize("stride", [1, 2])
def test_times_valid_and_match_tokens(stride):
    model, variables = _uni_model(stride, seed=1)
    rng = np.random.RandomState(0)
    B, T = 3, 40
    feats = jnp.asarray(rng.randn(B, T, 80).astype(np.float32) * 2)
    lengths = jnp.array([T, 25, 11], jnp.int32)

    toks, lens = greedy_decode(model, variables, feats, lengths)
    toks_t, lens_t, times = greedy_decode_with_times(model, variables, feats,
                                                     lengths)
    np.testing.assert_array_equal(np.asarray(toks), np.asarray(toks_t))
    np.testing.assert_array_equal(np.asarray(lens), np.asarray(lens_t))

    enc_lens = np.asarray(model.cfg.transnet.output_lengths(lengths))
    times, lens = np.asarray(times), np.asarray(lens)
    assert lens.sum() > 0  # untrained models emit plenty of tokens
    for b in range(B):
        row = times[b, :lens[b]]
        assert np.all(row >= 0)
        assert np.all(row < enc_lens[b])  # emitted on a valid encoder frame
        assert np.all(np.diff(row) >= 0)  # emissions are time-monotone


def test_times_consistent_across_chunks():
    """Feeding the encoder output in two greedy_decode_frames calls must
    give the same absolute times as one call (frames_done offset)."""
    model, variables = _uni_model(seed=2)
    rng = np.random.RandomState(3)
    T = 32
    feats = jnp.asarray(rng.randn(1, T, 80).astype(np.float32) * 2)
    lengths = jnp.array([T], jnp.int32)
    enc, _ = model.apply(variables, feats, lengths, method=model.encode)

    one = init_greedy_carry(model, variables, 1, 0, 64)
    one = greedy_decode_frames(model, variables, enc, lengths, one)

    two = init_greedy_carry(model, variables, 1, 0, 64)
    two = greedy_decode_frames(model, variables, enc[:, :12],
                               jnp.array([12]), two)
    assert int(two.frames_done[0]) == 12
    two = greedy_decode_frames(model, variables, enc[:, 12:],
                               jnp.array([T - 12]), two)

    n1, n2 = int(one.lengths[0]), int(two.lengths[0])
    assert n1 == n2 and n1 > 0
    np.testing.assert_array_equal(np.asarray(one.tokens), np.asarray(two.tokens))
    np.testing.assert_array_equal(np.asarray(one.times[0, :n1]),
                                  np.asarray(two.times[0, :n2]))


@pytest.mark.parametrize("stride", [1, 2])
def test_streaming_timestamps_property(stride):
    from rnntransducer_tpu.decode.streaming import StreamingRecognizer
    from rnntransducer_tpu.frontend import LogMelFrontend

    model, variables = _uni_model(stride, seed=4)
    acfg = AudioConfig(normalize=False)
    rng = np.random.RandomState(5)
    wav = (rng.randn(9600) * 2).astype(np.float32)

    feats, lengths = LogMelFrontend(acfg)(jnp.asarray(wav[None]))
    _, lens, times = greedy_decode_with_times(model, variables, feats,
                                              lengths, max_output_len=512)
    sec = stride * acfg.window_stride_sec
    want = [float(t) * sec for t in np.asarray(times)[0, :int(lens[0])]]

    rec = StreamingRecognizer(model, variables, acfg, chunk_frames=16,
                              normalize="none", max_output_len=512)
    for s in range(0, len(wav), 1600):
        rec.feed(wav[s:s + 1600])
    rec.flush()
    got = rec.timestamps
    assert got == pytest.approx(want)
    assert all(b >= a for a, b in zip(got, got[1:]))


def test_streaming_timestamps_rejects_beam():
    from rnntransducer_tpu.decode.streaming import StreamingRecognizer
    model, variables = _uni_model(seed=6)
    rec = StreamingRecognizer(model, variables, AudioConfig(normalize=False),
                              chunk_frames=16, decoder="beam")
    with pytest.raises(ValueError, match="greedy"):
        _ = rec.timestamps


def test_recognizer_transcribe_with_timestamps(tmp_path):
    """End-to-end serving surface: text matches plain greedy transcribe and
    every token gets a second-scaled stamp."""
    from rnntransducer_tpu.serve import Recognizer
    from rnntransducer_tpu.utils.audio_io import write_wav
    from tests.test_serve import _cfg
    from rnntransducer_tpu.data import SyntheticAudioDataset
    from rnntransducer_tpu.train import Trainer

    cfg = _cfg(tmp_path)
    ds = SyntheticAudioDataset(4, AudioConfig(), min_sec=0.3, max_sec=0.6,
                               min_labels=3, max_labels=8, seed=0)
    tr = Trainer(cfg, ds, val_dataset=None)
    tr.fit()
    tr.ckpt.close()

    wav_path = str(tmp_path / "a.wav")
    write_wav(wav_path, np.random.RandomState(0).randn(8000) * 0.1)
    rec = Recognizer.from_checkpoint(str(tmp_path / "ckpt"), decoder="greedy")
    text, stamps = rec.transcribe_with_timestamps(wav_path)
    assert text == rec.transcribe(wav_path)
    secs = [t for _, t in stamps]
    assert all(b >= a for a, b in zip(secs, secs[1:]))
    # 0.5 s of audio -> every stamp within the utterance
    assert all(0.0 <= t <= 0.6 for t in secs)
    assert all(isinstance(tok, str) for tok, _ in stamps)


def test_batched_session_timestamps():
    """Continuous-batching lanes expose .timestamps like the single-session
    recognizer; values survive flush() (slot reuse) and match the
    single-session streaming path."""
    from rnntransducer_tpu.decode.session_batch import BatchedStreamingRunner
    from rnntransducer_tpu.decode.streaming import StreamingRecognizer

    model, variables = _uni_model(seed=7)
    acfg = AudioConfig(normalize=False)
    rng = np.random.RandomState(8)
    wav = (rng.randn(8000) * 2).astype(np.float32)

    ref = StreamingRecognizer(model, variables, acfg, chunk_frames=16,
                              normalize="none")
    ref.feed(wav)
    ref.flush()

    runner = BatchedStreamingRunner(model, variables, acfg, max_sessions=2,
                                    chunk_frames=16)
    sess = runner.open()
    sess.feed(wav)
    live = sess.timestamps  # pre-flush poll
    assert all(b >= a for a, b in zip(live, live[1:]))
    sess.flush()
    assert sess.timestamps == pytest.approx(ref.timestamps)
    assert sess.tokens == ref.tokens

    # beam lanes refuse
    runner_b = BatchedStreamingRunner(model, variables, acfg, max_sessions=1,
                                      chunk_frames=16, decoder="beam")
    sb = runner_b.open()
    with pytest.raises(ValueError, match="greedy"):
        _ = sb.timestamps
    sb.abort()


def test_socket_final_reply_carries_times(tmp_path):
    """The TCP server's final greedy reply includes per-token seconds."""
    import json
    import socket
    import struct
    from rnntransducer_tpu.serve import Recognizer
    from rnntransducer_tpu.serve_socket import StreamingServer
    from rnntransducer_tpu.utils.audio_io import write_wav
    from tests.test_serve import _cfg
    from rnntransducer_tpu.data import SyntheticAudioDataset
    from rnntransducer_tpu.train import Trainer

    cfg = _cfg(tmp_path)
    ds = SyntheticAudioDataset(4, AudioConfig(), min_sec=0.3, max_sec=0.6,
                               min_labels=3, max_labels=8, seed=0)
    tr = Trainer(cfg, ds, val_dataset=None)
    tr.fit()
    tr.ckpt.close()
    rec = Recognizer.from_checkpoint(str(tmp_path / "ckpt"), decoder="greedy")
    wav = (np.random.RandomState(0).randn(8000) * 0.1).astype(np.float32)

    def roundtrip(batch_sessions):
        with StreamingServer(rec, port=0, chunk_frames=16,
                             batch_sessions=batch_sessions) as server:
            with socket.socket() as s:
                s.connect(("127.0.0.1", server.port))
                pcm16 = np.clip(wav * 32768, -32768, 32767).astype("<i2")
                payload = pcm16.tobytes()
                s.sendall(struct.pack("<i", len(payload)) + payload)
                s.recv(1 << 16)  # partial
                s.sendall(struct.pack("<i", 0))
                buf = b""
                while not buf.endswith(b"\n"):
                    chunk = s.recv(1 << 16)
                    if not chunk:
                        break
                    buf += chunk
                return json.loads(buf.splitlines()[-1])

    for bs in (0, 1):  # unbatched StreamingRecognizer and batched lane
        final = roundtrip(bs)
        assert "times" in final, final
        assert len(final["times"]) == len(final["tokens"])
        assert all(b >= a for a, b in zip(final["times"], final["times"][1:]))
