"""Streaming: chunked frontend == offline frontend bit-for-bit; streaming
recognizer == offline greedy decode; chunk-size invariance."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import rnntransducer_tpu as rt
from rnntransducer_tpu.config import AudioConfig
from rnntransducer_tpu.decode import greedy_decode
from rnntransducer_tpu.decode.streaming import StreamingFrontend, StreamingRecognizer
from rnntransducer_tpu.frontend import LogMelFrontend
from rnntransducer_tpu.models import RNNTransducer


@pytest.mark.parametrize("chunk", [160, 450, 1600, 7000])
def test_streaming_frontend_matches_offline(chunk):
    cfg = AudioConfig(normalize=False)
    rng = np.random.RandomState(0)
    wav = rng.randn(7350).astype(np.float32)

    offline, lengths = LogMelFrontend(cfg)(jnp.asarray(wav[None]))
    offline = np.asarray(offline[0])

    sf = StreamingFrontend(cfg, normalize="none")
    frames = []
    for s in range(0, len(wav), chunk):
        frames.append(sf.feed(wav[s:s + chunk]))
    frames.append(sf.flush())
    got = np.concatenate([f for f in frames if len(f)])
    assert got.shape == offline.shape == (int(lengths[0]), cfg.n_mels)
    np.testing.assert_allclose(got, offline, rtol=1e-4, atol=1e-4)


def _uni_model(seed=0):
    cfg = rt.config.ModelConfig(
        transnet=rt.config.TransNetConfig(input_size=80, hidden_size=16,
                                          output_size=12, num_layers=2,
                                          rnn_type="lstm", dropout=0.0,
                                          bidirectional=False),
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


@pytest.mark.parametrize("chunk_frames", [8, 16, 64])
def test_streaming_recognizer_matches_offline_greedy(chunk_frames):
    model, variables = _uni_model(seed=2)
    acfg = AudioConfig(normalize=False)
    rng = np.random.RandomState(1)
    wav = (rng.randn(16000) * 2).astype(np.float32)

    feats, lengths = LogMelFrontend(acfg)(jnp.asarray(wav[None]))
    toks, lens = greedy_decode(model, variables, feats, lengths,
                               max_output_len=512)
    want = list(np.asarray(toks)[0, :int(lens[0])])

    rec = StreamingRecognizer(model, variables, acfg,
                              chunk_frames=chunk_frames, normalize="none")
    out = []
    for s in range(0, len(wav), 1600):  # 100 ms chunks
        out.extend(rec.feed(wav[s:s + 1600]))
    out.extend(rec.flush())
    assert out == want, (chunk_frames, out[:20], want[:20])
    assert rec.tokens == want


def test_streaming_rejects_bidirectional():
    cfg = rt.tiny_config()
    model = RNNTransducer(cfg.model)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 80)),
                           jnp.array([4]), jnp.zeros((1, 2), jnp.int32),
                           jnp.array([2]))
    with pytest.raises(ValueError):
        StreamingRecognizer(model, variables, AudioConfig())


def test_streaming_incremental_emission():
    """Tokens should arrive incrementally (first tokens before stream end)."""
    model, variables = _uni_model(seed=5)
    acfg = AudioConfig(normalize=False)
    wav = (np.random.RandomState(3).randn(32000) * 2).astype(np.float32)
    rec = StreamingRecognizer(model, variables, acfg, chunk_frames=16,
                              normalize="none")
    emitted_early = 0
    for s in range(0, len(wav) // 2, 1600):
        emitted_early += len(rec.feed(wav[s:s + 1600]))
    total = emitted_early
    for s in range(len(wav) // 2, len(wav), 1600):
        total += len(rec.feed(wav[s:s + 1600]))
    total += len(rec.flush())
    if total > 2:
        assert emitted_early > 0  # streaming, not batch-at-flush


@pytest.mark.parametrize("chunk_frames", [16, 64])
def test_streaming_beam_matches_offline_beam(chunk_frames):
    """Chunked beam with carried BeamCarry == offline batched beam."""
    from rnntransducer_tpu.decode.beam_batched import batched_beam_decode

    model, variables = _uni_model(seed=4)
    acfg = AudioConfig(normalize=False)
    rng = np.random.RandomState(2)
    wav = (rng.randn(12800) * 2).astype(np.float32)

    feats, lengths = LogMelFrontend(acfg)(jnp.asarray(wav[None]))
    toks, lens, _ = batched_beam_decode(model, variables, feats, lengths,
                                        beam_width=4, max_output_len=512)
    want = list(np.asarray(toks)[0, 0, :int(lens[0, 0])])

    rec = StreamingRecognizer(model, variables, acfg, decoder="beam",
                              beam_width=4, chunk_frames=chunk_frames,
                              normalize="none")
    for s in range(0, len(wav), 1600):
        rec.feed(wav[s:s + 1600])
    final = rec.flush()
    assert final == want, (chunk_frames, final[:20], want[:20])


@pytest.mark.parametrize("stride_sec", [0.0125, 0.025])
def test_streaming_frontend_large_hop_parity(stride_sec):
    """Regression: buffer trimming dropped samples still needed by flush()'s
    end reflection when hop >= n_fft - pad (hop 200 and 400 at win 400)."""
    cfg = AudioConfig(normalize=False, window_stride_sec=stride_sec)
    rng = np.random.RandomState(11)
    wav = rng.randn(16000).astype(np.float32)
    offline, lengths = LogMelFrontend(cfg)(jnp.asarray(wav[None]))
    sf = StreamingFrontend(cfg, normalize="none")
    frames = []
    for s in range(0, len(wav), 1600):
        frames.append(sf.feed(wav[s:s + 1600]))
    frames.append(sf.flush())
    got = np.concatenate([f for f in frames if len(f)])
    assert got.shape[0] == int(lengths[0])
    np.testing.assert_allclose(got, np.asarray(offline[0]),
                               rtol=1e-4, atol=1e-4)


def test_streaming_fixed_norm_matches_offline_when_calibrated_exactly():
    """normalize="fixed" with the utterance's own stats must reproduce the
    offline per-utterance norm (datamodule.py:87-90) bit-closely."""
    cfg = AudioConfig(normalize=True)
    rng = np.random.RandomState(3)
    wav = (2.5 * rng.randn(7350) + 0.7).astype(np.float32)

    offline, lengths = LogMelFrontend(cfg)(jnp.asarray(wav[None]))
    offline = np.asarray(offline[0])

    sf = StreamingFrontend(cfg, normalize="fixed",
                           norm_mean=float(wav.mean()),
                           norm_var=float(wav.var()))
    frames = [sf.feed(wav[:4000]), sf.feed(wav[4000:]), sf.flush()]
    got = np.concatenate([f for f in frames if len(f)])
    assert got.shape == offline.shape == (int(lengths[0]), cfg.n_mels)
    np.testing.assert_allclose(got, offline, rtol=1e-4, atol=1e-4)


def test_streaming_running_norm_converges_to_offline():
    """For a statistically stationary stream, running-norm frames approach
    the offline-norm frames as the stream lengthens (the tail frames see
    near-complete statistics); "none" stays far off for scaled/offset audio."""
    cfg = AudioConfig(normalize=True)
    rng = np.random.RandomState(4)
    wav = (3.0 * rng.randn(48000) + 1.0).astype(np.float32)

    offline = np.asarray(LogMelFrontend(cfg)(jnp.asarray(wav[None]))[0][0])

    def stream(mode):
        sf = StreamingFrontend(cfg, normalize=mode)
        frames = []
        for s in range(0, len(wav), 1600):
            frames.append(sf.feed(wav[s:s + 1600]))
        frames.append(sf.flush())
        return np.concatenate([f for f in frames if len(f)])

    run = stream("running")
    none = stream("none")
    tail = slice(len(offline) // 2, None)
    err_run = np.abs(run[tail] - offline[tail]).mean()
    err_none = np.abs(none[tail] - offline[tail]).mean()
    assert err_run < 0.05, err_run
    assert err_none > 10 * err_run, (err_none, err_run)


@pytest.mark.parametrize("chunk_frames", [16, 64])
def test_streaming_beam_lm_matches_offline_beam_lm(chunk_frames, tmp_path):
    """Streaming fused beam (host A/B-set search over carried encoder chunks)
    == the offline host beam+LM decode, token for token — the fusion
    capability the reference only offers offline (transducer.py:147-213)
    extended to the streaming surface."""
    import textwrap

    from rnntransducer_tpu.decode.beam import BeamSearchDecoder
    from rnntransducer_tpu.decode.ngram_lm import NGramLM
    from rnntransducer_tpu.tokenizer import GraphemeTokenizer

    arpa = textwrap.dedent(r"""
    \data\
    ngram 1=6
    ngram 2=2

    \1-grams:
    -1.0    <s>    -0.5
    -1.0    </s>
    -0.8    at    -0.3
    -1.1    it    -0.2
    -1.3    to    -0.2
    -2.0    <unk>

    \2-grams:
    -0.4    <s> at
    -0.6    at it

    \end\
    """).strip()
    lm_path = tmp_path / "lm.arpa"
    lm_path.write_text(arpa)
    lm = NGramLM.load(str(lm_path), weight=0.8, beta=0.5)

    model, variables = _uni_model(seed=7)
    tok = GraphemeTokenizer({"<pad>": 0, "<unk>": 1, "a": 2,
                             "t": 3, "i": 4, "o": 5, "|": 6})
    acfg = AudioConfig(normalize=False)
    wav = (np.random.RandomState(6).randn(12800) * 2).astype(np.float32)

    feats, lengths = LogMelFrontend(acfg)(jnp.asarray(wav[None]))
    offline = BeamSearchDecoder(
        model, variables, blank_id=0, tokenizer=tok, beam_width=4,
        lm=lm, hotwords=["at"], hotword_weight=2.0)
    want = offline.decode(feats, lengths)[0]

    rec = StreamingRecognizer(
        model, variables, acfg, decoder="beam", beam_width=4,
        chunk_frames=chunk_frames, normalize="none", lm=lm,
        hotwords=["at"], hotword_weight=2.0, tokenizer=tok)
    partials = []
    for s in range(0, len(wav), 3200):
        rec.feed(wav[s:s + 3200])
        partials.append(rec.tokens)  # poll partials mid-stream
    final = rec.flush()
    assert final == want, (chunk_frames, final[:20], want[:20])
    assert rec.tokens == want
