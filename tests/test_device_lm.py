"""Device-resident char n-gram LM fusion (decode/device_lm.py +
decode/beam_batched.py): dense table values must equal the native ARPA
scorer with backoff, weight-0 fusion must be a no-op, the fused beam must
match an independent NumPy oracle applying the same frame-synchronous
rule, and a strongly biased LM must actually steer decoding.

The host word-level fusion (tests/test_beam_lm.py) is the reference-parity
path; this is the TPU-native zero-host-sync complement.
"""

import math
import textwrap

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rnntransducer_tpu.decode.beam_batched import batched_beam_decode
from rnntransducer_tpu.decode.device_lm import (
    DEFAULT_OOV_LOGP, DeviceCharLM, build_char_lm_table,
)
from rnntransducer_tpu.tokenizer import GraphemeTokenizer

from tests.test_beam_batched import _make_model

_LOG10 = math.log(10.0)

# char-level trigram over the graphemes a/b/c (plus specials): "ab" is very
# likely, "ba" follows, "aa" is never seen (pure backoff)
CHAR_ARPA = textwrap.dedent(r"""
\data\
ngram 1=5
ngram 2=3
ngram 3=2

\1-grams:
-1.0    <s>    -0.5
-1.0    </s>
-0.4    a    -0.3
-0.7    b    -0.2
-1.1    c    -0.1

\2-grams:
-0.2    a b    -0.4
-0.5    b a    -0.3
-0.9    b c

\3-grams:
-0.1    a b a
-0.6    b a b

\end\
""").strip()


def _tok(V=8):
    # ids: 0=<pad> 1=<unk> 2=<s> 3=</s> 4=| 5=a 6=b 7=c (build_default_vocab
    # layout for small sizes)
    vocab = {"<pad>": 0, "<unk>": 1, "<s>": 2, "</s>": 3, "|": 4,
             "a": 5, "b": 6, "c": 7}
    return GraphemeTokenizer(vocab)


@pytest.fixture(scope="module")
def char_lm(tmp_path_factory):
    from rnntransducer_tpu.decode.ngram_lm import NGramLM

    p = tmp_path_factory.mktemp("charlm") / "char.arpa"
    p.write_text(CHAR_ARPA)
    return NGramLM.load(str(p))


def test_table_matches_native_backoff(char_lm):
    tok = _tok()
    table = build_char_lm_table(char_lm, tok)
    assert table.shape == (8, 8, 8)
    a, b, c = 5, 6, 7
    wa, wb = char_lm.word_id("a"), char_lm.word_id("b")
    wc = char_lm.word_id("c")
    # full trigram: p(a | a b) is the explicit -0.1 entry
    np.testing.assert_allclose(table[a, b, a], _LOG10 * -0.1, rtol=1e-6)
    np.testing.assert_allclose(
        table[a, b, a], _LOG10 * char_lm.raw_score((wa, wb), wa), rtol=1e-6)
    # backoff: (c, c) context has no bigram/trigram entries
    np.testing.assert_allclose(
        table[c, c, b], _LOG10 * char_lm.raw_score((wc, wc), wb), rtol=1e-6)
    # blank context slots = shorter history: row (blank, b) == bigram p(.|b)
    wmap = {a: wa, b: wb, c: wc}
    for v in (a, b, c):
        np.testing.assert_allclose(
            table[0, b, v], _LOG10 * char_lm.raw_score((wb,), wmap[v]),
            rtol=1e-6)
    # all-blank context = unigrams
    np.testing.assert_allclose(
        table[0, 0, a], _LOG10 * char_lm.raw_score((), wa), rtol=1e-6)
    # non-LM tokens (pad/unk/bos/eos/extra) hold the OOV floor as targets
    assert float(table[a, b, 0]) == DEFAULT_OOV_LOGP
    assert float(table[a, b, 1]) == DEFAULT_OOV_LOGP


def test_table_order_cap(char_lm):
    tok = _tok()
    t2 = build_char_lm_table(char_lm, tok, max_order=2)
    assert t2.shape == (8, 8)
    wa, wb = char_lm.word_id("a"), char_lm.word_id("b")
    np.testing.assert_allclose(t2[5, 6], _LOG10 * char_lm.raw_score(
        (wa,), wb), rtol=1e-6)


def test_zero_weight_is_noop(char_lm):
    """weight=0 fusion must reproduce the unfused beam exactly (scores
    included) — the LM path only adds 0s."""
    tok = _tok()
    lm = DeviceCharLM(build_char_lm_table(char_lm, tok), weight=0.0)
    model, variables = _make_model(seed=3, V=8)
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(2, 7, 6).astype(np.float32) * 2)
    lengths = jnp.array([7, 5], jnp.int32)
    base = batched_beam_decode(model, variables, feats, lengths,
                               beam_width=4, max_output_len=16)
    fused = batched_beam_decode(model, variables, feats, lengths,
                                beam_width=4, max_output_len=16,
                                device_lm=lm)
    np.testing.assert_array_equal(np.asarray(base[0]), np.asarray(fused[0]))
    np.testing.assert_allclose(np.asarray(base[2]), np.asarray(fused[2]),
                               atol=1e-6)


def test_fused_beam_matches_numpy_oracle(char_lm):
    """Device fused beam == independent NumPy beam applying the same rule
    (every non-blank extension gains w * table[ctx, tok]; ctx follows the
    token buffer)."""
    tok = _tok()
    V = 8
    w = 0.7
    table = build_char_lm_table(char_lm, tok)
    lm = DeviceCharLM(table, weight=w)
    model, variables = _make_model(seed=6, V=V)
    rng = np.random.RandomState(4)
    feats = jnp.asarray(rng.randn(2, 5, 6).astype(np.float32) * 2)
    lengths = np.array([5, 4])
    K, max_symbols, max_out = 3, 2, 16
    blank = 0

    enc, _ = model.apply(variables, feats, jnp.asarray(lengths),
                         method=model.encode)
    enc = np.asarray(enc)

    results = []
    for b in range(2):
        d0, s0 = model.apply(variables, jnp.array([blank], jnp.int32), None,
                             method=model.predict_step)
        # hyp: [score, tokens, last, dec_out, state]
        hyps = [[0.0, [], blank, np.asarray(d0[0]), s0]]
        hyps += [[-1e30, [], blank, np.asarray(d0[0]), s0]
                 for _ in range(K - 1)]
        for t in range(int(lengths[b])):
            done = [False] * K
            for _ in range(max_symbols):
                logps = []
                for h in hyps:
                    lg = model.apply(variables, jnp.asarray(enc[b, t][None]),
                                     jnp.asarray(h[3][None]),
                                     method=model.joint_step)
                    logps.append(np.asarray(jax.nn.log_softmax(lg[0])))
                cands = []
                for k, h in enumerate(hyps):
                    stay = h[0] if done[k] else h[0] + logps[k][blank]
                    cands.append((stay, 0, k, blank))
                for k, h in enumerate(hyps):
                    ctx = ([blank, blank] + list(h[1]))[-2:]  # order-1 = 2
                    for v in range(V):
                        if v == blank or done[k]:
                            sc = -1e30
                        else:
                            sc = (h[0] + logps[k][v]
                                  + w * float(table[ctx[0], ctx[1], v]))
                        cands.append((sc, 1, k, v))
                order = sorted(range(len(cands)),
                               key=lambda i: (-cands[i][0], i))[:K]
                new_hyps, new_done = [], []
                for i in order:
                    sc, kind, parent, tok_v = cands[i]
                    ph = hyps[parent]
                    if kind == 0:
                        new_hyps.append([sc, list(ph[1]), ph[2], ph[3],
                                         ph[4]])
                        new_done.append(True)
                    else:
                        toks = list(ph[1])
                        if tok_v != ph[2] and len(toks) < max_out:
                            toks.append(tok_v)
                        o, ns = model.apply(variables,
                                            jnp.array([tok_v], jnp.int32),
                                            ph[4],
                                            method=model.predict_step)
                        new_hyps.append([sc, toks, tok_v, np.asarray(o[0]),
                                         ns])
                        new_done.append(False)
                hyps, done = new_hyps, new_done
            for k, h in enumerate(hyps):
                if not done[k]:
                    lg = model.apply(variables, jnp.asarray(enc[b, t][None]),
                                     jnp.asarray(h[3][None]),
                                     method=model.joint_step)
                    h[0] += float(np.asarray(jax.nn.log_softmax(lg[0]))[blank])
        best = max(hyps, key=lambda h: h[0] / (len(h[1]) + 1))
        results.append(best[1])

    toks_d, lens_d, _ = batched_beam_decode(
        model, variables, feats, jnp.asarray(lengths, dtype=jnp.int32),
        beam_width=K, max_symbols=max_symbols, max_output_len=max_out,
        device_lm=lm)
    toks_d, lens_d = np.asarray(toks_d), np.asarray(lens_d)
    for b in range(2):
        got = list(toks_d[b, 0, :lens_d[b, 0]])
        assert got == results[b], (b, got, results[b])


def test_strong_lm_steers_decode():
    """A table that massively rewards grapheme 5 after anything must pull
    the beam towards 5-heavy outputs relative to the unfused beam."""
    V = 8
    model, variables = _make_model(seed=9, V=V)
    rng = np.random.RandomState(7)
    feats = jnp.asarray(rng.randn(1, 8, 6).astype(np.float32) * 2)
    lengths = jnp.array([8], jnp.int32)
    table = np.full((V, V), -8.0, np.float32)
    table[:, 5] = 0.0  # ln p(5 | anything) = 0
    lm = DeviceCharLM(table, weight=5.0)
    ft, fl, _ = batched_beam_decode(model, variables, feats, lengths,
                                    beam_width=4, max_output_len=16,
                                    device_lm=lm)
    ft, fl = np.asarray(ft), np.asarray(fl)
    # with a -40 penalty on any non-5 extension, no surviving hypothesis
    # may contain a non-5 grapheme, and some hypothesis must have tried 5
    hyps = [list(ft[0, k, :fl[0, k]]) for k in range(ft.shape[1])]
    assert all(all(t == 5 for t in h) for h in hyps), hyps
    assert any(5 in h for h in hyps), hyps


def test_ctx_mismatch_raises(char_lm):
    from rnntransducer_tpu.decode.beam_batched import (
        beam_decode_frames, init_beam_carry,
    )

    tok = _tok()
    table = jnp.asarray(build_char_lm_table(char_lm, tok))  # order 3
    model, variables = _make_model(seed=3, V=8)
    enc = jnp.zeros((1, 2, 8))
    carry = init_beam_carry(model, variables, 1, 2, 0, 8, lm_context=0)
    with pytest.raises(ValueError, match="no ctx"):
        beam_decode_frames(model, variables, enc, jnp.array([2]), carry,
                           0, 2, lm_table=table, lm_weight=0.5)
    carry1 = init_beam_carry(model, variables, 1, 2, 0, 8, lm_context=1)
    with pytest.raises(ValueError, match="order"):
        beam_decode_frames(model, variables, enc, jnp.array([2]), carry1,
                           0, 2, lm_table=table, lm_weight=0.5)


# ---------------------------------------------------------------------------
# integration: device LM across the streaming / serving surfaces
# ---------------------------------------------------------------------------

def _rand_lm(V=32, order=3, weight=1.0, seed=21):
    """Deterministic dense pseudo-LM: strong enough to steer decoding, so
    parity tests cannot pass with the fusion accidentally disabled."""
    rng = np.random.RandomState(seed)
    return DeviceCharLM((rng.randn(*(V,) * order) * 2.0).astype(np.float32),
                        weight=weight)


def test_streaming_device_lm_matches_offline():
    """Chunked device-beam streaming with a carried LM ctx == offline fused
    decode, and the fusion visibly changes the output vs unfused."""
    from rnntransducer_tpu.config import AudioConfig
    from rnntransducer_tpu.decode.streaming import StreamingRecognizer
    from rnntransducer_tpu.frontend import LogMelFrontend

    from tests.test_session_batch import _uni_model

    model, variables = _uni_model(seed=4)
    lm = _rand_lm()
    acfg = AudioConfig(normalize=False)
    wav = (np.random.RandomState(2).randn(12800) * 2).astype(np.float32)

    feats, lengths = LogMelFrontend(acfg)(jnp.asarray(wav[None]))
    toks, lens, _ = batched_beam_decode(model, variables, feats, lengths,
                                        beam_width=4, max_output_len=512,
                                        device_lm=lm)
    want = list(np.asarray(toks)[0, 0, :int(lens[0, 0])])
    t0, l0, _ = batched_beam_decode(model, variables, feats, lengths,
                                    beam_width=4, max_output_len=512)
    base = list(np.asarray(t0)[0, 0, :int(l0[0, 0])])
    assert want != base  # the LM must actually be live

    rec = StreamingRecognizer(model, variables, acfg, decoder="beam",
                              beam_width=4, chunk_frames=16,
                              normalize="none", device_lm=lm)
    for s in range(0, len(wav), 1600):
        rec.feed(wav[s:s + 1600])
    assert rec.flush() == want


def test_batched_beam_sessions_with_device_lm_match_streaming():
    """Continuous-batching beam lanes with on-device fusion: interleaved
    sessions (incl. a freed slot reused, which must reset the lane's LM
    ctx) are token-exact vs independent fused StreamingRecognizers."""
    from rnntransducer_tpu.config import AudioConfig
    from rnntransducer_tpu.decode.session_batch import BatchedStreamingRunner
    from rnntransducer_tpu.decode.streaming import StreamingRecognizer

    from tests.test_session_batch import _uni_model, _wavs

    model, variables = _uni_model()
    lm = _rand_lm()

    def ref(wav):
        rec = StreamingRecognizer(model, variables,
                                  AudioConfig(normalize=False),
                                  chunk_frames=16, max_symbols=2,
                                  normalize="none", decoder="beam",
                                  beam_width=3, device_lm=lm)
        for i in range(0, len(wav), 1600):
            rec.feed(wav[i:i + 1600])
        rec.flush()
        return list(rec.tokens)

    runner = BatchedStreamingRunner(model, variables,
                                    AudioConfig(normalize=False),
                                    max_sessions=2, chunk_frames=16,
                                    max_symbols=2, decoder="beam",
                                    beam_width=3, device_lm=lm)
    wavs = _wavs(3, seed=11)
    want = [ref(w) for w in wavs]

    # two interleaved sessions fill the runner...
    sessions = [runner.open(), runner.open()]
    pos = [0, 0]
    while any(pos[i] < len(wavs[i]) for i in range(2)):
        for i, s in enumerate(sessions):
            if pos[i] < len(wavs[i]):
                assert s.feed(wavs[i][pos[i]:pos[i] + 1600]) == []
                pos[i] += 1600
    got = [s.flush() for s in sessions]
    assert got == want[:2]

    # ...then a third session reuses a freed slot: its lane's ctx history
    # must start blank (session 0/1 left non-blank ctx rows behind)
    s3 = runner.open()
    got3 = []
    for i in range(0, len(wavs[2]), 1600):
        s3.feed(wavs[2][i:i + 1600])
    got3 = s3.flush()
    assert got3 == want[2]


def test_device_lm_exclusive_with_host_fusion(char_lm):
    """device_lm (on-device char fusion) and lm/hotwords (host word fusion)
    must not combine, and device_lm requires a beam decoder — on both the
    streaming and the continuous-batching surfaces."""
    from rnntransducer_tpu.config import AudioConfig
    from rnntransducer_tpu.decode.session_batch import BatchedStreamingRunner
    from rnntransducer_tpu.decode.streaming import StreamingRecognizer

    from tests.test_session_batch import _uni_model

    model, variables = _uni_model()
    lm = _rand_lm()
    acfg = AudioConfig(normalize=False)
    with pytest.raises(ValueError, match="mutually exclusive"):
        StreamingRecognizer(model, variables, acfg, decoder="beam",
                            device_lm=lm, lm=char_lm, tokenizer=_tok())
    with pytest.raises(ValueError, match="decoder='beam'"):
        StreamingRecognizer(model, variables, acfg, decoder="greedy",
                            device_lm=lm)
    with pytest.raises(ValueError, match="mutually exclusive"):
        BatchedStreamingRunner(model, variables, acfg, decoder="beam",
                               device_lm=lm, lm=char_lm, tokenizer=_tok())
    with pytest.raises(ValueError, match="decoder='beam'"):
        BatchedStreamingRunner(model, variables, acfg, decoder="greedy",
                               device_lm=lm)
