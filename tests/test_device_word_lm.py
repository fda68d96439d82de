"""Device word-boundary LM fusion (decode/device_word_lm.py): table
semantics vs the host NGramLM scoring chain, zero-weight no-op through the
batched beam, and carry bookkeeping."""

import math
import textwrap

import numpy as np
import pytest

import jax.numpy as jnp

from rnntransducer_tpu.decode.device_word_lm import (DeviceWordLM,
                                                     build_device_word_lm)
from rnntransducer_tpu.tokenizer import GraphemeTokenizer

_LOG10 = math.log(10.0)

# grapheme vocab: words over {c, a, t, s} with "|" the word delimiter
VOCAB = {"<pad>": 0, "<unk>": 1, "|": 2, "c": 3, "a": 4, "t": 5, "s": 6}
WORDS = ["cat", "ca", "tas", "sat"]  # "ca" is a prefix of "cat" (trie share)

ARPA = textwrap.dedent(r"""
\data\
ngram 1=7
ngram 2=4

\1-grams:
-1.0    <s>    -0.5
-1.1    </s>
-0.6    cat    -0.3
-1.2    ca    -0.2
-1.4    tas    -0.2
-0.9    sat    -0.4
-2.0    <unk>

\2-grams:
-0.3    <s> cat
-0.4    cat tas
-0.9    tas sat
-0.5    sat cat

\end\
""").strip()


@pytest.fixture(scope="module")
def lm(tmp_path_factory):
    from rnntransducer_tpu.decode.ngram_lm import NGramLM
    p = tmp_path_factory.mktemp("wlm") / "word.arpa"
    p.write_text(ARPA)
    return NGramLM.load(str(p), weight=0.7, beta=0.25)


@pytest.fixture(scope="module")
def tok():
    return GraphemeTokenizer(VOCAB)


@pytest.fixture(scope="module")
def wlm(lm, tok):
    return build_device_word_lm(lm, tok, WORDS)


def test_trie_structure(wlm, tok):
    tn = np.asarray(wlm.trie_next)
    nw = np.asarray(wlm.node_word)
    W = wlm.n_words
    dead = tn.shape[0] - 1  # DEAD is the last node by construction
    # walking each lexicon word from the root lands on a node holding its id
    for wi, w in enumerate(WORDS):
        n = 0
        for g in tok.encode(w):
            n = tn[n, g]
        assert nw[n] == wi, w
    # a non-word prefix falls into the absorbing dead node and stays there
    n = tn[0, VOCAB["a"]]  # no word starts with "a"
    assert n == dead
    assert np.all(tn[dead] == dead)
    assert nw[dead] == W
    # "ca" completes a word AND continues toward "cat"
    n_ca = tn[tn[0, VOCAB["c"]], VOCAB["a"]]
    assert nw[n_ca] == WORDS.index("ca")
    assert nw[tn[n_ca, VOCAB["t"]]] == WORDS.index("cat")


def _device_walk(wlm, token_ids):
    """NumPy re-implementation of the in-scan bookkeeping + EOS settle:
    the total word-LM bonus the device fusion adds along a token path."""
    tn = np.asarray(wlm.trie_next)
    nw = np.asarray(wlm.node_word)
    rows = np.asarray(wlm.rows)
    eos = np.asarray(wlm.eos_col)
    ns = np.asarray(wlm.next_state)
    s, n, total = wlm.start_state, 0, 0.0
    for t in token_ids:
        if t == wlm.delimiter_id:
            if n != 0:
                w = nw[n]
                total += rows[s, w]
                s = ns[w] if ns[w] >= 0 else s
            n = 0
        else:
            n = tn[n, t]
    if n != 0:  # settle the in-progress word
        w = nw[n]
        total += rows[s, w]
        s = ns[w] if ns[w] >= 0 else s
    total += eos[s]
    return total


def _host_chain(lm, words, trailing_delim):
    """The host NGramLM scoring chain for the same text (ngram_lm.py
    ``score``): every word in order, then </s> from the final state."""
    state = lm.get_start_state()
    total = 0.0
    for w in words:
        sc, state = lm.score(state, w)
        total += sc
    total += lm.alpha * lm.raw_score(state, lm.word_id("</s>")) * _LOG10
    return total


@pytest.mark.parametrize("text", [
    "cat",            # single in-LM word, no trailing delimiter (settle)
    "cat|tas",        # bigram hit chain
    "cat|tas|sat|",   # trailing delimiter: all words boundary-scored
    "ca",             # word that the trie knows but shares a prefix
    "cat|ca|sat",     # OOV-for-LM? ca IS in LM; mixed chain
    "tas|tas|tas",    # repeated word (backoff paths)
    "cat|ta",         # trailing partial "ta": interior trie node == OOV
    "ct|cat",         # "ct" leaves the lexicon -> dead node -> OOV word
    "|cat",           # leading delimiter: empty word scores nothing
])
def test_device_tables_match_host_chain(wlm, lm, tok, text):
    ids = tok.encode(text)
    got = _device_walk(wlm, ids)
    # host equivalent: split into words; every non-empty word scored in
    # order (the device scores interior non-words / dead prefixes as OOV,
    # which is exactly the host's unknown-word branch)
    words = [w for w in text.split("|") if w]
    want = _host_chain(lm, words, text.endswith("|"))
    np.testing.assert_allclose(got, want, atol=1e-5, err_msg=text)


def test_oov_keeps_state(wlm, lm):
    """An OOV word must not disturb the LM context (host semantics): the
    bonus chain for cat -> OOV -> tas scores 'tas' from the 'cat' state."""
    rows = np.asarray(wlm.rows)
    i_cat, i_tas = WORDS.index("cat"), WORDS.index("tas")
    # direct bigram row: p(tas | cat) is a 2-gram hit, much better than
    # p(tas | <s>) backoff — the OOV in between must not reset to <s>
    assert rows[i_cat, i_tas] > rows[wlm.start_state, i_tas]
    tok_ids = []
    enc = GraphemeTokenizer(VOCAB).encode
    for w in ["cat", "ct", "tas"]:  # "ct" is OOV (dead-node word)
        tok_ids.extend(enc(w))
        tok_ids.append(wlm.delimiter_id)
    total = _device_walk(wlm, tok_ids)
    # manual: p(cat|<s>) + OOV + p(tas|cat) + eos backoff
    alpha, beta = lm.alpha, lm.beta
    want = (alpha * _LOG10 * lm.raw_score((lm.word_id("<s>"),),
                                          lm.word_id("cat")) + beta
            + alpha * lm.unk_offset + beta
            + alpha * _LOG10 * lm.raw_score((lm.word_id("cat"),),
                                            lm.word_id("tas")) + beta
            + alpha * _LOG10 * lm.raw_score((lm.word_id("tas"),),
                                            lm.word_id("</s>")))
    np.testing.assert_allclose(total, want, atol=1e-5)


def _make_model(seed=0, V=7, n_mels=6):
    import jax

    import rnntransducer_tpu as rt
    from rnntransducer_tpu.models import RNNTransducer
    cfg = rt.config.ModelConfig(
        transnet=rt.config.TransNetConfig(input_size=n_mels, hidden_size=12,
                                          output_size=8, num_layers=1,
                                          rnn_type="lstm", dropout=0.0,
                                          bidirectional=False),
        prednet=rt.config.PredNetConfig(embedding_size=V, hidden_size=12,
                                        output_size=8, num_layers=1,
                                        rnn_type="lstm", dropout=0.0),
        jointnet=rt.config.JointNetConfig(num_classes=V),
    )
    model = RNNTransducer(cfg)
    variables = model.init(jax.random.PRNGKey(seed),
                           jnp.zeros((1, 3, n_mels)), jnp.array([3]),
                           jnp.zeros((1, 2), jnp.int32), jnp.array([2]))
    return model, variables


def test_zero_weight_word_lm_is_noop(tok, tmp_path):
    """alpha=0, beta=0 zeroes every table entry -> fused decode must equal
    the plain decode exactly (tokens AND scores): the fusion path adds
    structure, never numerics, at zero weight."""
    from rnntransducer_tpu.decode.beam_batched import batched_beam_decode
    from rnntransducer_tpu.decode.ngram_lm import NGramLM
    p = tmp_path / "z.arpa"
    p.write_text(ARPA)
    lm0 = NGramLM.load(str(p), weight=0.0, beta=0.0)
    # unk_offset rides outside alpha in ngram_lm.score — zero it too
    lm0.unk_offset = 0.0
    wlm0 = build_device_word_lm(lm0, tok, WORDS)
    assert float(np.abs(np.asarray(wlm0.rows)).max()) == 0.0
    assert float(np.abs(np.asarray(wlm0.eos_col)).max()) == 0.0

    model, variables = _make_model(seed=3)
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(2, 8, 6).astype(np.float32) * 2)
    lengths = jnp.array([8, 6], jnp.int32)
    t0, l0, s0 = batched_beam_decode(model, variables, feats, lengths,
                                     beam_width=4, max_output_len=16)
    t1, l1, s1 = batched_beam_decode(model, variables, feats, lengths,
                                     beam_width=4, max_output_len=16,
                                     word_lm=wlm0)
    np.testing.assert_array_equal(np.asarray(t0), np.asarray(t1))
    np.testing.assert_array_equal(np.asarray(l0), np.asarray(l1))
    np.testing.assert_allclose(np.asarray(s0), np.asarray(s1), atol=1e-6)


def test_beam_score_includes_word_bonus_exhaustive(wlm, tok):
    """End-to-end through the batched beam with a beam wide enough to be
    EXHAUSTIVE for the tiny search space (T=2, max_symbols=2, V=7: the
    candidate pool never exceeds 1849 < K=2048, so neither run truncates).
    The word bonus is a pure function of the token sequence, so for every
    sequence max_fused_score == max_plain_score + device_walk(seq) must
    hold EXACTLY — the in-scan fusion plus the settle add precisely the
    documented quantity, along every alignment."""
    from rnntransducer_tpu.decode.beam_batched import batched_beam_decode
    model, variables = _make_model(seed=11)
    rng = np.random.RandomState(4)
    feats = jnp.asarray(rng.randn(1, 2, 6).astype(np.float32) * 2)
    lengths = jnp.array([2], jnp.int32)
    K = 2048
    tf, lf, sf = batched_beam_decode(model, variables, feats, lengths,
                                     beam_width=K, max_symbols=2,
                                     max_output_len=8, word_lm=wlm,
                                     length_norm=False)
    tp, lp, sp = batched_beam_decode(model, variables, feats, lengths,
                                     beam_width=K, max_symbols=2,
                                     max_output_len=8, length_norm=False)
    tf, lf, sf = np.asarray(tf), np.asarray(lf), np.asarray(sf)
    tp, lp, sp = np.asarray(tp), np.asarray(lp), np.asarray(sp)

    def best_by_seq(t, l, s):
        out = {}
        for k in range(K):
            if s[0, k] < -1e29:
                continue
            seq = tuple(t[0, k, :l[0, k]])
            if seq not in out or s[0, k] > out[seq]:
                out[seq] = float(s[0, k])
        return out

    fused, plain = best_by_seq(tf, lf, sf), best_by_seq(tp, lp, sp)
    assert set(fused) == set(plain)
    assert len(fused) > 10  # the space is genuinely explored
    bonus_seen = 0
    for seq, sc in fused.items():
        bonus = _device_walk(wlm, list(seq))
        np.testing.assert_allclose(sc, plain[seq] + bonus, atol=1e-4,
                                   err_msg=str(seq))
        if abs(bonus) > 1e-9:
            bonus_seen += 1
    assert bonus_seen > 0  # fusion actually fired somewhere


def test_streaming_word_lm_sessions_match_direct_chunked(wlm, tok):
    """Serving integration: a word-LM beam session through the continuous-
    batching runner equals driving the same compiled chunk step + EOS
    settle directly — fusion state resets per slot, rides the tick, and
    flush() serves the settled best."""
    import jax

    import rnntransducer_tpu as rt
    from rnntransducer_tpu.config import AudioConfig
    from rnntransducer_tpu.decode.beam_batched import (
        best_hyp_all, init_beam_carry, settle_word_lm)
    from rnntransducer_tpu.decode.session_batch import (
        BatchedStreamingRunner, _batched_chunk_step_beam)
    from rnntransducer_tpu.decode.streaming import (StreamingFrontend,
                                                    _zero_encoder_state)
    from rnntransducer_tpu.models import RNNTransducer

    V = len(VOCAB)
    cfg = rt.config.ModelConfig(
        transnet=rt.config.TransNetConfig(input_size=80, hidden_size=16,
                                          output_size=12, num_layers=2,
                                          rnn_type="lstm", dropout=0.0,
                                          bidirectional=False),
        prednet=rt.config.PredNetConfig(embedding_size=V, hidden_size=16,
                                        output_size=12, num_layers=1,
                                        rnn_type="lstm", dropout=0.0),
        jointnet=rt.config.JointNetConfig(num_classes=V),
    )
    model = RNNTransducer(cfg)
    variables = model.init(jax.random.PRNGKey(2), jnp.zeros((1, 4, 80)),
                           jnp.array([4]), jnp.zeros((1, 2), jnp.int32),
                           jnp.array([2]))
    acfg = AudioConfig(normalize=False)
    rng = np.random.RandomState(3)
    wav = rng.randn(9000).astype(np.float32) * 0.3

    runner = BatchedStreamingRunner(model, variables, acfg, max_sessions=2,
                                    chunk_frames=16, max_symbols=2,
                                    decoder="beam", beam_width=3,
                                    word_lm=wlm)
    sess = runner.open()
    for i in range(0, len(wav), 1600):
        assert sess.feed(wav[i:i + 1600]) == []
    got = sess.flush()

    # direct drive: identical frontend, chunk step, and settle
    fe = StreamingFrontend(acfg, "none")
    feats = np.concatenate([fe.feed(wav), fe.flush()])
    carry = init_beam_carry(model, variables, 1, 3, 0, 512,
                            word_lm_start=wlm.start_state)
    enc_state = _zero_encoder_state(model, variables, 1)
    for lo in range(0, len(feats), 16):
        chunk = np.zeros((1, 16, 80), np.float32)
        n = min(16, len(feats) - lo)
        chunk[0, :n] = feats[lo:lo + n]
        enc_state, carry = _batched_chunk_step_beam(
            model, variables, jnp.asarray(chunk), jnp.array([n], jnp.int32),
            enc_state, carry, 0, 2, word_lm=wlm)
    t, l = jax.device_get(best_hyp_all(settle_word_lm(carry, wlm)))
    want = [int(x) for x in t[0][:int(l[0])]]
    assert got == want
    # and the fusion is live: settled != unsettled ranking is allowed, but
    # the carry must actually hold word-LM state
    assert runner._carry.wlm_state is not None
