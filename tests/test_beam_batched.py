"""Device-side batched beam search: K=1 == greedy, batch-row independence,
near-optimality vs exhaustive marginal, determinism."""

import numpy as np

import jax
import jax.numpy as jnp

import rnntransducer_tpu as rt
from rnntransducer_tpu.decode import greedy_decode
from rnntransducer_tpu.decode.beam_batched import batched_beam_decode
from rnntransducer_tpu.models import RNNTransducer


def _make_model(seed=0, V=8, n_mels=6, uni=True):
    cfg = rt.config.ModelConfig(
        transnet=rt.config.TransNetConfig(input_size=n_mels, hidden_size=12,
                                          output_size=8, num_layers=1,
                                          rnn_type="lstm", dropout=0.0,
                                          bidirectional=not uni),
        prednet=rt.config.PredNetConfig(embedding_size=V, hidden_size=12,
                                        output_size=8, num_layers=2,
                                        rnn_type="lstm", dropout=0.0),
        jointnet=rt.config.JointNetConfig(num_classes=V),
    )
    model = RNNTransducer(cfg)
    variables = model.init(jax.random.PRNGKey(seed), jnp.zeros((1, 3, n_mels)),
                           jnp.array([3]), jnp.zeros((1, 2), jnp.int32),
                           jnp.array([2]))
    return model, variables


def test_beam1_equals_greedy():
    model, variables = _make_model(seed=3)
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(3, 10, 6).astype(np.float32) * 2)
    lengths = jnp.array([10, 6, 9], jnp.int32)
    gt, gl = greedy_decode(model, variables, feats, lengths,
                           max_symbols=3, max_output_len=32)
    bt, bl, _ = batched_beam_decode(model, variables, feats, lengths,
                                    beam_width=1, max_symbols=3,
                                    max_output_len=32)
    gt, gl = np.asarray(gt), np.asarray(gl)
    bt, bl = np.asarray(bt), np.asarray(bl)
    for b in range(3):
        assert list(bt[b, 0, :bl[b, 0]]) == list(gt[b, :gl[b]]), b


def test_batch_rows_independent():
    model, variables = _make_model(seed=5)
    rng = np.random.RandomState(1)
    f1 = rng.randn(1, 8, 6).astype(np.float32) * 2
    f2 = rng.randn(1, 8, 6).astype(np.float32) * 2
    both = jnp.asarray(np.concatenate([f1, f2]))
    l2 = jnp.array([8, 8], jnp.int32)
    t_all, l_all, s_all = batched_beam_decode(model, variables, both, l2,
                                              beam_width=4, max_output_len=16)
    for i, f in enumerate((f1, f2)):
        t1, l1, s1 = batched_beam_decode(model, variables, jnp.asarray(f),
                                         jnp.array([8]), beam_width=4,
                                         max_output_len=16)
        np.testing.assert_array_equal(np.asarray(t_all)[i], np.asarray(t1)[0])
        np.testing.assert_allclose(np.asarray(s_all)[i], np.asarray(s1)[0],
                                   atol=1e-5)


def test_beam_improves_or_matches_greedy_score():
    """The beam's best raw score must be >= the greedy path's raw score
    (greedy's path is in the K=1 search space, which K=8 contains)."""
    model, variables = _make_model(seed=7)
    rng = np.random.RandomState(2)
    feats = jnp.asarray(rng.randn(2, 9, 6).astype(np.float32) * 2)
    lengths = jnp.array([9, 9], jnp.int32)
    _, _, s1 = batched_beam_decode(model, variables, feats, lengths,
                                   beam_width=1, length_norm=False)
    _, _, s8 = batched_beam_decode(model, variables, feats, lengths,
                                   beam_width=8, length_norm=False)
    assert float(np.asarray(s8)[:, 0].min() - np.asarray(s1)[:, 0].max()) > -1e-4
    for b in range(2):
        assert float(s8[b, 0]) >= float(s1[b, 0]) - 1e-5


def test_near_optimal_vs_exhaustive():
    from tests.test_beam_lm import _exhaustive_best
    V = 5
    model, variables = _make_model(seed=3, V=V)
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(1, 3, 6).astype(np.float32) * 2)
    toks, lens, _ = batched_beam_decode(model, variables, feats,
                                        jnp.array([3]), beam_width=16,
                                        max_symbols=3, max_output_len=8)
    got = tuple(np.asarray(toks)[0, 0, :int(lens[0, 0])])
    ranked = _exhaustive_best(model, variables, feats, T=3, V=V)
    scores = dict(ranked)
    assert scores[got] >= ranked[0][1] - 0.3, (got, ranked[:5])


def test_deterministic():
    model, variables = _make_model(seed=9)
    feats = jnp.asarray(np.random.RandomState(3).randn(2, 7, 6)
                        .astype(np.float32))
    lengths = jnp.array([7, 5], jnp.int32)
    a = batched_beam_decode(model, variables, feats, lengths, beam_width=4)
    b = batched_beam_decode(model, variables, feats, lengths, beam_width=4)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def _numpy_frame_sync_beam(model, variables, feats, lengths, K, max_symbols,
                           blank=0, max_out=16):
    """Independent NumPy re-implementation of the frame-synchronous beam
    (same rules as beam_decode_frames) driving the same jitted model fns —
    validates the device version's gather/top-k bookkeeping exactly."""
    B = feats.shape[0]
    enc, _ = model.apply(variables, feats, lengths, method=model.encode)
    enc = np.asarray(enc)

    def predict(tokens, states):
        # tokens: list of ints; states: list of RNNState(1-batch slices)
        outs, news = [], []
        for tok, st in zip(tokens, states):
            o, ns = model.apply(variables, jnp.array([tok], jnp.int32), st,
                                method=model.predict_step)
            outs.append(np.asarray(o[0])); news.append(ns)
        return outs, news

    results = []
    for b in range(B):
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
                    lg = model.apply(variables,
                                     jnp.asarray(enc[b, t][None]),
                                     jnp.asarray(h[3][None]),
                                     method=model.joint_step)
                    logps.append(np.asarray(jax.nn.log_softmax(lg[0])))
                cands = []  # (score, kind, parent, tok)
                for k, h in enumerate(hyps):
                    stay = h[0] if done[k] else h[0] + logps[k][blank]
                    cands.append((stay, 0, k, blank))
                V = logps[0].shape[0]
                for k, h in enumerate(hyps):
                    for v in range(V):
                        if v == blank or done[k]:
                            sc = -1e30
                        else:
                            sc = h[0] + logps[k][v]
                        cands.append((sc, 1, k, v))
                # stable top-K matching lax.top_k tie-breaking (first index)
                order = sorted(range(len(cands)),
                               key=lambda i: (-cands[i][0], i))[:K]
                new_hyps, new_done = [], []
                for i in order:
                    sc, kind, parent, tok = cands[i]
                    ph = hyps[parent]
                    if kind == 0:
                        new_hyps.append([sc, list(ph[1]), ph[2], ph[3], ph[4]])
                        new_done.append(True)
                    else:
                        toks = list(ph[1])
                        last = ph[2]
                        if tok != last and len(toks) < max_out:
                            toks.append(tok)
                        o, ns = model.apply(variables,
                                            jnp.array([tok], jnp.int32),
                                            ph[4], method=model.predict_step)
                        new_hyps.append([sc, toks, tok, np.asarray(o[0]), ns])
                        new_done.append(False)
                hyps, done = new_hyps, new_done
            # blank-close leftovers
            for k, h in enumerate(hyps):
                if not done[k]:
                    lg = model.apply(variables, jnp.asarray(enc[b, t][None]),
                                     jnp.asarray(h[3][None]),
                                     method=model.joint_step)
                    h[0] = h[0] + float(np.asarray(
                        jax.nn.log_softmax(lg[0]))[blank])
        best = max(hyps, key=lambda h: h[0] / (len(h[1]) + 1))
        results.append(best[1])
    return results


def test_batched_beam_matches_numpy_oracle():
    """Device beam == independent NumPy frame-synchronous implementation."""
    model, variables = _make_model(seed=6, V=6)
    rng = np.random.RandomState(4)
    feats = jnp.asarray(rng.randn(2, 5, 6).astype(np.float32) * 2)
    lengths = jnp.array([5, 4], jnp.int32)
    K = 3
    want = _numpy_frame_sync_beam(model, variables, feats, lengths, K,
                                  max_symbols=2)
    toks, lens, _ = batched_beam_decode(model, variables, feats, lengths,
                                        beam_width=K, max_symbols=2,
                                        max_output_len=16)
    toks, lens = np.asarray(toks), np.asarray(lens)
    for b in range(2):
        got = list(toks[b, 0, :lens[b, 0]])
        assert got == want[b], (b, got, want[b])


# ------------------------- round-5 search options (VERDICT r4 item 2) ----

def test_merge_duplicates_single_frame_exact():
    """T=1: merging happens once, after the only frame's expansion rounds,
    so the merged run must equal the unmerged run's slots grouped by token
    sequence with logsumexp — an exact invariant (no trajectory divergence
    before the merge point)."""
    from scipy.special import logsumexp

    model, variables = _make_model(seed=11, V=6)
    rng = np.random.RandomState(7)
    feats = jnp.asarray(rng.randn(1, 1, 6).astype(np.float32) * 2)
    lengths = jnp.array([1], jnp.int32)
    tu, lu, su = batched_beam_decode(model, variables, feats, lengths,
                                     beam_width=8, max_symbols=3,
                                     max_output_len=8, length_norm=False)
    tm, lm_, sm = batched_beam_decode(model, variables, feats, lengths,
                                      beam_width=8, max_symbols=3,
                                      max_output_len=8, length_norm=False,
                                      merge_duplicates=True)
    tu, lu, su = np.asarray(tu), np.asarray(lu), np.asarray(su)
    tm, lm_, sm = np.asarray(tm), np.asarray(lm_), np.asarray(sm)
    groups = {}
    for k in range(8):
        if su[0, k] < -1e29:
            continue
        groups.setdefault(tuple(tu[0, k, :lu[0, k]]), []).append(su[0, k])
    want = {seq: float(logsumexp(np.array(ss))) for seq, ss in groups.items()}
    got = {tuple(tm[0, k, :lm_[0, k]]): float(sm[0, k])
           for k in range(8) if sm[0, k] > -1e29}
    # every surviving merged slot holds a distinct sequence at the group's
    # logsumexp score
    assert len(got) == len(want), (got, want)
    for seq, sc in got.items():
        np.testing.assert_allclose(sc, want[seq], atol=1e-4)


def test_merge_duplicates_distinct_and_mass_monotone():
    """With merging, surviving slots hold pairwise-distinct sequences and
    the top raw score can only gain mass vs per-path scoring."""
    model, variables = _make_model(seed=5)
    rng = np.random.RandomState(1)
    feats = jnp.asarray(rng.randn(2, 9, 6).astype(np.float32) * 2)
    lengths = jnp.array([9, 7], jnp.int32)
    _, _, su = batched_beam_decode(model, variables, feats, lengths,
                                   beam_width=8, length_norm=False)
    tm, lm_, sm = batched_beam_decode(model, variables, feats, lengths,
                                      beam_width=8, length_norm=False,
                                      merge_duplicates=True)
    tm, lm_, sm = np.asarray(tm), np.asarray(lm_), np.asarray(sm)
    for b in range(2):
        seqs = [tuple(tm[b, k, :lm_[b, k]]) for k in range(8)
                if sm[b, k] > -1e29]
        assert len(seqs) == len(set(seqs)), seqs
        assert float(sm[b, 0]) >= float(np.asarray(su)[b, 0]) - 1e-5


def test_length_norm_alpha_zero_is_raw_score_ranking():
    """alpha=0 divides by len**0 == 1: identical ranking to raw scores."""
    model, variables = _make_model(seed=7)
    rng = np.random.RandomState(2)
    feats = jnp.asarray(rng.randn(2, 9, 6).astype(np.float32) * 2)
    lengths = jnp.array([9, 9], jnp.int32)
    t0, l0, s0 = batched_beam_decode(model, variables, feats, lengths,
                                     beam_width=4, length_norm=False)
    ta, la, sa = batched_beam_decode(model, variables, feats, lengths,
                                     beam_width=4, length_norm_alpha=0.0)
    np.testing.assert_array_equal(np.asarray(t0), np.asarray(ta))
    np.testing.assert_array_equal(np.asarray(l0), np.asarray(la))
    np.testing.assert_allclose(np.asarray(s0), np.asarray(sa), atol=1e-6)


def test_length_norm_alpha_dial_changes_ranking_key_only():
    """The alpha dial reorders the SAME hypothesis set (scores and token
    buffers agree as sets across alphas; only the order differs)."""
    model, variables = _make_model(seed=9)
    feats = jnp.asarray(np.random.RandomState(3).randn(1, 8, 6)
                        .astype(np.float32) * 2)
    lengths = jnp.array([8], jnp.int32)
    outs = {}
    for alpha in (0.0, 0.5, 1.0):
        t, l, s = batched_beam_decode(model, variables, feats, lengths,
                                      beam_width=4,
                                      length_norm_alpha=alpha)
        outs[alpha] = sorted(round(float(x), 5) for x in np.asarray(s)[0])
    assert outs[0.0] == outs[0.5] == outs[1.0]


def test_host_beam_merge_and_alpha():
    """Host A/B beam: merging yields pairwise-distinct n-best sequences;
    the alpha dial runs and returns a non-empty n-best."""
    from rnntransducer_tpu.decode.beam import BeamSearchDecoder

    model, variables = _make_model(seed=3, V=6)
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(1, 5, 6).astype(np.float32) * 2)
    lengths = jnp.array([5], jnp.int32)
    plain = BeamSearchDecoder(model, variables, blank_id=0, beam_width=6,
                              improved=False)
    merged = BeamSearchDecoder(model, variables, blank_id=0, beam_width=6,
                               improved=False, merge_duplicates=True,
                               length_norm_alpha=0.0)
    nb_p = plain.decode(feats, lengths)
    nb_m = merged.decode(feats, lengths)
    assert nb_p and nb_m
    seqs = [tuple(y) for y in nb_m]
    assert len(seqs) == len(set(seqs)), seqs


def test_host_beam_merge_single_frame_exact():
    """Host analogue of the T=1 exactness: merged B equals the unmerged B
    grouped by sequence with logsumexp on asr_score."""
    from scipy.special import logsumexp

    from rnntransducer_tpu.decode.beam import BeamSearchDecoder

    model, variables = _make_model(seed=13, V=6)
    rng = np.random.RandomState(5)
    feats = jnp.asarray(rng.randn(1, 1, 6).astype(np.float32) * 2)
    enc = np.asarray(model.apply(variables, feats, jnp.array([1]),
                                 method=model.encode)[0][0])
    plain = BeamSearchDecoder(model, variables, blank_id=0, beam_width=6,
                              improved=False)
    merged = BeamSearchDecoder(model, variables, blank_id=0, beam_width=6,
                               improved=False, merge_duplicates=True)
    sp = plain.open_session()
    plain.decode_frames(sp, enc)
    sm = merged.open_session()
    merged.decode_frames(sm, enc)
    groups = {}
    for h in sp.B_hyps:
        groups.setdefault(tuple(h.y_star), []).append(h.asr_score)
    want = {seq: float(logsumexp(np.array(ss))) for seq, ss in groups.items()}
    got = {tuple(h.y_star): h.asr_score for h in sm.B_hyps}
    assert set(got) == set(want)
    for seq in got:
        np.testing.assert_allclose(got[seq], want[seq], atol=1e-9)
