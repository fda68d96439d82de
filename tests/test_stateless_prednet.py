"""Stateless (n-gram context) prediction network — Ghodsi et al. 2020,
arXiv:2002.08898; selected by ``prednet.rnn_type="stateless"`` with
``num_layers`` = carried context labels (1 = bigram).

The context rides the recurrent ``RNNState`` layout (h[i] = embedding of the
(i+1)-back label), so every decode surface works unchanged; zero state ==
all-blank context because pad embeds to zero (padding_idx semantics)."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import rnntransducer_tpu as rt
from rnntransducer_tpu.models import RNNTransducer
from rnntransducer_tpu.models.cells import RNNState


def _cfg(nctx=1, bidirectional=False):
    base = rt.tiny_config()
    return dataclasses.replace(
        base.model,
        transnet=dataclasses.replace(base.model.transnet,
                                     bidirectional=bidirectional),
        prednet=dataclasses.replace(base.model.prednet,
                                    rnn_type="stateless", num_layers=nctx))


def _init(model, B=2, T=24, U=5, seed=0):
    rng = jax.random.PRNGKey(seed)
    feats = jax.random.normal(rng, (B, T, 80))
    text = jnp.zeros((B, U + 1), jnp.int32)
    v = model.init(rng, feats, jnp.full((B,), T), text,
                   jnp.full((B,), U + 1))
    return v, feats


@pytest.mark.parametrize("nctx", [1, 2, 3])
def test_call_matches_step_sequence(nctx):
    """Batch __call__ output == stepping token by token; final state too."""
    model = RNNTransducer(_cfg(nctx))
    v, _ = _init(model)
    rng = np.random.RandomState(0)
    B, U1 = 3, 7
    tokens = jnp.asarray(rng.randint(0, 72, size=(B, U1)).astype(np.int32))

    out, fin = model.apply(v, tokens, jnp.full((B,), U1),
                           method=model.predict)
    assert out.shape == (B, U1, model.cfg.prednet.output_size)
    assert fin.h.shape == (nctx, 1, B, model.cfg.prednet.hidden_size)
    assert fin.c is None

    state = None
    steps = []
    for u in range(U1):
        o, state = model.apply(v, tokens[:, u], state,
                               method=model.predict_step)
        steps.append(o)
    stepped = jnp.stack(steps, 1)
    # one (B,U1,C*H) GEMM vs U1 (B,C*H) GEMMs: different reduction tiling,
    # fp32 noise only
    np.testing.assert_allclose(np.asarray(out), np.asarray(stepped),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(fin.h), np.asarray(state.h),
                               rtol=1e-6, atol=1e-6)


def test_lengths_freeze_final_state():
    """The final state reflects the last VALID token per sample, and
    len=0 rows keep the inherited (zero) context."""
    nctx = 2
    model = RNNTransducer(_cfg(nctx))
    v, _ = _init(model)
    tokens = jnp.asarray([[3, 5, 9, 11], [7, 2, 4, 6]], jnp.int32)
    lengths = jnp.asarray([2, 0])
    _, fin = model.apply(v, tokens, lengths, method=model.predict)
    # sample 0: context = [e(5), e(3)]; sample 1: untouched zeros
    _, fin_short = model.apply(v, tokens[:1, :2], jnp.asarray([2]),
                               method=model.predict)
    np.testing.assert_allclose(np.asarray(fin.h[:, :, 0]),
                               np.asarray(fin_short.h[:, :, 0]),
                               rtol=1e-6, atol=1e-6)
    assert float(jnp.abs(fin.h[:, :, 1]).max()) == 0.0


def test_resume_from_state_matches_unchunked():
    """__call__ with an initial_state (resume mid-label-stream) produces the
    same outputs/state as one unchunked pass — the stateless analogue of the
    recurrent carry contract."""
    nctx = 2
    model = RNNTransducer(_cfg(nctx))
    v, _ = _init(model)
    rng = np.random.RandomState(1)
    B, U1 = 2, 8
    tokens = jnp.asarray(rng.randint(1, 72, size=(B, U1)).astype(np.int32))

    full, fin_full = model.apply(v, tokens, jnp.full((B,), U1),
                                 method=model.predict)
    a, mid = model.apply(v, tokens[:, :3], jnp.full((B,), 3),
                         method=model.predict)
    b, fin = model.apply(v, tokens[:, 3:], jnp.full((B,), U1 - 3), mid,
                         method=model.predict)
    np.testing.assert_allclose(np.asarray(full),
                               np.asarray(jnp.concatenate([a, b], 1)),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(fin_full.h), np.asarray(fin.h),
                               rtol=1e-6, atol=1e-6)


def test_zero_state_is_blank_context():
    """Stepping from state=None == stepping from explicit zeros == stepping
    after a pad token (pad embeds to zero)."""
    model = RNNTransducer(_cfg(1))
    v, _ = _init(model)
    tok = jnp.asarray([5], jnp.int32)
    pad = jnp.asarray([0], jnp.int32)
    o_none, _ = model.apply(v, tok, None, method=model.predict_step)
    H = model.cfg.prednet.hidden_size
    zeros = RNNState(jnp.zeros((1, 1, 1, H)), None)
    o_zero, _ = model.apply(v, tok, zeros, method=model.predict_step)
    _, after_pad = model.apply(v, pad, None, method=model.predict_step)
    o_pad, _ = model.apply(v, tok, after_pad, method=model.predict_step)
    for o in (o_zero, o_pad):
        np.testing.assert_allclose(np.asarray(o_none), np.asarray(o),
                                   rtol=1e-6, atol=1e-6)


def test_context_shifts_and_caps():
    """Bigram context depends ONLY on the immediately previous label."""
    model = RNNTransducer(_cfg(1))
    v, _ = _init(model)
    # histories [..., 9] vs [..., 9] with different older tokens
    s1 = None
    for t in (3, 9):
        _, s1 = model.apply(v, jnp.asarray([t], jnp.int32), s1,
                            method=model.predict_step)
    s2 = None
    for t in (44, 9):
        _, s2 = model.apply(v, jnp.asarray([t], jnp.int32), s2,
                            method=model.predict_step)
    o1, _ = model.apply(v, jnp.asarray([7], jnp.int32), s1,
                        method=model.predict_step)
    o2, _ = model.apply(v, jnp.asarray([7], jnp.int32), s2,
                        method=model.predict_step)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2),
                               rtol=1e-6, atol=1e-6)


def test_decode_surfaces_run_stateless():
    """Greedy, batched beam, and streaming sessions work unchanged; chunked
    streaming stays token-exact vs offline."""
    from rnntransducer_tpu.decode.beam_batched import batched_beam_decode
    from rnntransducer_tpu.decode.greedy import greedy_decode
    from rnntransducer_tpu.decode.streaming import StreamingRecognizer
    from rnntransducer_tpu.config import AudioConfig
    from rnntransducer_tpu.frontend import LogMelFrontend

    model = RNNTransducer(_cfg(1))
    v, _ = _init(model)
    acfg = AudioConfig(normalize=False)
    wav = (np.random.RandomState(5).randn(11000) * 2).astype(np.float32)
    feats, lengths = LogMelFrontend(acfg)(jnp.asarray(wav[None]))

    toks, lens = greedy_decode(model, v, feats, lengths, max_output_len=128)
    want = [int(t) for t in np.asarray(toks)[0, :int(lens[0])]]

    bt, bl, _ = batched_beam_decode(model, v, feats, lengths, beam_width=3,
                                    max_output_len=64)
    assert np.asarray(bt).shape[1] == 3

    rec = StreamingRecognizer(model, v, acfg, chunk_frames=16,
                              normalize="none", max_output_len=128)
    out = []
    for s in range(0, len(wav), 1600):
        out.extend(rec.feed(wav[s:s + 1600]))
    out.extend(rec.flush())
    assert [int(t) for t in out] == want


def test_host_beam_and_session_batch_run_stateless():
    from rnntransducer_tpu.decode.beam import BeamSearchDecoder
    from rnntransducer_tpu.decode.session_batch import BatchedStreamingRunner
    from rnntransducer_tpu.config import AudioConfig

    model = RNNTransducer(_cfg(2))
    v, _ = _init(model)
    feats = jax.random.normal(jax.random.PRNGKey(3), (1, 20, 80))
    dec = BeamSearchDecoder(model, v, beam_width=2)
    nbest = dec.decode(feats, jnp.asarray([20]))
    assert len(nbest) >= 1

    acfg = AudioConfig(normalize=False)
    runner = BatchedStreamingRunner(model, v, acfg, max_sessions=2,
                                    chunk_frames=8)
    s = runner.open(normalize="none")
    wav = (np.random.RandomState(7).randn(4800) * 2).astype(np.float32)
    s.feed(wav)
    toks = s.flush()
    assert isinstance(list(toks), list)


def test_stateless_trains():
    """A train_step over the stateless prednet advances with finite loss and
    nonzero embedding/projection grads (both loss paths: factored + fused)."""
    from rnntransducer_tpu.train import TrainState, make_optimizer, train_step
    from rnntransducer_tpu.train.state import loss_fn
    from rnntransducer_tpu.train import build_model

    base = rt.tiny_config()
    cfg = dataclasses.replace(
        base,
        model=_cfg(1, bidirectional=True),
        train=dataclasses.replace(base.train,
                                  per_device_train_batch_size=2,
                                  max_steps=4))
    rng = np.random.RandomState(8)
    B, T, U = 2, 16, 4
    targets = rng.randint(1, 71, size=(B, U)).astype(np.int32)
    batch = {
        "feats": rng.randn(B, T, 80).astype(np.float32),
        "feat_lengths": np.array([T, T - 3], np.int32),
        "text_in": np.concatenate([np.zeros((B, 1), np.int32), targets], 1),
        "text_lengths": np.full((B,), U + 1, np.int32),
        "targets": targets, "target_lengths": np.full((B,), U, np.int32),
    }
    tx = make_optimizer(cfg.train)
    state = TrainState.create(cfg)
    state2, metrics = train_step(cfg, tx, state, batch)
    assert int(state2.step) == 1 and np.isfinite(float(metrics["loss"]))

    model = build_model(cfg)
    key = jax.random.PRNGKey(0)
    params = model.init(key, jnp.asarray(batch["feats"]),
                        jnp.asarray(batch["feat_lengths"]),
                        jnp.asarray(batch["text_in"]),
                        jnp.asarray(batch["text_lengths"]))["params"]
    g = jax.grad(lambda p: loss_fn(model, cfg, p, batch, key, True))(params)
    pn = g["prednet"]
    total = sum(float(jnp.abs(x).sum())
                for x in jax.tree_util.tree_leaves(pn))
    assert np.isfinite(total) and total > 0
