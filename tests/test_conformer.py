"""Conformer encoder (arch="conformer", Gulati et al. 2020) — the second
encoder family beyond the reference's RNN-only registry
(``networks/encoder.py:48-52``).

The masked-exactness contract matches the RNN encoder: padded batches
produce the same valid rows as per-utterance calls (attention excludes
padded keys, the conv module zeroes padded inputs, outputs zero past each
row's length)."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import rnntransducer_tpu as rt
from rnntransducer_tpu.models import RNNTransducer


def _cfg(stride=1, dropout=0.0, layers=2, heads=4, d=64):
    base = rt.tiny_config()
    return dataclasses.replace(
        base.model,
        transnet=dataclasses.replace(
            base.model.transnet, arch="conformer", hidden_size=d,
            output_size=48, num_layers=layers, attention_heads=heads,
            conv_kernel_size=7, time_reduction_stride=stride,
            dropout=dropout))


def _init(model, B=2, T=20, U=4, seed=0):
    rng = jax.random.PRNGKey(seed)
    feats = jax.random.normal(rng, (B, T, 80))
    text = jnp.zeros((B, U + 1), jnp.int32)
    v = model.init(rng, feats, jnp.full((B,), T), text,
                   jnp.full((B,), U + 1))
    return v, feats


def test_shapes_and_reduction():
    model = RNNTransducer(_cfg(stride=2))
    v, feats = _init(model, B=2, T=21)
    lengths = jnp.array([21, 13])
    enc, _ = model.apply(v, feats, lengths, method=model.encode)
    assert enc.shape == (2, 11, 48)          # ceil(21/2)
    assert bool(jnp.isfinite(enc).all())
    # masked-scan contract: zeros past each row's reduced length
    assert float(jnp.abs(enc[1, 7:]).max()) == 0.0


@pytest.mark.parametrize("stride", [1, 2])
def test_padded_batch_matches_per_utterance(stride):
    """The killer masking test: every block (attention keys, conv window,
    stacking) must keep pad frames out of valid rows."""
    model = RNNTransducer(_cfg(stride=stride))
    v, feats = _init(model, B=3, T=24)
    lengths = jnp.array([24, 17, 9])
    enc, _ = model.apply(v, feats, lengths, method=model.encode)
    for i, L in enumerate([24, 17, 9]):
        solo, _ = model.apply(v, feats[i:i + 1, :L], jnp.array([L]),
                              method=model.encode)
        TL = model.cfg.transnet.output_lengths(L)
        np.testing.assert_allclose(
            np.asarray(enc[i, :TL]), np.asarray(solo[0, :TL]),
            rtol=1e-4, atol=1e-5)  # fp32 reduction-extent noise only


def test_full_forward_lattice_and_grads():
    model = RNNTransducer(_cfg())
    v, feats = _init(model, B=2, T=16, U=3)
    lengths = jnp.array([16, 11])
    text = jnp.asarray([[0, 5, 9, 2], [0, 7, 1, 3]], jnp.int32)
    out = model.apply(v, feats, lengths, text, jnp.array([4, 4]))
    assert out.shape == (2, 16, 4, 72) and bool(jnp.isfinite(out).all())

    def loss(params):
        o = model.apply({"params": params}, feats, lengths, text,
                        jnp.array([4, 4]))
        return jnp.sum(o ** 2)
    g = jax.grad(loss)(v["params"])
    total = sum(float(jnp.abs(x).sum())
                for x in jax.tree_util.tree_leaves(g))
    assert np.isfinite(total) and total > 0


def test_conformer_trains_and_decodes():
    from rnntransducer_tpu.decode.beam_batched import batched_beam_decode
    from rnntransducer_tpu.decode.greedy import greedy_decode
    from rnntransducer_tpu.train import TrainState, make_optimizer, train_step

    base = rt.tiny_config()
    cfg = dataclasses.replace(
        base, model=_cfg(dropout=0.1),
        train=dataclasses.replace(base.train,
                                  per_device_train_batch_size=2,
                                  max_steps=4))
    rng = np.random.RandomState(0)
    B, T, U = 2, 16, 4
    targets = rng.randint(1, 71, size=(B, U)).astype(np.int32)
    batch = {
        "feats": rng.randn(B, T, 80).astype(np.float32),
        "feat_lengths": np.array([T, T - 5], np.int32),
        "text_in": np.concatenate([np.zeros((B, 1), np.int32), targets], 1),
        "text_lengths": np.full((B,), U + 1, np.int32),
        "targets": targets, "target_lengths": np.full((B,), U, np.int32),
    }
    tx = make_optimizer(cfg.train)
    state = TrainState.create(cfg)
    state, m1 = train_step(cfg, tx, state, batch)
    state, m2 = train_step(cfg, tx, state, batch)
    assert np.isfinite(float(m1["loss"])) and np.isfinite(float(m2["loss"]))

    model = RNNTransducer(cfg.model)
    variables = {"params": jax.device_get(state.params)}
    feats = jnp.asarray(batch["feats"])
    lens = jnp.asarray(batch["feat_lengths"])
    toks, tl = greedy_decode(model, variables, feats, lens,
                             max_output_len=16)
    assert np.asarray(toks).shape == (B, 16)
    bt, bl, _ = batched_beam_decode(model, variables, feats, lens,
                                    beam_width=2, max_output_len=16)
    assert np.asarray(bt).shape[1] == 2


def test_streaming_refuses_conformer():
    from rnntransducer_tpu.config import AudioConfig
    from rnntransducer_tpu.decode.streaming import StreamingRecognizer
    from rnntransducer_tpu.models.cells import RNNState

    model = RNNTransducer(_cfg())
    v, _ = _init(model)
    with pytest.raises(ValueError, match="unidirectional|streaming"):
        StreamingRecognizer(model, v, AudioConfig(), chunk_frames=16)
    with pytest.raises(ValueError, match="full-context|streaming"):
        model.apply(v, jnp.zeros((1, 8, 80)), jnp.array([8]),
                    RNNState(jnp.zeros((0, 1, 1, 0)), None),
                    method=model.encode)


def test_config_validation():
    with pytest.raises(ValueError, match="bidirectional"):
        _cfg().transnet.__class__(arch="conformer", bidirectional=False)
    with pytest.raises(ValueError, match="attention_heads"):
        _cfg().transnet.__class__(arch="conformer", hidden_size=100,
                                  attention_heads=8)
    with pytest.raises(ValueError, match="unknown encoder arch"):
        _cfg().transnet.__class__(arch="transformer")


def test_bf16_forward():
    from rnntransducer_tpu.utils.precision import cast_float_leaves
    model = RNNTransducer(_cfg())
    v, feats = _init(model)
    vb = cast_float_leaves(v, jnp.bfloat16)
    enc, _ = model.apply(vb, feats.astype(jnp.bfloat16), jnp.array([20, 14]),
                         method=model.encode)
    assert enc.dtype == jnp.bfloat16 and bool(jnp.isfinite(
        enc.astype(jnp.float32)).all())


def test_rope_properties():
    """RoPE preserves norms and makes q.k depend on relative offset only."""
    from rnntransducer_tpu.models.conformer import rope
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 1, 8, 16).astype(np.float32))
    r = rope(x)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(x), axis=-1),
                               np.linalg.norm(np.asarray(r), axis=-1),
                               rtol=1e-5)
    # same vectors placed at (2, 5) vs (4, 7): identical dot product
    q = jnp.asarray(rng.randn(16).astype(np.float32))
    k = jnp.asarray(rng.randn(16).astype(np.float32))

    def dot_at(pq, pk):
        T = 10
        qs = jnp.zeros((1, 1, T, 16)).at[0, 0, pq].set(q)
        ks = jnp.zeros((1, 1, T, 16)).at[0, 0, pk].set(k)
        return float(jnp.sum(rope(qs)[0, 0, pq] * rope(ks)[0, 0, pk]))

    assert abs(dot_at(2, 5) - dot_at(4, 7)) < 1e-4


def test_conformer_data_parallel_matches_single():
    """Conformer train_step sharded over the 8-device CPU mesh == unsharded
    (the DP exactness contract extends to the second encoder family)."""
    from rnntransducer_tpu.parallel import make_mesh, replicate, shard_batch
    from rnntransducer_tpu.train import TrainState, make_optimizer, train_step

    assert len(jax.devices()) == 8
    base = rt.tiny_config()
    cfg = dataclasses.replace(
        base, model=_cfg(layers=1, d=32, heads=2),
        train=dataclasses.replace(base.train,
                                  per_device_train_batch_size=2,
                                  max_steps=4, precision="fp32"))
    rng = np.random.RandomState(1)
    B, T, U = 16, 12, 3
    targets = rng.randint(1, 71, size=(B, U)).astype(np.int32)
    batch = {
        "feats": rng.randn(B, T, 80).astype(np.float32),
        "feat_lengths": np.full((B,), T, np.int32),
        "text_in": np.concatenate([np.zeros((B, 1), np.int32), targets], 1),
        "text_lengths": np.full((B,), U + 1, np.int32),
        "targets": targets, "target_lengths": np.full((B,), U, np.int32),
    }
    tx = make_optimizer(cfg.train)
    sa, ma = train_step(cfg, tx, TrainState.create(cfg), batch)

    mesh = make_mesh()
    sb, mb = train_step(cfg, tx, replicate(mesh, TrainState.create(cfg)),
                        shard_batch(mesh, batch))
    np.testing.assert_allclose(float(ma["loss"]), float(mb["loss"]),
                               rtol=1e-5)
    d = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                     sa.params, sb.params)
    assert max(jax.tree.leaves(d)) < 1e-5


def _scfg(chunk=4, left=2, stride=2, layers=2, d=64, kernel=7):
    base = rt.tiny_config()
    return dataclasses.replace(
        base.model,
        transnet=dataclasses.replace(
            base.model.transnet, arch="conformer", hidden_size=d,
            output_size=48, num_layers=layers, attention_heads=4,
            conv_kernel_size=kernel, bidirectional=False,
            attention_chunk=chunk, attention_left_chunks=left,
            time_reduction_stride=stride))


def test_streaming_conformer_chunked_cache_matches_offline():
    """Chunk-by-chunk encode with the per-block cache == the offline
    block-causal masked forward, including a ragged final chunk."""
    from rnntransducer_tpu.decode.streaming import _zero_encoder_state

    model = RNNTransducer(_scfg())
    v, _ = _init(model, B=2, T=40)
    feats = jax.random.normal(jax.random.PRNGKey(3), (2, 40, 80))
    lengths = jnp.array([40, 29])
    off, _ = model.apply(v, feats, lengths, method=model.encode)

    st = _zero_encoder_state(model, v, batch=2)
    outs = []
    rem = np.array([40, 29])
    for c0 in range(0, 40, 8):                 # chunk_frames = 4*2
        n_valid = np.clip(rem - c0, 0, 8)
        o, st = model.apply(v, feats[:, c0:c0 + 8], jnp.asarray(n_valid),
                            st, method=model.encode)
        outs.append(o)
    stream = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(stream), np.asarray(off),
                               rtol=1e-4, atol=2e-5)


def test_streaming_conformer_is_causal():
    """Changing FUTURE frames must not change past chunk outputs (the
    block-causal mask + causal conv really are causal)."""
    model = RNNTransducer(_scfg())
    v, _ = _init(model, B=1, T=40)
    rng = np.random.RandomState(0)
    a = rng.randn(1, 40, 80).astype(np.float32)
    b = a.copy()
    b[:, 24:] = rng.randn(1, 16, 80)           # perturb last 2 chunks
    oa, _ = model.apply(v, jnp.asarray(a), jnp.array([40]),
                        method=model.encode)
    ob, _ = model.apply(v, jnp.asarray(b), jnp.array([40]),
                        method=model.encode)
    # first 12 reduced frames (3 chunks) depend only on frames < 24
    np.testing.assert_allclose(np.asarray(oa[:, :12]),
                               np.asarray(ob[:, :12]), rtol=1e-5, atol=1e-6)
    assert float(jnp.abs(oa[:, 12:] - ob[:, 12:]).max()) > 1e-3


def test_streaming_conformer_left_context_bounded():
    """With left=1, chunk c must not see chunk c-2: perturbing chunk 0
    leaves chunk >= 2 outputs unchanged (the window really is bounded)."""
    model = RNNTransducer(_scfg(chunk=4, left=1, stride=1, layers=1))
    v, _ = _init(model, B=1, T=20)
    rng = np.random.RandomState(1)
    a = rng.randn(1, 20, 80).astype(np.float32)
    b = a.copy()
    b[:, :4] = rng.randn(1, 4, 80)             # perturb chunk 0
    oa, _ = model.apply(v, jnp.asarray(a), jnp.array([20]),
                        method=model.encode)
    ob, _ = model.apply(v, jnp.asarray(b), jnp.array([20]),
                        method=model.encode)
    # receptive field of y[f] through one block: conv (causal, reach K-1=6)
    # reads x2[f-6..f]; x2[p] attends x1 back to chunkstart(p)-4. For
    # f >= 16: p >= 10 => window start >= 4 — chunk 0 (frames 0..3) is out
    # of reach, so y[16:] must be unchanged; early frames must differ.
    np.testing.assert_allclose(np.asarray(oa[:, 16:]),
                               np.asarray(ob[:, 16:]), rtol=1e-5, atol=1e-6)
    assert float(jnp.abs(oa[:, :8] - ob[:, :8]).max()) > 1e-3


def test_streaming_recognizer_conformer_matches_offline_greedy():
    """Full wav-in StreamingRecognizer session over the streaming Conformer
    == offline greedy decode, token for token."""
    from rnntransducer_tpu.config import AudioConfig
    from rnntransducer_tpu.decode.greedy import greedy_decode
    from rnntransducer_tpu.decode.streaming import StreamingRecognizer
    from rnntransducer_tpu.frontend import LogMelFrontend

    model = RNNTransducer(_scfg(chunk=8, left=2, stride=2))
    v, _ = _init(model, B=1, T=32)
    acfg = AudioConfig(normalize=False)
    wav = (np.random.RandomState(9).randn(12000) * 2).astype(np.float32)
    feats, lengths = LogMelFrontend(acfg)(jnp.asarray(wav[None]))
    toks, lens = greedy_decode(model, v, feats, lengths, max_output_len=128)
    want = [int(t) for t in np.asarray(toks)[0, :int(lens[0])]]

    rec = StreamingRecognizer(model, v, acfg, chunk_frames=16,
                              normalize="none", max_output_len=128)
    out = []
    for s in range(0, len(wav), 1600):
        out.extend(rec.feed(wav[s:s + 1600]))
    out.extend(rec.flush())
    assert [int(t) for t in out] == want


def test_streaming_conformer_session_batch_slot_reuse():
    """Continuous batching over the streaming Conformer: lanes decode, and
    a reused slot starts from a clean cache (reset zeroes the flags)."""
    from rnntransducer_tpu.config import AudioConfig
    from rnntransducer_tpu.decode.session_batch import BatchedStreamingRunner

    model = RNNTransducer(_scfg(chunk=8, left=1, stride=2))
    v, _ = _init(model, B=1, T=32)
    acfg = AudioConfig(normalize=False)
    runner = BatchedStreamingRunner(model, v, acfg, max_sessions=2,
                                    chunk_frames=16)
    wav = (np.random.RandomState(11).randn(6400) * 2).astype(np.float32)

    s1 = runner.open(normalize="none")
    s1.feed(wav)
    t1 = list(s1.flush())

    s2 = runner.open(normalize="none")      # reuses the freed slot
    s2.feed(wav)
    t2 = list(s2.flush())
    assert t1 == t2                         # clean cache => same decode


def test_streaming_conformer_validation():
    from rnntransducer_tpu.config import AudioConfig
    from rnntransducer_tpu.decode.streaming import StreamingRecognizer

    with pytest.raises(ValueError, match="bidirectional=False"):
        _scfg().transnet.__class__(arch="conformer", attention_chunk=4,
                                   bidirectional=True)
    model = RNNTransducer(_scfg(chunk=8, stride=2))
    v, _ = _init(model)
    with pytest.raises(ValueError, match="attention_chunk"):
        StreamingRecognizer(model, v, AudioConfig(), chunk_frames=32)


def test_streaming_conformer_trains():
    """The chunked-causal forward trains (the mask is applied at training
    time, so train/serve see the same context)."""
    from rnntransducer_tpu.train import TrainState, make_optimizer, train_step

    base = rt.tiny_config()
    cfg = dataclasses.replace(
        base, model=_scfg(chunk=4, left=1, stride=1),
        train=dataclasses.replace(base.train,
                                  per_device_train_batch_size=2,
                                  max_steps=4))
    rng = np.random.RandomState(4)
    B, T, U = 2, 16, 3
    targets = rng.randint(1, 71, size=(B, U)).astype(np.int32)
    batch = {
        "feats": rng.randn(B, T, 80).astype(np.float32),
        "feat_lengths": np.array([T, T - 5], np.int32),
        "text_in": np.concatenate([np.zeros((B, 1), np.int32), targets], 1),
        "text_lengths": np.full((B,), U + 1, np.int32),
        "targets": targets, "target_lengths": np.full((B,), U, np.int32),
    }
    tx = make_optimizer(cfg.train)
    state = TrainState.create(cfg)
    state, m = train_step(cfg, tx, state, batch)
    assert np.isfinite(float(m["loss"]))


def test_scan_blocks_matches_per_block_layout():
    """scan_blocks=True (one compiled block body, stacked 'blocks' params)
    must be numerically identical to the per-block layout on the same
    weights, via the stack converter."""
    from rnntransducer_tpu.models.conformer import (
        stack_conformer_block_params, unstack_conformer_block_params,
    )

    L = 3
    cfg_loop = _cfg(layers=L)
    model_loop = RNNTransducer(cfg_loop)
    v, feats = _init(model_loop, B=2, T=20)
    lengths = jnp.array([20, 13])
    enc_loop, _ = model_loop.apply(v, feats, lengths,
                                   method=model_loop.encode)

    cfg_scan = dataclasses.replace(
        cfg_loop, transnet=dataclasses.replace(cfg_loop.transnet,
                                               scan_blocks=True))
    model_scan = RNNTransducer(cfg_scan)
    p = dict(v["params"])
    p["encoder"] = stack_conformer_block_params(v["params"]["encoder"], L)
    enc_scan, _ = model_scan.apply({"params": p}, feats, lengths,
                                   method=model_scan.encode)
    np.testing.assert_allclose(np.asarray(enc_scan), np.asarray(enc_loop),
                               rtol=2e-5, atol=2e-5)

    # converter round-trip is exact
    back = unstack_conformer_block_params(p["encoder"], L)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), back, dict(v["params"]["encoder"]))


def test_scan_blocks_init_and_train_shapes():
    """Fresh init under scan_blocks trains: params carry the stacked
    'blocks' subtree with a leading L axis and the loss is finite."""
    from rnntransducer_tpu.ops import rnnt_loss

    L = 3
    cfg = _cfg(layers=L)
    cfg = dataclasses.replace(
        cfg, transnet=dataclasses.replace(cfg.transnet, scan_blocks=True))
    model = RNNTransducer(cfg)
    v, feats = _init(model, B=2, T=20, U=4)
    blk = v["params"]["encoder"]["blocks"]
    leaf = jax.tree_util.tree_leaves(blk)[0]
    assert leaf.shape[0] == L
    lengths = jnp.full((2,), 20)
    text = jnp.zeros((2, 5), jnp.int32)
    logits = model.apply(v, feats, lengths, text, jnp.full((2,), 5))
    targets = jnp.ones((2, 4), jnp.int32)
    loss = rnnt_loss(logits, targets, lengths, jnp.full((2,), 4), blank=0)
    assert bool(jnp.isfinite(loss))


def test_scan_blocks_streaming_raises_with_pointer():
    cfg = _cfg(layers=2)
    cfg = dataclasses.replace(
        cfg, transnet=dataclasses.replace(
            cfg.transnet, scan_blocks=True, attention_chunk=4,
            bidirectional=False))
    model = RNNTransducer(cfg)
    v, feats = _init(model, B=1, T=4)
    enc = model.bind(v)
    state = enc.encoder.zero_state(1)
    with pytest.raises(ValueError, match="unstack_conformer_block_params"):
        model.apply(v, feats[:, :4], jnp.array([4]), state,
                    method=model.encode)


def test_depthwise_conv_custom_vjp_matches_autodiff():
    """_dwconv_valid's hand-written VJP must equal plain autodiff of the
    same shift formula (value, dx, dk) — the custom VJP exists purely for
    TPU backward speed."""
    from rnntransducer_tpu.models.conformer import _dwconv_valid

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 20, 8), jnp.float32)
    k = jnp.asarray(rng.randn(5, 8), jnp.float32)

    def ref(x, k):
        K = k.shape[0]
        t_out = x.shape[1] - K + 1
        out = x[:, 0:t_out] * k[0]
        for i in range(1, K):
            out = out + x[:, i:i + t_out] * k[i]
        return out

    np.testing.assert_allclose(np.asarray(_dwconv_valid(x, k)),
                               np.asarray(ref(x, k)), rtol=1e-6)
    g = jnp.asarray(rng.randn(2, 16, 8), jnp.float32)
    loss = lambda f: lambda x, k: jnp.sum(f(x, k) * g)
    dx_c, dk_c = jax.grad(loss(_dwconv_valid), argnums=(0, 1))(x, k)
    dx_r, dk_r = jax.grad(loss(ref), argnums=(0, 1))(x, k)
    np.testing.assert_allclose(np.asarray(dx_c), np.asarray(dx_r),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(dk_c), np.asarray(dk_r),
                               rtol=1e-5, atol=1e-5)


def test_scan_block_group_matches_per_block_layout():
    """scan_block_group=2 (scan over groups of 2 unrolled blocks) equals
    the per-block layout on the same weights via the group converter."""
    from rnntransducer_tpu.models.conformer import (
        stack_conformer_block_params, unstack_conformer_block_params,
    )

    L, G = 4, 2
    cfg_loop = _cfg(layers=L)
    model_loop = RNNTransducer(cfg_loop)
    v, feats = _init(model_loop, B=2, T=20)
    lengths = jnp.array([20, 13])
    enc_loop, _ = model_loop.apply(v, feats, lengths,
                                   method=model_loop.encode)

    cfg_scan = dataclasses.replace(
        cfg_loop, transnet=dataclasses.replace(
            cfg_loop.transnet, scan_blocks=True, scan_block_group=G))
    model_scan = RNNTransducer(cfg_scan)
    p = dict(v["params"])
    p["encoder"] = stack_conformer_block_params(v["params"]["encoder"], L,
                                                group=G)
    enc_scan, _ = model_scan.apply({"params": p}, feats, lengths,
                                   method=model_scan.encode)
    np.testing.assert_allclose(np.asarray(enc_scan), np.asarray(enc_loop),
                               rtol=2e-5, atol=2e-5)
    back = unstack_conformer_block_params(p["encoder"], L, group=G)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), back, dict(v["params"]["encoder"]))
