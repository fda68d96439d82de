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
