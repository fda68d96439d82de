"""Forward-pass shape/behavior tests for the combined transducer model."""

import jax
import jax.numpy as jnp
import numpy as np

import rnntransducer_tpu as rt
from rnntransducer_tpu.models import RNNTransducer


def _tiny_model():
    cfg = rt.tiny_config()
    return RNNTransducer(cfg.model), cfg


def test_lattice_shape_and_finite():
    model, cfg = _tiny_model()
    rng = jax.random.PRNGKey(0)
    B, T, U1 = 2, 12, 5
    audio = jax.random.normal(rng, (B, T, 80))
    text = jnp.zeros((B, U1), jnp.int32)
    v = model.init(rng, audio, jnp.array([T, 7]), text, jnp.array([U1, 3]))
    out = model.apply(v, audio, jnp.array([T, 7]), text, jnp.array([U1, 3]))
    assert out.shape == (B, T, U1, cfg.model.jointnet.num_classes)
    assert bool(jnp.isfinite(out).all())


def test_dropout_config_trains():
    """Regression: dropout>0 configs used to crash (Dropout built outside
    setup). The full base config (8L bi-GRU, dropout 0.2) must run in both
    eval and train mode."""
    cfg = rt.base_config()
    model = RNNTransducer(cfg.model)
    rng = jax.random.PRNGKey(0)
    audio = jax.random.normal(rng, (1, 10, 80))
    text = jnp.zeros((1, 4), jnp.int32)
    v = model.init(rng, audio, jnp.array([10]), text, jnp.array([4]))
    o_eval = model.apply(v, audio, jnp.array([10]), text, jnp.array([4]))
    o_train = model.apply(v, audio, jnp.array([10]), text, jnp.array([4]),
                          deterministic=False, rngs={"dropout": jax.random.PRNGKey(1)})
    assert bool(jnp.isfinite(o_eval).all()) and bool(jnp.isfinite(o_train).all())
    assert float(jnp.abs(o_eval - o_train).max()) > 1e-4


def test_fast_dropout_semantics():
    """FastDropout (cells.py): quantized-rate rbg masks must drop ~rate of
    units, rescale survivors by the quantized keep prob (E[out] == in), and
    be the identity in deterministic mode."""
    from rnntransducer_tpu.models.cells import FastDropout

    x = jnp.ones((64, 64, 64), jnp.float32)
    mod = FastDropout(0.1)
    y = np.asarray(mod.apply({}, x, False,
                             rngs={"dropout": jax.random.PRNGKey(0)}))
    q = 26 / 256  # 0.1 quantized to n/256
    dropped = float((y == 0).mean())
    assert abs(dropped - q) < 0.01, dropped
    np.testing.assert_allclose(y[y != 0], 1.0 / (1.0 - q), rtol=1e-6)
    assert abs(y.mean() - 1.0) < 0.02
    # distinct keys -> distinct masks
    y2 = np.asarray(mod.apply({}, x, False,
                              rngs={"dropout": jax.random.PRNGKey(1)}))
    assert (y != y2).any()
    # deterministic / rate-0 are the identity; rate>=1 zeroes
    np.testing.assert_array_equal(np.asarray(mod.apply({}, x, True)), x)
    np.testing.assert_array_equal(
        np.asarray(FastDropout(0.0).apply(
            {}, x, False, rngs={"dropout": jax.random.PRNGKey(0)})), x)
    assert not np.asarray(FastDropout(1.0).apply(
        {}, x, False, rngs={"dropout": jax.random.PRNGKey(0)})).any()


def test_pad_embedding_is_zero():
    model, cfg = _tiny_model()
    rng = jax.random.PRNGKey(0)
    text = jnp.zeros((1, 3), jnp.int32)
    audio = jnp.zeros((1, 4, 80))
    v = model.init(rng, audio, jnp.array([4]), text, jnp.array([3]))
    # pad token embeds to exactly zero (networks/decoder.py:69 padding_idx)
    emb_fn = lambda tok: model.apply(v, tok, None, method=model.predict_step)
    out_pad, _ = emb_fn(jnp.array([cfg.model.prednet.pad_token_id]))
    out_tok, _ = emb_fn(jnp.array([5]))
    assert float(jnp.abs(out_pad - out_tok).max()) > 1e-6  # different paths


def test_joint_add_mode():
    """combine='add': per-side projections allow De != Dd and match the
    documented additive-joint semantics."""
    import rnntransducer_tpu as rt
    cfg = rt.config.ModelConfig(
        transnet=rt.config.TransNetConfig(input_size=8, hidden_size=12,
                                          output_size=10, num_layers=1,
                                          rnn_type="lstm", dropout=0.0,
                                          bidirectional=False),
        prednet=rt.config.PredNetConfig(embedding_size=9, hidden_size=12,
                                        output_size=6,  # != transnet output
                                        num_layers=1, rnn_type="lstm",
                                        dropout=0.0),
        jointnet=rt.config.JointNetConfig(num_classes=9, combine="add",
                                          hidden_size=16),
    )
    model = RNNTransducer(cfg)
    rng = jax.random.PRNGKey(0)
    audio = jax.random.normal(rng, (2, 6, 8))
    text = jnp.zeros((2, 4), jnp.int32)
    v = model.init(rng, audio, jnp.array([6, 6]), text, jnp.array([4, 4]))
    out = model.apply(v, audio, jnp.array([6, 6]), text, jnp.array([4, 4]))
    assert out.shape == (2, 6, 4, 9)
    assert bool(jnp.isfinite(out).all())


def test_rank_decomposed_concat_joint_matches_naive():
    """The lattice-mode concat joint computes
    fc(gelu(concat(bcast(e), bcast(d)))) via the rank decomposition
    gelu(e)@W_enc + gelu(d)@W_dec + b; must match the naive broadcast-concat
    computation to float tolerance."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from rnntransducer_tpu.config import JointNetConfig
    from rnntransducer_tpu.models.joint import JointNetwork

    B, T, U, De, Dd, V = 2, 5, 4, 8, 6, 11
    cfg = JointNetConfig(num_classes=V, combine="concat")
    m = JointNetwork(cfg)
    rng = jax.random.PRNGKey(0)
    enc = jax.random.normal(rng, (B, T, De))
    dec = jax.random.normal(jax.random.PRNGKey(1), (B, U, Dd))
    params = m.init(jax.random.PRNGKey(2), enc, dec)

    got = m.apply(params, enc, dec)
    W = params["params"]["fc"]["kernel"]
    b = params["params"]["fc"]["bias"]
    ebc = jnp.broadcast_to(enc[:, :, None, :], (B, T, U, De))
    dbc = jnp.broadcast_to(dec[:, None, :, :], (B, T, U, Dd))
    want = jax.nn.gelu(jnp.concatenate([ebc, dbc], -1), approximate=True) @ W + b
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-6)

    # single-step (decode) mode keeps the direct path and must agree with a
    # one-frame lattice slice
    step = m.apply(params, enc[:, 0], dec[:, 0])
    np.testing.assert_allclose(np.asarray(step), np.asarray(got[:, 0, 0]),
                               rtol=2e-5, atol=2e-6)
