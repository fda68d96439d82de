"""Training regularizers beyond reference parity.

* FastEmit (arXiv:2010.11148): the RNN-T loss backward scales the label-arc
  occupancy gradient by (1 + lambda).  Tested against the NumPy oracle
  (which implements the same eq. 9-10 surrogate independently), for exact
  lambda=0 equivalence, and for the sign of its effect (blank mass grows).
* Variational weight noise (Graves 2012, arXiv:1211.3711 — the original
  RNN-T paper's regularizer): fresh gaussian noise on every float param per
  microbatch forward, grads taken at the noisy point.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import rnntransducer_tpu as rt
from rnntransducer_tpu.ops import rnnt_loss, rnnt_numpy
from rnntransducer_tpu.ops.rnnt_loss import rnnt_loss_factored


def _case(rng, B=2, T=6, U=3, V=7):
    logits = rng.randn(B, T, U + 1, V).astype(np.float32)
    labels = rng.randint(1, V, size=(B, U)).astype(np.int32)
    t_len = np.full((B,), T, np.int32)
    u_len = np.full((B,), U, np.int32)
    if B > 1:
        t_len[1], u_len[1] = T - 2, U - 1
    return logits, labels, t_len, u_len


def test_fastemit_zero_is_plain_loss_and_grad():
    rng = np.random.RandomState(0)
    logits, labels, t_len, u_len = _case(rng)
    f0 = lambda lg: rnnt_loss(lg, jnp.asarray(labels), jnp.asarray(t_len),
                              jnp.asarray(u_len), reduction="mean")
    f1 = lambda lg: rnnt_loss(lg, jnp.asarray(labels), jnp.asarray(t_len),
                              jnp.asarray(u_len), reduction="mean",
                              fastemit_lambda=0.0)
    v0, g0 = jax.value_and_grad(f0)(jnp.asarray(logits))
    v1, g1 = jax.value_and_grad(f1)(jnp.asarray(logits))
    assert float(v0) == float(v1)
    np.testing.assert_array_equal(np.asarray(g0), np.asarray(g1))


@pytest.mark.parametrize("lam", [0.0, 0.01, 0.3])
def test_fastemit_grad_matches_oracle(lam):
    rng = np.random.RandomState(1)
    logits, labels, t_len, u_len = _case(rng, B=3, T=8, U=4, V=11)
    _, want = rnnt_numpy.rnnt_loss(logits, labels, t_len, u_len,
                                   reduction="mean", fastemit_lambda=lam)
    f = lambda lg: rnnt_loss(lg, jnp.asarray(labels), jnp.asarray(t_len),
                             jnp.asarray(u_len), reduction="mean",
                             fastemit_lambda=lam)
    got = jax.grad(f)(jnp.asarray(logits))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_fastemit_loss_value_unchanged():
    """The surrogate leaves the forward value at the plain -logZ."""
    rng = np.random.RandomState(2)
    logits, labels, t_len, u_len = _case(rng)
    a = rnnt_loss(jnp.asarray(logits), jnp.asarray(labels),
                  jnp.asarray(t_len), jnp.asarray(u_len), reduction="none")
    b = rnnt_loss(jnp.asarray(logits), jnp.asarray(labels),
                  jnp.asarray(t_len), jnp.asarray(u_len), reduction="none",
                  fastemit_lambda=0.5)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fastemit_factored_path_matches_unfused():
    """The factored GEMM-form path (the flagship's production loss) applies
    the same label-arc scaling: its logits-equivalent gradient matches the
    unfused path at the same lambda."""
    rng = np.random.RandomState(3)
    B, T, U, V = 2, 5, 3, 7
    A = rng.randn(B, T, V).astype(np.float32)
    C = rng.randn(B, U + 1, V).astype(np.float32)
    labels = rng.randint(1, V, size=(B, U)).astype(np.int32)
    t_len = np.array([T, T - 1], np.int32)
    u_len = np.array([U, U - 1], np.int32)
    lam = 0.1

    def f_fact(a, c):
        return rnnt_loss_factored(jnp.asarray(a), jnp.asarray(c),
                                  jnp.asarray(labels), jnp.asarray(t_len),
                                  jnp.asarray(u_len), reduction="mean",
                                  fastemit_lambda=lam)

    def f_unfused(a, c):
        logits = a[:, :, None, :] + c[:, None, :, :]
        return rnnt_loss(logits, jnp.asarray(labels), jnp.asarray(t_len),
                         jnp.asarray(u_len), reduction="mean",
                         fastemit_lambda=lam)

    va, (ga, gc) = jax.value_and_grad(f_fact, argnums=(0, 1))(A, C)
    vb, (gb, gd) = jax.value_and_grad(f_unfused, argnums=(0, 1))(A, C)
    np.testing.assert_allclose(float(va), float(vb), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gb),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gc), np.asarray(gd),
                               rtol=1e-4, atol=1e-5)


def test_fastemit_pushes_toward_labels():
    """One gradient step with lambda > 0 raises label-arc log-probs more
    than the plain loss does (the mechanism behind earlier emission)."""
    rng = np.random.RandomState(4)
    logits, labels, t_len, u_len = _case(rng, B=1, T=6, U=3, V=7)

    def after_step(lam):
        f = lambda lg: rnnt_loss(lg, jnp.asarray(labels), jnp.asarray(t_len),
                                 jnp.asarray(u_len), reduction="mean",
                                 fastemit_lambda=lam)
        g = jax.grad(f)(jnp.asarray(logits))
        new = jnp.asarray(logits) - 0.5 * g
        lp = jax.nn.log_softmax(new, axis=-1)
        # mean label-token log-prob over valid (t, u<U) cells
        tot = 0.0
        for u in range(u_len[0]):
            tot += float(lp[0, :t_len[0], u, labels[0, u]].mean())
        return tot

    assert after_step(0.5) > after_step(0.0)


def _tiny_batch(rng, B=2, T=12, M=80, U=3):
    feats = rng.randn(B, T, M).astype(np.float32)
    targets = rng.randint(1, 71, size=(B, U)).astype(np.int32)
    text_in = np.concatenate([np.zeros((B, 1), np.int32), targets], axis=1)
    return {
        "feats": feats, "feat_lengths": np.array([T, T - 3], np.int32),
        "text_in": text_in, "text_lengths": np.full((B,), U + 1, np.int32),
        "targets": targets, "target_lengths": np.full((B,), U, np.int32),
    }


def test_weight_noise_zero_is_identity_and_eval_ignores_it():
    from rnntransducer_tpu.train.state import loss_fn
    from rnntransducer_tpu.train import build_model

    rng = np.random.RandomState(5)
    batch = _tiny_batch(rng)
    cfg0 = rt.tiny_config()
    cfg1 = dataclasses.replace(
        cfg0, train=dataclasses.replace(cfg0.train, weight_noise_std=0.05))
    model = build_model(cfg0)
    key = jax.random.PRNGKey(0)
    params = model.init(key, jnp.asarray(batch["feats"]),
                        jnp.asarray(batch["feat_lengths"]),
                        jnp.asarray(batch["text_in"]),
                        jnp.asarray(batch["text_lengths"]))["params"]

    base = float(loss_fn(model, cfg0, params, batch, key, False))
    zero_cfg = dataclasses.replace(
        cfg0, train=dataclasses.replace(cfg0.train, weight_noise_std=0.0))
    same = float(loss_fn(model, zero_cfg, params, batch, key, False))
    assert base == same
    # deterministic (eval) forward ignores the noise entirely
    ev0 = float(loss_fn(model, cfg0, params, batch, key, True))
    ev1 = float(loss_fn(model, cfg1, params, batch, key, True))
    assert ev0 == ev1


def test_weight_noise_perturbs_loss_and_keeps_grads_finite():
    from rnntransducer_tpu.train.state import loss_fn
    from rnntransducer_tpu.train import build_model

    rng = np.random.RandomState(6)
    batch = _tiny_batch(rng)
    cfg0 = rt.tiny_config()
    cfg = dataclasses.replace(
        cfg0, train=dataclasses.replace(cfg0.train, weight_noise_std=0.05,
                                        precision="fp32"))
    cfg0 = dataclasses.replace(
        cfg0, train=dataclasses.replace(cfg0.train, precision="fp32"))
    model = build_model(cfg)
    key = jax.random.PRNGKey(1)
    params = model.init(key, jnp.asarray(batch["feats"]),
                        jnp.asarray(batch["feat_lengths"]),
                        jnp.asarray(batch["text_in"]),
                        jnp.asarray(batch["text_lengths"]))["params"]

    clean = float(loss_fn(model, cfg0, params, batch, key, False))
    noisy1 = float(loss_fn(model, cfg, params, batch, key, False))
    noisy2 = float(loss_fn(model, cfg, params, batch,
                           jax.random.PRNGKey(2), False))
    assert noisy1 != clean and noisy2 != noisy1  # fresh draw per rng
    assert np.isfinite(noisy1) and np.isfinite(noisy2)

    g = jax.grad(lambda p: loss_fn(model, cfg, p, batch, key, False))(params)
    flat = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(x)).all() for x in flat)


def test_weight_noise_train_step_runs():
    """End-to-end: a train_step with weight noise + fastemit advances and
    produces a finite loss (the two compose)."""
    from rnntransducer_tpu.train import TrainState, make_optimizer, train_step

    rng = np.random.RandomState(7)
    batch = _tiny_batch(rng)
    cfg0 = rt.tiny_config()
    cfg = dataclasses.replace(
        cfg0, train=dataclasses.replace(
            cfg0.train, weight_noise_std=0.02, fastemit_lambda=0.01,
            max_steps=10, per_device_train_batch_size=2))
    tx = make_optimizer(cfg.train)
    state = TrainState.create(cfg)
    state2, metrics = train_step(cfg, tx, state, batch)  # donates state
    assert int(state2.step) == 1
    assert np.isfinite(float(metrics["loss"]))
