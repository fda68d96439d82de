"""RNN-T loss: JAX implementation vs NumPy oracle, plus finite differences.

Parity target: 1e-5 on loss and gradients (BASELINE.md north star)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rnntransducer_tpu.ops import rnnt_loss
from rnntransducer_tpu.ops import rnnt_numpy


def _rand_case(rng, B, T, U, V, full=False):
    logits = rng.randn(B, T, U + 1, V).astype(np.float32)
    labels = rng.randint(1, V, size=(B, U)).astype(np.int32)
    if full:
        t_len = np.full((B,), T, np.int32)
        u_len = np.full((B,), U, np.int32)
    else:
        t_len = rng.randint(max(1, T // 2), T + 1, size=(B,)).astype(np.int32)
        u_len = rng.randint(1, U + 1, size=(B,)).astype(np.int32)
        # RNN-T requires T >= 1; also keep U <= something emittable
        u_len = np.minimum(u_len, t_len * 3)
    return logits, labels, t_len, u_len


@pytest.mark.parametrize("shape,full", [
    ((2, 5, 3, 7), True),
    ((3, 8, 4, 11), False),
    ((1, 1, 0, 5), True),        # degenerate: empty label sequence
    ((2, 12, 6, 72), False),     # realistic vocab
])
def test_loss_matches_oracle(shape, full):
    B, T, U, V = shape
    rng = np.random.RandomState(0)
    logits, labels, t_len, u_len = _rand_case(rng, B, T, U, V, full)
    want_losses, _ = rnnt_numpy.rnnt_loss(logits, labels, t_len, u_len,
                                          reduction="none")
    got = rnnt_loss(jnp.asarray(logits), jnp.asarray(labels),
                    jnp.asarray(t_len), jnp.asarray(u_len), reduction="none")
    np.testing.assert_allclose(np.asarray(got), want_losses, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("shape", [(2, 5, 3, 7), (2, 9, 4, 12)])
def test_grad_matches_oracle(shape):
    B, T, U, V = shape
    rng = np.random.RandomState(1)
    logits, labels, t_len, u_len = _rand_case(rng, B, T, U, V)
    _, want_grad = rnnt_numpy.rnnt_loss(logits, labels, t_len, u_len,
                                        reduction="mean")
    f = lambda lg: rnnt_loss(lg, jnp.asarray(labels), jnp.asarray(t_len),
                             jnp.asarray(u_len), reduction="mean")
    got_grad = jax.grad(f)(jnp.asarray(logits))
    np.testing.assert_allclose(np.asarray(got_grad), want_grad,
                               rtol=1e-5, atol=1e-5)


def test_grad_finite_differences():
    """Independent check of the analytic gradient (not via the oracle's own
    occupancy formula): central finite differences on a tiny lattice."""
    B, T, U, V = 1, 3, 2, 4
    rng = np.random.RandomState(2)
    logits, labels, t_len, u_len = _rand_case(rng, B, T, U, V, full=True)
    f = lambda lg: rnnt_loss(lg, jnp.asarray(labels), jnp.asarray(t_len),
                             jnp.asarray(u_len), reduction="sum")
    g = np.asarray(jax.grad(f)(jnp.asarray(logits)))
    eps = 1e-3
    for idx in [(0, 0, 0, 0), (0, 1, 1, labels[0, 1]), (0, 2, 2, 0), (0, 2, 1, 3)]:
        lp = logits.copy(); lp[idx] += eps
        lm = logits.copy(); lm[idx] -= eps
        fd = (float(f(jnp.asarray(lp))) - float(f(jnp.asarray(lm)))) / (2 * eps)
        assert abs(fd - g[idx]) < 5e-3, (idx, fd, g[idx])


def test_padded_positions_get_zero_grad():
    B, T, U, V = 2, 6, 3, 5
    rng = np.random.RandomState(3)
    logits, labels, t_len, u_len = _rand_case(rng, B, T, U, V)
    t_len[:] = [4, 6]; u_len[:] = [2, 3]
    f = lambda lg: rnnt_loss(lg, jnp.asarray(labels), jnp.asarray(t_len),
                             jnp.asarray(u_len), reduction="sum")
    g = np.asarray(jax.grad(f)(jnp.asarray(logits)))
    assert np.abs(g[0, 4:]).max() == 0.0
    assert np.abs(g[0, :, 3:]).max() == 0.0
    # and padding the lattice must not change the loss
    big = np.zeros((B, T + 5, U + 3 + 1, V), np.float32)
    big[:, :T, :U + 1] = logits
    l1 = rnnt_loss(jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(t_len),
                   jnp.asarray(u_len), reduction="none")
    l2 = rnnt_loss(jnp.asarray(big), jnp.asarray(np.pad(labels, ((0, 0), (0, 3)))),
                   jnp.asarray(t_len), jnp.asarray(u_len), reduction="none")
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=1e-5, atol=1e-5)


def test_bf16_logits_supported():
    """One implementation covers both reference backends (fp32 warp + fp16
    torchaudio): bf16 in, finite loss and grads out."""
    B, T, U, V = 2, 8, 4, 12
    rng = np.random.RandomState(4)
    logits, labels, t_len, u_len = _rand_case(rng, B, T, U, V)
    lg = jnp.asarray(logits, jnp.bfloat16)
    f = lambda x: rnnt_loss(x, jnp.asarray(labels), jnp.asarray(t_len),
                            jnp.asarray(u_len))
    loss, grad = jax.value_and_grad(f)(lg)
    assert np.isfinite(float(loss))
    assert grad.dtype == jnp.bfloat16
    assert bool(jnp.isfinite(grad.astype(jnp.float32)).all())
    # close to the fp32 result at bf16 resolution
    loss32 = f(jnp.asarray(logits))
    assert abs(float(loss) - float(loss32)) / abs(float(loss32)) < 0.05


def test_reductions():
    B, T, U, V = 3, 5, 2, 6
    rng = np.random.RandomState(5)
    logits, labels, t_len, u_len = _rand_case(rng, B, T, U, V, full=True)
    args = (jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(t_len),
            jnp.asarray(u_len))
    none = np.asarray(rnnt_loss(*args, reduction="none"))
    assert none.shape == (B,)
    np.testing.assert_allclose(float(rnnt_loss(*args, reduction="mean")),
                               none.mean(), rtol=1e-6)
    np.testing.assert_allclose(float(rnnt_loss(*args, reduction="sum")),
                               none.sum(), rtol=1e-6)


def test_fused_loss_matches_unfused():
    """rnnt_loss_fused (chunked joint) must equal joint->rnnt_loss exactly,
    including gradients through the joint closure."""
    from rnntransducer_tpu.ops.rnnt_loss import rnnt_loss_fused

    B, T, U, V, De, Dd = 2, 13, 4, 9, 6, 5
    rng = np.random.RandomState(7)
    enc = jnp.asarray(rng.randn(B, T, De).astype(np.float32))
    dec = jnp.asarray(rng.randn(B, U + 1, Dd).astype(np.float32))
    W = jnp.asarray(rng.randn(De + Dd, V).astype(np.float32) * 0.3)
    labels = jnp.asarray(rng.randint(1, V, (B, U)), jnp.int32)
    t_len = jnp.array([13, 9], jnp.int32)
    u_len = jnp.array([4, 2], jnp.int32)

    def joint_fn_w(w):
        def joint_fn(e, d):
            Tc, U1 = e.shape[1], d.shape[1]
            eb = jnp.broadcast_to(e[:, :, None, :], (B, Tc, U1, De))
            db = jnp.broadcast_to(d[:, None, :, :], (B, Tc, U1, Dd))
            return jnp.tanh(jnp.concatenate([eb, db], -1)) @ w
        return joint_fn

    def unfused(w, e, d):
        logits = joint_fn_w(w)(e, d)
        return rnnt_loss(logits, labels, t_len, u_len, reduction="mean")

    def fused(w, e, d):
        return rnnt_loss_fused(joint_fn_w(w), e, d, labels, t_len, u_len,
                               reduction="mean", chunk_frames=5)  # 13 -> 3 chunks

    l1, g1 = jax.value_and_grad(unfused, argnums=(0, 1, 2))(W, enc, dec)
    l2, g2 = jax.value_and_grad(fused, argnums=(0, 1, 2))(W, enc, dec)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_fuzz_loss_and_grad_parity():
    """Randomized sweep: 12 random (B,T,U,V, lengths, scale) configs, loss +
    grad parity vs the NumPy oracle at 1e-5 (both XLA and Pallas-interpret
    backends on a subset)."""
    master = np.random.RandomState(1234)
    for trial in range(12):
        B = int(master.randint(1, 4))
        T = int(master.randint(1, 16))
        U = int(master.randint(0, 7))
        V = int(master.randint(2, 24))
        scale = float(master.choice([0.3, 1.0, 4.0]))
        logits = (master.randn(B, T, U + 1, V) * scale).astype(np.float32)
        labels = master.randint(1, V, size=(B, max(U, 1))).astype(np.int32)
        t_len = master.randint(1, T + 1, size=(B,)).astype(np.int32)
        u_len = master.randint(0, U + 1, size=(B,)).astype(np.int32)
        want_l, want_g = rnnt_numpy.rnnt_loss(logits, labels, t_len, u_len,
                                              reduction="mean")
        backend = "pallas_interpret" if trial % 4 == 0 else "xla"
        f = lambda lg: rnnt_loss(lg, jnp.asarray(labels), jnp.asarray(t_len),
                                 jnp.asarray(u_len), reduction="mean",
                                 backend=backend)
        got_l, got_g = jax.value_and_grad(f)(jnp.asarray(logits))
        np.testing.assert_allclose(float(got_l), want_l, rtol=1e-5, atol=1e-5,
                                   err_msg=f"trial {trial} {B,T,U,V,scale}")
        np.testing.assert_allclose(np.asarray(got_g), want_g, rtol=1e-5,
                                   atol=1e-5,
                                   err_msg=f"trial {trial} {B,T,U,V,scale}")


def test_factored_compact_lattice_matches_materialized():
    """GEMM-form bl/lb from (A, C) factors == compact_lattice of the
    materialized logits A[:,:,None,:] + C[:,None,:,:], values AND grads."""
    from rnntransducer_tpu.ops.rnnt_loss import (compact_lattice,
                                                 factored_compact_lattice)

    B, T, U1, V = 3, 11, 5, 13
    rng = np.random.RandomState(11)
    A = jnp.asarray(rng.randn(B, T, V).astype(np.float32) * 2.0)
    C = jnp.asarray(rng.randn(B, U1, V).astype(np.float32) * 2.0)
    labels = jnp.asarray(rng.randint(1, V, (B, U1 - 2)), jnp.int32)
    w = jnp.asarray(rng.randn(B, T, U1).astype(np.float32))  # random cotangent

    def via_lattice(a, c):
        logits = a[:, :, None, :] + c[:, None, :, :]
        bl, lb = compact_lattice(logits, labels)
        return jnp.sum(bl * w) + jnp.sum(lb * (2.0 * w))

    def via_factors(a, c):
        bl, lb = factored_compact_lattice(a, c, labels)
        return jnp.sum(bl * w) + jnp.sum(lb * (2.0 * w))

    l1, (ga1, gc1) = jax.value_and_grad(via_lattice, argnums=(0, 1))(A, C)
    l2, (ga2, gc2) = jax.value_and_grad(via_factors, argnums=(0, 1))(A, C)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ga1), np.asarray(ga2),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gc1), np.asarray(gc2),
                               rtol=1e-4, atol=1e-5)


def test_factored_loss_matches_unfused_through_joint():
    """rnnt_loss_factored on JointNetwork.factors == rnnt_loss on the
    materialized JointNetwork.__call__ lattice, incl. grads through the
    shared fc params (the zero-pad trick keeps one (De+Dd, V) kernel)."""
    from rnntransducer_tpu.config import JointNetConfig
    from rnntransducer_tpu.models.joint import JointNetwork
    from rnntransducer_tpu.ops.rnnt_loss import rnnt_loss_factored

    B, T, U, V, De, Dd = 2, 9, 3, 11, 6, 5
    rng = np.random.RandomState(21)
    enc = jnp.asarray(rng.randn(B, T, De).astype(np.float32))
    dec = jnp.asarray(rng.randn(B, U + 1, Dd).astype(np.float32))
    labels = jnp.asarray(rng.randint(1, V, (B, U)), jnp.int32)
    t_len = jnp.array([9, 6], jnp.int32)
    u_len = jnp.array([3, 2], jnp.int32)
    joint = JointNetwork(JointNetConfig(num_classes=V, combine="concat"))
    params = joint.init(jax.random.PRNGKey(0), enc, dec)["params"]

    def unfused(p, e, d):
        logits = joint.apply({"params": p}, e, d)
        return rnnt_loss(logits, labels, t_len, u_len, reduction="mean")

    def factored(p, e, d):
        A, C = joint.apply({"params": p}, e, d, method=joint.factors)
        return rnnt_loss_factored(A, C, labels, t_len, u_len,
                                  reduction="mean")

    l1, g1 = jax.value_and_grad(unfused, argnums=(0, 1, 2))(params, enc, dec)
    l2, g2 = jax.value_and_grad(factored, argnums=(0, 1, 2))(params, enc, dec)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_factored_lattice_extreme_scales_stay_finite():
    """Anti-aligned factor peaks drive the stabilized product sum toward
    fp32 underflow; the tiny-floor clamp must keep values and grads finite
    (those lattice points carry ~zero probability mass either way)."""
    from rnntransducer_tpu.ops.rnnt_loss import factored_compact_lattice

    B, T, U1, V = 1, 4, 3, 8
    A = np.full((B, T, V), -60.0, np.float32)
    C = np.full((B, U1, V), -60.0, np.float32)
    A[..., 0] = 60.0   # A peaks hard on v=0
    C[..., 0] = -120.0  # C bottoms out exactly there: worst-case anti-align
    C[..., 1] = 60.0
    A[..., 1] = -120.0
    labels = jnp.asarray(np.full((B, U1 - 1), 2, np.int32))

    def f(a, c):
        bl, lb = factored_compact_lattice(jnp.asarray(a), jnp.asarray(c),
                                          labels)
        return jnp.sum(bl) + jnp.sum(lb), (bl, lb)

    (val, (bl, lb)), (ga, gc) = jax.value_and_grad(
        f, argnums=(0, 1), has_aux=True)(A, C)
    assert np.isfinite(float(val))
    assert np.isfinite(np.asarray(bl)).all()
    assert np.isfinite(np.asarray(lb)).all()
    assert np.isfinite(np.asarray(ga)).all()
    assert np.isfinite(np.asarray(gc)).all()


def test_loss_fn_factored_matches_full_lattice():
    """Trainer loss_fn: the concat-joint factored path (joint_chunk_frames>0)
    must match the chunk_frames=0 full-lattice path on a tiny model, loss and
    parameter grads."""
    import dataclasses

    import rnntransducer_tpu as rt
    from rnntransducer_tpu.models import RNNTransducer
    from rnntransducer_tpu.train.state import loss_fn
    from rnntransducer_tpu.config import TrainConfig

    cfg = rt.tiny_config()
    assert cfg.model.jointnet.combine == "concat"
    cfg_fact = dataclasses.replace(
        cfg, train=TrainConfig(joint_chunk_frames=8, precision="fp32"))
    cfg_full = dataclasses.replace(
        cfg, train=TrainConfig(joint_chunk_frames=0, precision="fp32"))
    model = RNNTransducer(cfg.model)
    rng = np.random.RandomState(3)
    B, T, U = 2, 12, 4
    M = cfg.model.transnet.input_size
    batch = {
        "feats": jnp.asarray(rng.randn(B, T, M).astype(np.float32)),
        "feat_lengths": jnp.array([12, 9], jnp.int32),
        "text_in": jnp.asarray(
            np.concatenate([np.zeros((B, 1), np.int32),
                            rng.randint(1, 20, (B, U)).astype(np.int32)], 1)),
        "text_lengths": jnp.array([U + 1, U], jnp.int32),
        "targets": jnp.asarray(rng.randint(1, 20, (B, U)).astype(np.int32)),
        "target_lengths": jnp.array([U, U - 1], jnp.int32),
    }
    variables = model.init_variables(jax.random.PRNGKey(0), max_t=T, max_u=U)
    params = variables["params"]
    key = jax.random.PRNGKey(1)

    def run(cfg_x, p):
        return loss_fn(model, cfg_x, p, batch, key, deterministic=True)

    l1, g1 = jax.value_and_grad(lambda p: run(cfg_fact, p))(params)
    l2, g2 = jax.value_and_grad(lambda p: run(cfg_full, p))(params)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
