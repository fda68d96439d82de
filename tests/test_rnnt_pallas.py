"""Pallas sweep kernel parity vs the XLA tier (interpret mode on CPU; the
same kernel runs compiled on TPU — exercised by bench.py / graft entry)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rnntransducer_tpu.ops import rnnt_loss, rnnt_numpy
from rnntransducer_tpu.ops.rnnt_loss import _sweep, compact_lattice
from rnntransducer_tpu.ops.rnnt_pallas import sweep_pallas


@pytest.mark.parametrize("shape", [(2, 7, 4), (1, 130, 3), (3, 16, 9)])
def test_sweep_kernel_matches_xla(shape):
    B, T, U1 = shape
    rng = np.random.RandomState(0)
    be = jnp.asarray(rng.randn(B, T, U1).astype(np.float32) - 2.0)
    le = jnp.asarray(rng.randn(B, T, U1).astype(np.float32) - 2.0)
    want = np.asarray(_sweep(be, le))
    got = np.asarray(sweep_pallas(be, le, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("shape", [(2, 9, 4, 12), (2, 5, 3, 7)])
def test_pallas_backend_loss_and_grad_parity(shape):
    B, T, U, V = shape
    rng = np.random.RandomState(1)
    logits = rng.randn(B, T, U + 1, V).astype(np.float32)
    labels = rng.randint(1, V, size=(B, U)).astype(np.int32)
    t_len = rng.randint(max(1, T // 2), T + 1, size=(B,)).astype(np.int32)
    u_len = rng.randint(1, U + 1, size=(B,)).astype(np.int32)

    want_losses, want_grad = rnnt_numpy.rnnt_loss(logits, labels, t_len, u_len,
                                                  reduction="mean")
    args = (jnp.asarray(labels), jnp.asarray(t_len), jnp.asarray(u_len))
    f = lambda lg: rnnt_loss(lg, *args, reduction="mean",
                             backend="pallas_interpret")
    loss, grad = jax.value_and_grad(f)(jnp.asarray(logits))
    np.testing.assert_allclose(float(loss), want_losses, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(grad), want_grad, rtol=1e-5, atol=1e-5)
