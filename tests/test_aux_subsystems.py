"""Aux subsystems: profiling timer, checkify loss guard, interpret-mode
debugging, multi-host init info."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_step_timer():
    from rnntransducer_tpu.utils.profiling import StepTimer
    t = StepTimer(warmup=1)
    for _ in range(4):
        t.start()
        x = jnp.ones((8, 8)).sum()
        t.stop(sync_value=x)
    s = t.summary()
    assert s["steps"] == 3
    assert s["p50_ms"] >= 0 and s["max_ms"] >= s["p50_ms"]


def test_trace_writes_profile(tmp_path):
    from rnntransducer_tpu.utils.profiling import annotate, trace
    d = str(tmp_path / "trace")
    with trace(d):
        with annotate("test_phase"):
            jnp.ones((16, 16)).sum().block_until_ready()
    found = []
    for root, _, files in os.walk(d):
        found.extend(files)
    assert found, "no profiler artifacts written"


def test_checked_rnnt_loss_catches_bad_lengths():
    from rnntransducer_tpu.utils.debugging import checked_rnnt_loss
    rng = np.random.RandomState(0)
    logits = jnp.asarray(rng.randn(1, 4, 3, 5).astype(np.float32))
    labels = jnp.asarray(rng.randint(1, 5, (1, 2)), jnp.int32)
    err, loss = checked_rnnt_loss(logits, labels, jnp.array([4]),
                                  jnp.array([2]))
    err.throw()  # valid case: no error
    assert np.isfinite(float(loss))

    err, _ = checked_rnnt_loss(logits, labels, jnp.array([9]), jnp.array([2]))
    with pytest.raises(Exception):
        err.throw()
    err, _ = checked_rnnt_loss(logits, labels, jnp.array([4]), jnp.array([7]))
    with pytest.raises(Exception):
        err.throw()


def test_force_interpret_runs_pallas_on_cpu():
    from rnntransducer_tpu.utils.debugging import force_interpret
    from rnntransducer_tpu.ops.rnnt_loss import _sweep
    from rnntransducer_tpu.ops.rnnt_pallas import sweep_pallas
    rng = np.random.RandomState(0)
    be = jnp.asarray(rng.randn(1, 6, 3).astype(np.float32))
    le = jnp.asarray(rng.randn(1, 6, 3).astype(np.float32))
    with force_interpret():
        got = sweep_pallas(be, le)
    np.testing.assert_allclose(np.asarray(got), np.asarray(_sweep(be, le)),
                               rtol=1e-5, atol=1e-5)


def test_distributed_info_single_host():
    from rnntransducer_tpu.parallel.distributed import initialize
    info = initialize()
    assert info["process_index"] == 0
    assert info["process_count"] == 1
    assert info["global_devices"] == 8  # the CPU test mesh


def test_vm_map_guard():
    """resource_guard: map counting works and a forced clear runs cleanly."""
    from rnntransducer_tpu.utils.resource_guard import (
        maybe_clear_jax_caches, vm_map_count,
    )

    n = vm_map_count()
    assert n > 100  # a live jax process always has many mappings
    assert maybe_clear_jax_caches(threshold=10 ** 9) is False  # under limit
    assert maybe_clear_jax_caches(threshold=1) is True  # forced clear
    # process still functional after the clear: jit something
    import jax
    import jax.numpy as jnp
    assert float(jax.jit(lambda x: x + 1)(jnp.zeros(()))) == 1.0
