"""Sequence-parallel wavefront encoder (parallel/wavefront.py): a
unidirectional stack time-sharded over the 8-virtual-device CPU mesh must
reproduce the single-device masked scans exactly — the chunked scans run the
same op sequence with the carry threaded through ppermute.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rnntransducer_tpu.config import TransNetConfig
from rnntransducer_tpu.models.cells import StackedRNN
from rnntransducer_tpu.models.encoder import AudioEncoder
from rnntransducer_tpu.parallel.wavefront import (
    make_time_mesh, pad_time_to_multiple, wavefront_encode, wavefront_scan,
)


def _lengths(rng, B, T):
    # ragged: include rows shorter than one chunk and a full-length row
    out = rng.randint(3, T + 1, size=(B,)).astype(np.int32)
    out[0] = T
    out[-1] = 2
    return out


@pytest.mark.parametrize("rnn_type", ["gru", "lstm", "rnn"])
@pytest.mark.parametrize("scan_layers", [False, True])
def test_wavefront_matches_stacked_rnn(rnn_type, scan_layers):
    B, T, F, H, L = 2, 32, 6, 8, 3
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, T, F).astype(np.float32))
    lengths = jnp.asarray(_lengths(rng, B, T))

    rnn = StackedRNN(input_size=F, hidden_size=H, num_layers=L,
                     rnn_type=rnn_type, dropout=0.0, bidirectional=False,
                     scan_layers=scan_layers, use_pallas="off")
    params = rnn.init(jax.random.PRNGKey(1), x, lengths)["params"]
    want, want_state = rnn.apply({"params": params}, x, lengths)

    mesh = make_time_mesh()
    got, got_state = jax.jit(
        lambda p, x, n: wavefront_scan(p, x, n, rnn_type=rnn_type,
                                       num_layers=L, mesh=mesh))(
        params, x, lengths)

    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_state.h),
                               np.asarray(want_state.h),
                               rtol=1e-5, atol=1e-5)
    if rnn_type == "lstm":
        np.testing.assert_allclose(np.asarray(got_state.c),
                                   np.asarray(want_state.c),
                                   rtol=1e-5, atol=1e-5)
    else:
        assert got_state.c is None


def test_wavefront_single_layer():
    B, T, F, H = 2, 16, 4, 8
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(B, T, F).astype(np.float32))
    lengths = jnp.asarray([T, 7], np.int32)
    rnn = StackedRNN(input_size=F, hidden_size=H, num_layers=1,
                     rnn_type="gru", bidirectional=False, use_pallas="off")
    params = rnn.init(jax.random.PRNGKey(3), x, lengths)["params"]
    want, _ = rnn.apply({"params": params}, x, lengths)
    got, _ = wavefront_scan(params, x, lengths, rnn_type="gru",
                            num_layers=1, mesh=make_time_mesh())
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_wavefront_encoder_and_padding():
    """Encoder-level wrapper (rnn + out_proj) on a T that needs padding up
    to the mesh width; outputs must match AudioEncoder on the true frames."""
    B, T, F = 2, 29, 6  # 29 % 8 != 0
    cfg = TransNetConfig(input_size=F, hidden_size=8, output_size=5,
                         num_layers=2, rnn_type="lstm", dropout=0.5,
                         bidirectional=False, use_pallas_cells="off")
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(B, T, F).astype(np.float32))
    lengths = jnp.asarray([T, 11], np.int32)

    enc = AudioEncoder(cfg)
    params = enc.init(jax.random.PRNGKey(5), x, lengths)["params"]
    want, want_state = enc.apply({"params": params}, x, lengths,
                                 deterministic=True)

    mesh = make_time_mesh()
    xp = pad_time_to_multiple(x, mesh.shape["time"])
    assert xp.shape[1] == 32
    got, got_state = wavefront_encode(params, cfg, xp, lengths, mesh)
    # pad frames are masked to zero hidden, but out_proj adds its bias
    # everywhere — compare the true frames
    np.testing.assert_allclose(np.asarray(got[:, :T]), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_state.h),
                               np.asarray(want_state.h),
                               rtol=1e-5, atol=1e-5)


def test_wavefront_rejects_bidirectional_and_ragged_T():
    cfg = TransNetConfig(input_size=4, hidden_size=8, output_size=5,
                         num_layers=1, rnn_type="gru", bidirectional=True)
    with pytest.raises(ValueError, match="unidirectional"):
        wavefront_encode({}, cfg, jnp.zeros((1, 8, 4)), jnp.ones((1,)),
                         make_time_mesh())
    with pytest.raises(ValueError, match="not divisible"):
        wavefront_scan({}, jnp.zeros((1, 9, 4)), jnp.ones((1,)),
                       rnn_type="gru", num_layers=1, mesh=make_time_mesh())


def test_wavefront_gradients_match_single_device():
    """The staircase schedule is differentiable: fori_loop's static trip
    count (D + L - 1) lowers to scan and ppermute's transpose is the reverse
    permute, so param AND input grads match the single-device stack — the
    scan supports sequence-parallel TRAINING of unidirectional encoders,
    not just inference."""
    B, T, F, H, L = 2, 32, 6, 8, 3
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(B, T, F).astype(np.float32))
    lengths = jnp.asarray([T, 13], np.int32)
    rnn = StackedRNN(input_size=F, hidden_size=H, num_layers=L,
                     rnn_type="lstm", bidirectional=False, scan_layers=False,
                     use_pallas="off")
    params = rnn.init(jax.random.PRNGKey(1), x, lengths)["params"]
    mesh = make_time_mesh()

    def loss_ref(p, x):
        out, st = rnn.apply({"params": p}, x, lengths)
        return jnp.sum(out ** 2) + jnp.sum(st.h ** 2)

    def loss_wf(p, x):
        out, st = wavefront_scan(p, x, lengths, rnn_type="lstm",
                                 num_layers=L, mesh=mesh)
        return jnp.sum(out ** 2) + jnp.sum(st.h ** 2)

    g_ref = jax.grad(loss_ref)(params, x)
    g_wf = jax.jit(jax.grad(loss_wf))(params, x)
    errs = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), g_ref, g_wf)
    assert max(jax.tree.leaves(errs)) < 1e-5
    gx_ref = jax.grad(loss_ref, argnums=1)(params, x)
    gx_wf = jax.jit(jax.grad(loss_wf, argnums=1))(params, x)
    np.testing.assert_allclose(np.asarray(gx_wf), np.asarray(gx_ref),
                               rtol=1e-5, atol=1e-6)
