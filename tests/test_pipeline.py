"""GPipe-style stage pipeline (parallel/pipeline.py): the layer stack
sharded over the 8-virtual-device CPU mesh must reproduce the single-device
StackedRNN/AudioEncoder exactly — same masked scans, split at layer
boundaries with activations threaded through ppermute — for forward AND
parameter gradients, bidirectional included (the case the wavefront
cannot pipeline).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rnntransducer_tpu.config import TransNetConfig
from rnntransducer_tpu.models.cells import StackedRNN
from rnntransducer_tpu.models.encoder import AudioEncoder
from rnntransducer_tpu.parallel.pipeline import (
    make_stage_mesh, pipeline_encode, pipeline_scan,
)


def _lengths(rng, B, T):
    out = rng.randint(3, T + 1, size=(B,)).astype(np.int32)
    out[0] = T
    out[-1] = 4
    return out


@pytest.mark.parametrize("rnn_type", ["gru", "lstm"])
@pytest.mark.parametrize("bidirectional", [True, False])
def test_pipeline_matches_stacked_rnn(rnn_type, bidirectional):
    B, T, F, H, L, M = 4, 12, 6, 8, 8, 2
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, T, F).astype(np.float32))
    lengths = jnp.asarray(_lengths(rng, B, T))

    rnn = StackedRNN(input_size=F, hidden_size=H, num_layers=L,
                     rnn_type=rnn_type, dropout=0.0,
                     bidirectional=bidirectional, scan_layers=True,
                     use_pallas="off")
    params = rnn.init(jax.random.PRNGKey(1), x, lengths)["params"]
    want, _ = rnn.apply({"params": params}, x, lengths)

    mesh = make_stage_mesh()  # 8 stages, 1 layer each
    got = jax.jit(lambda p, x, n: pipeline_scan(
        p, x, n, rnn_type=rnn_type, num_layers=L,
        bidirectional=bidirectional, mesh=mesh, num_microbatches=M))(
        params, x, lengths)

    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_pipeline_multilayer_stages_and_per_layer_layout():
    """2 layers per stage (D=4 submesh), per-layer param layout."""
    B, T, F, H, L, M = 6, 10, 4, 8, 8, 3
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(B, T, F).astype(np.float32))
    lengths = jnp.asarray(_lengths(rng, B, T))
    rnn = StackedRNN(input_size=F, hidden_size=H, num_layers=L,
                     rnn_type="gru", bidirectional=True, scan_layers=False,
                     use_pallas="off")
    params = rnn.init(jax.random.PRNGKey(3), x, lengths)["params"]
    want, _ = rnn.apply({"params": params}, x, lengths)
    mesh = make_stage_mesh(jax.devices()[:4])
    got = pipeline_scan(params, x, lengths, rnn_type="gru", num_layers=L,
                        bidirectional=True, mesh=mesh, num_microbatches=M)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_pipeline_grad_parity():
    """Parameter gradients through the pipeline equal the single-device
    stack's — the schedule supports pipeline-parallel TRAINING."""
    B, T, F, H, L, M = 4, 8, 4, 8, 4, 2
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(B, T, F).astype(np.float32))
    lengths = jnp.asarray([T, T - 2, 5, T], np.int32)
    rnn = StackedRNN(input_size=F, hidden_size=H, num_layers=L,
                     rnn_type="gru", bidirectional=True, scan_layers=True,
                     use_pallas="off")
    params = rnn.init(jax.random.PRNGKey(5), x, lengths)["params"]

    def loss_ref(p):
        out, _ = rnn.apply({"params": p}, x, lengths)
        return jnp.sum(out ** 2)

    mesh = make_stage_mesh(jax.devices()[:4])

    def loss_pp(p):
        out = pipeline_scan(p, x, lengths, rnn_type="gru", num_layers=L,
                            bidirectional=True, mesh=mesh,
                            num_microbatches=M)
        return jnp.sum(out ** 2)

    g_ref = jax.grad(loss_ref)(params)
    g_pp = jax.jit(jax.grad(loss_pp))(params)
    flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_pp = dict(jax.tree_util.tree_leaves_with_path(g_pp))
    assert len(flat_ref) == len(flat_pp)
    for path, leaf in flat_ref:
        np.testing.assert_allclose(np.asarray(flat_pp[path]),
                                   np.asarray(leaf), rtol=2e-4, atol=2e-5,
                                   err_msg=jax.tree_util.keystr(path))


def test_pipeline_encoder_wrapper():
    B, T, F = 4, 9, 6
    cfg = TransNetConfig(input_size=F, hidden_size=8, output_size=10,
                         num_layers=4, rnn_type="lstm", dropout=0.0,
                         bidirectional=True)
    rng = np.random.RandomState(6)
    x = jnp.asarray(rng.randn(B, T, F).astype(np.float32))
    lengths = jnp.asarray(_lengths(rng, B, T))
    enc = AudioEncoder(cfg)
    variables = enc.init(jax.random.PRNGKey(7), x, lengths)
    want, _ = enc.apply(variables, x, lengths)
    mesh = make_stage_mesh(jax.devices()[:4])
    got = pipeline_encode(variables["params"], cfg, x, lengths, mesh,
                          num_microbatches=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_pipeline_and_wavefront_zero_length_rows():
    """All-pad utterances (length 0) must flow through both multi-device
    schedules exactly like the single-device stack: zero outputs, no NaNs
    (zero/overlong lengths were a historical NaN source — see the verify
    probes in the repo skill)."""
    from rnntransducer_tpu.parallel.wavefront import (
        make_time_mesh, wavefront_scan,
    )

    B, T, F, H, L = 4, 16, 4, 8, 4
    rng = np.random.RandomState(13)
    x = jnp.asarray(rng.randn(B, T, F).astype(np.float32))
    lengths = jnp.asarray([0, T, 1, 0], np.int32)
    full = jnp.full((B,), T, jnp.int32)
    rnn = StackedRNN(input_size=F, hidden_size=H, num_layers=L,
                     rnn_type="gru", bidirectional=True, scan_layers=True,
                     use_pallas="off")
    p = rnn.init(jax.random.PRNGKey(1), x, full)["params"]
    want, _ = rnn.apply({"params": p}, x, lengths)
    got = pipeline_scan(p, x, lengths, rnn_type="gru", num_layers=L,
                        bidirectional=True,
                        mesh=make_stage_mesh(jax.devices()[:4]),
                        num_microbatches=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    assert bool(jnp.isfinite(got).all())
    rnn_u = StackedRNN(input_size=F, hidden_size=H, num_layers=L,
                       rnn_type="lstm", bidirectional=False,
                       scan_layers=True, use_pallas="off")
    pu = rnn_u.init(jax.random.PRNGKey(2), x, full)["params"]
    want_u, _ = rnn_u.apply({"params": pu}, x, lengths)
    got_u, _ = wavefront_scan(pu, x, lengths, rnn_type="lstm",
                              num_layers=L, mesh=make_time_mesh())
    np.testing.assert_allclose(np.asarray(got_u), np.asarray(want_u),
                               rtol=1e-5, atol=1e-5)
    assert bool(jnp.isfinite(got_u).all())


def test_pipeline_validation_errors():
    B, T, F, H, L = 2, 8, 4, 8, 3
    rng = np.random.RandomState(8)
    x = jnp.asarray(rng.randn(B, T, F).astype(np.float32))
    lengths = jnp.asarray([T, T], np.int32)
    rnn = StackedRNN(input_size=F, hidden_size=H, num_layers=L,
                     rnn_type="gru", bidirectional=False, use_pallas="off")
    params = rnn.init(jax.random.PRNGKey(9), x, lengths)["params"]
    mesh = make_stage_mesh(jax.devices()[:2])
    with pytest.raises(ValueError, match="not divisible by stage"):
        pipeline_scan(params, x, lengths, rnn_type="gru", num_layers=L,
                      bidirectional=False, mesh=mesh, num_microbatches=2)
    rnn4 = StackedRNN(input_size=F, hidden_size=H, num_layers=4,
                      rnn_type="gru", bidirectional=False, use_pallas="off")
    params4 = rnn4.init(jax.random.PRNGKey(10), x, lengths)["params"]
    with pytest.raises(ValueError, match="num_microbatches"):
        pipeline_scan(params4, x, lengths, rnn_type="gru", num_layers=4,
                      bidirectional=False, mesh=mesh, num_microbatches=3)
    # input wider than the uniform layer width cannot be padded up
    rng2 = np.random.RandomState(11)
    x_wide = jnp.asarray(rng2.randn(B, T, 24).astype(np.float32))
    rnn_w = StackedRNN(input_size=24, hidden_size=H, num_layers=4,
                       rnn_type="gru", bidirectional=False,
                       use_pallas="off")
    params_w = rnn_w.init(jax.random.PRNGKey(12), x_wide,
                          lengths)["params"]
    with pytest.raises(ValueError, match="input_size"):
        pipeline_scan(params_w, x_wide, lengths, rnn_type="gru",
                      num_layers=4, bidirectional=False, mesh=mesh,
                      num_microbatches=2)
