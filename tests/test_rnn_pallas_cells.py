"""Parity tests for the persistent Pallas recurrent kernels
(``ops/rnn_pallas.py``) and their integration into ``models/cells.py``.

Run in interpreter mode on the CPU conftest; the compiled TPU path shares the
same kernel body.  Reference: the XLA masked-scan cells, themselves
torch-parity-tested (tests/test_cells_torch_parity.py) against the reference's
cuDNN stacks (/root/reference/networks/encoder.py:48-52).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rnntransducer_tpu.models.cells import RNNLayer, StackedRNN
from rnntransducer_tpu.ops import rnn_pallas as rp

T, B, H = 6, 4, 16


def _rand(key, *shape, scale=0.4):
    return jax.random.normal(key, shape) * scale


def _lengths():
    return jnp.array([6, 4, 2, 1], jnp.float32)


def _xla_gru(xw, w_hh, b_hh, h0, lengths):
    def body(h, inp):
        xw_t, t = inp
        hw = h @ w_hh + b_hh
        h_new, _ = rp._gru_gates(xw_t, hw, h)
        m = (lengths > t)[:, None]
        return jnp.where(m, h_new, h), jnp.where(m, h_new, 0.0)
    hfin, hall = jax.lax.scan(body, h0, (xw, jnp.arange(T, dtype=jnp.float32)))
    return hall, hfin


def _xla_lstm(xw, w_hh, b_hh, h0, c0, lengths):
    def body(carry, inp):
        h, c = carry
        xw_t, t = inp
        hw = h @ w_hh + b_hh
        h_new, c_new, _ = rp._lstm_gates(xw_t, hw, c)
        m = (lengths > t)[:, None]
        return ((jnp.where(m, h_new, h), jnp.where(m, c_new, c)),
                jnp.where(m, h_new, 0.0))
    (hfin, cfin), hall = jax.lax.scan(
        body, (h0, c0), (xw, jnp.arange(T, dtype=jnp.float32)))
    return hall, hfin, cfin


def test_gru_kernel_fwd_and_grads_match_xla():
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    xw = _rand(ks[0], T, B, 3 * H, scale=1.0)
    w = _rand(ks[1], H, 3 * H)
    b = _rand(ks[2], 3 * H, scale=0.1)
    h0 = _rand(ks[3], B, H)
    lengths = _lengths()

    hall_p, hfin_p = rp.gru_scan(xw, w, b, h0, lengths, False, True)
    hall_x, hfin_x = _xla_gru(xw, w, b, h0, lengths)
    np.testing.assert_allclose(hall_p, hall_x, atol=1e-6)
    np.testing.assert_allclose(hfin_p, hfin_x, atol=1e-6)

    def loss(fn):
        def f(args):
            ha, hf = fn(*args)
            return jnp.sum(jnp.sin(ha)) + 2.0 * jnp.sum(jnp.cos(hf))
        return f

    gp = jax.grad(loss(lambda *a: rp.gru_scan(*a, lengths, False, True)))((xw, w, b, h0))
    gx = jax.grad(loss(lambda *a: _xla_gru(*a, lengths)))((xw, w, b, h0))
    for got, want in zip(gp, gx):
        np.testing.assert_allclose(got, want, atol=2e-5)


def test_lstm_kernel_fwd_and_grads_match_xla():
    ks = jax.random.split(jax.random.PRNGKey(1), 5)
    xw = _rand(ks[0], T, B, 4 * H, scale=1.0)
    w = _rand(ks[1], H, 4 * H)
    b = _rand(ks[2], 4 * H, scale=0.1)
    h0 = _rand(ks[3], B, H)
    c0 = _rand(ks[4], B, H)
    lengths = _lengths()

    out_p = rp.lstm_scan(xw, w, b, h0, c0, lengths, False, True)
    out_x = _xla_lstm(xw, w, b, h0, c0, lengths)
    for got, want in zip(out_p, out_x):
        np.testing.assert_allclose(got, want, atol=1e-6)

    def loss(fn):
        def f(args):
            ha, hf, cf = fn(*args)
            return (jnp.sum(jnp.sin(ha)) + 2.0 * jnp.sum(jnp.cos(hf))
                    + 3.0 * jnp.sum(jnp.sin(cf)))
        return f

    gp = jax.grad(loss(lambda *a: rp.lstm_scan(*a, lengths, False, True)))(
        (xw, w, b, h0, c0))
    gx = jax.grad(loss(lambda *a: _xla_lstm(*a, lengths)))((xw, w, b, h0, c0))
    for got, want in zip(gp, gx):
        np.testing.assert_allclose(got, want, atol=2e-5)


@pytest.mark.parametrize("rnn_type", ["gru", "lstm"])
def test_rnnlayer_pallas_path_matches_xla_path(rnn_type):
    """The integrated cells.py branch: identical outputs AND parameter grads."""
    x = _rand(jax.random.PRNGKey(2), B, T, 8, scale=1.0)
    lengths = jnp.array([6, 5, 3, 2], jnp.int32)
    from rnntransducer_tpu.utils.masking import length_mask
    mask = length_mask(lengths, T)

    layer_x = RNNLayer(8, H, rnn_type, use_pallas="off")
    layer_p = RNNLayer(8, H, rnn_type, use_pallas="interpret")
    params = layer_x.init(jax.random.PRNGKey(3), x, mask)

    out_x, fin_x = layer_x.apply(params, x, mask)
    out_p, fin_p = layer_p.apply(params, x, mask)
    np.testing.assert_allclose(out_p, out_x, atol=1e-6)
    np.testing.assert_allclose(fin_p[0], fin_x[0], atol=1e-6)
    if rnn_type == "lstm":
        np.testing.assert_allclose(fin_p[1], fin_x[1], atol=1e-6)

    def loss(mod):
        def f(p):
            out, (h, c) = mod.apply(p, x, mask)
            return jnp.sum(out ** 2) + jnp.sum(jnp.tanh(h))
        return f

    gx = jax.grad(loss(layer_x))(params)
    gp = jax.grad(loss(layer_p))(params)
    for (kx, vx), (_, vp) in zip(
            sorted(jax.tree_util.tree_leaves_with_path(gx),
                   key=lambda kv: str(kv[0])),
            sorted(jax.tree_util.tree_leaves_with_path(gp),
                   key=lambda kv: str(kv[0]))):
        np.testing.assert_allclose(vp, vx, atol=2e-5, err_msg=str(kx))


def test_stacked_bidirectional_pallas_matches_xla():
    """Bi-GRU stack (the flagship topology) through flip_sequences."""
    x = _rand(jax.random.PRNGKey(4), B, T, 8, scale=1.0)
    lengths = jnp.array([6, 5, 3, 2], jnp.int32)

    rnn_x = StackedRNN(8, H, num_layers=2, rnn_type="gru", bidirectional=True,
                       use_pallas="off")
    rnn_p = StackedRNN(8, H, num_layers=2, rnn_type="gru", bidirectional=True,
                       use_pallas="interpret")
    params = rnn_x.init(jax.random.PRNGKey(5), x, lengths)

    out_x, st_x = rnn_x.apply(params, x, lengths)
    out_p, st_p = rnn_p.apply(params, x, lengths)
    np.testing.assert_allclose(out_p, out_x, atol=1e-6)
    np.testing.assert_allclose(st_p.h, st_x.h, atol=1e-6)


@pytest.mark.parametrize("rnn_type", ["gru", "lstm"])
def test_reverse_kernel_matches_flip_scan_flip(rnn_type):
    """reverse=True == flip_sequences -> scan -> flip_sequences, including
    nonzero h0 with short lengths (masked steps are a PREFIX of reversed
    processing order — the subtle predecessor-select case), fwd and grads."""
    from rnntransducer_tpu.utils.masking import flip_sequences
    G = 3 if rnn_type == "gru" else 4
    ks = jax.random.split(jax.random.PRNGKey(8), 5)
    xw = _rand(ks[0], T, B, G * H, scale=1.0)
    w = _rand(ks[1], H, G * H)
    b = _rand(ks[2], G * H, scale=0.1)
    h0 = _rand(ks[3], B, H)
    c0 = _rand(ks[4], B, H)
    lengths = _lengths()

    def ref(args):
        # flip along time of the (T, B, G) stream == flip_sequences on (B, T, G)
        xw_btg = jnp.swapaxes(args[0], 0, 1)
        flipped = jnp.swapaxes(
            flip_sequences(xw_btg, lengths.astype(jnp.int32)), 0, 1)
        if rnn_type == "gru":
            hall, hfin = _xla_gru(flipped, *args[1:], lengths)
            hall = jnp.swapaxes(
                flip_sequences(jnp.swapaxes(hall, 0, 1),
                               lengths.astype(jnp.int32)), 0, 1)
            return hall, hfin
        hall, hfin, cfin = _xla_lstm(flipped, *args[1:], lengths)
        hall = jnp.swapaxes(
            flip_sequences(jnp.swapaxes(hall, 0, 1),
                           lengths.astype(jnp.int32)), 0, 1)
        return hall, hfin, cfin

    if rnn_type == "gru":
        args = (xw, w, b, h0)
        got = rp.gru_scan(*args, lengths, True, True)
    else:
        args = (xw, w, b, h0, c0)
        got = rp.lstm_scan(*args, lengths, True, True)
    want = ref(args)
    for g_, w_ in zip(got, want):
        np.testing.assert_allclose(g_, w_, atol=1e-6)

    def loss(fn):
        def f(a):
            outs = fn(a)
            return sum((i + 1.0) * jnp.sum(jnp.sin(o))
                       for i, o in enumerate(outs))
        return f

    if rnn_type == "gru":
        gp = jax.grad(loss(lambda a: rp.gru_scan(*a, lengths, True, True)))(args)
    else:
        gp = jax.grad(loss(lambda a: rp.lstm_scan(*a, lengths, True, True)))(args)
    gx = jax.grad(loss(ref))(args)
    for got_g, want_g in zip(gp, gx):
        np.testing.assert_allclose(got_g, want_g, atol=2e-5)


def test_supported_gating_and_odd_shapes():
    """supported() rejects misaligned/tiny/VMEM-overflow shapes (compiled TPU
    path falls back to the XLA scan); interpret mode handles any shape."""
    assert not rp.supported("gru", 50, 4)
    assert not rp.supported("lstm", 128, 2)
    assert not rp.supported("rnn", 128, 8)
    assert rp.supported("gru", 1024, 64, itemsize=2)   # flagship bf16
    assert not rp.supported("gru", 1024, 64, itemsize=4)  # fp32 overflows VMEM
    # time-grid gate: odd/tiny T (prednet's U+1) stays on the XLA scan —
    # Mosaic's real bwd allocation at T=49 k=1 overflows scoped VMEM
    assert rp.supported("lstm", 1024, 64, itemsize=2, seq_len=512)
    assert not rp.supported("lstm", 1024, 64, itemsize=2, seq_len=49)
    assert not rp.supported("lstm", 1024, 64, itemsize=2, seq_len=16)
    assert rp.supported("lstm", 1024, 64, itemsize=2, seq_len=64)
    x = _rand(jax.random.PRNGKey(6), 2, T, 8)
    lengths = jnp.array([6, 3], jnp.int32)
    rnn = StackedRNN(8, 50, num_layers=1, rnn_type="gru",
                     use_pallas="interpret")
    params = rnn.init(jax.random.PRNGKey(7), x, lengths)
    out, _ = rnn.apply(params, x, lengths)
    assert out.shape == (2, T, 50)


@pytest.mark.parametrize("rnn_type", ["gru", "lstm"])
@pytest.mark.parametrize("Tk", [5, 4, 8, 12])  # k = 1, 4, 8, 4
def test_time_block_unroll_matches_xla_all_k(rnn_type, Tk):
    """The k-timesteps-per-grid-step unrolling (incl. the k=1 fallback for
    odd T) is semantically invisible: fwd + grads match the XLA scan."""
    G = 3 if rnn_type == "gru" else 4
    ks = jax.random.split(jax.random.PRNGKey(20 + Tk), 5)
    xw = _rand(ks[0], Tk, B, G * H, scale=1.0)
    w = _rand(ks[1], H, G * H)
    b = _rand(ks[2], G * H, scale=0.1)
    h0 = _rand(ks[3], B, H)
    c0 = _rand(ks[4], B, H)
    lengths = jnp.array([Tk, max(Tk - 2, 1), 2, 1], jnp.float32)

    def xla(args, rev):
        xw_, w_, b_ = args[0], args[1], args[2]
        if rev:
            from rnntransducer_tpu.utils.masking import flip_sequences
            xw_ = jnp.swapaxes(
                flip_sequences(jnp.swapaxes(xw_, 0, 1),
                               lengths.astype(jnp.int32)), 0, 1)

        def body(carry, inp):
            xw_t, t = inp
            if rnn_type == "gru":
                h = carry
                h_new, _ = rp._gru_gates(xw_t, h @ w_ + b_, h)
                m = (lengths > t)[:, None]
                return jnp.where(m, h_new, h), jnp.where(m, h_new, 0.0)
            h, c = carry
            h_new, c_new, _ = rp._lstm_gates(xw_t, h @ w_ + b_, c)
            m = (lengths > t)[:, None]
            return ((jnp.where(m, h_new, h), jnp.where(m, c_new, c)),
                    jnp.where(m, h_new, 0.0))
        init = args[3] if rnn_type == "gru" else (args[3], args[4])
        fin, hall = jax.lax.scan(
            body, init, (xw_, jnp.arange(Tk, dtype=jnp.float32)))
        if rev:
            from rnntransducer_tpu.utils.masking import flip_sequences
            hall = jnp.swapaxes(
                flip_sequences(jnp.swapaxes(hall, 0, 1),
                               lengths.astype(jnp.int32)), 0, 1)
        if rnn_type == "gru":
            return hall, fin
        return hall, fin[0], fin[1]

    for rev in (False, True):
        if rnn_type == "gru":
            args = (xw, w, b, h0)
            got = rp.gru_scan(*args, lengths, rev, True)
            fn = lambda a: rp.gru_scan(*a, lengths, rev, True)
        else:
            args = (xw, w, b, h0, c0)
            got = rp.lstm_scan(*args, lengths, rev, True)
            fn = lambda a: rp.lstm_scan(*a, lengths, rev, True)
        want = xla(args, rev)
        for g_, w_ in zip(got, want):
            np.testing.assert_allclose(g_, w_, atol=1e-6, err_msg=f"rev={rev}")

        def loss(f):
            return lambda a: sum((i + 1.0) * jnp.sum(jnp.sin(o))
                                 for i, o in enumerate(f(a)))
        gp = jax.grad(loss(fn))(args)
        gx = jax.grad(loss(lambda a: xla(a, rev)))(args)
        for g_, w_ in zip(gp, gx):
            np.testing.assert_allclose(g_, w_, atol=2e-5, err_msg=f"rev={rev}")


@pytest.mark.parametrize("rnn_type", ["gru", "lstm"])
def test_batch_chunking_matches_unchunked(monkeypatch, rnn_type):
    """Batches above _MAX_KERNEL_BATCH split into per-chunk kernel calls
    (B=96 at the flagship shape overflows real scoped VMEM in one call);
    outputs and grads must equal the single-call path exactly."""
    ks = jax.random.split(jax.random.PRNGKey(7), 5)
    xw = _rand(ks[0], T, B, (3 if rnn_type == "gru" else 4) * H, scale=1.0)
    w = _rand(ks[1], H, xw.shape[-1])
    b = _rand(ks[2], xw.shape[-1], scale=0.1)
    h0 = _rand(ks[3], B, H)
    c0 = _rand(ks[4], B, H)
    lengths = _lengths()

    if rnn_type == "gru":
        args = (xw, w, b, h0)
        fn = lambda a: rp.gru_scan(*a, lengths, False, True)
    else:
        args = (xw, w, b, h0, c0)
        fn = lambda a: rp.lstm_scan(*a, lengths, False, True)

    want = fn(args)
    gw = jax.grad(lambda a: sum(jnp.sum(jnp.sin(o)) for o in fn(a)))(args)

    monkeypatch.setattr(rp, "_MAX_KERNEL_BATCH", 2)
    assert rp._batch_slices(B) == [(0, 2), (2, 2)]
    got = fn(args)
    gg = jax.grad(lambda a: sum(jnp.sum(jnp.sin(o)) for o in fn(a)))(args)
    for g_, w_ in zip(got, want):
        np.testing.assert_allclose(g_, w_, atol=1e-6)
    for g_, w_ in zip(gg, gw):
        np.testing.assert_allclose(g_, w_, atol=2e-5)


def test_batch_slices_shapes():
    assert rp._batch_slices(64) == [(0, 64)]
    assert rp._batch_slices(96) == [(0, 48), (48, 48)]
    assert rp._batch_slices(128) == [(0, 64), (64, 64)]
    assert rp._batch_slices(100) == [(0, 56), (56, 44)]
    assert rp._batch_slices(65) == [(0, 40), (40, 25)]
    for bsz in (8, 64, 65, 96, 100, 128, 200, 256):
        sl = rp._batch_slices(bsz)
        assert sum(s for _, s in sl) == bsz
        assert all(s <= rp._MAX_KERNEL_BATCH for _, s in sl)
        assert [o for o, _ in sl] == [sum(s for _, s in sl[:i])
                                      for i in range(len(sl))]


def test_block_k_steps_down_in_oversubscribed_context():
    """Round-3 'B>64 fails to compile' root cause: at global batches above
    _MAX_KERNEL_BATCH, Mosaic's real scoped-VMEM allocation inflates past
    the stream model (measured 18.9 MiB vs 12.5 modeled, GRU bwd H=1024
    T=512 global B=128 on v5e), so the k chooser must pick a strictly
    smaller-or-equal k — and for the flagship bwd shape, strictly
    smaller."""
    from rnntransducer_tpu.ops import rnn_pallas as rp

    for rnn_type in ("gru", "lstm"):
        for phase in ("fwd", "bwd"):
            k_plain = rp._block_k(rnn_type, phase, 512, 1024, 64, 2, False)
            k_over = rp._block_k(rnn_type, phase, 512, 1024, 64, 2, True)
            assert k_over <= k_plain, (rnn_type, phase, k_plain, k_over)
    assert (rp._block_k("gru", "bwd", 512, 1024, 64, 2, True)
            < rp._block_k("gru", "bwd", 512, 1024, 64, 2, False))
    # chunked calls really mark the context: the public scan entry points
    # pass ctx_over=True for every chunk when the global batch splits
    assert len(rp._batch_slices(128)) == 2
    assert len(rp._batch_slices(64)) == 1
