"""Golden-value parity: scanned JAX cells vs torch.nn.{LSTM,GRU,RNN} on CPU,
including pack_padded_sequence semantics for variable lengths (the behavior
the reference relies on at networks/encoder.py:93-102)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from rnntransducer_tpu.models.cells import StackedRNN

ATOL = 2e-5


def _copy_torch_weights(torch_rnn, params, num_layers, bidirectional, rnn_type):
    """Load torch weights into our param tree. torch stores W_ih as
    (G*H, in) — ours is (in, G*H)."""
    p = {k: dict(v) for k, v in params.items()}
    for layer in range(num_layers):
        for d, prefix in enumerate(["fwd", "bwd"] if bidirectional else ["fwd"]):
            suffix = f"_reverse" if d == 1 else ""
            name = f"{prefix}_{layer}"
            w_ih = getattr(torch_rnn, f"weight_ih_l{layer}{suffix}").detach().numpy().T
            w_hh = getattr(torch_rnn, f"weight_hh_l{layer}{suffix}").detach().numpy().T
            b_ih = getattr(torch_rnn, f"bias_ih_l{layer}{suffix}").detach().numpy()
            b_hh = getattr(torch_rnn, f"bias_hh_l{layer}{suffix}").detach().numpy()
            p[name] = {
                "w_ih": jnp.asarray(w_ih), "w_hh": jnp.asarray(w_hh),
                "b_ih": jnp.asarray(b_ih), "b_hh": jnp.asarray(b_hh),
            }
    return p


@pytest.mark.parametrize("rnn_type", ["lstm", "gru", "rnn"])
@pytest.mark.parametrize("bidirectional", [False, True])
@pytest.mark.parametrize("num_layers", [1, 2])
def test_full_length_parity(rnn_type, bidirectional, num_layers):
    torch.manual_seed(0)
    B, T, F, H = 3, 11, 6, 8
    torch_cls = {"lstm": torch.nn.LSTM, "gru": torch.nn.GRU, "rnn": torch.nn.RNN}[rnn_type]
    trnn = torch_cls(F, H, num_layers=num_layers, batch_first=True,
                     bidirectional=bidirectional)
    x = np.random.RandomState(1).randn(B, T, F).astype(np.float32)

    model = StackedRNN(input_size=F, hidden_size=H, num_layers=num_layers,
                       rnn_type=rnn_type, bidirectional=bidirectional)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = _copy_torch_weights(trnn, variables["params"], num_layers,
                                 bidirectional, rnn_type)

    out, state = model.apply({"params": params}, jnp.asarray(x))
    with torch.no_grad():
        tout, tstate = trnn(torch.from_numpy(x))
    np.testing.assert_allclose(np.asarray(out), tout.numpy(), atol=ATOL)

    # final hidden state parity: torch h_n is (L*D, B, H); ours (L, D, B, H)
    th = (tstate[0] if rnn_type == "lstm" else tstate).numpy()
    D = 2 if bidirectional else 1
    ours_h = np.asarray(state.h).reshape(num_layers * D, B, H)
    np.testing.assert_allclose(ours_h, th, atol=ATOL)


@pytest.mark.parametrize("rnn_type", ["lstm", "gru"])
@pytest.mark.parametrize("bidirectional", [False, True])
def test_variable_length_pack_padded_parity(rnn_type, bidirectional):
    """Masked scan must equal sort->pack_padded->rnn->pad_packed->unsort."""
    torch.manual_seed(2)
    B, T, F, H, L = 4, 10, 5, 7, 2
    lengths = np.array([10, 3, 7, 1], np.int64)
    torch_cls = {"lstm": torch.nn.LSTM, "gru": torch.nn.GRU}[rnn_type]
    trnn = torch_cls(F, H, num_layers=L, batch_first=True, bidirectional=bidirectional)
    x = np.random.RandomState(3).randn(B, T, F).astype(np.float32)

    model = StackedRNN(input_size=F, hidden_size=H, num_layers=L,
                       rnn_type=rnn_type, bidirectional=bidirectional)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = _copy_torch_weights(trnn, variables["params"], L, bidirectional, rnn_type)
    out, state = model.apply({"params": params}, jnp.asarray(x),
                             jnp.asarray(lengths, jnp.int32))

    with torch.no_grad():
        xt = torch.from_numpy(x)
        sl, idx = torch.sort(torch.from_numpy(lengths), descending=True)
        packed = torch.nn.utils.rnn.pack_padded_sequence(xt[idx], sl, batch_first=True)
        tout, tstate = trnn(packed)
        tout, _ = torch.nn.utils.rnn.pad_packed_sequence(tout, batch_first=True,
                                                         total_length=T)
        _, deidx = torch.sort(idx)
        tout = tout[deidx]
    np.testing.assert_allclose(np.asarray(out), tout.numpy(), atol=ATOL)

    # forward-direction final state must be the state at t = length-1
    th = (tstate[0] if rnn_type == "lstm" else tstate).numpy()
    D = 2 if bidirectional else 1
    th = th.reshape(L, D, B, H)[:, :, deidx.numpy(), :]
    np.testing.assert_allclose(np.asarray(state.h), th, atol=ATOL)
    if rnn_type == "lstm":
        tc = tstate[1].numpy().reshape(L, D, B, H)[:, :, deidx.numpy(), :]
        np.testing.assert_allclose(np.asarray(state.c), tc, atol=ATOL)


def test_step_matches_scan():
    """Single-step decode mode must reproduce the scan output sequence."""
    B, T, F, H = 2, 6, 4, 5
    model = StackedRNN(input_size=F, hidden_size=H, num_layers=2, rnn_type="lstm")
    x = jnp.asarray(np.random.RandomState(0).randn(B, T, F).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(1), x)
    out_scan, final_scan = model.apply(variables, x)

    state = None
    outs = []
    for t in range(T):
        o, state = model.apply(variables, x[:, t], state, method=model.step)
        outs.append(o)
    out_step = jnp.stack(outs, axis=1)
    np.testing.assert_allclose(np.asarray(out_scan), np.asarray(out_step), atol=1e-6)
    np.testing.assert_allclose(np.asarray(final_scan.h), np.asarray(state.h), atol=1e-6)


def test_scan_layers_matches_loop_layers():
    """scan-over-layers mode must be numerically identical to the per-layer
    loop given the same weights (params restructured: stacked vs named)."""
    B, T, F, H, L = 2, 9, 5, 6, 4
    for bidirectional in (False, True):
        for rnn_type in ("lstm", "gru"):
            loop = StackedRNN(input_size=F, hidden_size=H, num_layers=L,
                              rnn_type=rnn_type, bidirectional=bidirectional,
                              scan_layers=False)
            scan = StackedRNN(input_size=F, hidden_size=H, num_layers=L,
                              rnn_type=rnn_type, bidirectional=bidirectional,
                              scan_layers=True)
            x = jnp.asarray(np.random.RandomState(0).randn(B, T, F)
                            .astype(np.float32))
            lengths = jnp.array([9, 5], jnp.int32)
            vs = scan.init(jax.random.PRNGKey(1), x, lengths)
            # restructure stacked params -> named per-layer params
            p = dict(vs["params"])
            stack = p.pop("stack")
            loop_params = {k: v for k, v in p.items()}  # fwd_0 / bwd_0
            for i in range(L - 1):
                loop_params[f"fwd_{i+1}"] = jax.tree.map(
                    lambda a: a[i], stack["fwd"])
                if bidirectional:
                    loop_params[f"bwd_{i+1}"] = jax.tree.map(
                        lambda a: a[i], stack["bwd"])
            out_s, st_s = scan.apply(vs, x, lengths)
            out_l, st_l = loop.apply({"params": loop_params}, x, lengths)
            np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_l),
                                       atol=1e-6)
            np.testing.assert_allclose(np.asarray(st_s.h), np.asarray(st_l.h),
                                       atol=1e-6)
            # carried initial state round-trips through both layouts
            out_s2, _ = scan.apply(vs, x, lengths, st_s)
            out_l2, _ = loop.apply({"params": loop_params}, x, lengths, st_l)
            np.testing.assert_allclose(np.asarray(out_s2), np.asarray(out_l2),
                                       atol=1e-6)


def test_remat_scan_layers_trains():
    """Regression: nn.remat over the scanned layer must keep `deterministic`
    static (Dropout bool check) — and remat must not change values."""
    B, T, F, H, L = 2, 7, 5, 6, 3
    kw = dict(input_size=F, hidden_size=H, num_layers=L, rnn_type="lstm",
              bidirectional=True, dropout=0.1, scan_layers=True)
    base = StackedRNN(**kw)
    remat = StackedRNN(**kw, remat=True)
    x = jnp.asarray(np.random.RandomState(0).randn(B, T, F).astype(np.float32))
    vs = base.init(jax.random.PRNGKey(0), x)
    out_a, _ = base.apply(vs, x)
    out_b, _ = remat.apply(vs, x)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b), atol=1e-6)
    # train mode with dropout rng works under remat
    out_c, _ = remat.apply(vs, x, deterministic=False,
                           rngs={"dropout": jax.random.PRNGKey(1)})
    assert bool(jnp.isfinite(out_c).all())
    # and gradients flow
    g = jax.grad(lambda v: remat.apply(v, x)[0].sum())(vs)
    assert all(bool(jnp.isfinite(l).all()) for l in jax.tree.leaves(g))
