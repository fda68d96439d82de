"""Quick interpret-mode parity check of ops/rnn_pallas.py vs XLA scan autodiff."""
import jax
jax.config.update("jax_platforms", "cpu")  # axon plugin ignores JAX_PLATFORMS
import jax.numpy as jnp
import numpy as np

from rnntransducer_tpu.ops import rnn_pallas as rp

T, B, H, IN = 7, 4, 16, 8


def xla_gru(xw, w_hh, b_hh, h0, lengths):
    def body(h, inp):
        xw_t, t = inp
        hw = h @ w_hh + b_hh
        h_new, _ = rp._gru_gates(xw_t, hw, h)
        m = (lengths > t)[:, None]
        h = jnp.where(m, h_new, h)
        return h, jnp.where(m, h_new, 0.0)
    hfin, hall = jax.lax.scan(body, h0, (xw, jnp.arange(T, dtype=jnp.float32)))
    return hall, hfin


def xla_lstm(xw, w_hh, b_hh, h0, c0, lengths):
    def body(carry, inp):
        h, c = carry
        xw_t, t = inp
        hw = h @ w_hh + b_hh
        h_new, c_new, _ = rp._lstm_gates(xw_t, hw, c)
        m = (lengths > t)[:, None]
        h = jnp.where(m, h_new, h)
        c = jnp.where(m, c_new, c)
        return (h, c), jnp.where(m, h_new, 0.0)
    (hfin, cfin), hall = jax.lax.scan(
        body, (h0, c0), (xw, jnp.arange(T, dtype=jnp.float32)))
    return hall, hfin, cfin


def check(name, got, want, tol=2e-5):
    err = float(jnp.max(jnp.abs(got - want)))
    scale = float(jnp.max(jnp.abs(want))) + 1e-30
    status = "OK " if err <= tol * max(1.0, scale) else "FAIL"
    print(f"{status} {name:22s} maxerr={err:.3e} (scale {scale:.2e})")
    return status == "OK "


def main():
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    ok = True

    # ---- GRU ----
    xw = jax.random.normal(ks[0], (T, B, 3 * H))
    w = jax.random.normal(ks[1], (H, 3 * H)) * 0.3
    b = jax.random.normal(ks[2], (3 * H,)) * 0.1
    h0 = jax.random.normal(ks[3], (B, H)) * 0.5
    lengths = jnp.array([7, 5, 3, 1], jnp.float32)

    hall_p, hfin_p = rp.gru_scan(xw, w, b, h0, lengths, True)
    hall_x, hfin_x = xla_gru(xw, w, b, h0, lengths)
    ok &= check("gru fwd h_all", hall_p, hall_x)
    ok &= check("gru fwd h_fin", hfin_p, hfin_x)

    def loss_p(args):
        ha, hf = rp.gru_scan(*args, lengths, True)
        return jnp.sum(jnp.sin(ha)) + 2.0 * jnp.sum(jnp.cos(hf))

    def loss_x(args):
        ha, hf = xla_gru(*args, lengths)
        return jnp.sum(jnp.sin(ha)) + 2.0 * jnp.sum(jnp.cos(hf))

    gp = jax.grad(loss_p)((xw, w, b, h0))
    gx = jax.grad(loss_x)((xw, w, b, h0))
    for name, a, bb in zip(["dxw", "dw_hh", "db_hh", "dh0"], gp, gx):
        ok &= check(f"gru {name}", a, bb)

    # ---- LSTM ----
    xw4 = jax.random.normal(ks[4], (T, B, 4 * H))
    w4 = jax.random.normal(ks[5], (H, 4 * H)) * 0.3
    b4 = jax.random.normal(ks[6], (4 * H,)) * 0.1
    c0 = jax.random.normal(ks[7], (B, H)) * 0.5

    out_p = rp.lstm_scan(xw4, w4, b4, h0, c0, lengths, True)
    out_x = xla_lstm(xw4, w4, b4, h0, c0, lengths)
    for name, a, bb in zip(["h_all", "h_fin", "c_fin"], out_p, out_x):
        ok &= check(f"lstm fwd {name}", a, bb)

    def loss4_p(args):
        ha, hf, cf = rp.lstm_scan(*args, lengths, True)
        return (jnp.sum(jnp.sin(ha)) + 2.0 * jnp.sum(jnp.cos(hf))
                + 3.0 * jnp.sum(jnp.sin(cf)))

    def loss4_x(args):
        ha, hf, cf = xla_lstm(*args, lengths)
        return (jnp.sum(jnp.sin(ha)) + 2.0 * jnp.sum(jnp.cos(hf))
                + 3.0 * jnp.sum(jnp.sin(cf)))

    gp4 = jax.grad(loss4_p)((xw4, w4, b4, h0, c0))
    gx4 = jax.grad(loss4_x)((xw4, w4, b4, h0, c0))
    for name, a, bb in zip(["dxw", "dw_hh", "db_hh", "dh0", "dc0"], gp4, gx4):
        ok &= check(f"lstm {name}", a, bb)

    print("ALL OK" if ok else "FAILURES")
    raise SystemExit(0 if ok else 1)


if __name__ == "__main__":
    main()
