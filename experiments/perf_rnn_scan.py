"""Roofline experiment: where does the encoder scan's time go on the real chip?

Times a single GRU layer-direction (the flagship shape: B=64, T=512, H=1024,
input 2048) forward and forward+backward, against HBM/MXU rooflines, to test
the hypothesis that the XLA scan backward's per-step dW_hh accumulation
(12.6 MB fp32 read+write per timestep) dominates the training step.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

B, T, H, IN = 64, 512, 1024, 2048
G = 3  # GRU


def make_params(key):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    s = 1.0 / np.sqrt(H)
    return dict(
        w_ih=jax.random.uniform(k1, (IN, G * H), jnp.float32, -s, s),
        w_hh=jax.random.uniform(k2, (H, G * H), jnp.float32, -s, s),
        b_ih=jax.random.uniform(k3, (G * H,), jnp.float32, -s, s),
        b_hh=jax.random.uniform(k4, (G * H,), jnp.float32, -s, s),
    )


def gru_layer(params, x):
    """Current cells.py pattern: hoisted input GEMM + scan with in-body W_hh."""
    w_hh, b_hh = params["w_hh"], params["b_hh"]
    xw = x @ params["w_ih"] + params["b_ih"]  # (B,T,3H)
    xw_t = jnp.swapaxes(xw, 0, 1)

    def body(h, xw_i):
        hw = h @ w_hh + b_hh
        xr, xz, xn = jnp.split(xw_i, 3, axis=-1)
        hr, hz, hn = jnp.split(hw, 3, axis=-1)
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)
        h = (1.0 - z) * n + z * h
        return h, h

    h0 = jnp.zeros((B, H), x.dtype)
    _, outs = lax.scan(body, h0, xw_t)
    return jnp.swapaxes(outs, 0, 1)


def scan_only(params, xw):
    """Just the recurrent scan (input GEMM excluded), xw: (T,B,3H)."""
    w_hh, b_hh = params["w_hh"], params["b_hh"]

    def body(h, xw_i):
        hw = h @ w_hh + b_hh
        xr, xz, xn = jnp.split(xw_i, 3, axis=-1)
        hr, hz, hn = jnp.split(hw, 3, axis=-1)
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)
        h = (1.0 - z) * n + z * h
        return h, h

    h0 = jnp.zeros((B, H), xw.dtype)
    _, outs = lax.scan(body, h0, xw)
    return outs


@jax.jit
def _scalar(tree):
    """Device-side scalar reduction so the host sync fetches 4 bytes, not the
    full result (a multi-MB fetch over the axon tunnel distorts timings)."""
    leaves = jax.tree_util.tree_leaves(tree)
    return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)


def timed(fn, *args, iters=10, warmup=2):
    for _ in range(warmup):
        r = fn(*args)
    float(_scalar(r))  # value fetch = reliable sync through the tunnel
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    float(_scalar(r))
    return (time.perf_counter() - t0) / iters


def main():
    key = jax.random.PRNGKey(0)
    params = make_params(key)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, IN), jnp.float32)
    dtype = jnp.bfloat16
    params_bf = jax.tree.map(lambda a: a.astype(dtype), params)
    x_bf = x.astype(dtype)
    xw = jnp.swapaxes(x_bf @ params_bf["w_ih"] + params_bf["b_ih"], 0, 1)

    fwd_full = jax.jit(gru_layer)
    fwd_scan = jax.jit(scan_only)

    def loss_full(p, x):
        return jnp.sum(gru_layer(p, x).astype(jnp.float32))

    def loss_scan(p, xw):
        return jnp.sum(scan_only(p, xw).astype(jnp.float32))

    grad_full = jax.jit(jax.grad(loss_full))
    grad_scan = jax.jit(jax.grad(loss_scan, argnums=(0, 1)))

    t_fwd = timed(fwd_full, params_bf, x_bf)
    t_fwd_scan = timed(fwd_scan, params_bf, xw)
    t_grad = timed(grad_full, params_bf, x_bf)
    t_grad_scan = timed(grad_scan, params_bf, xw)

    flops_in = 2 * B * T * IN * G * H
    flops_rec = 2 * B * T * H * G * H
    peak = 197e12  # v5e bf16
    bw = 819e9
    w_bytes = H * G * H * 2
    print(f"shape B={B} T={T} H={H} IN={IN} GRU bf16")
    print(f"fwd  full-layer : {t_fwd*1e3:8.2f} ms   (input GEMM roofline "
          f"{flops_in/peak*1e3:.2f} ms, scan W-fetch roofline {T*w_bytes/bw*1e3:.2f} ms)")
    print(f"fwd  scan-only  : {t_fwd_scan*1e3:8.2f} ms   per-step {t_fwd_scan/T*1e6:.2f} us "
          f"(W fetch {w_bytes/bw*1e6:.2f} us, MXU {flops_rec/T/peak*1e6:.2f} us)")
    print(f"train full-layer: {t_grad*1e3:8.2f} ms")
    print(f"train scan-only : {t_grad_scan*1e3:8.2f} ms   per-step {t_grad_scan/T*1e6:.2f} us")
    dw_traffic = (2 * H * G * H * 4) / bw * 1e6  # dW read+write fp32 per step
    print(f"  hypothesis: per-step dW accumulate traffic = {dw_traffic:.1f} us "
          f"-> {T*dw_traffic/1e3:.1f} ms per layer-direction if in HBM")

    # ---- persistent Pallas kernel ----
    from rnntransducer_tpu.ops import rnn_pallas as rp

    lengths = jnp.full((B,), T, jnp.float32)
    h0 = jnp.zeros((B, H), dtype)

    pallas_fwd = jax.jit(lambda xw: rp.gru_scan(
        xw, params_bf["w_hh"], params_bf["b_hh"], h0, lengths))

    def loss_pallas(p, xw):
        ha, hf = rp.gru_scan(xw, p["w_hh"], p["b_hh"], h0, lengths)
        return jnp.sum(ha.astype(jnp.float32))

    grad_pallas = jax.jit(jax.grad(loss_pallas, argnums=(0, 1)))

    # numeric sanity vs the XLA scan at bf16
    ha_p, _ = pallas_fwd(xw)
    ha_x = fwd_scan(params_bf, xw)
    err = float(jnp.max(jnp.abs(ha_p.astype(jnp.float32) - ha_x.astype(jnp.float32))))
    print(f"pallas-vs-xla bf16 fwd maxerr: {err:.3e}")

    t_pf = timed(pallas_fwd, xw)
    t_pg = timed(grad_pallas, params_bf, xw)
    print(f"pallas fwd scan : {t_pf*1e3:8.2f} ms   per-step {t_pf/T*1e6:.2f} us")
    print(f"pallas train    : {t_pg*1e3:8.2f} ms   per-step {t_pg/T*1e6:.2f} us")


if __name__ == "__main__":
    main()


def integrated():
    """Timing of the integrated RNNLayer (includes input GEMM + transposes)."""
    import sys
    sys.path.insert(0, "/root/repo")
    from rnntransducer_tpu.models.cells import RNNLayer
    from rnntransducer_tpu.utils.masking import length_mask

    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, IN), jnp.bfloat16)
    lengths = jnp.full((B,), T, jnp.int32)
    mask = length_mask(lengths, T)

    for mode in ["off", "auto"]:
        layer = RNNLayer(IN, H, "gru", use_pallas=mode)
        params = layer.init(jax.random.PRNGKey(2), x.astype(jnp.float32), mask)
        params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)

        def loss(p):
            out, (h, c) = layer.apply(p, x, mask)
            return jnp.sum(out.astype(jnp.float32))

        g = jax.jit(jax.grad(loss))
        t = timed(g, params)
        print(f"RNNLayer train ({mode:4s}): {t*1e3:8.2f} ms")


if __name__ == "__main__" and "--integrated" in __import__("sys").argv:
    integrated()
