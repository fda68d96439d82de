"""Attribute the flagship train step's time to its components (round-2
verdict weakness 5: ~107 ms of the 264 ms step was unattributed encoder
overhead beyond the Pallas kernel time).

`jax.profiler` kills the axon TPU tunnel (memory: axon-tunnel-pathologies),
so this measures hypothesis-sized sub-programs instead: each component is
jitted alone and timed by the two-run-length slope method (cancels fixed
dispatch overhead; value-fetch sync because block_until_ready returns early
through the tunnel).  Sub-program times are *upper* bounds on in-graph times
(XLA fuses more context in the full step), but their ratios locate the time.

Run on the real chip: python experiments/perf_step_breakdown.py [--quick]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

B, T, U = 64, 512, 48


def timed(fn, sync, iters):
    fn()  # warm
    sync()

    def run(n):
        t0 = time.perf_counter()
        for _ in range(n):
            fn()
        sync()
        return time.perf_counter() - t0

    small = max(1, iters // 4)
    d_small = run(small)
    d_big = run(iters)
    return (d_big - d_small) / (iters - small)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--conformer", action="store_true",
                    help="break down the Conformer-L perf config "
                         "(perf_conformer.py's model) instead of the "
                         "flagship bi-GRU — the roofline accounting for "
                         "VERDICT r4 item 6")
    args = ap.parse_args()
    iters = 4 if args.quick else 12

    sys.path.insert(0, ".")
    import rnntransducer_tpu as rt
    from rnntransducer_tpu.config import TrainConfig
    from rnntransducer_tpu.train import TrainState, make_optimizer, train_step
    from rnntransducer_tpu.train.state import loss_fn
    from rnntransducer_tpu.train import build_model
    from __graft_entry__ import _example_batch

    cfg = rt.base_config()
    if args.conformer:
        cfg = dataclasses.replace(cfg, model=dataclasses.replace(
            cfg.model, transnet=dataclasses.replace(
                cfg.model.transnet, arch="conformer", hidden_size=512,
                num_layers=16, attention_heads=8, ff_multiplier=4,
                conv_kernel_size=15, time_reduction_stride=4,
                time_reduction_layer=0, bidirectional=True,
                scan_blocks=False)))
    cfg = dataclasses.replace(cfg, train=TrainConfig(
        precision="bf16", accumulate_grad_batches=1, max_steps=1000))
    model = build_model(cfg)
    batch = _example_batch(cfg, B, T, U)
    batch["feat_lengths"] = jnp.full((B,), T, jnp.int32)

    tx = make_optimizer(cfg.train)
    state = TrainState.create(cfg)
    # Component benchmarks apply the model directly, so mirror the train
    # path's mixed-precision policy (train/state.py:64): bf16 compute params.
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if jnp.issubdtype(x.dtype, jnp.floating) else x,
        state.params)
    results = {}

    # ---- full step ------------------------------------------------------
    holder = {"s": state}

    def full():
        holder["s"], holder["m"] = train_step(cfg, tx, holder["s"], batch)

    results["full_step"] = timed(full, lambda: float(holder["m"]["loss"]),
                                 iters)

    # ---- encoder fwd / fwd+bwd -----------------------------------------
    audio = batch["feats"].astype(jnp.bfloat16)
    alen = batch["feat_lengths"]

    @jax.jit
    def enc_fwd(p):
        enc, _ = model.apply({"params": p}, audio, alen, method=model.encode)
        return jnp.sum(enc.astype(jnp.float32))

    enc_bwd = jax.jit(jax.grad(enc_fwd))
    out = {}
    results["encoder_fwd"] = timed(lambda: out.update(v=enc_fwd(params)),
                                   lambda: float(out["v"]), iters)

    def ebwd():
        out["g"] = enc_bwd(params)

    def esync():
        float(jax.tree.leaves(out["g"])[0].reshape(-1)[0])

    results["encoder_fwd_bwd"] = timed(ebwd, esync, iters)

    # ---- prednet fwd+bwd ------------------------------------------------
    text = batch["text_in"]

    @jax.jit
    def pred_fwd(p):
        dec, _ = model.apply({"params": p}, text, None,
                             method=model.predict)
        return jnp.sum(dec.astype(jnp.float32))

    pred_bwd = jax.jit(jax.grad(pred_fwd))

    def pbwd():
        out["pg"] = pred_bwd(params)

    results["prednet_fwd_bwd"] = timed(
        pbwd, lambda: float(jax.tree.leaves(out["pg"])[0].reshape(-1)[0]),
        iters)

    # ---- joint + loss fwd+bwd on fixed enc/dec outputs ------------------
    # at the ENCODER OUTPUT rate: time reduction (e.g. the Conformer's 4x
    # subsampling) shrinks the lattice the joint/loss actually see
    rng = jax.random.PRNGKey(0)
    Tp = cfg.model.transnet.output_frames(T)
    enc_lens = cfg.model.transnet.output_lengths(batch["feat_lengths"])
    enc_out = jax.random.normal(rng, (B, Tp, cfg.model.transnet.output_size),
                                jnp.bfloat16)
    dec_out = jax.random.normal(rng, (B, U + 1,
                                      cfg.model.prednet.output_size),
                                jnp.bfloat16)

    from rnntransducer_tpu.ops.rnnt_loss import rnnt_loss_fused

    @jax.jit
    def joint_loss(p):
        def apply_joint(e, d):
            return model.apply({"params": p}, e, d, method=model.joint_step)

        return jnp.mean(rnnt_loss_fused(
            apply_joint, enc_out, dec_out, batch["targets"],
            enc_lens, batch["target_lengths"],
            chunk_frames=cfg.train.joint_chunk_frames))

    jl_bwd = jax.jit(jax.grad(joint_loss))

    def jbwd():
        out["jg"] = jl_bwd(params)

    results["joint_loss_fwd_bwd"] = timed(
        jbwd, lambda: float(jax.tree.leaves(out["jg"])[0].reshape(-1)[0]),
        iters)

    # ---- factored GEMM-form joint+loss (the round-3 default) ------------
    from rnntransducer_tpu.ops.rnnt_loss import rnnt_loss_factored

    @jax.jit
    def joint_loss_factored(p):
        A, C = model.apply({"params": p}, enc_out, dec_out,
                           method=model.joint_factors)
        return jnp.mean(rnnt_loss_factored(
            A, C, batch["targets"], enc_lens,
            batch["target_lengths"]))

    jf_bwd = jax.jit(jax.grad(joint_loss_factored))

    def jfbwd():
        out["jfg"] = jf_bwd(params)

    results["joint_loss_factored_fwd_bwd"] = timed(
        jfbwd, lambda: float(jax.tree.leaves(out["jfg"])[0].reshape(-1)[0]),
        iters)

    # ---- raw GEMM floors (what the MXU needs for the same math) --------
    H, Din = 1024, 2048
    x = jax.random.normal(rng, (B * T, Din), jnp.bfloat16)
    w = jax.random.normal(rng, (Din, 3 * H), jnp.bfloat16)

    @jax.jit
    def big_gemms(x, w):
        acc = jnp.zeros((), jnp.float32)
        for _ in range(14):  # layers 1-7 x 2 directions input projections
            acc += jnp.sum((x @ w).astype(jnp.float32)[:1, :1])
        return acc

    results["input_proj_gemms_14x"] = timed(
        lambda: out.update(g1=big_gemms(x, w)), lambda: float(out["g1"]),
        iters)

    @jax.jit
    def dw_gemms(x):
        acc = jnp.zeros((), jnp.float32)
        g = x  # stand-in upstream gradient (B*T, 3H) comes from x slices
        dy = jnp.concatenate([x, x[:, :H]], axis=1)  # (B*T, 3H)
        for _ in range(16):  # dW_ih for 8 layers x 2 dirs
            acc += jnp.sum((g.T @ dy).astype(jnp.float32)[:1, :1])
        return acc

    results["dw_gemms_16x"] = timed(
        lambda: out.update(g2=dw_gemms(x)), lambda: float(out["g2"]), iters)

    for k, v in results.items():
        print(f"{k:24s} {v * 1000:8.1f} ms")
    print(json.dumps({k: round(v * 1000, 2) for k, v in results.items()}))


if __name__ == "__main__":
    main()
