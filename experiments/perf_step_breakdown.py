"""Flagship train-step composition on the real chip: encoder vs prednet vs
joint+loss vs optimizer.  Guides where the next throughput work goes."""
import sys
import time

sys.path.insert(0, "/root/repo")

import dataclasses

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import rnntransducer_tpu as rt
from rnntransducer_tpu.config import TrainConfig
from rnntransducer_tpu.ops.rnnt_loss import rnnt_loss_fused
from rnntransducer_tpu.train import TrainState, make_optimizer, train_step
from rnntransducer_tpu.train.state import build_model, _cast

B, T, U = 64, 512, 48


@jax.jit
def _scalar(tree):
    return sum(jnp.sum(l.astype(jnp.float32))
               for l in jax.tree_util.tree_leaves(tree))


def timed(fn, *args, iters=8, warmup=2):
    for _ in range(warmup):
        r = fn(*args)
    float(_scalar(r))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    float(_scalar(r))
    return (time.perf_counter() - t0) / iters


def main():
    cfg = rt.base_config()
    cfg = dataclasses.replace(cfg, train=TrainConfig(
        precision="bf16", accumulate_grad_batches=1, max_steps=1000))
    from __graft_entry__ import _example_batch
    batch = _example_batch(cfg, B, T, U)
    batch["feat_lengths"] = jnp.full((B,), T, jnp.int32)

    tx = make_optimizer(cfg.train)
    state = TrainState.create(cfg)
    model = build_model(cfg)

    # train_step donates state: thread it manually
    st = state
    for _ in range(2):
        st, m = train_step(cfg, tx, st, batch)
    float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(8):
        st, m = train_step(cfg, tx, st, batch)
    float(m["loss"])
    print(f"full train step      : {(time.perf_counter()-t0)/8*1e3:8.1f} ms")
    state = st

    feats = batch["feats"].astype(jnp.bfloat16)
    flen = batch["feat_lengths"]
    p_bf = _cast(state.params, jnp.bfloat16)

    def enc_fwd(p):
        out, _ = model.apply({"params": p}, feats, flen, method=model.encode)
        return out

    def enc_loss(p):
        return jnp.sum(enc_fwd(p).astype(jnp.float32))

    print(f"encoder fwd          : {timed(jax.jit(enc_fwd), p_bf)*1e3:8.1f} ms")
    print(f"encoder fwd+bwd      : {timed(jax.jit(jax.grad(enc_loss)), p_bf)*1e3:8.1f} ms")

    def pred_fwd(p):
        out, _ = model.apply({"params": p}, batch["text_in"],
                             batch["text_lengths"], method=model.predict)
        return out

    def pred_loss(p):
        return jnp.sum(pred_fwd(p).astype(jnp.float32))

    print(f"prednet fwd+bwd      : {timed(jax.jit(jax.grad(pred_loss)), p_bf)*1e3:8.1f} ms")

    enc = jax.jit(enc_fwd)(p_bf)
    dec = jax.jit(pred_fwd)(p_bf)

    def joint_loss(p, enc, dec):
        joint_fn = lambda e, d: model.apply({"params": p}, e, d,
                                            method=model.joint_step)
        return rnnt_loss_fused(joint_fn, enc, dec, batch["targets"], flen,
                               batch["target_lengths"], blank=0,
                               chunk_frames=cfg.train.joint_chunk_frames)

    jl = jax.jit(jax.grad(joint_loss, argnums=(0, 1, 2)))
    print(f"joint+loss fwd+bwd   : {timed(jl, p_bf, enc, dec)*1e3:8.1f} ms")

    grads = jax.tree.map(jnp.zeros_like, state.params)

    @jax.jit
    def opt(state, grads):
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        import optax
        return optax.apply_updates(state.params, updates)

    print(f"optimizer update     : {timed(opt, state, grads)*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
