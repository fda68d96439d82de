#!/usr/bin/env python
"""Truncated-BPTT experiment — the framework's counterpart of the reference's
``multi_network_tbptt_test.py`` (a standalone Lightning script that verified
TBPTT ``hiddens`` threading and informed the decision NOT to use TBPTT for
RNN-T, recorded at reference ``model.py:43-45`` and ``README.md:60-62``).

This version is assertion-based and answers the same two questions in JAX
terms:

1. **State threading is exact**: a unidirectional encoder run chunk-by-chunk
   with its carried ``RNNState`` reproduces the full-sequence forward
   bit-for-bit — the mechanism behind both streaming inference and any
   chunked training scheme.

2. **TBPTT is unnecessary (and ill-defined) for RNN-T**: the transducer loss
   marginalizes over the full T x U alignment lattice, so it cannot be
   decomposed into per-chunk losses — chunk-local gradients with a
   stop-gradient carry (what Lightning TBPTT does) differ measurably from
   full-BPTT gradients. The framework therefore trains full sequences with
   remat/fused-loss for memory (config: transnet.remat,
   train.joint_chunk_frames), exactly the trade the reference settled on.

Run: python examples/tbptt_chunked_experiment.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import numpy as np

import jax
import jax.numpy as jnp

from rnntransducer_tpu.config import TransNetConfig
from rnntransducer_tpu.models.encoder import AudioEncoder


def main():
    B, T, F, H, CHUNK = 2, 32, 8, 16, 8
    cfg = TransNetConfig(input_size=F, hidden_size=H, output_size=H,
                         num_layers=2, rnn_type="lstm", dropout=0.0,
                         bidirectional=False, scan_layers=False)
    enc = AudioEncoder(cfg)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, T, F).astype(np.float32))
    variables = enc.init(jax.random.PRNGKey(0), x)

    # 1) chunked forward with carried state == full forward
    full, _ = enc.apply(variables, x)
    state = None
    outs = []
    for s in range(0, T, CHUNK):
        o, state = enc.apply(variables, x[:, s:s + CHUNK],
                             initial_state=state)
        outs.append(o)
    chunked = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(chunked), np.asarray(full),
                               atol=1e-5)
    print("1) chunked carried-state forward == full forward  OK")

    # 2) TBPTT-style chunk-local gradients != full-BPTT gradients
    def full_loss(params):
        out, _ = enc.apply({"params": params}, x)
        return (out ** 2).mean()

    def tbptt_loss_grads(params):
        grads = None
        state = None
        for s in range(0, T, CHUNK):
            def chunk_loss(p, st):
                out, new_st = enc.apply({"params": p}, x[:, s:s + CHUNK],
                                        initial_state=st)
                return (out ** 2).mean() / (T // CHUNK), new_st
            (l, new_state), g = jax.value_and_grad(chunk_loss,
                                                   has_aux=True)(params, state)
            state = jax.tree.map(jax.lax.stop_gradient, new_state)  # TBPTT cut
            grads = g if grads is None else jax.tree.map(jnp.add, grads, g)
        return grads

    g_full = jax.grad(full_loss)(variables["params"])
    g_tbptt = tbptt_loss_grads(variables["params"])
    diffs = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                         g_full, g_tbptt)
    max_diff = max(jax.tree.leaves(diffs))
    assert max_diff > 1e-6, "TBPTT should NOT equal full BPTT"
    print(f"2) TBPTT chunk gradients differ from full BPTT "
          f"(max |diff| = {max_diff:.2e}) — and the RNN-T loss needs the full "
          f"T x U lattice anyway, so the framework trains full sequences "
          f"(remat + fused chunked loss for memory), matching the reference's "
          f"conclusion (model.py:43-45).")


if __name__ == "__main__":
    main()
