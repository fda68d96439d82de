#!/usr/bin/env python
"""Long-form sequence parallelism: ONE recording time-sharded over a mesh.

The reference can only shard *utterances* across devices (DDP,
``/root/reference/train.py:45``); a single recording longer than one GPU's
memory simply cannot be encoded.  ``parallel/wavefront.py`` spreads one
recording's frames over a 1-D ``time`` mesh and pipelines the layer stack
with a staircase schedule (device d runs layer s-d at stage s, handing the
RNN carry to its right neighbour over ICI), so

* per-device activation memory drops by the mesh width D, and
* wall-clock approaches L*D/(L+D-1) chunk-layer passes instead of L*D.

This demo encodes a ~13-minute synthetic recording (T = 80k frames) with a
4-layer unidirectional LSTM encoder on the 8-virtual-device CPU mesh, checks
the outputs and greedy tokens against the single-device encoder bit-for-bit,
and prints the per-device memory picture.  (The one-chip axon box cannot
show real multi-chip wall-clock; the schedule and collectives are the same
program that runs on a real v5e-8 slice.)

Run: python examples/longform_wavefront.py [--frames 80000]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["XLA_FLAGS"] = ("--xla_force_host_platform_device_count=8 "
                           + os.environ.get("XLA_FLAGS", ""))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=80_000,
                    help="recording length in 10 ms frames (80k = 13.3 min)")
    ap.add_argument("--hidden", type=int, default=256)
    ap.add_argument("--layers", type=int, default=4)
    args = ap.parse_args()

    from rnntransducer_tpu.config import (
        JointNetConfig, ModelConfig, PredNetConfig, TransNetConfig,
    )
    from rnntransducer_tpu.decode.greedy import (
        greedy_decode_frames, init_greedy_carry,
    )
    from rnntransducer_tpu.models import RNNTransducer
    from rnntransducer_tpu.parallel import (
        make_time_mesh, pad_time_to_multiple, wavefront_encode,
    )

    H, L = args.hidden, args.layers
    cfg = ModelConfig(
        transnet=TransNetConfig(input_size=80, hidden_size=H, output_size=144,
                                num_layers=L, rnn_type="lstm", dropout=0.0,
                                bidirectional=False),
        prednet=PredNetConfig(embedding_size=72, hidden_size=H,
                              output_size=144, num_layers=1, rnn_type="lstm",
                              dropout=0.0),
        jointnet=JointNetConfig(num_classes=72),
    )
    model = RNNTransducer(cfg)
    rng = jax.random.PRNGKey(0)
    T = args.frames
    audio = jax.random.normal(rng, (1, T, 80), jnp.float32) * 0.5
    alen = jnp.array([T])
    variables = model.init(rng, audio[:, :64], jnp.array([64]),
                           jnp.zeros((1, 9), jnp.int32), jnp.array([9]))
    params = variables["params"]

    mesh = make_time_mesh()
    D = mesh.shape["time"]
    chunk = -(-T // D)
    act_bytes = T * H * 4
    print(f"recording: {T} frames ({T * 0.01 / 60:.1f} min), "
          f"{L}-layer LSTM H={H}")
    print(f"mesh: {D} devices -> {chunk} frames/device; per-layer activation "
          f"{act_bytes / 2**20:.0f} MiB single-device vs "
          f"{act_bytes / D / 2**20:.0f} MiB/device sharded")

    # single-device reference encode
    t0 = time.perf_counter()
    enc_ref, _ = jax.jit(
        lambda p, x, n: model.apply({"params": p}, x, n,
                                    method=model.encode))(params, audio, alen)
    enc_ref.block_until_ready()
    t_ref = time.perf_counter() - t0

    # wavefront encode, time-sharded
    xp = pad_time_to_multiple(audio, D)
    t0 = time.perf_counter()
    enc_wf, _ = wavefront_encode(params["encoder"], cfg.transnet, xp, alen,
                                 mesh)
    enc_wf.block_until_ready()
    t_wf = time.perf_counter() - t0
    err = float(jnp.abs(enc_wf[:, :T] - enc_ref).max())
    print(f"encode: single-device {t_ref:.1f}s, wavefront {t_wf:.1f}s "
          f"(CPU pipeline timing is indicative only); max |diff| = {err:g}")
    assert err == 0.0, err

    # greedy decode both encodes: tokens must agree exactly
    def decode(enc):
        carry = init_greedy_carry(model, variables, 1, 0, 512)
        carry = greedy_decode_frames(model, variables, enc, alen, carry)
        return np.asarray(carry.tokens), int(carry.lengths[0])

    tok_ref, n_ref = decode(enc_ref)
    tok_wf, n_wf = decode(jnp.asarray(np.asarray(enc_wf)[:, :T]))
    assert n_ref == n_wf and np.array_equal(tok_ref, tok_wf)
    print(f"greedy decode: {n_ref} tokens, wavefront == single-device "
          f"exactly")
    print("OK")


if __name__ == "__main__":
    main()
