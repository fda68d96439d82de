"""Inference-precision bench: fp32 vs bf16 decode on the real chip.

Measures the two serving-relevant costs on the flagship serving model
(6L uni-LSTM 1024, the bench_session_scale.py config):

* continuous-batching tick latency (N lanes, 16-frame ticks) — the
  streaming/serving hot loop, HBM-bandwidth-bound at small batch, where
  bf16 halves the weight bytes read per tick;
* offline batched greedy decode wall time for a (B, T) batch — the
  evaluate.py / transcribe_batch path.

Timing goes through a host value fetch (the axon tunnel returns early from
block_until_ready — see bench.py), and each measurement repeats the work to
amortize fixed RPC overhead.

Run on the real chip:
  python experiments/bench_infer_precision.py [--lanes 8] [--batch 8]
Prints one JSON line per precision.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lanes", type=int, default=8)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--utt_sec", type=float, default=8.0)
    ap.add_argument("--hidden", type=int, default=1024)
    ap.add_argument("--layers", type=int, default=6)
    ap.add_argument("--decoder", default="greedy",
                    choices=["greedy", "beam"])
    args = ap.parse_args()

    import jax.numpy as jnp

    import rnntransducer_tpu as rt
    from rnntransducer_tpu.config import AudioConfig
    from rnntransducer_tpu.decode import greedy_decode
    from rnntransducer_tpu.decode.session_batch import BatchedStreamingRunner
    from rnntransducer_tpu.frontend import LogMelFrontend
    from rnntransducer_tpu.models import RNNTransducer
    from rnntransducer_tpu.utils.precision import cast_float_leaves

    cfg = rt.config.ModelConfig(
        transnet=rt.config.TransNetConfig(
            input_size=80, hidden_size=args.hidden, output_size=512,
            num_layers=args.layers, rnn_type="lstm", dropout=0.0,
            bidirectional=False),
        prednet=rt.config.PredNetConfig(
            embedding_size=72, hidden_size=args.hidden, output_size=512,
            num_layers=2, rnn_type="lstm", dropout=0.0),
        jointnet=rt.config.JointNetConfig(num_classes=72),
    )
    acfg = AudioConfig(normalize=False)
    model = RNNTransducer(cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 80)),
                           jnp.array([8]), jnp.zeros((1, 2), jnp.int32),
                           jnp.array([2]))

    sr = acfg.sample_rate
    chunk_samples = sr // 10  # 100 ms
    rng = np.random.RandomState(0)
    wavs = [rng.randn(int(sr * args.utt_sec)).astype(np.float32) * 0.3
            for _ in range(max(args.lanes, args.batch))]

    # offline batch once per precision: feats precomputed (frontend is
    # precision-independent, fp32 by design)
    S = max(len(w) for w in wavs[:args.batch])
    batch = np.zeros((args.batch, S), np.float32)
    blens = np.zeros((args.batch,), np.int32)
    for i in range(args.batch):
        batch[i, :len(wavs[i])] = wavs[i]
        blens[i] = len(wavs[i])
    feats, feat_lengths = LogMelFrontend(acfg)(jnp.asarray(batch),
                                               jnp.asarray(blens))

    for precision in ("fp32", "bf16"):
        v = (variables if precision == "fp32"
             else cast_float_leaves(variables, jnp.bfloat16))

        # ---- offline batched greedy ----
        def offline():
            toks, lens = greedy_decode(model, v, feats, feat_lengths,
                                       max_output_len=256)
            return int(np.asarray(lens)[0])  # host fetch = real sync
        offline()  # compile
        t0 = time.perf_counter()
        reps = 5
        for _ in range(reps):
            offline()
        offline_ms = (time.perf_counter() - t0) / reps * 1000

        # ---- continuous-batching ticks ----
        runner = BatchedStreamingRunner(
            model, variables, acfg, max_sessions=args.lanes,
            chunk_frames=16, decoder=args.decoder, precision=precision)
        runner.warmup()
        sessions = [runner.open(normalize="none")
                    for _ in range(args.lanes)]
        for s in sessions:
            s.feed(wavs[0][:chunk_samples], drain=False)
        runner.drain()
        tick_times = []
        n_chunks = int(args.utt_sec * 10)
        t_start = time.perf_counter()
        for c in range(1, n_chunks):
            for i, s in enumerate(sessions):
                s.feed(wavs[i][c * chunk_samples:(c + 1) * chunk_samples],
                       drain=False)
            t0 = time.perf_counter()
            n_ticks = runner.drain()
            if n_ticks:
                tick_times.append((time.perf_counter() - t0) / n_ticks)
        total = time.perf_counter() - t_start
        for s in sessions:
            s.flush()
        audio_sec = args.lanes * (n_chunks - 1) * 0.1
        tick_ms = sorted(t * 1000 for t in tick_times)
        print(json.dumps({
            "metric": "infer_precision",
            "precision": precision,
            "decoder": args.decoder,
            "lanes": args.lanes,
            "tick_ms_p50": round(tick_ms[len(tick_ms) // 2], 1),
            "tick_ms_p99": round(tick_ms[int(len(tick_ms) * 0.99)], 1),
            "aggregate_rtf": round(audio_sec / total, 1),
            "offline_batch_ms": round(offline_ms, 1),
            "offline_batch": [args.batch, int(feats.shape[1])],
        }), flush=True)


if __name__ == "__main__":
    main()
