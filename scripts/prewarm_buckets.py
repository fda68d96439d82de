#!/usr/bin/env python
"""Pre-warm the persistent XLA compilation cache for every bucket shape.

The unrolled Conformer perf mode costs ~247 s of XLA compile PER bucket
shape cold (BASELINE.md round-4 Conformer row) — a serving/training fleet
with several bucket shapes would pay that at first deploy.  Compiles are
content-addressed in JAX's persistent cache, so the production answer is
to pay them ONCE, at image-build / deploy time, with this tool: it runs
one training step per (audio_bucket x label_bucket) shape, populating the
cache directory that later jobs point at (same --cache_dir => hits).

    python scripts/prewarm_buckets.py --config config.json \
        --batch 64 --cache_dir /path/to/jax_cache [--precision bf16]

Then launch training/serving with the same cache dir
(``jax_compilation_cache_dir``); every bucket shape starts warm
(measured: 247 s cold -> ~1-3 s warm per shape).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def main():
    ap = argparse.ArgumentParser(
        description=__doc__.splitlines()[1].strip())
    ap.add_argument("--config", type=str, default=None,
                    help="config JSON (default: the flagship base_config)")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--cache_dir", type=str, default="/tmp/jax_cache")
    ap.add_argument("--precision", type=str, default=None,
                    help="override train.precision (e.g. bf16)")
    ap.add_argument("--max_label_bucket_only", action="store_true",
                    help="compile only the largest label bucket per audio "
                         "bucket (the shape campaigns actually run when "
                         "label_buckets has one entry)")
    args = ap.parse_args()
    jax.config.update("jax_compilation_cache_dir", args.cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    import dataclasses

    import rnntransducer_tpu as rt
    from __graft_entry__ import _example_batch
    from rnntransducer_tpu.train import (TrainState, make_optimizer,
                                         train_step)

    cfg = (rt.config.Config.from_json(args.config) if args.config
           else rt.base_config())
    if args.precision:
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train,
                                           precision=args.precision))
    tx = make_optimizer(cfg.train)
    state = TrainState.create(cfg)
    labels = (cfg.data.label_buckets[-1:] if args.max_label_bucket_only
              else cfg.data.label_buckets)
    shapes = [(t, u) for t in cfg.data.audio_buckets for u in labels]
    print(f"pre-warming {len(shapes)} (T, U) shapes at B={args.batch} "
          f"into {args.cache_dir}")
    for t, u in shapes:
        batch = _example_batch(cfg, args.batch, t, u)
        t0 = time.monotonic()
        # carry the returned state forward: train_step donates its input
        # state buffers, so the previous shape's state is gone after use
        state, metrics = train_step(cfg, tx, state, batch)
        loss = float(metrics["loss"])
        print(f"  (T={t}, U={u}): {time.monotonic() - t0:.1f} s "
              f"(loss {loss:.3f})", flush=True)
    print("done — launch with the same jax_compilation_cache_dir")


if __name__ == "__main__":
    main()
