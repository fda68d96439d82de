"""Continuous-batching scale sweep (round-2 verdict item 6): tick latency,
aggregate real-time factor, and feed-blocking time at 8/16/32/64 lanes.

All lanes are fed in lockstep (buffer-only feeds + one coordinated drain per
round), which measures the device tick economics at each width; the
feed-block metric is the time a *non-draining* feed (buffer append under the
state lock) waits while a tick is in flight — the round-2 weakness was that
this blocked for the whole tick.

Run on the real chip:
  python experiments/bench_session_scale.py [--decoder greedy|beam] \
      [--lanes 8 16 32 64]
Prints one JSON line per width.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

import jax

import os
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--decoder", default="greedy",
                    choices=["greedy", "beam"])
    ap.add_argument("--beam_width", type=int, default=4)
    ap.add_argument("--lanes", type=int, nargs="*",
                    default=[8, 16, 32, 64])
    ap.add_argument("--utt_sec", type=float, default=8.0)
    ap.add_argument("--with_lm", action="store_true",
                    help="host word-LM shallow fusion in every lane "
                         "(decoder=beam): measures the fused path's tick "
                         "economics under load — VERDICT r3 item 9")
    ap.add_argument("--device_word_lm", action="store_true",
                    help="DEVICE word-boundary LM fusion in every lane "
                         "(decoder=beam): the round-5 answer to --with_lm "
                         "being host-CPU-bound — the lexicon trie + bigram "
                         "tables ride the compiled tick with zero host "
                         "round trips (decode/device_word_lm.py)")
    ap.add_argument("--lm_path", type=str, default=None,
                    help="ARPA/kenlm binary for --with_lm (default: a "
                         "generated 200-word bigram ARPA)")
    ap.add_argument("--lm_weight", type=float, default=0.5)
    ap.add_argument("--hidden", type=int, default=1024)
    ap.add_argument("--layers", type=int, default=6)
    args = ap.parse_args()

    import rnntransducer_tpu as rt
    import jax.numpy as jnp
    import threading
    from rnntransducer_tpu.config import AudioConfig
    from rnntransducer_tpu.decode.session_batch import BatchedStreamingRunner
    from rnntransducer_tpu.models import RNNTransducer

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

    if args.with_lm and args.device_word_lm:
        raise SystemExit("--with_lm (host fusion) and --device_word_lm "
                         "are mutually exclusive")
    lm = None
    tok = None
    word_lm = None
    if args.with_lm or args.device_word_lm:
        if args.decoder != "beam":
            raise SystemExit("LM fusion requires --decoder beam")
        from rnntransducer_tpu.decode.ngram_lm import NGramLM
        from rnntransducer_tpu.tokenizer import GraphemeTokenizer
        tok = GraphemeTokenizer.default(72)
        lm_path = args.lm_path
        words = None
        if lm_path is None:
            # deterministic 200-word jamo bigram ARPA: the LOAD is what is
            # measured (the audio is noise); scores just have to be real
            import math as _math
            import tempfile
            rngw = np.random.RandomState(7)
            chars = [tok.ids_to_tokens[i] for i in range(5, 40)]
            words = sorted({"".join(rngw.choice(chars, rngw.randint(2, 5)))
                            for _ in range(260)})[:200]
            lines = ["\\data\\", f"ngram 1={len(words)+3}",
                     f"ngram 2={len(words)}", "", "\\1-grams:",
                     "-1.5\t<s>\t-0.3", "-1.5\t</s>", "-3.0\t<unk>"]
            for w in words:
                lines.append(f"{_math.log10(1.0/len(words)):.4f}\t{w}\t-0.3")
            lines += ["", "\\2-grams:"]
            for a, b in zip(words, words[1:] + words[:1]):
                lines.append(f"-0.8\t{a} {b}")
            lines += ["", "\\end\\", ""]
            fd, lm_path = tempfile.mkstemp(suffix=".arpa")
            with os.fdopen(fd, "w") as f:
                f.write("\n".join(lines))
        ngram = NGramLM.load(lm_path, weight=args.lm_weight, beta=0.0)
        if words is not None and lm_path != args.lm_path:
            os.unlink(lm_path)  # loaded into the native scorer; done with it
        if args.device_word_lm:
            from rnntransducer_tpu.decode.device_word_lm import (
                build_device_word_lm,
            )
            if words is None:
                raise SystemExit("--device_word_lm needs the generated "
                                 "lexicon; omit --lm_path")
            word_lm = build_device_word_lm(ngram, tok, words)
        else:
            lm = ngram

    sr = acfg.sample_rate
    chunk_samples = sr // 10  # 100 ms
    rng = np.random.RandomState(0)

    for lanes in args.lanes:
        runner = BatchedStreamingRunner(
            model, variables, acfg, max_sessions=lanes, chunk_frames=16,
            decoder=args.decoder, beam_width=args.beam_width,
            lm=lm, tokenizer=tok, word_lm=word_lm)
        t0 = time.perf_counter()
        runner.warmup()  # tick + reset + fetch compile before any traffic
        warmup_s = time.perf_counter() - t0
        wavs = [rng.randn(int(sr * args.utt_sec)).astype(np.float32) * 0.3
                for _ in range(lanes)]
        sessions = [runner.open(normalize="none") for _ in range(lanes)]

        # one throwaway round so the measured loop starts from streaming
        # steady state (chunk 0 primes every frontend's STFT overlap buffer)
        for s in sessions:
            s.feed(wavs[0][:chunk_samples], drain=False)
        runner.drain()

        tick_times = []
        feed_block = []
        stop_probe = threading.Event()

        # probe thread: times state-lock operations (partial-token polls)
        # against in-flight ticks — the round-2 weakness was that these
        # blocked for the whole tick under the single runner lock
        def probe():
            while not stop_probe.is_set():
                t0 = time.perf_counter()
                sessions[0].tokens
                feed_block.append(time.perf_counter() - t0)
                time.sleep(0.01)

        pt = threading.Thread(target=probe, daemon=True)
        pt.start()
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
        stop_probe.set()
        pt.join(timeout=5)
        total = time.perf_counter() - t_start
        audio_sec = lanes * (n_chunks - 1) * 0.1
        tick_ms = sorted(t * 1000 for t in tick_times)
        fb_ms = sorted(t * 1000 for t in feed_block) or [0.0]
        print(json.dumps({
            "metric": "session_batch_scale",
            "decoder": args.decoder + ("+word_lm" if lm is not None else "")
            + ("+device_word_lm" if word_lm is not None else ""),
            "lanes": lanes,
            "warmup_s": round(warmup_s, 1),
            "tick_ms_p50": round(tick_ms[len(tick_ms) // 2], 1),
            "tick_ms_p99": round(tick_ms[int(len(tick_ms) * 0.99)], 1),
            "aggregate_rtf": round(audio_sec / total, 1),
            "poll_block_ms_p50": round(fb_ms[len(fb_ms) // 2], 2),
            "poll_block_ms_p99": round(fb_ms[int(len(fb_ms) * 0.99)], 2),
        }), flush=True)
        for s in sessions:
            s.flush()


if __name__ == "__main__":
    main()
