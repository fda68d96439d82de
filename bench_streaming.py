"""Streaming decode benchmark: RTF + p50 first-token latency (BASELINE.md
north-star config 4). Prints one JSON line.

Run on the real TPU chip: python bench_streaming.py
"""

from __future__ import annotations

import json
import time

import numpy as np

import jax
import jax.numpy as jnp


def main():
    import rnntransducer_tpu as rt
    from rnntransducer_tpu.config import AudioConfig
    from rnntransducer_tpu.decode.streaming import StreamingRecognizer
    from rnntransducer_tpu.models import RNNTransducer

    # streaming model: unidirectional encoder (base width, 6 layers)
    cfg = rt.config.ModelConfig(
        transnet=rt.config.TransNetConfig(input_size=80, hidden_size=1024,
                                          output_size=512, num_layers=6,
                                          rnn_type="lstm", dropout=0.0,
                                          bidirectional=False),
        prednet=rt.config.PredNetConfig(embedding_size=72, hidden_size=1024,
                                        output_size=512, num_layers=2,
                                        rnn_type="lstm", dropout=0.0),
        jointnet=rt.config.JointNetConfig(num_classes=72),
    )
    import sys
    decoder = "beam" if "--beam" in sys.argv else "greedy"
    stride = 2 if "--time_reduction" in sys.argv else 1
    arch = "conformer" if "--conformer" in sys.argv else "rnn"
    import dataclasses
    if arch == "conformer":
        # chunked-causal streaming Conformer at serving scale: 16 blocks,
        # d=512, 4x subsampling; attention_chunk=16 reduced frames so one
        # 64-input-frame feed = exactly one attention chunk, left context
        # 4 chunks (= 2.56 s of audio).
        stride = 4
        cfg = dataclasses.replace(cfg, transnet=dataclasses.replace(
            cfg.transnet, arch="conformer", hidden_size=512, num_layers=16,
            attention_heads=8, ff_multiplier=4, conv_kernel_size=15,
            bidirectional=False, attention_chunk=16, attention_left_chunks=4,
            time_reduction_stride=4, time_reduction_layer=0))
    elif stride > 1:
        cfg = dataclasses.replace(cfg, transnet=dataclasses.replace(
            cfg.transnet, time_reduction_stride=stride,
            time_reduction_layer=1))

    acfg = AudioConfig(normalize=False)
    model = RNNTransducer(cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 80)),
                           jnp.array([8]), jnp.zeros((1, 2), jnp.int32),
                           jnp.array([2]))

    sr = acfg.sample_rate
    chunk_ms = 100
    chunk = sr * chunk_ms // 1000
    utt_sec = 10.0
    n_utts = 5
    rng = np.random.RandomState(0)

    rtfs, first_tok = [], []
    for u in range(n_utts + 1):  # first utterance = warmup/compile
        wav = (rng.randn(int(sr * utt_sec)) * 2).astype(np.float32)
        rec = StreamingRecognizer(model, variables, acfg, chunk_frames=64,
                                  normalize="none", decoder=decoder,
                                  beam_width=4)
        t0 = time.perf_counter()
        tft = None
        compute = 0.0
        for ci, s in enumerate(range(0, len(wav), chunk)):
            c0 = time.perf_counter()
            toks = rec.feed(wav[s:s + chunk])
            if decoder == "beam" and ci % 5 == 4:
                toks = rec.tokens  # poll partials at a UI-ish cadence
                # (every 5 chunks for the whole stream, so the headline RTF
                # includes the recurring rank+sync cost of partials)
            compute += time.perf_counter() - c0
            if toks and tft is None:
                # latency = compute time until first emission (audio arrival
                # time excluded: feed is instantaneous in this harness)
                tft = time.perf_counter() - t0
        c0 = time.perf_counter()
        rec.flush()
        compute += time.perf_counter() - c0
        if u == 0:
            continue
        rtfs.append(compute / utt_sec)
        if tft is not None:
            first_tok.append(tft)

    rtf = float(np.median(rtfs))
    p50 = float(np.median(first_tok)) if first_tok else -1.0
    print(json.dumps({
        "metric": "streaming_decode_rtf",
        "value": round(rtf, 4),
        "unit": f"RTF ({'16x512 chunked-causal Conformer, stride 4' if arch == 'conformer' else '6L uni-LSTM 1024' + (f', stride {stride}' if stride > 1 else '')}, "
                f"{decoder}{' width 4' if decoder == 'beam' else ''}, {chunk_ms}ms "
                f"chunks; p50 first-token latency {p50:.3f}s)",
        "vs_baseline": round(1.0 / max(rtf, 1e-9), 2),
    }))


if __name__ == "__main__":
    main()
