#!/usr/bin/env python
"""Inference CLI.

Capability-equivalent of the reference's ``inference.py`` (checkpoint load ->
inline log-mel frontend -> beam/greedy decode -> text,
``inference.py:13-66``), with the frontend on-device and decoding batched.

Example:
  python inference.py --checkpoint_dir ckpts --wav sample.wav
  python inference.py --checkpoint_dir ckpts --wav sample.wav \
      --decoder beam --beam_width 5 --lm_path lm.arpa
"""

from __future__ import annotations

import argparse

import numpy as np

import jax.numpy as jnp


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint_dir", type=str, required=True)
    p.add_argument("--step", type=int, default=None,
                   help="checkpoint step (default: best by val_cer, else latest)")
    p.add_argument("--average_k", type=int, default=None,
                   help="decode with the element-wise mean of the best K "
                        "retained checkpoints (SWA-style averaging) instead "
                        "of a single step")
    p.add_argument("--use_ema", action="store_true",
                   help="decode with the Polyak-averaged (EMA) shadow "
                        "params (requires train.ema_decay > 0 at training "
                        "time)")
    p.add_argument("--wav", type=str, nargs="+", required=True)
    p.add_argument("--vocab_path", type=str, default=None)
    # unset beam/LM flags fall back to the InferenceConfig persisted with
    # the checkpoint (cfg.inference), matching what the model was tuned with
    p.add_argument("--decoder", type=str, default="beam",
                   choices=["greedy", "beam", "beam_batched"])
    p.add_argument("--timestamps", action="store_true",
                   help="with --decoder greedy: print per-token emission "
                        "seconds after each transcript")
    p.add_argument("--beam_width", type=int, default=None)
    p.add_argument("--improved", action="store_true", default=None)
    p.add_argument("--no-improved", dest="improved", action="store_false")
    p.add_argument("--state_beam", type=float, default=None)
    p.add_argument("--expand_beam", type=float, default=None)
    p.add_argument("--lm_path", type=str, default=None,
                   help="ARPA n-gram LM for shallow fusion")
    p.add_argument("--lm_weight", type=float, default=None)
    p.add_argument("--hotwords", type=str, nargs="*", default=None)
    p.add_argument("--hotword_weight", type=float, default=None)
    p.add_argument("--device_lm", type=str, default=None,
                   help="char-level n-gram LM fused ON DEVICE inside the "
                        "compiled beam scan (decode/device_lm.py). Requires "
                        "--decoder beam_batched (or --stream with a beam "
                        "decoder); mutually exclusive with --lm_path/"
                        "--hotwords (host word-level fusion)")
    p.add_argument("--device_lm_weight", type=float, default=0.3)
    p.add_argument("--device_lm_order", type=int, default=3,
                   help="cap the dense char-LM table order (V^order "
                        "entries; 3 on a 72-grapheme vocab is 1.5 MB)")
    p.add_argument("--nbest", type=int, default=1,
                   help="with a beam decoder (offline): print the top-N "
                        "hypotheses per wav (rank-tagged lines)")
    p.add_argument("--precision", choices=("fp32", "bf16"), default=None,
                   help="decode compute dtype: bf16 halves the weight bytes "
                        "each decode reads from HBM (beam scores stay fp32); "
                        "default keeps the checkpoint's dtype")
    p.add_argument("--max_output_len", type=int, default=256)
    p.add_argument("--stream", action="store_true",
                   help="simulate real-time streaming: feed the wav in "
                        "--chunk_ms chunks through the incremental frontend "
                        "+ carried encoder state, printing partials "
                        "(requires a unidirectional encoder)")
    p.add_argument("--chunk_ms", type=int, default=100)
    p.add_argument("--normalize", type=str, default=None,
                   choices=["none", "running", "fixed"],
                   help="streaming normalization (default: 'running' when "
                        "the model was trained with per-utterance norm)")
    p.add_argument("--norm_mean", type=float, default=0.0,
                   help="--normalize fixed calibration mean")
    p.add_argument("--norm_var", type=float, default=1.0,
                   help="--normalize fixed calibration variance")
    return p.parse_args()


def main():
    args = parse_args()
    if args.decoder != "beam" and (args.lm_path or args.hotwords):
        raise SystemExit(
            f"--lm_path/--hotwords require --decoder beam "
            f"(the '{args.decoder}' decoder has no shallow fusion)")
    if args.timestamps and (args.decoder != "greedy" or args.stream):
        raise SystemExit("--timestamps requires --decoder greedy (offline; "
                         "streaming sessions expose .timestamps in the API)")
    if args.nbest > 1 and (args.decoder == "greedy" or args.stream):
        raise SystemExit("--nbest requires an offline beam decoder")
    if args.device_lm:
        if args.lm_path or args.hotwords:
            raise SystemExit(
                "--device_lm (on-device char fusion) and --lm_path/"
                "--hotwords (host word-level fusion) are mutually exclusive")
        if args.decoder == "greedy":
            raise SystemExit("--device_lm requires a beam decoder")
        if args.decoder == "beam" and not args.stream:
            raise SystemExit(
                "--device_lm fuses inside the compiled beam scan — use "
                "--decoder beam_batched (offline) or --stream; --decoder "
                "beam is the host A/B search (use --lm_path there)")

    from rnntransducer_tpu.decode import greedy_decode
    from rnntransducer_tpu.frontend import LogMelFrontend
    from rnntransducer_tpu.tokenizer import load_tokenizer
    from rnntransducer_tpu.train import (
        build_model, load_config, load_decode_params,
    )
    from rnntransducer_tpu.utils.audio_io import read_wav

    cfg = load_config(args.checkpoint_dir)
    inf = cfg.inference
    pick = lambda flag, cfg_val: cfg_val if flag is None else flag
    args.beam_width = pick(args.beam_width, inf.beam_width)
    args.improved = pick(args.improved, inf.improved)
    args.state_beam = pick(args.state_beam, inf.state_beam)
    args.expand_beam = pick(args.expand_beam, inf.expand_beam)
    args.lm_path = pick(args.lm_path, inf.lm_path)
    args.lm_weight = pick(args.lm_weight, inf.lm_weight)
    args.hotwords = pick(args.hotwords, list(inf.hotwords) or None)
    args.hotword_weight = pick(args.hotword_weight, inf.hotword_weight)
    if args.decoder != "beam" and (args.lm_path or args.hotwords):
        # fusion lives in the host A/B-set decoder only; refusing beats
        # silently transcribing without the LM.  Checked AFTER the merge so
        # a checkpoint-persisted lm_path/hotwords is caught too, not only
        # CLI flags (pass --lm_path '' to override a persisted LM path).
        raise SystemExit(
            f"--decoder {args.decoder} has no LM/hotword fusion (fusion "
            "runs in the host beam). Use --decoder beam, or drop the "
            "LM/hotword flags (pass --lm_path '' to override a "
            "checkpoint-persisted LM path).")
    tok = load_tokenizer(args.vocab_path or cfg.vocab_path,
                         cfg.model.jointnet.num_classes)

    import jax
    # restore standard JAX_PLATFORMS env semantics: third-party PJRT plugins
    # (e.g. the axon TPU tunnel) can ignore the env var, so pin it via
    # config before backend init — JAX_PLATFORMS=cpu must mean cpu
    import os as _os
    if _os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
    # persistent compile cache: repeated CLI decodes at the same frame
    # buckets skip the ~minutes-long first XLA compile (same cache train.py
    # and bench.py use)
    jax.config.update("jax_compilation_cache_dir",
                      _os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
    try:
        params, picked = load_decode_params(
            args.checkpoint_dir, cfg, step=args.step,
            average_k=args.average_k, use_ema=args.use_ema)
    except ValueError as e:
        raise SystemExit(str(e))
    if args.average_k is not None:
        print(f"averaged checkpoints: {picked}")
    model = build_model(cfg)
    if args.precision is not None:
        from rnntransducer_tpu.utils.precision import (cast_float_leaves,
                                                       decode_dtype)
        params = cast_float_leaves(params, decode_dtype(args.precision))
    variables = {"params": params}

    device_lm = None
    if args.device_lm:
        from rnntransducer_tpu.decode.device_lm import DeviceCharLM
        device_lm = DeviceCharLM.load(args.device_lm, tok,
                                      weight=args.device_lm_weight,
                                      max_order=args.device_lm_order)

    wavs = [read_wav(p, cfg.data.audio.sample_rate) for p in args.wav]

    if args.stream:
        # (decoder/fusion consistency — incl. checkpoint-persisted LM
        # paths — was checked right after the InferenceConfig merge above)
        lm = None
        if args.lm_path:
            from rnntransducer_tpu.decode.ngram_lm import NGramLM
            lm = NGramLM.load(args.lm_path, weight=args.lm_weight)
        from rnntransducer_tpu.decode.streaming import StreamingRecognizer
        norm = args.normalize or (
            "running" if cfg.data.audio.normalize else "none")
        chunk = max(1, cfg.data.audio.sample_rate * args.chunk_ms // 1000)
        use_beam = args.decoder in ("beam", "beam_batched")
        for path, wav in zip(args.wav, wavs):
            rec = StreamingRecognizer(
                model, variables, cfg.data.audio,
                blank_id=tok.blank_token_id,
                max_symbols=cfg.train.greedy_max_symbols,
                max_output_len=args.max_output_len, normalize=norm,
                decoder="beam" if use_beam else "greedy",
                beam_width=args.beam_width,
                norm_mean=args.norm_mean, norm_var=args.norm_var,
                lm=lm, hotwords=args.hotwords,
                hotword_weight=args.hotword_weight, tokenizer=tok,
                improved=args.improved, state_beam=args.state_beam,
                expand_beam=args.expand_beam, device_lm=device_lm)
            emitted = []  # greedy: accumulate feed()'s returns — a .tokens
            # poll would re-fetch the whole buffer every chunk
            for s in range(0, len(wav), chunk):
                emitted += rec.feed(wav[s:s + chunk])
                toks = rec.tokens if use_beam else emitted
                partial = tok.decode(toks, group_tokens=False)
                print(f"\r{path}\t{partial}", end="", flush=True)
            rec.flush()
            print(f"\r{path}\t{tok.decode(rec.tokens, group_tokens=False)}")
        return
    S = max(len(w) for w in wavs)
    batch = np.zeros((len(wavs), S), np.float32)
    lengths = np.zeros((len(wavs),), np.int32)
    for i, w in enumerate(wavs):
        batch[i, :len(w)] = w
        lengths[i] = len(w)

    frontend = LogMelFrontend(cfg.data.audio)
    feats, feat_lengths = frontend(jnp.asarray(batch), jnp.asarray(lengths))

    times = None
    if args.decoder == "greedy":
        if args.timestamps:
            from rnntransducer_tpu.decode import greedy_decode_with_times
            toks, lens, frames = greedy_decode_with_times(
                model, variables, feats, feat_lengths,
                blank_id=tok.blank_token_id,
                max_symbols=cfg.train.greedy_max_symbols,
                max_output_len=args.max_output_len)
            sec = (cfg.model.transnet.time_reduction_stride *
                   cfg.data.audio.window_stride_sec)
            frames = np.asarray(frames)
            toks, lens = np.asarray(toks), np.asarray(lens)
            times = [[round(float(f) * sec, 3)
                      for f in frames[i, :lens[i]]] for i in range(len(wavs))]
        else:
            toks, lens = greedy_decode(
                model, variables, feats, feat_lengths,
                blank_id=tok.blank_token_id,
                max_symbols=cfg.train.greedy_max_symbols,
                max_output_len=args.max_output_len)
            toks, lens = np.asarray(toks), np.asarray(lens)
        hyps = [list(toks[i, :lens[i]]) for i in range(len(wavs))]
    elif args.decoder == "beam_batched":
        from rnntransducer_tpu.decode import batched_beam_decode
        toks, lens, _ = batched_beam_decode(
            model, variables, feats, feat_lengths,
            blank_id=tok.blank_token_id, beam_width=args.beam_width,
            max_symbols=cfg.train.greedy_max_symbols,
            max_output_len=args.max_output_len, device_lm=device_lm)
        toks, lens = np.asarray(toks), np.asarray(lens)
        hyps = [list(toks[i, 0, :lens[i, 0]]) for i in range(len(wavs))]
        if args.nbest > 1:
            K = min(args.nbest, toks.shape[1])
            nbest_lists = [[list(toks[i, k, :lens[i, k]]) for k in range(K)]
                           for i in range(len(wavs))]
    else:
        from rnntransducer_tpu.decode.beam import BeamSearchDecoder
        lm = None
        if args.lm_path:
            from rnntransducer_tpu.decode.ngram_lm import NGramLM
            lm = NGramLM.load(args.lm_path, weight=args.lm_weight)
        decoder = BeamSearchDecoder(
            model, variables, blank_id=tok.blank_token_id, tokenizer=tok,
            beam_width=args.beam_width, improved=args.improved,
            state_beam=args.state_beam, expand_beam=args.expand_beam,
            lm=lm, hotwords=args.hotwords, hotword_weight=args.hotword_weight)
        hyps = []
        nbest_lists = []
        for i in range(len(wavs)):
            nbest = decoder.decode(feats[i:i + 1],
                                   feat_lengths[i:i + 1])
            hyps.append(nbest[0])
            nbest_lists.append(nbest[:args.nbest])

    for i, (path, hyp) in enumerate(zip(args.wav, hyps)):
        print(f"{path}\t{tok.decode(hyp, group_tokens=False)}")
        if args.nbest > 1:
            for k, y in enumerate(nbest_lists[i]):
                print(f"{path}\tnbest[{k}]\t"
                      f"{tok.decode(y, group_tokens=False)}")
        if times is not None:
            stamps = " ".join(
                f"{tok.decode([t], group_tokens=False)}@{s}"
                for t, s in zip(hyp, times[i]))
            print(f"{path}\ttimes\t{stamps}")


if __name__ == "__main__":
    main()
