"""Deployment bundles: serialized transcription programs via ``jax.export``.

The reference's only deployment artifact is a Lightning ``.ckpt`` that needs
the full model code to run (``/root/reference/inference.py:19-25``).  Here a
trained model additionally exports to a **self-contained bundle**: one
serialized StableHLO program per shape bucket (params baked in as constants)
plus the vocab and a manifest.  Loading the bundle needs jax but NOT this
package's model code — the artifact a serving fleet pins and ships.

Design notes (TPU-first, per docs/DESIGN.md):

* One program per (batch, frames) bucket — the same static-shape bucketing
  the training/serving paths use; the loader pads into the smallest
  covering bucket.
* Programs are exported for BOTH cpu and tpu platforms by default
  (``jax.export`` multi-platform lowering), so one artifact serves both a
  CPU canary and the TPU fleet.
* The traced program uses the portable XLA path for the recurrent scans
  (``use_pallas_cells="off"``): a Pallas kernel baked into the artifact
  would pin it to one TPU generation and break the cpu lowering.  Greedy
  transcription is dispatch/latency-bound, so the portable scan is the
  right trade for a frozen artifact; peak-throughput serving should use the
  live ``serve.Recognizer`` instead.
* ``input_kind="wav"`` bakes the log-mel frontend into the program (raw
  16 kHz PCM in, token ids out — zero preprocessing at the serving edge);
  ``"logmel"`` exports from precomputed features.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Optional, Sequence, Tuple, Union

import numpy as np

import jax
import jax.numpy as jnp

from rnntransducer_tpu.config import Config
from rnntransducer_tpu.tokenizer import GraphemeTokenizer, compose_jamo

BUNDLE_MANIFEST = "bundle.json"
_FORMAT_VERSION = 1


def _portable_cfg(cfg: Config) -> Config:
    m = cfg.model
    m = dataclasses.replace(
        m,
        transnet=dataclasses.replace(m.transnet, use_pallas_cells="off"),
        prednet=dataclasses.replace(m.prednet, use_pallas_cells="off"))
    return dataclasses.replace(cfg, model=m)


def _program_name(decoder: str, batch: int, frames: int) -> str:
    return f"{decoder}_b{batch}_t{frames}.jaxexp"


def export_transcriber(cfg: Config, params, out_dir: str, *,
                       tokenizer: Optional[GraphemeTokenizer] = None,
                       batch: int = 1,
                       frame_buckets: Sequence[int] = (256, 512, 1024),
                       input_kind: str = "wav",
                       decoder: str = "greedy",
                       beam_width: int = 4,
                       platforms: Sequence[str] = ("cpu", "tpu"),
                       max_symbols: int = 3,
                       max_output_len: int = 256,
                       streaming_chunk_frames: Optional[int] = None) -> str:
    """Export transcription programs for every frame bucket into
    ``out_dir`` (created).  Returns ``out_dir``.

    Each program maps ``(wav (B,S) f32, wav_lengths (B,) i32)`` (or
    ``(feats (B,T,n_mels) f32, feat_lengths)`` for ``input_kind="logmel"``)
    to ``(tokens (B, max_output_len) i32 blank-padded, lengths (B,) i32)``.
    ``decoder="beam"`` bakes the device-batched beam (decode/beam_batched.py,
    width ``beam_width``, length-normalized) and emits its best hypothesis —
    same program interface as greedy, so bundles are drop-in swappable.

    ``streaming_chunk_frames=N`` additionally exports a chunked streaming
    step program (unidirectional encoders only): greedy decode resumed
    across N-frame feature chunks with the recurrent state as an explicit,
    flattened carry — the loader (``ExportedStreamingSession``) threads it
    as an opaque list of arrays, so streaming serving also needs no model
    code.
    """
    from jax import export as jexport

    from rnntransducer_tpu.decode.beam_batched import batched_beam_decode
    from rnntransducer_tpu.decode.greedy import greedy_decode
    from rnntransducer_tpu.frontend import LogMelFrontend
    from rnntransducer_tpu.train import build_model

    if input_kind not in ("wav", "logmel"):
        raise ValueError(f"input_kind must be 'wav' or 'logmel', "
                         f"got {input_kind!r}")
    if decoder not in ("greedy", "beam"):
        raise ValueError(f"decoder must be 'greedy' or 'beam', got {decoder!r}")
    cfg = _portable_cfg(cfg)
    model = build_model(cfg)
    blank = cfg.data.text.pad_token_id
    hop = cfg.data.audio.hop_length
    variables = {"params": params}
    os.makedirs(out_dir, exist_ok=True)

    def decode_fn(feats, feat_lengths):
        if decoder == "beam":
            toks, lens, _ = batched_beam_decode(
                model, variables, feats, feat_lengths, blank_id=blank,
                beam_width=beam_width, max_symbols=max_symbols,
                max_output_len=max_output_len)
            return toks[:, 0], lens[:, 0]  # best-first rank -> top-1
        return greedy_decode(model, variables, feats, feat_lengths,
                             blank_id=blank, max_symbols=max_symbols,
                             max_output_len=max_output_len)

    programs = []
    for frames in sorted(set(int(t) for t in frame_buckets)):
        if input_kind == "wav":
            # the full sample range of the bucket: num_frames = S//hop + 1,
            # so frames admits S up to frames*hop - 1; anything shorter
            # would truncate the longest utterances' final ~hop samples
            samples = frames * hop - 1

            def fn(wav, wav_lengths):
                feats, feat_lengths = LogMelFrontend(cfg.data.audio)(
                    wav, wav_lengths)
                return decode_fn(feats, feat_lengths)

            args = (jax.ShapeDtypeStruct((batch, samples), jnp.float32),
                    jax.ShapeDtypeStruct((batch,), jnp.int32))
        else:
            fn = decode_fn
            args = (jax.ShapeDtypeStruct((batch, frames, cfg.data.audio.n_mels),
                                         jnp.float32),
                    jax.ShapeDtypeStruct((batch,), jnp.int32))
        exp = jexport.export(jax.jit(fn), platforms=list(platforms))(*args)
        name = _program_name(decoder, batch, frames)
        with open(os.path.join(out_dir, name), "wb") as f:
            f.write(exp.serialize())
        programs.append({"frames": frames, "file": name})

    streaming_meta = None
    if streaming_chunk_frames:
        if cfg.model.transnet.bidirectional:
            raise ValueError("streaming export requires a unidirectional "
                             "encoder (transnet.bidirectional=false)")
        from rnntransducer_tpu.decode.greedy import (
            greedy_decode_frames, init_greedy_carry,
        )
        from rnntransducer_tpu.decode.streaming import _zero_encoder_state

        n = int(streaming_chunk_frames)
        stream_len = max_output_len
        carry0 = (_zero_encoder_state(model, variables, 1),
                  init_greedy_carry(model, variables, 1, blank, stream_len))
        flat0, treedef = jax.tree.flatten(carry0)

        stride = cfg.model.transnet.time_reduction_stride
        if stride > 1 and n % stride:
            raise ValueError(
                f"streaming_chunk_frames ({n}) must be a multiple of "
                f"time_reduction_stride ({stride})")

        def stream_step(chunk, n_valid, *flat):
            enc_state, g = jax.tree.unflatten(treedef, flat)
            enc, enc_state2 = model.apply(variables, chunk, n_valid,
                                          enc_state, method=model.encode)
            n_enc = cfg.model.transnet.output_lengths(n_valid)
            g2 = greedy_decode_frames(model, variables, enc, n_enc, g,
                                      blank_id=blank,
                                      max_symbols=max_symbols)
            return (g2.tokens, g2.lengths,
                    *jax.tree.leaves((enc_state2, g2)))

        args = ((jax.ShapeDtypeStruct((1, n, cfg.data.audio.n_mels),
                                      jnp.float32),
                 jax.ShapeDtypeStruct((1,), jnp.int32))
                + tuple(jax.ShapeDtypeStruct(x.shape, x.dtype)
                        for x in flat0))
        exp = jexport.export(jax.jit(stream_step),
                             platforms=list(platforms))(*args)
        sfile = f"stream_greedy_t{n}.jaxexp"
        with open(os.path.join(out_dir, sfile), "wb") as f:
            f.write(exp.serialize())
        np.savez(os.path.join(out_dir, "stream_init.npz"),
                 **{f"c{i}": np.asarray(x) for i, x in enumerate(flat0)})
        streaming_meta = {
            "chunk_frames": n, "file": sfile, "init": "stream_init.npz",
            "n_carry": len(flat0), "max_output_len": stream_len,
        }

    tok = tokenizer or GraphemeTokenizer.default(
        cfg.model.jointnet.num_classes)
    tok.save(os.path.join(out_dir, "vocab.json"))
    manifest = {
        "format_version": _FORMAT_VERSION,
        "input_kind": input_kind,
        "batch": batch,
        "programs": programs,
        "platforms": list(platforms),
        "sample_rate": cfg.data.audio.sample_rate,
        "hop_length": hop,
        "n_mels": cfg.data.audio.n_mels,
        "blank_id": blank,
        "max_output_len": max_output_len,
        "max_symbols": max_symbols,
        "decoder": decoder,
        "beam_width": beam_width if decoder == "beam" else None,
        "streaming": streaming_meta,
        "audio": dataclasses.asdict(cfg.data.audio),
    }
    with open(os.path.join(out_dir, BUNDLE_MANIFEST), "w") as f:
        json.dump(manifest, f, indent=1)
    return out_dir


def export_transcriber_from_checkpoint(checkpoint_dir: str, out_dir: str,
                                       step: Optional[int] = None,
                                       vocab_path: Optional[str] = None,
                                       **kw) -> str:
    """Bundle-export straight from an Orbax checkpoint directory (the
    counterpart of ``serve.Recognizer.from_checkpoint``)."""
    from rnntransducer_tpu.serve import _load_tokenizer
    from rnntransducer_tpu.train import (
        CheckpointManager, TrainState, load_config,
    )

    cfg = load_config(checkpoint_dir)
    mgr = CheckpointManager(checkpoint_dir, save_top_k=cfg.train.save_top_k)
    step = step if step is not None else mgr.best_or_latest_step()
    template = jax.eval_shape(lambda: TrainState.create(cfg))
    state = mgr.restore(template, step=step)
    mgr.close()
    return export_transcriber(cfg, state.params, out_dir,
                              tokenizer=_load_tokenizer(cfg, vocab_path), **kw)


class ExportedTranscriber:
    """Run a bundle written by :func:`export_transcriber`.

    Needs only jax + the bundle directory — no model code, no checkpoint.
    Picks the smallest bucket covering each input, pads, executes the
    deserialized program on the current default backend, and decodes token
    ids to text with the bundled vocab.
    """

    def __init__(self, bundle_dir: str):
        with open(os.path.join(bundle_dir, BUNDLE_MANIFEST)) as f:
            self.manifest = json.load(f)
        if self.manifest.get("format_version") != _FORMAT_VERSION:
            raise ValueError(
                f"unsupported bundle format {self.manifest.get('format_version')}")
        self.dir = bundle_dir
        self.tokenizer = GraphemeTokenizer.from_file(
            os.path.join(bundle_dir, "vocab.json"))
        self._programs = {}  # frames -> callable (lazy deserialize)

    # ------------------------------------------------------------------
    @property
    def batch(self) -> int:
        return int(self.manifest["batch"])

    def _bucket_for(self, frames_needed: int) -> int:
        buckets = sorted(p["frames"] for p in self.manifest["programs"])
        for b in buckets:
            if frames_needed <= b:
                return b
        raise ValueError(
            f"input needs {frames_needed} frames; largest exported bucket "
            f"is {buckets[-1]} (re-export with a bigger frame bucket)")

    def _program(self, frames: int):
        if frames not in self._programs:
            from jax import export as jexport
            name = _program_name(self.manifest.get("decoder", "greedy"),
                                 self.batch, frames)
            with open(os.path.join(self.dir, name), "rb") as f:
                exp = jexport.deserialize(bytearray(f.read()))
            self._programs[frames] = jax.jit(exp.call)
        return self._programs[frames]

    # ------------------------------------------------------------------
    def transcribe_tokens(self, inputs, lengths) -> Tuple[np.ndarray, np.ndarray]:
        """Raw program call: blank-padded token ids + counts for a full
        batch already padded to an exported bucket shape."""
        fn = self._program(self._frames_of(inputs))
        toks, n = fn(inputs, lengths)
        return np.asarray(toks), np.asarray(n)

    def _frames_of(self, inputs) -> int:
        if self.manifest["input_kind"] == "wav":
            return inputs.shape[1] // self.manifest["hop_length"] + 1
        return inputs.shape[1]

    def transcribe_batch(self, wavs: Sequence[np.ndarray],
                         compose_hangul: bool = True) -> list:
        """wavs: float32 PCM arrays at the bundle's sample rate (or feature
        matrices (T, n_mels) for logmel bundles).  Any count: processed in
        bundle-batch groups.  Returns transcripts."""
        kind = self.manifest["input_kind"]
        hop = self.manifest["hop_length"]
        out = []
        B = self.batch
        for g in range(0, len(wavs), B):
            group = [np.asarray(w) for w in wavs[g:g + B]]
            lens = [len(w) if kind == "wav" else w.shape[0] for w in group]
            if kind == "wav":
                frames = self._bucket_for(max(lens) // hop + 1)
                width = frames * hop - 1  # matches the exported shape
                batch = np.zeros((B, width), np.float32)
                for i, w in enumerate(group):
                    batch[i, :min(len(w), width)] = w[:width]
                lengths = np.asarray(
                    [min(l, width) for l in lens] + [1] * (B - len(group)),
                    np.int32)
            else:
                frames = self._bucket_for(max(lens))
                batch = np.zeros((B, frames, self.manifest["n_mels"]),
                                 np.float32)
                for i, w in enumerate(group):
                    batch[i, :min(w.shape[0], frames)] = w[:frames]
                lengths = np.asarray(
                    [min(l, frames) for l in lens] + [1] * (B - len(group)),
                    np.int32)
            toks, n = self.transcribe_tokens(batch, lengths)
            for i in range(len(group)):
                ids = toks[i, :n[i]].tolist()
                text = self.tokenizer.decode(ids, group_tokens=False)
                out.append(compose_jamo(text) if compose_hangul else text)
        return out

    def transcribe(self, wav: np.ndarray, **kw) -> str:
        return self.transcribe_batch([wav], **kw)[0]


class ExportedStreamingSession:
    """Streaming recognition from a bundle exported with
    ``streaming_chunk_frames`` — raw PCM in, incremental token ids out.

    The recurrent carry crosses chunks as an opaque flat list of arrays
    (the flattened (encoder RNNState, GreedyCarry) pytree), so no model
    code is needed; the log-mel/normalization frontend runs host-side
    (decode/streaming.StreamingFrontend, numpy-only)."""

    def __init__(self, bundle_dir: str, normalize: str = "none",
                 norm_mean: float = 0.0, norm_var: float = 1.0):
        from jax import export as jexport

        from rnntransducer_tpu.config import AudioConfig
        from rnntransducer_tpu.decode.streaming import StreamingFrontend

        with open(os.path.join(bundle_dir, BUNDLE_MANIFEST)) as f:
            self.manifest = json.load(f)
        sm = self.manifest.get("streaming")
        if not sm:
            raise ValueError(
                "bundle has no streaming program (re-export with "
                "streaming_chunk_frames=N)")
        self.chunk_frames = int(sm["chunk_frames"])
        self.tokenizer = GraphemeTokenizer.from_file(
            os.path.join(bundle_dir, "vocab.json"))
        audio = AudioConfig(**self.manifest["audio"])
        self.frontend = StreamingFrontend(audio, normalize,
                                          norm_mean=norm_mean,
                                          norm_var=norm_var)
        with open(os.path.join(bundle_dir, sm["file"]), "rb") as f:
            self._step = jax.jit(jexport.deserialize(bytearray(f.read())).call)
        init = np.load(os.path.join(bundle_dir, sm["init"]))
        self._carry = [init[f"c{i}"] for i in range(int(sm["n_carry"]))]
        self._feat_buf = np.zeros((0, audio.n_mels), np.float32)
        self._tokens: list = []
        self._n_mels = audio.n_mels

    def _run(self, final: bool) -> list:
        new = []
        n = self.chunk_frames
        while (len(self._feat_buf) >= n
               or (final and len(self._feat_buf) > 0)):
            valid = min(len(self._feat_buf), n)
            chunk = np.zeros((1, n, self._n_mels), np.float32)
            chunk[0, :valid] = self._feat_buf[:valid]
            self._feat_buf = self._feat_buf[valid:]
            out = self._step(chunk, np.asarray([valid], np.int32),
                             *self._carry)
            tokens, lengths = np.asarray(out[0]), np.asarray(out[1])
            self._carry = list(out[2:])
            emitted = tokens[0, :int(lengths[0])].tolist()
            new.extend(emitted[len(self._tokens):])
            self._tokens = emitted
        return new

    def feed(self, samples: np.ndarray) -> list:
        """Feed PCM; returns NEWLY emitted token ids (monotone)."""
        feats = self.frontend.feed(np.asarray(samples, np.float32))
        if len(feats):
            self._feat_buf = np.concatenate([self._feat_buf, feats])
        return self._run(final=False)

    def flush(self) -> list:
        tail = self.frontend.flush()
        if len(tail):
            self._feat_buf = np.concatenate([self._feat_buf, tail])
        return self._run(final=True)

    @property
    def tokens(self) -> list:
        return list(self._tokens)

    def text(self, compose_hangul: bool = True) -> str:
        t = self.tokenizer.decode(self._tokens, group_tokens=False)
        return compose_jamo(t) if compose_hangul else t


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser(
        description="Export a trained checkpoint as a self-contained "
                    "jax.export deployment bundle (serialized StableHLO "
                    "greedy-transcription programs + vocab).")
    ap.add_argument("--checkpoint_dir", required=True)
    ap.add_argument("--out_dir", required=True)
    ap.add_argument("--step", type=int, default=None)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--frame_buckets", type=int, nargs="+",
                    default=[256, 512, 1024])
    ap.add_argument("--input_kind", choices=["wav", "logmel"], default="wav")
    ap.add_argument("--decoder", choices=["greedy", "beam"], default="greedy")
    ap.add_argument("--beam_width", type=int, default=4)
    ap.add_argument("--streaming_chunk_frames", type=int, default=None,
                    help="also export a chunked streaming greedy program "
                         "(unidirectional encoders only)")
    ap.add_argument("--platforms", nargs="+", default=["cpu", "tpu"])
    ap.add_argument("--max_output_len", type=int, default=256)
    ap.add_argument("--vocab_path", default=None)
    args = ap.parse_args(argv)
    out = export_transcriber_from_checkpoint(
        args.checkpoint_dir, args.out_dir, step=args.step,
        vocab_path=args.vocab_path, batch=args.batch,
        frame_buckets=tuple(args.frame_buckets), input_kind=args.input_kind,
        decoder=args.decoder, beam_width=args.beam_width,
        streaming_chunk_frames=args.streaming_chunk_frames,
        platforms=tuple(args.platforms),
        max_output_len=args.max_output_len)
    print(f"exported bundle: {out}")


if __name__ == "__main__":
    main()
