"""High-level recognition API for serving.

The reference's inference surface is a script (``inference.py:13-66``); for a
framework, serving wants an object: load once, transcribe many, stream.

    rec = Recognizer.from_checkpoint("ckpts")          # best step by val_cer
    text = rec.transcribe("utt.wav")
    texts = rec.transcribe_batch([wav1, wav2])          # device batched beam
    with_session = rec.stream()                         # StreamingRecognizer

Deployment artifacts: ``export_params`` writes a params-only msgpack bundle
(no optimizer moments — a third of the checkpoint size) next to the config;
``Recognizer.from_params`` loads it without touching orbax.
"""

from __future__ import annotations

import json
import os
from typing import List, Optional, Sequence, Tuple, Union

import numpy as np

import jax
import jax.numpy as jnp

from rnntransducer_tpu.config import Config
from rnntransducer_tpu.tokenizer import (GraphemeTokenizer, compose_jamo,
                                          load_tokenizer)


def _load_tokenizer(cfg: Config, vocab_path: Optional[str]):
    """Grapheme OR subword (BPE), sniffed from the file format."""
    return load_tokenizer(vocab_path or cfg.vocab_path,
                          cfg.model.jointnet.num_classes)


def export_params(checkpoint_dir: str, out_dir: str,
                  step: Optional[int] = None) -> str:
    """Write a deployment bundle: params.msgpack + config.json."""
    from flax import serialization
    from rnntransducer_tpu.train import CheckpointManager, TrainState, load_config

    cfg = load_config(checkpoint_dir)
    mgr = CheckpointManager(checkpoint_dir, save_top_k=cfg.train.save_top_k)
    step = step if step is not None else mgr.best_or_latest_step()
    template = jax.eval_shape(lambda: TrainState.create(cfg))
    state = mgr.restore(template, step=step)
    mgr.close()

    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "params.msgpack"), "wb") as f:
        f.write(serialization.to_bytes(
            jax.tree.map(np.asarray, state.params)))
    cfg.to_json(os.path.join(out_dir, "config.json"))
    with open(os.path.join(out_dir, "export.json"), "w") as f:
        json.dump({"step": int(step)}, f)
    return out_dir


class Recognizer:
    def __init__(self, cfg: Config, params, tokenizer: GraphemeTokenizer,
                 decoder: str = "beam_batched",
                 beam_width: Optional[int] = None,
                 max_output_len: int = 512, compose_hangul: bool = True,
                 lm_path: Optional[str] = None,
                 lm_weight: Optional[float] = None,
                 hotwords: Optional[Sequence[str]] = None,
                 hotword_weight: Optional[float] = None,
                 device_lm_path: Optional[str] = None,
                 device_lm_weight: float = 0.3,
                 device_lm_order: Optional[int] = 3,
                 precision: Optional[str] = None):
        from rnntransducer_tpu.frontend import LogMelFrontend
        from rnntransducer_tpu.train import build_model

        self.cfg = cfg
        self.model = build_model(cfg)
        # precision: 'bf16' halves the HBM bytes every decode/streaming tick
        # reads (small-batch decode is bandwidth-bound); None keeps the
        # checkpoint's dtype.  Beam scores stay fp32 (utils/precision.py).
        if precision is not None:
            from rnntransducer_tpu.utils.precision import (cast_float_leaves,
                                                           decode_dtype)
            params = cast_float_leaves(params, decode_dtype(precision))
        self.variables = {"params": params}
        self.tokenizer = tokenizer
        self.decoder = decoder
        # default comes from the config persisted with the checkpoint
        self.beam_width = (beam_width if beam_width is not None
                           else cfg.inference.beam_width)
        self.max_output_len = max_output_len
        self.compose_hangul = compose_hangul
        self.frontend = LogMelFrontend(cfg.data.audio)
        # LM / hotword shallow fusion (reference: transducer.py:147-213,
        # offline only there; here it also reaches stream()): fused decodes
        # route through the host A/B-set beam (decode/beam.py)
        self.lm = None
        if lm_path:
            from rnntransducer_tpu.decode.ngram_lm import NGramLM
            self.lm = NGramLM.load(lm_path, weight=lm_weight)
        self.hotwords = list(hotwords) if hotwords else None
        self.hotword_weight = hotword_weight
        if (self.lm is not None or self.hotwords) and decoder == "greedy":
            raise ValueError("LM/hotword fusion requires a beam decoder")
        # device-resident char-LM fusion (decode/device_lm.py): grapheme
        # n-gram table gathered INSIDE the compiled beam scan — reaches
        # every device-beam surface (transcribe_batch, stream, batched
        # serving lanes) with zero per-chunk host work
        self.device_lm = None
        if device_lm_path:
            if decoder == "greedy":
                raise ValueError("device_lm requires a beam decoder")
            if self.fused:
                raise ValueError(
                    "device_lm (on-device char fusion) and lm_path/hotwords "
                    "(host word-level fusion) are mutually exclusive")
            from rnntransducer_tpu.decode.device_lm import DeviceCharLM
            self.device_lm = DeviceCharLM.load(
                device_lm_path, tokenizer, weight=device_lm_weight,
                max_order=device_lm_order)

    @property
    def fused(self) -> bool:
        return self.lm is not None or bool(self.hotwords)

    # -- constructors --------------------------------------------------
    @classmethod
    def from_checkpoint(cls, checkpoint_dir: str, step: Optional[int] = None,
                        vocab_path: Optional[str] = None,
                        average_k: Optional[int] = None,
                        use_ema: bool = False, **kw) -> "Recognizer":
        """``average_k``: decode with the element-wise mean of the best k
        retained checkpoints' params (SWA-style checkpoint averaging — see
        ``train.average_checkpoint_params``) instead of a single step.
        ``use_ema``: decode with the Polyak-averaged shadow params the run
        maintained (requires the run to have set ``train.ema_decay > 0``)."""
        from rnntransducer_tpu.train import load_config, load_decode_params

        cfg = load_config(checkpoint_dir)
        params, _ = load_decode_params(checkpoint_dir, cfg, step=step,
                                       average_k=average_k, use_ema=use_ema)
        return cls(cfg, params, _load_tokenizer(cfg, vocab_path), **kw)

    @classmethod
    def from_params(cls, export_dir: str, vocab_path: Optional[str] = None,
                    **kw) -> "Recognizer":
        from flax import serialization
        from rnntransducer_tpu.train import TrainState

        cfg = Config.from_json(os.path.join(export_dir, "config.json"))
        template = jax.eval_shape(lambda: TrainState.create(cfg)).params
        with open(os.path.join(export_dir, "params.msgpack"), "rb") as f:
            params = serialization.from_bytes(template, f.read())
        params = jax.tree.map(jnp.asarray, params)
        return cls(cfg, params, _load_tokenizer(cfg, vocab_path), **kw)

    # -- inference ------------------------------------------------------
    def _to_wave(self, w: Union[str, np.ndarray]) -> np.ndarray:
        if isinstance(w, str):
            from rnntransducer_tpu.utils.audio_io import read_wav
            return read_wav(w, self.cfg.data.audio.sample_rate)
        return np.asarray(w, np.float32)

    def _decode_text(self, ids: Sequence[int]) -> str:
        text = self.tokenizer.decode(ids, group_tokens=False)
        return compose_jamo(text) if self.compose_hangul else text

    def transcribe(self, wav: Union[str, np.ndarray]) -> str:
        return self.transcribe_batch([wav])[0]

    def transcribe_batch(self, wavs: Sequence[Union[str, np.ndarray]]
                         ) -> List[str]:
        from rnntransducer_tpu.decode import batched_beam_decode, greedy_decode

        waves = [self._to_wave(w) for w in wavs]
        S = max(len(w) for w in waves)
        batch = np.zeros((len(waves), S), np.float32)
        lengths = np.zeros((len(waves),), np.int32)
        for i, w in enumerate(waves):
            batch[i, :len(w)] = w
            lengths[i] = len(w)
        feats, feat_lengths = self.frontend(jnp.asarray(batch),
                                            jnp.asarray(lengths))
        blank = self.tokenizer.blank_token_id
        if self.fused:
            from rnntransducer_tpu.decode.beam import BeamSearchDecoder
            from rnntransducer_tpu.decode.hotwords import (
                DEFAULT_HOTWORD_WEIGHT,
            )
            dec = BeamSearchDecoder(
                self.model, self.variables, blank_id=blank,
                tokenizer=self.tokenizer, beam_width=self.beam_width,
                improved=self.cfg.inference.improved,
                state_beam=self.cfg.inference.state_beam,
                expand_beam=self.cfg.inference.expand_beam, lm=self.lm,
                hotwords=self.hotwords,
                hotword_weight=(DEFAULT_HOTWORD_WEIGHT
                                if self.hotword_weight is None
                                else self.hotword_weight))
            return [self._decode_text(
                        dec.decode(feats[i:i + 1], feat_lengths[i:i + 1])[0])
                    for i in range(len(waves))]
        if self.decoder == "greedy" or self.beam_width <= 1:
            toks, lens = greedy_decode(
                self.model, self.variables, feats, feat_lengths,
                blank_id=blank,
                max_symbols=self.cfg.train.greedy_max_symbols,
                max_output_len=self.max_output_len)
            toks, lens = np.asarray(toks), np.asarray(lens)
            return [self._decode_text(toks[i, :lens[i]])
                    for i in range(len(waves))]
        toks, lens, _ = batched_beam_decode(
            self.model, self.variables, feats, feat_lengths, blank_id=blank,
            beam_width=self.beam_width,
            max_symbols=self.cfg.train.greedy_max_symbols,
            max_output_len=self.max_output_len, device_lm=self.device_lm)
        toks, lens = np.asarray(toks), np.asarray(lens)
        return [self._decode_text(toks[i, 0, :lens[i, 0]])
                for i in range(len(waves))]

    def transcribe_with_timestamps(self, wav: Union[str, np.ndarray]
                                   ) -> Tuple[str, List[Tuple[str, float]]]:
        """Greedy decode with per-token emission times: returns
        ``(text, [(token_text, start_sec), ...])``.  Times are the encoder
        frame that emitted each token, converted to seconds
        (frame * time_reduction_stride * hop); the reference's decoders
        expose no timing at all."""
        from rnntransducer_tpu.decode.greedy import greedy_decode_with_times

        wave = self._to_wave(wav)
        feats, feat_lengths = self.frontend(
            jnp.asarray(wave[None]), jnp.asarray([len(wave)], jnp.int32))
        blank = self.tokenizer.blank_token_id
        toks, lens, times = greedy_decode_with_times(
            self.model, self.variables, feats, feat_lengths, blank_id=blank,
            max_symbols=self.cfg.train.greedy_max_symbols,
            max_output_len=self.max_output_len)
        n = int(lens[0])
        ids = [int(t) for t in np.asarray(toks)[0, :n]]
        sec = (self.cfg.model.transnet.time_reduction_stride *
               self.cfg.data.audio.window_stride_sec)
        stamps = [(self.tokenizer.decode([i]), float(f) * sec)
                  for i, f in zip(ids, np.asarray(times)[0, :n])]
        return self._decode_text(ids), stamps

    def stream(self, chunk_frames: Optional[int] = None, **kw):
        """New streaming session (requires a unidirectional encoder).

        When the model was trained with per-utterance normalization
        (cfg.data.audio.normalize), the session defaults to the causal
        "running" normalization — an approximation of the offline statistics
        (exact per-utterance norm needs the whole utterance); pass
        normalize="none"/"running"/"fixed" (with norm_mean/norm_var corpus
        statistics) to override.  Measured on the waveform testbed
        (examples/streaming_norm_validation.py, numbers in BASELINE.md):
        "running" tracks offline decoding closely; "none" on a norm-trained
        model pays a real CER penalty.
        """
        from rnntransducer_tpu.decode.streaming import StreamingRecognizer
        kw.setdefault("normalize",
                      "running" if self.cfg.data.audio.normalize else "none")
        if self.fused:
            kw.setdefault("lm", self.lm)
            kw.setdefault("hotwords", self.hotwords)
            kw.setdefault("hotword_weight", self.hotword_weight)
            kw.setdefault("tokenizer", self.tokenizer)
            kw.setdefault("improved", self.cfg.inference.improved)
            kw.setdefault("state_beam", self.cfg.inference.state_beam)
            kw.setdefault("expand_beam", self.cfg.inference.expand_beam)
        elif self.device_lm is not None and self.decoder != "greedy":
            kw.setdefault("device_lm", self.device_lm)
        kw.setdefault("max_output_len", self.max_output_len)
        return StreamingRecognizer(
            self.model, self.variables, self.cfg.data.audio,
            blank_id=self.tokenizer.blank_token_id,
            chunk_frames=chunk_frames or self.cfg.inference.streaming_chunk_frames,
            max_symbols=self.cfg.train.greedy_max_symbols,
            decoder="beam" if self.decoder != "greedy" else "greedy",
            beam_width=self.beam_width, **kw)
