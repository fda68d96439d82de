"""Streaming recognition: chunked log-mel frontend + carried encoder state +
resumable greedy decode.

The reference bills RNN-T as streaming-capable (``README.md:2``) but only
implements the decoder-side state threading (``transducer.py:119,135``,
``decoder.py:121-123``); the encoder always consumes the whole utterance.
Here streaming is a first-class path (SURVEY.md §5 long-context plan):

* ``StreamingFrontend`` — incremental STFT/mel with an overlap buffer; frames
  it emits are bit-identical to the offline frontend (same center/reflect
  padding, realized at stream start and at ``flush()``);
* ``StreamingRecognizer`` — feeds audio chunks through the frontend, a
  unidirectional encoder carrying its ``RNNState`` across chunks, and the
  resumable greedy carry; every piece is shape-stable so each chunk size
  compiles once.

Per-utterance mean-var normalization needs the whole utterance by definition;
streaming offers ``normalize="none"`` (default; match a model trained without
norm), ``"running"`` (causal running mean/var — converges to the offline
statistics as the stream lengthens), or ``"fixed"`` (calibrated corpus-level
mean/var, i.e. global CMVN).  Validated against the offline
``datamodule.py:87-90`` semantics on the waveform testbed by
``examples/streaming_norm_validation.py`` (numbers in BASELINE.md): for
models trained with per-utterance norm, use ``"running"``; ``"none"`` is
only correct for models trained without norm.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

import jax.numpy as jnp

from functools import partial

import jax

from rnntransducer_tpu.config import AudioConfig
from rnntransducer_tpu.decode.greedy import (
    greedy_decode_frames, init_greedy_carry,
)
from rnntransducer_tpu.frontend.melspec import WINDOWS, mel_filterbank
from rnntransducer_tpu.models.cells import RNNState
from rnntransducer_tpu.models.transducer import RNNTransducer
from rnntransducer_tpu.utils.precision import match_param_dtype, param_dtype


class StreamingFrontend:
    """Incremental log-mel. feed(samples) -> (n, n_mels) new frames;
    flush() -> trailing frames (with the right-side reflect pad)."""

    def __init__(self, cfg: AudioConfig, normalize: str = "none",
                 norm_mean: float = 0.0, norm_var: float = 1.0):
        assert normalize in ("none", "running", "fixed")
        self.cfg = cfg
        self.normalize = normalize
        # "fixed": calibrated (corpus-level) statistics — the global-CMVN
        # stand-in for the offline per-utterance norm (datamodule.py:87-90)
        self.norm_mean = norm_mean
        self.norm_var = norm_var
        self.window = WINDOWS[cfg.window](cfg.win_length)
        self.fb = mel_filterbank(cfg.n_fft // 2 + 1, cfg.n_mels,
                                 cfg.sample_rate)
        self.reset()

    def reset(self):
        self._buf = np.zeros((0,), np.float32)
        self._buf_start = 0        # absolute sample index of _buf[0]
        self._next_frame = 0
        self._total = 0
        self._sum = 0.0
        self._sumsq = 0.0

    def _normalize(self, x: np.ndarray) -> np.ndarray:
        if self.normalize == "none" or self._total == 0:
            return x
        if self.normalize == "fixed":
            mean, var = self.norm_mean, self.norm_var
        else:
            mean = self._sum / self._total
            var = max(self._sumsq / self._total - mean * mean, 0.0)
        return (x - mean) / np.sqrt(var + 1e-7)

    def _frames_between(self, first: int, last: int) -> np.ndarray:
        """Materialize frames [first, last) from the buffer, applying the
        stream-start reflect pad when windows reach before sample 0."""
        cfg = self.cfg
        pad = cfg.n_fft // 2
        if last <= first or self._total == 0:
            return np.zeros((0, cfg.n_mels), np.float32)
        out = np.zeros((last - first, cfg.n_fft), np.float32)
        for j, i in enumerate(range(first, last)):
            s = i * cfg.hop_length - pad
            idx = np.arange(s, s + cfg.n_fft)
            # reflect at stream start (offline pad_mode="reflect" parity)
            idx = np.where(idx < 0, -idx, idx)
            # reflect at stream end (only reachable from flush())
            over = idx - (self._total - 1)
            idx = np.where(over > 0, self._total - 1 - over, idx)
            # guard very short streams (total < pad): double reflection would
            # leave the buffer range — clamp instead of wrapping negatively
            idx = np.clip(idx, self._buf_start,
                          self._buf_start + len(self._buf) - 1)
            out[j] = self._buf[idx - self._buf_start]
        spec = np.fft.rfft(self._normalize(out) * self.window[None, :], axis=-1)
        power = (spec.real ** 2 + spec.imag ** 2).astype(np.float32)
        return np.log1p(power @ self.fb)

    def feed(self, samples: np.ndarray) -> np.ndarray:
        samples = np.asarray(samples, np.float32)
        self._buf = np.concatenate([self._buf, samples])
        self._total += len(samples)
        self._sum += float(samples.sum())
        self._sumsq += float((samples ** 2).sum())
        cfg = self.cfg
        pad = cfg.n_fft // 2
        # frames fully determined without right-side padding:
        # i*hop - pad + n_fft <= total
        last = (self._total - cfg.n_fft + pad) // cfg.hop_length + 1
        last = max(last, self._next_frame)
        feats = self._frames_between(self._next_frame, last)
        self._next_frame = last
        # trim consumed samples; future windows reach back to
        # next_frame*hop - pad, and flush()'s end-reflection reaches back to
        # (final) total-1-pad, which is >= the CURRENT total-1-pad — keep the
        # earlier of the two (with hop >= n_fft - pad the window constraint
        # alone would trim samples the end mirror still needs)
        keep_from = max(0, min(self._next_frame * cfg.hop_length - pad,
                               self._total - 1 - pad))
        if keep_from > self._buf_start:
            self._buf = self._buf[keep_from - self._buf_start:]
            self._buf_start = keep_from
        return feats

    def flush(self) -> np.ndarray:
        """Emit the final frames exactly as the offline frontend would:
        total // hop + 1 frames overall."""
        last = self._total // self.cfg.hop_length + 1
        feats = self._frames_between(self._next_frame, max(last, self._next_frame))
        self._next_frame = max(last, self._next_frame)
        return feats


def _zero_encoder_state(model: RNNTransducer, variables,
                        batch: int = 1) -> RNNState:
    cfg = model.cfg.transnet
    # state dtype must match the params' compute dtype: the carried state is
    # re-fed to the next chunk's program, whose carry dtype is fixed at
    # trace time (utils/precision.py)
    dt = param_dtype(variables)
    if cfg.arch == "conformer":
        # chunked-causal cache: per-block attention window (+validity
        # channel) and conv tail (models/conformer.py::zero_state)
        ctx = cfg.attention_left_chunks * cfg.attention_chunk
        return RNNState(
            jnp.zeros((cfg.num_layers, ctx, batch, cfg.hidden_size + 1), dt),
            jnp.zeros((cfg.num_layers, cfg.conv_kernel_size - 1, batch,
                       cfg.hidden_size), dt))
    d = 2 if cfg.bidirectional else 1
    h = jnp.zeros((cfg.num_layers, d, batch, cfg.hidden_size), dt)
    c = h if cfg.rnn_type.lower() == "lstm" else None
    return RNNState(h, c)


@partial(jax.jit, static_argnames=("model",))
def _encode_chunk(model: RNNTransducer, variables, chunk, n_valid, state):
    """Jitted chunked-encoder step (un-jitted apply dispatches op-by-op —
    catastrophic over a remote-TPU tunnel)."""
    chunk = match_param_dtype(variables, chunk)
    return model.apply(variables, chunk, n_valid, state, method=model.encode)


class StreamingRecognizer:
    """Chunked streaming ASR session over a unidirectional-encoder model.

    decoder="greedy": feed() returns newly emitted token ids (monotone).
    decoder="beam": feed() returns [] (fetching the ranked best every chunk
    would cost one device->host round trip each); poll the current best via
    the .tokens property at whatever cadence the UI needs. flush() returns
    the final best hypothesis.

    LM / hotword shallow fusion: pass ``lm`` (decode/ngram_lm.NGramLM) and/or
    ``hotwords`` with ``decoder="beam"`` and a ``tokenizer``.  Fusion runs the
    host A/B-set decoder (decode/beam.py — the same search the offline
    ``--decoder beam`` path uses, made resumable over encoder chunks), so
    streaming beam+LM output equals offline beam+LM output by construction.
    The reference only fuses offline (``transducer.py:147-213``); here the
    capability extends to the streaming surface.

    Device-resident fusion: pass ``device_lm``
    (decode/device_lm.DeviceCharLM) with ``decoder="beam"`` instead — the
    grapheme-level LM table rides inside the compiled beam frame scan
    (decode/beam_batched.py), so fusion costs zero host round trips per
    chunk.  Mutually exclusive with the host ``lm``/``hotwords`` path
    (which is word-level and runs the search on host).
    """

    def __init__(self, model: RNNTransducer, variables, audio_cfg: AudioConfig,
                 blank_id: int = 0, chunk_frames: int = 64,
                 max_symbols: int = 3, max_output_len: int = 512,
                 normalize: str = "none", decoder: str = "greedy",
                 beam_width: int = 4, norm_mean: float = 0.0,
                 norm_var: float = 1.0, lm=None,
                 hotwords=None, hotword_weight: Optional[float] = None,
                 tokenizer=None, improved: bool = True,
                 state_beam: float = 4.6, expand_beam: float = 2.3,
                 device_lm=None, precision: Optional[str] = None):
        if model.cfg.transnet.bidirectional:
            raise ValueError(
                "streaming requires a unidirectional encoder "
                "(transnet.bidirectional=false)")
        stride = model.cfg.transnet.time_reduction_stride
        if stride > 1 and chunk_frames % stride:
            raise ValueError(
                f"chunk_frames ({chunk_frames}) must be a multiple of "
                f"time_reduction_stride ({stride}) so reduced groups align "
                "across chunks")
        tn = model.cfg.transnet
        if tn.arch == "conformer":
            want = tn.attention_chunk * stride
            if chunk_frames != want:
                raise ValueError(
                    f"the streaming Conformer consumes exactly one "
                    f"attention chunk per step: chunk_frames must be "
                    f"attention_chunk*stride = {want}, got {chunk_frames}")
        if decoder not in ("greedy", "beam"):
            raise ValueError(f"unknown streaming decoder: {decoder}")
        fused = lm is not None or bool(hotwords)
        if fused and decoder != "beam":
            raise ValueError("LM/hotword fusion requires decoder='beam'")
        if device_lm is not None:
            if decoder != "beam":
                raise ValueError("device_lm requires decoder='beam'")
            if fused:
                raise ValueError(
                    "device_lm (on-device char fusion) and lm/hotwords "
                    "(host word-level fusion) are mutually exclusive")
        self.model = model
        # precision='bf16': stream the weights from HBM at half width every
        # tick; None keeps the caller's dtype (see utils/precision.py)
        if precision is not None:
            from rnntransducer_tpu.utils.precision import (cast_float_leaves,
                                                           decode_dtype)
            variables = cast_float_leaves(variables, decode_dtype(precision))
        self.variables = variables
        self.blank_id = blank_id
        self.chunk_frames = chunk_frames
        self.max_symbols = max_symbols
        self.decoder = decoder
        self.beam_width = beam_width
        self.frontend = StreamingFrontend(audio_cfg, normalize,
                                          norm_mean=norm_mean,
                                          norm_var=norm_var)
        self._feat_buf = np.zeros((0, audio_cfg.n_mels), np.float32)
        self._enc_state: Optional[RNNState] = None
        self._host_beam = None
        self._final_tokens: Optional[List[int]] = None
        self._lm_table = (jnp.asarray(device_lm.table)
                          if device_lm is not None else None)
        self._lm_weight = device_lm.weight if device_lm is not None else 0.0
        if fused:
            from rnntransducer_tpu.decode.beam import BeamSearchDecoder
            from rnntransducer_tpu.decode.hotwords import (
                DEFAULT_HOTWORD_WEIGHT,
            )
            self._host_beam = BeamSearchDecoder(
                model, variables, blank_id=blank_id, tokenizer=tokenizer,
                beam_width=beam_width, improved=improved,
                state_beam=state_beam, expand_beam=expand_beam, lm=lm,
                hotwords=hotwords,
                hotword_weight=(DEFAULT_HOTWORD_WEIGHT if hotword_weight
                                is None else hotword_weight))
            self._carry = self._host_beam.open_session()
        elif decoder == "beam":
            from rnntransducer_tpu.decode.beam_batched import init_beam_carry
            self._carry = init_beam_carry(
                model, variables, 1, beam_width, blank_id, max_output_len,
                lm_context=device_lm.context if device_lm is not None else 0)
        else:
            self._carry = init_greedy_carry(
                model, variables, 1, blank_id, max_output_len)
        self._emitted = 0

    # ------------------------------------------------------------------
    def _run_chunks(self, final: bool) -> List[int]:
        new_tokens: List[int] = []
        while len(self._feat_buf) >= self.chunk_frames or (
                final and len(self._feat_buf) > 0):
            chunk = self._feat_buf[:self.chunk_frames]
            self._feat_buf = self._feat_buf[self.chunk_frames:]
            n_valid = len(chunk)
            if n_valid < self.chunk_frames:  # final partial chunk: pad
                chunk = np.pad(chunk, ((0, self.chunk_frames - n_valid), (0, 0)))
            if self._enc_state is None:
                self._enc_state = _zero_encoder_state(self.model,
                                                      self.variables)
            enc, self._enc_state = _encode_chunk(
                self.model, self.variables, jnp.asarray(chunk[None]),
                jnp.array([n_valid], jnp.int32), self._enc_state)
            # time reduction: the encoder emits ceil(n/stride) frames
            n_enc = int(self.model.cfg.transnet.output_lengths(n_valid))
            if self._host_beam is not None:
                # fused beam: the search itself is host-side (A/B sets, LM
                # caches); fetch the chunk's valid frames in one transfer
                enc_host = np.asarray(enc[0, :n_enc])
                self._host_beam.decode_frames(self._carry, enc_host)
            elif self.decoder == "beam":
                from rnntransducer_tpu.decode.beam_batched import (
                    beam_decode_frames,
                )
                self._carry = beam_decode_frames(
                    self.model, self.variables, enc, jnp.array([n_enc]),
                    self._carry, self.blank_id, self.max_symbols,
                    lm_table=self._lm_table, lm_weight=self._lm_weight)
                # partials are available on demand via .tokens — fetching the
                # ranked best every chunk would cost one device->host round
                # trip per chunk; the final fetch happens after the drain loop
            else:
                self._carry = greedy_decode_frames(
                    self.model, self.variables, enc, jnp.array([n_enc]),
                    self._carry, self.blank_id, self.max_symbols)
                toks, total = jax.device_get(
                    (self._carry.tokens[0], self._carry.lengths[0]))
                total = int(total)
                new_tokens.extend(int(t) for t in toks[self._emitted:total])
                self._emitted = total
        if final and self.decoder == "beam":
            if self._host_beam is not None and self._final_tokens is None:
                # settle EOS LM scoring once; .tokens serves it afterwards
                self._final_tokens = self._host_beam.finalize(self._carry)[0]
            new_tokens = self.tokens
        return new_tokens

    def feed(self, samples: np.ndarray) -> List[int]:
        """Feed PCM samples; returns newly emitted token ids."""
        feats = self.frontend.feed(samples)
        if len(feats):
            self._feat_buf = np.concatenate([self._feat_buf, feats])
        return self._run_chunks(final=False)

    def flush(self) -> List[int]:
        """End of stream: drain remaining frames (incl. right reflect pad)."""
        feats = self.frontend.flush()
        if len(feats):
            self._feat_buf = np.concatenate([self._feat_buf, feats])
        return self._run_chunks(final=True)

    @property
    def tokens(self) -> List[int]:
        if self._host_beam is not None:
            if self._final_tokens is not None:
                return list(self._final_tokens)
            return self._host_beam.current_best(self._carry)
        if self.decoder == "beam":
            from rnntransducer_tpu.decode.beam_batched import best_hyp
            # one jitted call + one combined transfer per poll
            best, n = jax.device_get(best_hyp(self._carry))
            return [int(t) for t in best[:int(n)]]
        toks, n = jax.device_get((self._carry.tokens[0],
                                  self._carry.lengths[0]))
        return [int(t) for t in toks[:int(n)]]

    @property
    def timestamps(self) -> List[float]:
        """Per-token emission times in seconds (greedy sessions only —
        beam hypotheses can rewrite, so a stable per-token time is not
        defined until finalization).  Parallel to ``.tokens``."""
        if self.decoder != "greedy":
            raise ValueError("timestamps are available for greedy sessions")
        times, n = jax.device_get((self._carry.times[0],
                                   self._carry.lengths[0]))
        cfg = self.model.cfg.transnet
        sec = (cfg.time_reduction_stride *
               self.frontend.cfg.window_stride_sec)
        return [float(t) * sec for t in times[:int(n)]]
