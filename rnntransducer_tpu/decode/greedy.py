"""Batched greedy RNN-T decoding as a stateful scan.

Capability-equivalent of the reference's ``recognize_greedy``
(``networks/transducer.py:95-145``), which loops per-utterance in Python with
a per-frame ``while u < max_iters`` symbol loop.  Here the whole batch decodes
in one compiled ``lax.scan`` over frames with a static bounded symbol loop:

* same emission rule: argmax of the joint; non-blank tokens are fed back into
  the prediction net (duplicates included), but a token equal to the last
  *appended* token is not appended (``transducer.py:129-132``);
* blank (or an exhausted symbol budget) advances to the next frame
  (``transducer.py:137-139``);
* unlike the reference (which iterates padded frames, ``transducer.py:121``),
  frames beyond each utterance's true length are skipped.

Static shapes: outputs land in a fixed (B, max_output_len) buffer + lengths.
The decode carry (prediction-net state + output buffer) is an explicit value,
so the same compiled function serves both offline decoding and chunked
streaming (decode/streaming.py) — the carry IS the streaming API.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from rnntransducer_tpu.models.cells import RNNState
from rnntransducer_tpu.models.transducer import RNNTransducer
from rnntransducer_tpu.utils.precision import match_param_dtype


class GreedyCarry(NamedTuple):
    """Resumable greedy-decode state across frame chunks."""
    dec_out: jnp.ndarray      # (B, Dd) last prediction-net output
    state: RNNState           # prediction-net recurrent state
    last_appended: jnp.ndarray  # (B,) int32
    tokens: jnp.ndarray       # (B, max_output_len) int32
    lengths: jnp.ndarray      # (B,) int32 emitted so far
    # per-token emission frame (absolute ENCODER-frame index across chunks;
    # multiply by time_reduction_stride * hop to get seconds) + the total
    # valid frames consumed so far (the cross-chunk offset)
    times: jnp.ndarray        # (B, max_output_len) int32
    frames_done: jnp.ndarray  # (B,) int32


@partial(jax.jit, static_argnames=("model", "batch", "blank_id",
                                   "max_output_len"))
def init_greedy_carry(model: RNNTransducer, variables, batch: int,
                      blank_id: int = 0,
                      max_output_len: int = 256) -> GreedyCarry:
    blank_tokens = jnp.full((batch,), blank_id, jnp.int32)
    dec_out0, state0 = model.apply(variables, blank_tokens, None,
                                   method=model.predict_step)
    return GreedyCarry(
        dec_out=dec_out0, state=state0, last_appended=blank_tokens,
        tokens=jnp.full((batch, max_output_len), blank_id, jnp.int32),
        lengths=jnp.zeros((batch,), jnp.int32),
        times=jnp.zeros((batch, max_output_len), jnp.int32),
        frames_done=jnp.zeros((batch,), jnp.int32))


@partial(jax.jit, static_argnames=("model", "blank_id", "max_symbols"))
def greedy_decode_frames(model: RNNTransducer, variables, enc, enc_lengths,
                         carry: GreedyCarry, blank_id: int = 0,
                         max_symbols: int = 3) -> GreedyCarry:
    """Consume encoder frames enc (B, T, De) (valid up to enc_lengths) and
    return the advanced carry. Compiled once per (B, T) shape."""
    B = enc.shape[0]
    max_output_len = carry.tokens.shape[1]
    enc_t = jnp.swapaxes(enc, 0, 1)  # (T, B, D)
    blank_tokens = jnp.full((B,), blank_id, jnp.int32)

    def frame_step(c: GreedyCarry, inp):
        enc_i, t = inp
        (dec_out, state, last_app, out_buf, out_len,
         time_buf, frames_done) = c
        abs_t = frames_done + t  # absolute encoder-frame index
        frame_valid = t < enc_lengths.astype(jnp.int32)
        emitting = frame_valid

        for _ in range(max_symbols):
            logits = model.apply(variables, enc_i, dec_out,
                                 method=model.joint_step)
            tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            advance = emitting & (tok != blank_id)
            do_append = advance & (tok != last_app) & (out_len < max_output_len)
            idx = jnp.minimum(out_len, max_output_len - 1)
            cur = out_buf[jnp.arange(B), idx]
            out_buf = out_buf.at[jnp.arange(B), idx].set(
                jnp.where(do_append, tok, cur))
            cur_t = time_buf[jnp.arange(B), idx]
            time_buf = time_buf.at[jnp.arange(B), idx].set(
                jnp.where(do_append, abs_t, cur_t))
            out_len = out_len + do_append.astype(jnp.int32)
            last_app = jnp.where(do_append, tok, last_app)
            feed_tok = jnp.where(advance, tok, blank_tokens)
            new_dec_out, new_state = model.apply(variables, feed_tok, state,
                                                 method=model.predict_step)
            m = advance[:, None]
            dec_out = jnp.where(m, new_dec_out, dec_out)
            state = jax.tree.map(
                lambda n, o: jnp.where(
                    advance.reshape((1,) * (n.ndim - 2) + (B, 1)), n, o),
                new_state, state)
            emitting = advance

        return GreedyCarry(dec_out, state, last_app, out_buf, out_len,
                           time_buf, frames_done), None

    ts = jnp.arange(enc.shape[1], dtype=jnp.int32)
    carry, _ = jax.lax.scan(frame_step, carry, (enc_t, ts))
    # advance the cross-chunk frame offset by this call's valid frames
    return carry._replace(
        frames_done=carry.frames_done + enc_lengths.astype(jnp.int32))


@partial(jax.jit, static_argnames=("model", "blank_id", "max_symbols",
                                   "max_output_len"))
def greedy_decode(model: RNNTransducer, variables, feats, feat_lengths,
                  blank_id: int = 0, max_symbols: int = 3,
                  max_output_len: int = 256) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Offline path: encode feats (B, T, n_mels) then run the frame scan.
    Returns (tokens (B, max_output_len) padded with blank_id, lengths (B,)).

    max_symbols mirrors the reference's ``max_iters=3`` (``model.py:76``).
    """
    feats = match_param_dtype(variables, feats)
    enc, _ = model.apply(variables, feats, feat_lengths, method=model.encode)
    enc_lengths = model.cfg.transnet.output_lengths(feat_lengths)
    carry = init_greedy_carry(model, variables, feats.shape[0], blank_id,
                              max_output_len)
    carry = greedy_decode_frames(model, variables, enc, enc_lengths, carry,
                                 blank_id, max_symbols)
    return carry.tokens, carry.lengths


@partial(jax.jit, static_argnames=("model", "blank_id", "max_symbols",
                                   "max_output_len"))
def greedy_decode_with_times(model: RNNTransducer, variables, feats,
                             feat_lengths, blank_id: int = 0,
                             max_symbols: int = 3, max_output_len: int = 256
                             ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """greedy_decode, additionally returning per-token emission frames
    ``times`` (B, max_output_len) int32 — ENCODER-frame indices (multiply by
    ``cfg.transnet.time_reduction_stride * hop_sec`` for seconds).  The
    reference's decoders carry no timing information at all
    (``networks/transducer.py:95-145``)."""
    feats = match_param_dtype(variables, feats)
    enc, _ = model.apply(variables, feats, feat_lengths, method=model.encode)
    enc_lengths = model.cfg.transnet.output_lengths(feat_lengths)
    carry = init_greedy_carry(model, variables, feats.shape[0], blank_id,
                              max_output_len)
    carry = greedy_decode_frames(model, variables, enc, enc_lengths, carry,
                                 blank_id, max_symbols)
    return carry.tokens, carry.lengths, carry.times


@partial(jax.jit, static_argnames=("model", "blank_id", "max_symbols",
                                   "max_output_len"))
def greedy_decode_label_looping(model: RNNTransducer, variables, feats,
                                feat_lengths, blank_id: int = 0,
                                max_symbols: int = 3,
                                max_output_len: int = 256
                                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Label-looping greedy decode (after arXiv:2406.03791): a while_loop
    over *events* rather than a scan over frames.

    The frame scan evaluates the joint + prediction net ``max_symbols`` times
    per frame regardless of emissions; here each iteration advances every
    utterance by exactly one event — a blank (frame pointer +1) or a label
    (prediction-net step) — so the loop runs ~T + U iterations of ONE joint +
    ONE prednet step instead of T iterations of ``max_symbols`` each (~2.7x
    fewer evaluations at the default budget), and exits as soon as the whole
    batch is done. Emission semantics are identical to greedy_decode
    (parity-tested); inference-only (while_loop is not reverse-differentiable).

    Measured on TPU v5e (16 x 5 s, 6L uni-LSTM 1024): 62 ms vs the frame
    scan's 49 ms — on TPU the while_loop's per-iteration overhead and the
    dynamic enc gather outweigh the saved evaluations (the technique's wins
    are reported on GPUs with CUDA graphs), so the frame scan remains the
    default; this path is kept for very sparse-emission workloads where
    T >> max_symbols x emissions.
    """
    B, T = feats.shape[0], feats.shape[1]
    feats = match_param_dtype(variables, feats)
    enc, _ = model.apply(variables, feats, feat_lengths, method=model.encode)
    lengths = model.cfg.transnet.output_lengths(
        feat_lengths).astype(jnp.int32)
    blank_tokens = jnp.full((B,), blank_id, jnp.int32)
    dec_out0, state0 = model.apply(variables, blank_tokens, None,
                                   method=model.predict_step)

    def cond(carry):
        t_ptr = carry[0]
        return jnp.any(t_ptr < lengths)

    def body(carry):
        (t_ptr, syms, dec_out, state, last_app, out_buf, out_len) = carry
        active = t_ptr < lengths
        enc_t = jnp.take_along_axis(
            enc, jnp.clip(t_ptr, 0, T - 1)[:, None, None], axis=1)[:, 0]
        logits = model.apply(variables, enc_t, dec_out,
                             method=model.joint_step)
        tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        emit = active & (tok != blank_id) & (syms < max_symbols)

        # blank / budget-exhausted: advance the frame pointer
        t_ptr = jnp.where(active & ~emit, t_ptr + 1, t_ptr)
        syms = jnp.where(emit, syms + 1, jnp.where(active, 0, syms))

        # label: append (with dedup) + prednet step
        do_append = emit & (tok != last_app) & (out_len < max_output_len)
        idx = jnp.minimum(out_len, max_output_len - 1)
        cur = out_buf[jnp.arange(B), idx]
        out_buf = out_buf.at[jnp.arange(B), idx].set(
            jnp.where(do_append, tok, cur))
        out_len = out_len + do_append.astype(jnp.int32)
        last_app = jnp.where(do_append, tok, last_app)

        feed_tok = jnp.where(emit, tok, blank_tokens)
        new_dec_out, new_state = model.apply(variables, feed_tok, state,
                                             method=model.predict_step)
        m = emit[:, None]
        dec_out = jnp.where(m, new_dec_out, dec_out)
        state = jax.tree.map(
            lambda n, o: jnp.where(
                emit.reshape((1,) * (n.ndim - 2) + (B, 1)), n, o),
            new_state, state)
        return (t_ptr, syms, dec_out, state, last_app, out_buf, out_len)

    out_buf = jnp.full((B, max_output_len), blank_id, jnp.int32)
    init = (jnp.zeros((B,), jnp.int32), jnp.zeros((B,), jnp.int32),
            dec_out0, state0, blank_tokens, out_buf,
            jnp.zeros((B,), jnp.int32))
    (_, _, _, _, _, out_buf, out_len) = jax.lax.while_loop(cond, body, init)
    return out_buf, out_len
