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
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from rnntransducer_tpu.models.transducer import RNNTransducer


@partial(jax.jit, static_argnames=("model", "max_symbols", "max_output_len"))
def greedy_decode(model: RNNTransducer, variables, feats, feat_lengths,
                  blank_id: int = 0, max_symbols: int = 3,
                  max_output_len: int = 256) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """feats: (B, T, n_mels); returns (tokens (B, max_output_len) int32 padded
    with blank_id, lengths (B,) int32).

    max_symbols mirrors the reference's ``max_iters=3`` (``model.py:76``).
    """
    B = feats.shape[0]
    enc, _ = model.apply(variables, feats, feat_lengths, method=model.encode)
    enc = jnp.swapaxes(enc, 0, 1)  # (T, B, D)

    blank_tokens = jnp.full((B,), blank_id, jnp.int32)
    dec_out0, state0 = model.apply(variables, blank_tokens, None,
                                   method=model.predict_step)

    def frame_step(carry, inp):
        dec_out, state, last_app, out_buf, out_len = carry
        enc_t, t = inp
        frame_valid = t < feat_lengths.astype(jnp.int32)
        emitting = frame_valid  # per-sample: still expanding this frame

        for _ in range(max_symbols):
            logits = model.apply(variables, enc_t, dec_out,
                                 method=model.joint_step)
            tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            advance = emitting & (tok != blank_id)
            # append unless equal to last appended token (dedup)
            do_append = advance & (tok != last_app) & (out_len < max_output_len)
            idx = jnp.minimum(out_len, max_output_len - 1)
            cur = out_buf[jnp.arange(B), idx]
            out_buf = out_buf.at[jnp.arange(B), idx].set(
                jnp.where(do_append, tok, cur))
            out_len = out_len + do_append.astype(jnp.int32)
            last_app = jnp.where(do_append, tok, last_app)
            # feed every non-blank token back into the prediction net
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

        return (dec_out, state, last_app, out_buf, out_len), None

    out_buf = jnp.full((B, max_output_len), blank_id, jnp.int32)
    out_len = jnp.zeros((B,), jnp.int32)
    init = (dec_out0, state0, blank_tokens, out_buf, out_len)
    ts = jnp.arange(enc.shape[0], dtype=jnp.int32)
    (_, _, _, out_buf, out_len), _ = jax.lax.scan(frame_step, init, (enc, ts))
    return out_buf, out_len
