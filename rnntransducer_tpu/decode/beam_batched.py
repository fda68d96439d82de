"""Fully device-side batched RNN-T beam search.

The reference's beam search (``networks/transducer.py:215-361``) is a
batch-of-1 host loop with one device call per hypothesis expansion — fine for
offline use, but serving wants the whole search compiled.  This decoder is the
TPU-native counterpart: frame-synchronous beam with a static expansion budget
per frame, entirely inside one ``lax.scan``:

* K hypotheses per utterance, whole batch decoded together;
* per frame, ``max_symbols`` expansion rounds: every live hypothesis offers a
  "stay" (emit blank, close for this frame) and V-1 token extensions; top-K of
  the pooled candidates survive (per-path scores, no prefix merging — same
  scoring semantics as the reference);
* consecutive-duplicate appends are dropped but still advance the prediction
  net, exactly like the reference (``transducer.py:337,345`` + ``:303``);
* hypotheses still live after the round budget are blank-closed;
* final ranking uses the reference's length normalization
  (score / (len + 1), the +1 being the blank seed, ``transducer.py:360``).

With beam_width=1 this reduces exactly to greedy decoding (tested).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from rnntransducer_tpu.models.transducer import RNNTransducer

NEG = -1e30


@partial(jax.jit, static_argnames=("model", "blank_id", "beam_width",
                                   "max_symbols", "max_output_len",
                                   "length_norm"))
def batched_beam_decode(model: RNNTransducer, variables, feats, feat_lengths,
                        blank_id: int = 0, beam_width: int = 4,
                        max_symbols: int = 3, max_output_len: int = 256,
                        length_norm: bool = True
                        ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """feats: (B, T, n_mels). Returns (tokens (B, K, max_output_len),
    lengths (B, K), scores (B, K)), hypotheses sorted best-first."""
    B = feats.shape[0]
    K = beam_width
    V = model.cfg.jointnet.num_classes
    enc, _ = model.apply(variables, feats, feat_lengths, method=model.encode)
    enc_t = jnp.swapaxes(enc, 0, 1)  # (T, B, De)

    def predict(tokens_flat, state):
        return model.apply(variables, tokens_flat, state,
                           method=model.predict_step)

    def joint(enc_bk, dec_flat):
        # pointwise joint on (B*K, De)+(B*K, Dd)
        logits = model.apply(variables, enc_bk, dec_flat,
                             method=model.joint_step)
        return jax.nn.log_softmax(logits, axis=-1)

    blank_flat = jnp.full((B * K,), blank_id, jnp.int32)
    dec_out0, state0 = predict(blank_flat, None)

    def gather_bk(x, parent, k_axis_from_flat=False):
        """Gather along the K axis with parent (B, K) int32.
        x: (B, K, ...) or state-style (..., B*K, H)."""
        return jnp.take_along_axis(
            x, parent.reshape(parent.shape + (1,) * (x.ndim - 2)), axis=1)

    def gather_state(state, parent):
        """state arrays: (L, D, B*K, H) -> reindex the K slot per batch."""
        def g(a):
            L, D, BK, H = a.shape
            a4 = a.reshape(L, D, B, K, H)
            idx = parent.reshape(1, 1, B, K, 1)
            return jnp.take_along_axis(a4, idx, axis=3).reshape(L, D, BK, H)
        return jax.tree.map(g, state)

    def frame_step(carry, inp):
        enc_i, t = inp  # enc_i: (B, De)
        scores, tokens, lens, last, dec_out, state = carry
        frame_valid = (t < feat_lengths.astype(jnp.int32))  # (B,)
        done = jnp.zeros((B, K), bool)
        enc_bk = jnp.repeat(enc_i, K, axis=0)  # (B*K, De)

        new = (scores, tokens, lens, last, dec_out, state)
        for _ in range(max_symbols):
            scores, tokens, lens, last, dec_out, state = new
            logp = joint(enc_bk, dec_out).reshape(B, K, V)
            stay = jnp.where(done, scores, scores + logp[..., blank_id])
            ext = scores[..., None] + logp
            ext = ext.at[..., blank_id].set(NEG)
            ext = jnp.where(done[..., None], NEG, ext)
            pool = jnp.concatenate([stay, ext.reshape(B, K * V)], axis=1)
            top_sc, top_idx = jax.lax.top_k(pool, K)
            is_stay = top_idx < K
            parent = jnp.where(is_stay, top_idx, (top_idx - K) // V)
            tok = jnp.where(is_stay, blank_id,
                            (top_idx - K) % V).astype(jnp.int32)

            tokens_g = gather_bk(tokens, parent)
            lens_g = jnp.take_along_axis(lens, parent, axis=1)
            last_g = jnp.take_along_axis(last, parent, axis=1)
            dec_g = gather_bk(dec_out.reshape(B, K, -1), parent)
            state_g = gather_state(state, parent)

            append = (~is_stay) & (tok != last_g) & (lens_g < max_output_len)
            idx = jnp.minimum(lens_g, max_output_len - 1)
            cur = jnp.take_along_axis(tokens_g, idx[..., None], axis=2)[..., 0]
            tokens_n = jnp.where(
                jax.lax.broadcasted_iota(jnp.int32, (B, K, max_output_len), 2)
                == idx[..., None],
                jnp.where(append, tok, cur)[..., None], tokens_g)
            lens_n = lens_g + append.astype(jnp.int32)
            last_n = jnp.where(is_stay, last_g, tok)

            feed = jnp.where(is_stay, blank_id, tok).reshape(B * K)
            ndo, nst = predict(feed, state_g)
            ndo = ndo.reshape(B, K, -1)
            m = is_stay[..., None]
            dec_n = jnp.where(m, dec_g, ndo).reshape(B * K, -1)
            sel = is_stay.reshape(1, 1, B, K, 1)

            def mix(old_a, new_a):
                L, D, BK, H = old_a.shape
                o = old_a.reshape(L, D, B, K, H)
                n = new_a.reshape(L, D, B, K, H)
                return jnp.where(sel, o, n).reshape(L, D, BK, H)

            state_n = jax.tree.map(mix, state_g, nst)
            done = is_stay
            new = (top_sc, tokens_n, lens_n, last_n, dec_n, state_n)

        scores, tokens, lens, last, dec_out, state = new
        # blank-close hypotheses that exhausted the round budget
        logp = joint(enc_bk, dec_out).reshape(B, K, V)
        scores = jnp.where(done, scores, scores + logp[..., blank_id])

        # skip invalid frames entirely
        old = carry
        fv = frame_valid
        pick = lambda n, o: jnp.where(
            fv.reshape((B,) + (1,) * (n.ndim - 1)), n, o)
        pick_state = lambda n, o: jax.tree.map(
            lambda na, oa: jnp.where(
                fv.repeat(K).reshape(1, 1, B * K, 1), na, oa), n, o)
        carry = (pick(scores, old[0]), pick(tokens, old[1]),
                 pick(lens, old[2]), pick(last, old[3]),
                 jnp.where(fv.repeat(K)[:, None], dec_out, old[4]),
                 pick_state(state, old[5]))
        return carry, None

    scores0 = jnp.full((B, K), NEG).at[:, 0].set(0.0)
    tokens0 = jnp.full((B, K, max_output_len), blank_id, jnp.int32)
    lens0 = jnp.zeros((B, K), jnp.int32)
    last0 = jnp.full((B, K), blank_id, jnp.int32)
    carry = (scores0, tokens0, lens0, last0, dec_out0, state0)
    ts = jnp.arange(enc_t.shape[0], dtype=jnp.int32)
    (scores, tokens, lens, _, _, _), _ = jax.lax.scan(frame_step, carry,
                                                      (enc_t, ts))

    rank = scores / (lens + 1) if length_norm else scores
    order = jnp.argsort(-rank, axis=1)
    scores = jnp.take_along_axis(scores, order, axis=1)
    lens = jnp.take_along_axis(lens, order, axis=1)
    tokens = jnp.take_along_axis(tokens, order[:, :, None], axis=1)
    return tokens, lens, scores
