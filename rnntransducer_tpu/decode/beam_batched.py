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

With beam_width=1 this reduces exactly to greedy decoding (tested).  The beam
state is an explicit ``BeamCarry``, so the same compiled frame scan serves
offline decoding and chunked streaming (decode/streaming.py).

Principled search options (round 5 — the reference ranking is the default,
but it measurably LOSES to greedy on noisy audio, BASELINE.md round-4
stress rung; these flags close that):

* ``length_norm_alpha`` — rank by ``score / max(len, 1)**alpha`` over
  EMITTED tokens (the seed blank excluded, unlike ``transducer.py:360``):
  ``alpha=0`` ranks by raw path score (greedy-consistent — the beam can
  then never prefer a hypothesis greedy would reject on likelihood),
  ``alpha=1`` is per-token average log-prob, fractional values
  interpolate (GNMT-style).  ``None`` keeps the reference ranking.
* ``merge_duplicates`` — frame-synchronous RNN-T search reaches the same
  token prefix along many blank/emit alignments; per-path scoring (the
  reference's, kept as default) splits that probability mass across beam
  slots and lets noise-induced alignment ties crowd out distinct
  hypotheses.  With merging, identical token sequences are combined once
  per frame with ``logsumexp`` (the better path's prednet state is kept —
  the states are identical unless a consecutive-duplicate drop diverged
  them), i.e. scores approximate marginalization over alignments as in
  Graves 2012 proper.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from rnntransducer_tpu.models.cells import RNNState
from rnntransducer_tpu.models.transducer import RNNTransducer
from rnntransducer_tpu.utils.precision import match_param_dtype

NEG = -1e30


class BeamCarry(NamedTuple):
    """Resumable beam state across frame chunks. Shapes: scores/lens/last
    (B, K); tokens (B, K, L); dec_out (B*K, Dd); state: prednet RNNState
    over batch B*K; ctx (B, K, order-1) last-emitted-grapheme history for
    device-resident char-LM fusion (None — no pytree leaf — when unused,
    so LM-free carries are unchanged from earlier rounds); wlm_state /
    wlm_node (B, K) word-LM state + lexicon-trie node for device
    word-boundary fusion (``device_word_lm.py``; None when unused)."""
    scores: jnp.ndarray
    tokens: jnp.ndarray
    lens: jnp.ndarray
    last: jnp.ndarray
    dec_out: jnp.ndarray
    state: RNNState
    ctx: Optional[jnp.ndarray] = None
    wlm_state: Optional[jnp.ndarray] = None
    wlm_node: Optional[jnp.ndarray] = None


@partial(jax.jit, static_argnames=("model", "batch", "beam_width", "blank_id",
                                   "max_output_len", "lm_context",
                                   "word_lm_start"))
def init_beam_carry(model: RNNTransducer, variables, batch: int,
                    beam_width: int, blank_id: int = 0,
                    max_output_len: int = 256,
                    lm_context: int = 0,
                    word_lm_start: int = -1) -> BeamCarry:
    """``lm_context > 0`` adds a (B, K, lm_context) emitted-grapheme history
    for device char-LM fusion (``decode/device_lm.py``); pass the LM's
    ``.context`` (order - 1). Blank-filled = no history yet.

    ``word_lm_start >= 0`` adds the word-boundary fusion state
    (``decode/device_word_lm.py``): every hypothesis starts in LM state
    ``word_lm_start`` (the LM's ``<s>`` row) at the lexicon-trie root."""
    B, K = batch, beam_width
    blank_flat = jnp.full((B * K,), blank_id, jnp.int32)
    dec_out0, state0 = model.apply(variables, blank_flat, None,
                                   method=model.predict_step)
    return BeamCarry(
        # explicit dtype: a weak-typed scores leaf would make the
        # init carry compile a tick program no post-reset carry can
        # reuse (reset outputs are strongly typed f32)
        scores=jnp.full((B, K), NEG, jnp.float32).at[:, 0].set(0.0),
        tokens=jnp.full((B, K, max_output_len), blank_id, jnp.int32),
        lens=jnp.zeros((B, K), jnp.int32),
        last=jnp.full((B, K), blank_id, jnp.int32),
        dec_out=dec_out0,
        state=state0,
        ctx=(jnp.full((B, K, lm_context), blank_id, jnp.int32)
             if lm_context > 0 else None),
        wlm_state=(jnp.full((B, K), word_lm_start, jnp.int32)
                   if word_lm_start >= 0 else None),
        wlm_node=(jnp.zeros((B, K), jnp.int32)
                  if word_lm_start >= 0 else None),
    )


def _merge_duplicate_hyps(scores, tokens, lens):
    """Marginalize identical token sequences: for each group of beam slots
    holding the same (lens, tokens) sequence, the best-scoring slot gets the
    group's logsumexp score and the rest drop to NEG.  Token buffers are
    blank-filled past ``lens`` (init + append discipline), so whole-buffer
    equality == prefix equality.  O(K^2 L) elementwise — negligible for
    serving-size K."""
    B, K = scores.shape
    same = ((lens[:, :, None] == lens[:, None, :])
            & jnp.all(tokens[:, :, None, :] == tokens[:, None, :, :],
                      axis=-1))  # (B, K, K) — an equivalence relation
    group = jnp.where(same, scores[:, None, :], NEG)  # row i: scores of i's group
    merged = jax.scipy.special.logsumexp(group, axis=-1)
    # representative = the group's argmax slot (ties -> lowest index);
    # every member computes the same best_j, so exactly one slot survives
    best_j = jnp.argmax(group, axis=-1)  # (B, K)
    is_rep = best_j == jnp.arange(K)[None, :]
    return jnp.where(is_rep, merged, NEG)


@partial(jax.jit, static_argnames=("model", "blank_id", "max_symbols",
                                   "merge_duplicates"))
def beam_decode_frames(model: RNNTransducer, variables, enc, enc_lengths,
                       carry: BeamCarry, blank_id: int = 0,
                       max_symbols: int = 3, lm_table=None,
                       lm_weight=0.0,
                       merge_duplicates: bool = False,
                       word_lm=None) -> BeamCarry:
    """(beam width is carry.scores.shape[1] — set by init_beam_carry)

    ``lm_table``: optional dense char-LM table, shape (V,) * order
    (``decode/device_lm.py``) — every non-blank extension gains
    ``lm_weight * ln p(tok | ctx)`` gathered from it on-device; requires
    the carry to hold a ctx of order-1 tokens (init_beam_carry
    ``lm_context``).

    ``word_lm``: optional ``decode.device_word_lm.DeviceWordLM`` —
    word-boundary fusion inside the scan: a delimiter extension gains the
    just-completed word's fused n-gram score from the HBM tables (that
    module's docstring); requires the carry's wlm fields
    (init_beam_carry ``word_lm_start``)."""
    # Advance the beam over encoder frames enc (B, T, De), valid up to
    # enc_lengths (B,). Compiled once per (B, T) shape.
    B, K = carry.scores.shape
    if lm_table is not None:
        if carry.ctx is None:
            raise ValueError("lm_table given but the beam carry has no ctx "
                             "history — init_beam_carry(lm_context=order-1)")
        if carry.ctx.shape[2] != lm_table.ndim - 1:
            raise ValueError(
                f"carry ctx holds {carry.ctx.shape[2]} tokens of history "
                f"but the LM table is order {lm_table.ndim}")
    if word_lm is not None and carry.wlm_state is None:
        raise ValueError("word_lm given but the beam carry has no word-LM "
                         "state — init_beam_carry(word_lm_start=...)")
    wlm_delim = word_lm.delimiter_id if word_lm is not None else -1
    V = model.cfg.jointnet.num_classes
    max_output_len = carry.tokens.shape[2]
    enc_t = jnp.swapaxes(enc, 0, 1)  # (T, B, De)

    def predict(tokens_flat, state):
        return model.apply(variables, tokens_flat, state,
                           method=model.predict_step)

    def joint(enc_bk, dec_flat):
        # score in fp32 regardless of the compute dtype: hypothesis ranking
        # accumulates log-probs across frames (see utils/precision.py)
        logits = model.apply(variables, enc_bk, dec_flat,
                             method=model.joint_step)
        return jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)

    def gather_bk(x, parent):
        return jnp.take_along_axis(
            x, parent.reshape(parent.shape + (1,) * (x.ndim - 2)), axis=1)

    def gather_state(state, parent):
        def g(a):
            L, D, BK, H = a.shape
            a5 = a.reshape(L, D, B, K, H)
            idx = parent.reshape(1, 1, B, K, 1)
            return jnp.take_along_axis(a5, idx, axis=3).reshape(L, D, BK, H)
        return jax.tree.map(g, state)

    def frame_step(c: BeamCarry, inp):
        enc_i, t = inp
        (scores, tokens, lens, last, dec_out, state, ctx,
         wlm_s, wlm_n) = c
        frame_valid = (t < enc_lengths.astype(jnp.int32))  # (B,)
        done = jnp.zeros((B, K), bool)
        enc_bk = jnp.repeat(enc_i, K, axis=0)

        new = (scores, tokens, lens, last, dec_out, state, ctx,
               wlm_s, wlm_n)
        for _ in range(max_symbols):
            (scores, tokens, lens, last, dec_out, state, ctx,
             wlm_s, wlm_n) = new
            logp = joint(enc_bk, dec_out).reshape(B, K, V)
            stay = jnp.where(done, scores, scores + logp[..., blank_id])
            ext = scores[..., None] + logp
            if lm_table is not None:
                # on-device shallow fusion: one gather of the (B, K, V)
                # next-grapheme row per expansion round, no host sync
                rows = lm_table[tuple(ctx[..., i]
                                      for i in range(ctx.shape[2]))]
                ext = ext + lm_weight * rows
            if word_lm is not None:
                # word-boundary fusion: the delimiter extension closes the
                # in-progress word — its fused n-gram score (alpha/beta
                # baked in the table) joins the candidate BEFORE top-K, so
                # the LM steers the search, not just the final ranking.
                # An empty current word (trie root) scores nothing.
                completed = word_lm.node_word[wlm_n]        # (B, K)
                bonus = word_lm.rows[wlm_s, completed]
                bonus = jnp.where(wlm_n == 0, 0.0, bonus)
                ext = ext.at[..., wlm_delim].add(bonus)
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
            if ctx is not None:
                # LM history mirrors the token buffer: shift in appended
                # graphemes only (duplicate-drops advance nothing)
                ctx_g = gather_bk(ctx, parent)
                shifted = jnp.concatenate([ctx_g[..., 1:], tok[..., None]],
                                          axis=-1)
                ctx_n = jnp.where(append[..., None], shifted, ctx_g)
            else:
                ctx_n = None
            if word_lm is not None:
                # word-LM bookkeeping follows the token buffer exactly:
                # an appended delimiter commits the completed word (OOV /
                # un-LM'd words keep the previous state, host semantics)
                # and resets the trie walk; an appended grapheme advances
                # the trie; duplicate-drops and stays change nothing
                wlm_s_g = jnp.take_along_axis(wlm_s, parent, axis=1)
                wlm_n_g = jnp.take_along_axis(wlm_n, parent, axis=1)
                is_delim = tok == wlm_delim
                completed_g = word_lm.node_word[wlm_n_g]
                ns_cand = word_lm.next_state[completed_g]
                committed = jnp.where(ns_cand >= 0, ns_cand, wlm_s_g)
                wlm_s_n = jnp.where(append & is_delim & (wlm_n_g != 0),
                                    committed, wlm_s_g)
                walk = word_lm.trie_next[wlm_n_g, tok]
                wlm_n_n = jnp.where(append,
                                    jnp.where(is_delim, 0, walk), wlm_n_g)
            else:
                wlm_s_n = wlm_n_n = None
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
            dec_n = jnp.where(is_stay[..., None], dec_g, ndo).reshape(B * K, -1)
            sel = is_stay.reshape(1, 1, B, K, 1)

            def mix(old_a, new_a):
                L, D, BK, H = old_a.shape
                o = old_a.reshape(L, D, B, K, H)
                n = new_a.reshape(L, D, B, K, H)
                return jnp.where(sel, o, n).reshape(L, D, BK, H)

            state_n = jax.tree.map(mix, state_g, nst)
            done = is_stay
            new = (top_sc, tokens_n, lens_n, last_n, dec_n, state_n, ctx_n,
                   wlm_s_n, wlm_n_n)

        (scores, tokens, lens, last, dec_out, state, ctx,
         wlm_s, wlm_n) = new
        # blank-close hypotheses that exhausted the round budget
        logp = joint(enc_bk, dec_out).reshape(B, K, V)
        scores = jnp.where(done, scores, scores + logp[..., blank_id])
        if merge_duplicates:
            # all hypotheses are blank-closed at this point, so merging at
            # the frame boundary is alignment-consistent (module docstring)
            scores = _merge_duplicate_hyps(scores, tokens, lens)

        # skip invalid frames entirely
        fv = frame_valid
        pick = lambda n, o: jnp.where(
            fv.reshape((B,) + (1,) * (n.ndim - 1)), n, o)
        pick_state = lambda n, o: jax.tree.map(
            lambda na, oa: jnp.where(
                fv.repeat(K).reshape(1, 1, B * K, 1), na, oa), n, o)
        out = BeamCarry(pick(scores, c.scores), pick(tokens, c.tokens),
                        pick(lens, c.lens), pick(last, c.last),
                        jnp.where(fv.repeat(K)[:, None], dec_out, c.dec_out),
                        pick_state(state, c.state),
                        pick(ctx, c.ctx) if ctx is not None else None,
                        pick(wlm_s, c.wlm_state) if wlm_s is not None
                        else None,
                        pick(wlm_n, c.wlm_node) if wlm_n is not None
                        else None)
        return out, None

    ts = jnp.arange(enc_t.shape[0], dtype=jnp.int32)
    carry, _ = jax.lax.scan(frame_step, carry, (enc_t, ts))
    return carry


@jax.jit
def settle_word_lm(carry: BeamCarry, word_lm) -> BeamCarry:
    """End-of-stream word-LM settling (the host path's ``is_last_word``
    semantics, ngram_lm.py ``score``): the in-progress word — trie node
    not at root — is scored from the current LM state, then ``</s>`` from
    the resulting state.  Returns a carry with adjusted scores (wlm fields
    untouched); call ONCE before the final ranking.  Streaming partial
    polls rank the unsettled carry — mid-stream there is no EOS event."""
    completed = word_lm.node_word[carry.wlm_node]
    at_root = carry.wlm_node == 0
    word_bonus = jnp.where(at_root, 0.0,
                           word_lm.rows[carry.wlm_state, completed])
    ns_cand = word_lm.next_state[completed]
    final_state = jnp.where(
        at_root, carry.wlm_state,
        jnp.where(ns_cand >= 0, ns_cand, carry.wlm_state))
    eos_bonus = word_lm.eos_col[final_state]
    return carry._replace(scores=carry.scores + word_bonus + eos_bonus)


def _rank_scores(scores, lens, length_norm: bool, alpha):
    """The ranking key: reference ``score/(len+1)`` when ``alpha`` is None
    (``transducer.py:360``, seed blank counted), else the round-5 dial
    ``score / max(len, 1)**alpha`` over emitted tokens (module docstring)."""
    if alpha is not None:
        return scores / jnp.maximum(lens, 1).astype(scores.dtype) ** alpha
    return scores / (lens + 1) if length_norm else scores


@partial(jax.jit, static_argnames=("length_norm", "length_norm_alpha"))
def rank_beam(carry: BeamCarry, length_norm: bool = True,
              length_norm_alpha=None):
    """Sort hypotheses best-first: (tokens (B,K,L), lens (B,K), scores).
    Jitted: polled per-chunk by streaming partials, where eager dispatch costs
    one tunnel round trip per op (measured ~0.9 s/poll eager vs one call)."""
    scores, tokens, lens = carry.scores, carry.tokens, carry.lens
    rank = _rank_scores(scores, lens, length_norm, length_norm_alpha)
    order = jnp.argsort(-rank, axis=1)
    scores = jnp.take_along_axis(scores, order, axis=1)
    lens = jnp.take_along_axis(lens, order, axis=1)
    tokens = jnp.take_along_axis(tokens, order[:, :, None], axis=1)
    return tokens, lens, scores


@partial(jax.jit, static_argnames=("length_norm",))
def best_hyp_all(carry: BeamCarry, length_norm: bool = True):
    """Best hypothesis of EVERY lane: (tokens (B, L), lens (B,)).  The
    continuous-batching tick fetches this instead of the full (B, K, L)
    buffers — the ranking runs on device and the transfer shrinks K-fold."""
    scores, tokens, lens = carry.scores, carry.tokens, carry.lens
    rank = scores / (lens + 1) if length_norm else scores
    k = jnp.argmax(rank, axis=1)  # (B,)
    best_tokens = jnp.take_along_axis(tokens, k[:, None, None], axis=1)[:, 0]
    best_lens = jnp.take_along_axis(lens, k[:, None], axis=1)[:, 0]
    return best_tokens, best_lens


@partial(jax.jit, static_argnames=("length_norm",))
def best_hyp(carry: BeamCarry, length_norm: bool = True):
    """The single best hypothesis of utterance 0: (tokens (L,), len ()).
    One jitted call + one transfer — the cheapest streaming-partials poll."""
    scores, tokens, lens = carry.scores, carry.tokens, carry.lens
    rank = scores / (lens + 1) if length_norm else scores
    k = jnp.argmax(rank[0])
    return tokens[0, k], lens[0, k]


@partial(jax.jit, static_argnames=("model", "blank_id", "beam_width",
                                   "max_symbols", "max_output_len",
                                   "length_norm", "length_norm_alpha",
                                   "merge_duplicates"))
def batched_beam_decode(model: RNNTransducer, variables, feats, feat_lengths,
                        blank_id: int = 0, beam_width: int = 4,
                        max_symbols: int = 3, max_output_len: int = 256,
                        length_norm: bool = True, device_lm=None,
                        length_norm_alpha=None, merge_duplicates: bool = False,
                        word_lm=None
                        ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Offline path: encode feats (B, T, n_mels), run the beam frame scan,
    rank. Returns (tokens (B, K, max_output_len), lengths (B, K),
    scores (B, K)) best-first.

    ``device_lm``: optional ``decode.device_lm.DeviceCharLM`` — on-device
    grapheme-level shallow fusion inside the frame scan.
    ``word_lm``: optional ``decode.device_word_lm.DeviceWordLM`` —
    on-device word-boundary fusion inside the scan + EOS settling before
    the ranking (that module's docstring).
    ``length_norm_alpha`` / ``merge_duplicates``: the round-5 search
    options (module docstring); defaults keep reference behavior."""
    feats = match_param_dtype(variables, feats)
    enc, _ = model.apply(variables, feats, feat_lengths, method=model.encode)
    enc_lengths = model.cfg.transnet.output_lengths(feat_lengths)
    carry = init_beam_carry(
        model, variables, feats.shape[0], beam_width, blank_id,
        max_output_len,
        lm_context=device_lm.context if device_lm else 0,
        word_lm_start=word_lm.start_state if word_lm is not None else -1)
    carry = beam_decode_frames(
        model, variables, enc, enc_lengths, carry, blank_id, max_symbols,
        lm_table=jnp.asarray(device_lm.table) if device_lm else None,
        lm_weight=device_lm.weight if device_lm else 0.0,
        merge_duplicates=merge_duplicates, word_lm=word_lm)
    if word_lm is not None:
        carry = settle_word_lm(carry, word_lm)
    return rank_beam(carry, length_norm, length_norm_alpha)
