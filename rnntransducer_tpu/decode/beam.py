"""RNN-T beam search with improved pruning and LM shallow fusion.

Capability-equivalent of the reference's ``recognize_beams``
(``networks/transducer.py:215-361``): the Graves A/B-set beam search with the
"improved" pruning of arXiv:1911.01629 (state_beam early exit, expand_beam
candidate pruning), KenLM-style shallow fusion gated on completed words
(``_get_lm_beams``, ``transducer.py:147-213``) and hotword boosting.

Device/host split: prediction-net step + joint + log-softmax run as one jitted
K-wide batched function on device; hypothesis management, LM scoring and the
hotword trie are host work by nature (SURVEY.md §7 design stance 6).

Round-trip economics (vs the reference's one decoder+joint call per expansion,
``transducer.py:303-309``): when the popped-best hypothesis has no cached
scores, the top ``wave_size`` unscored hypotheses in A (by search key — pop
order) are scored in ONE padded batched device call (K padded to a power of
two to bound compile shapes) and fetched with a single transfer.  Scoring is
a pure function of (enc_t, last token, prednet state), so prefetching waves
leaves the search semantics bit-identical; typical frames need 1-3 device
calls instead of one per expansion.  The wave is capped because most A-hyps
are never popped — when pruning is weak (flat distributions) A can grow far
beyond the beam, and scoring all of it would swamp the saving.

Faithful reference quirks kept (documented):
* expansions feed ``y_star[-1]`` (last *appended* token) to the prediction
  net (``transducer.py:303``), not the last emitted one;
* the final ranking normalizes by ``len(y_star)`` which includes the initial
  blank (``transducer.py:360``);
* duplicate hypotheses are not merged (scores are per-expansion, not
  marginalized);
* the cumulative completed-word LM score is read ONLY at word boundaries
  (``transducer.py:185-202`` gates the ``cached_lm`` read on the delimiter
  flag): a mid-word hypothesis is keyed by asr + partial-token score alone,
  and a single-word utterance that never emits a delimiter reaches
  ``finalize(is_eos=True)`` with ``flag False`` — its word gets only the
  partial-token score.  pyctcdecode proper reads the cumulative score
  unconditionally; kept as-is for reference parity;
* a hypothesis ending in the delimiter scores its just-completed word with
  BOTH the completed-hotword bonus and ``score_partial_token`` (the
  reference does too, ``transducer.py:172-174,204-210``; pyctcdecode scores
  the empty in-progress word as zero).

Deliberate divergences from the reference (CTC-isms corrected for RNN-T):
* hypothesis texts decode with ``group_tokens=False`` — the reference's
  ``tokenizer.decode`` inherits Wav2Vec2CTC's default consecutive-repeat
  merging (``transducer.py:170``), but RNN-T emissions are real tokens, not
  CTC frame repeats, so merging would silently delete legitimate repeated
  graphemes;
* the no-LM hotword branch scores ``score_partial_token`` on the LAST word
  (the in-progress one) rather than the full text
  (``transducer.py:172-174``) — partial-token boosting is defined on the
  word being typed, and pyctcdecode's own LM branch does exactly that
  (mirrored at ``transducer.py:205-210``);
* a missing ``current_text`` LM-cache entry falls back to the LM start
  state instead of raising ``KeyError`` (``transducer.py:198``).
"""

from __future__ import annotations

from functools import partial
from typing import Iterable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from rnntransducer_tpu.decode.hotwords import DEFAULT_HOTWORD_WEIGHT, HotwordScorer
from rnntransducer_tpu.models.transducer import RNNTransducer
from rnntransducer_tpu.utils.precision import match_param_dtype


@partial(jax.jit, static_argnames=("model",))
def _encode(model: RNNTransducer, variables, feats, feat_lengths):
    feats = match_param_dtype(variables, feats)
    enc, _ = model.apply(variables, feats, feat_lengths, method=model.encode)
    return enc


def _zero_prednet_state(model: RNNTransducer):
    """Host-side (numpy) zero state: (h, c|None) of shape (L, 1, 1, H)."""
    cfg = model.cfg.prednet
    h = np.zeros((cfg.num_layers, 1, 1, cfg.hidden_size), np.float32)
    c = h if cfg.rnn_type.lower() == "lstm" else None
    return (h, c)


@partial(jax.jit, static_argnames=("model",))
def _predict_joint_step_k(model: RNNTransducer, variables, enc_t, tokens,
                          state):
    """K-wide expansion scoring. enc_t: (1, De); tokens: (K,); state:
    RNNState with batch K. Returns (log_probs (K, V), new_state)."""
    state = jax.tree_util.tree_map(
        lambda x: match_param_dtype(variables, x), state)
    dec_out, new_state = model.apply(variables, tokens, state,
                                     method=model.predict_step)
    enc_k = jnp.broadcast_to(match_param_dtype(variables, enc_t),
                             (tokens.shape[0], enc_t.shape[-1]))
    logits = model.apply(variables, enc_k, dec_out, method=model.joint_step)
    # fp32 scores: accumulated across frames by the host search
    return jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1), new_state


@partial(jax.jit, static_argnames=("model",))
def _predict_joint_step_rows(model: RNNTransducer, variables, enc_rows,
                             tokens, state):
    """Like ``_predict_joint_step_k`` but with a PER-ROW encoder frame:
    enc_rows (K, De) — rows from different lanes/frames score in one call
    (the multilane pump, ``decode_frames_multilane``)."""
    state = jax.tree_util.tree_map(
        lambda x: match_param_dtype(variables, x), state)
    dec_out, new_state = model.apply(variables, tokens, state,
                                     method=model.predict_step)
    logits = model.apply(variables, match_param_dtype(variables, enc_rows),
                         dec_out, method=model.joint_step)
    return jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1), new_state


class _Hyp:
    __slots__ = ("asr_score", "y_star", "state", "lm_score", "lm_state",
                 "cache")

    def __init__(self, asr_score, y_star, state, lm_score, lm_state,
                 cache=None):
        self.asr_score = asr_score
        self.y_star = y_star
        self.state = state      # (h, c|None) numpy, shapes (L, 1, 1, H)
        self.lm_score = lm_score
        self.lm_state = lm_state
        self.cache = cache      # (log_probs (V,), new_state) for this frame


class HostBeamSession:
    """Resumable A/B-set search state (see BeamSearchDecoder.open_session)."""
    __slots__ = ("B_hyps", "cached_lm", "cached_partial")

    def __init__(self, B_hyps, cached_lm, cached_partial):
        self.B_hyps = B_hyps
        self.cached_lm = cached_lm
        self.cached_partial = cached_partial


class BeamSearchDecoder:
    def __init__(self, model: RNNTransducer, variables, blank_id: int = 0,
                 tokenizer=None, beam_width: int = 5, improved: bool = True,
                 state_beam: float = 4.6, expand_beam: float = 2.3,
                 lm=None, hotwords: Optional[Iterable[str]] = None,
                 hotword_weight: float = DEFAULT_HOTWORD_WEIGHT,
                 max_expansions_per_frame: int = 200,
                 length_norm_alpha: Optional[float] = None,
                 merge_duplicates: bool = False):
        """``length_norm_alpha`` / ``merge_duplicates`` are the round-5
        search options (same semantics as ``beam_batched``'s, see that
        module's docstring): ``alpha`` ranks the final n-best by
        ``score / max(emitted_len, 1)**alpha`` (seed blank EXCLUDED)
        instead of the reference's ``score / len(y_star)``
        (``transducer.py:360``); ``merge_duplicates`` combines
        identical-token-sequence hypotheses in B with logsumexp at each
        frame boundary (per-path scoring otherwise, like the reference)."""
        self.model = model
        self.variables = variables
        self.blank_id = blank_id
        self.tokenizer = tokenizer
        self.beam_width = beam_width
        self.improved = improved
        self.state_beam = state_beam
        self.expand_beam = expand_beam
        self.length_norm_alpha = length_norm_alpha
        self.merge_duplicates = merge_duplicates
        self.lm = lm
        self.hotword_scorer = HotwordScorer.build_scorer(hotwords,
                                                         weight=hotword_weight)
        self.max_expansions = max_expansions_per_frame
        # per-wave device-call width: enough to cover several future pops
        self.wave_size = max(4 * beam_width, 16)
        self.max_live = max(64 * beam_width, 512)
        self._use_lm = lm is not None or bool(self.hotword_scorer)
        if self._use_lm and tokenizer is None:
            raise ValueError("LM/hotword fusion requires a tokenizer")
        if (lm is not None
                and getattr(tokenizer, "word_delimiter_token_id", None) is None):
            # word-boundary detection keys off the delimiter TOKEN
            # (_score_lm_beams below); subword vocabs mark boundaries inside
            # pieces instead, so word-level fusion cannot see them
            raise ValueError(
                "word-level LM fusion requires a word-delimiter tokenizer "
                "(grapheme vocab.json); for subword (BPE) vocabs use the "
                "on-device char LM (decode/device_lm.py) instead")

    def _key(self, hyp: _Hyp) -> float:
        return hyp.lm_score if self._use_lm else hyp.asr_score

    # ---------------------------------------------------------------- LM
    def _score_lm_beams(self, beams: List[_Hyp], cached_lm, cached_partial,
                        is_eos: bool) -> None:
        """In-place lm_score update (transducer.py:147-213 semantics)."""
        hw = self.hotword_scorer
        tok = self.tokenizer
        if self.lm is None:
            for hyp in beams:
                text = tok.decode(hyp.y_star, group_tokens=False)
                if not text:
                    # no words yet -> zero LM/hotword contribution.  The key
                    # must still track THIS hyp's acoustics: inheriting the
                    # parent's lm_score would rank a delimiter-only expansion
                    # by a stale (typically 0.0) key above every legitimately
                    # scored hypothesis.
                    hyp.lm_score = hyp.asr_score
                    continue
                hyp.lm_score = (hyp.asr_score + hw.score(text) +
                                hw.score_partial_token(text.split()[-1]))
            return

        delim_id = tok.word_delimiter_token_id
        for hyp in beams:
            lm_score = 0.0
            text = tok.decode(hyp.y_star, group_tokens=False)
            if not text:
                hyp.lm_score = hyp.asr_score  # see the hotword-only branch
                continue
            words = text.split()
            current_text = " ".join(words[:-1])
            next_word = words[-1]
            new_text = (current_text + " " + next_word) if current_text else next_word
            if is_eos:
                flag = delim_id in hyp.y_star
            else:
                flag = hyp.y_star[-1] == delim_id
            if flag:
                if new_text not in cached_lm:
                    _, prev_raw, start_state = cached_lm.get(
                        current_text, (0.0, 0.0, self.lm.get_start_state()))
                    score, end_state = self.lm.score(start_state, next_word,
                                                     is_last_word=is_eos)
                    raw = prev_raw + score
                    cached_lm[new_text] = (raw + hw.score(new_text), raw,
                                           end_state)
                lm_score, _, _ = cached_lm[new_text]
            if next_word not in cached_partial:
                if next_word in hw:
                    cached_partial[next_word] = hw.score_partial_token(next_word)
                else:
                    cached_partial[next_word] = self.lm.score_partial_token(next_word)
            lm_score += cached_partial[next_word]
            hyp.lm_score = hyp.asr_score + lm_score

    # ----------------------------------------------------- device batching
    def _score_wave(self, hyps: List[_Hyp], enc_t) -> None:
        """Score every hypothesis in one padded batched device call and cache
        (log_probs, new_state) on each; a single host transfer per wave."""
        from rnntransducer_tpu.models.cells import RNNState
        K = len(hyps)
        Kp = 1 << (K - 1).bit_length()  # pad to power of two: bounded compiles
        tokens = np.full((Kp,), self.blank_id, np.int32)
        tokens[:K] = [h.y_star[-1] for h in hyps]
        h0, c0 = hyps[0].state
        h = np.zeros(h0.shape[:2] + (Kp,) + h0.shape[3:], np.float32)
        c = None if c0 is None else np.zeros_like(h)
        for i, hyp in enumerate(hyps):
            h[:, :, i] = hyp.state[0][:, :, 0]
            if c is not None:
                c[:, :, i] = hyp.state[1][:, :, 0]
        # numpy args transfer as part of the ONE dispatch RPC — explicit
        # jnp.asarray would cost a separate blocking round trip per array
        log_probs, new_state = _predict_joint_step_k(
            self.model, self.variables, enc_t, tokens, RNNState(h, c))
        log_probs, nh, nc = jax.device_get(
            (log_probs, new_state.h, new_state.c))
        for i, hyp in enumerate(hyps):
            state_i = (nh[:, :, i:i + 1],
                       None if nc is None else nc[:, :, i:i + 1])
            hyp.cache = (log_probs[i].astype(np.float64), state_i)

    def _score_wave_multi(self, requests) -> None:
        """Fulfill several lanes' wave requests with ONE padded device call.

        requests: list of ``(hyps, enc_t)`` as yielded by ``_search_steps``
        — each with its own encoder frame (lanes sit at different stream
        positions).  Rows = all hypotheses concatenated, each against its
        request's frame (``_predict_joint_step_rows``); per-row results are
        identical to per-request ``_score_wave`` calls (pure function,
        padding rows are discarded), so batching changes latency, not
        tokens."""
        if len(requests) == 1:
            self._score_wave(*requests[0])
            return
        from rnntransducer_tpu.models.cells import RNNState
        all_hyps: List[_Hyp] = []
        enc_rows = []
        for hyps, enc_t in requests:
            all_hyps.extend(hyps)
            enc_rows.append(np.broadcast_to(
                np.asarray(enc_t), (len(hyps), np.asarray(enc_t).shape[-1])))
        K = len(all_hyps)
        Kp = 1 << (K - 1).bit_length()  # pad: bounded compile shapes
        enc_cat = np.concatenate(enc_rows)
        enc = np.zeros((Kp, enc_cat.shape[-1]), enc_cat.dtype)
        enc[:K] = enc_cat
        tokens = np.full((Kp,), self.blank_id, np.int32)
        tokens[:K] = [h.y_star[-1] for h in all_hyps]
        h0, c0 = all_hyps[0].state
        h = np.zeros(h0.shape[:2] + (Kp,) + h0.shape[3:], np.float32)
        c = None if c0 is None else np.zeros_like(h)
        for i, hyp in enumerate(all_hyps):
            h[:, :, i] = hyp.state[0][:, :, 0]
            if c is not None:
                c[:, :, i] = hyp.state[1][:, :, 0]
        log_probs, new_state = _predict_joint_step_rows(
            self.model, self.variables, enc, tokens, RNNState(h, c))
        log_probs, nh, nc = jax.device_get(
            (log_probs, new_state.h, new_state.c))
        for i, hyp in enumerate(all_hyps):
            state_i = (nh[:, :, i:i + 1],
                       None if nc is None else nc[:, :, i:i + 1])
            hyp.cache = (log_probs[i].astype(np.float64), state_i)

    def decode_frames_multilane(self, lanes) -> None:
        """Advance several independent sessions together, batching their
        device work: ``lanes`` is a list of ``(session, enc_frames)`` pairs.

        Each round advances every live lane's search to its next wave
        request, then fulfills ALL pending requests in one padded device
        call.  Per-lane results are bit-identical to calling
        ``decode_frames(session, enc_frames)`` lane by lane (asserted by
        tests); device calls per round drop from #lanes to 1.  This is what
        makes LM/hotword fusion viable under continuous batching
        (decode/session_batch.py) — the search and the LM stay host-side
        per lane, but lanes no longer serialize on scoring round trips."""
        gens = {i: self._search_steps(s, e) for i, (s, e) in enumerate(lanes)}
        ready = list(gens)
        while ready:
            requests, owners = [], []
            for i in ready:
                try:
                    requests.append(next(gens[i]))
                    owners.append(i)
                except StopIteration:
                    pass  # lane finished its frames
            if not requests:
                break
            self._score_wave_multi(requests)
            ready = owners

    # ------------------------------------------------------------ session
    def open_session(self) -> "HostBeamSession":
        """Resumable search state: feed encoder frames in arbitrary chunk
        sizes via ``decode_frames`` and settle with ``finalize`` — the frame
        loop is identical to ``decode``'s, so chunked decoding is equal to
        offline decoding by construction (used by the streaming path,
        decode/streaming.py, for LM/hotword fusion)."""
        start_lm_state = self.lm.get_start_state() if self.lm else None
        zero_state = _zero_prednet_state(self.model)
        return HostBeamSession(
            B_hyps=[_Hyp(0.0, [self.blank_id], zero_state, 0.0,
                         start_lm_state)],
            cached_lm={"": (0.0, 0.0, start_lm_state)},
            cached_partial={})

    def current_best(self, session: "HostBeamSession") -> List[int]:
        """Best-so-far tokens for streaming partials (no EOS settling)."""
        best = max(session.B_hyps, key=self._key)
        return best.y_star[1:]

    def finalize(self, session: "HostBeamSession",
                 n_best: Optional[int] = None) -> List[List[int]]:
        B_hyps = session.B_hyps
        if self._use_lm:
            self._score_lm_beams(B_hyps, session.cached_lm,
                                 session.cached_partial, is_eos=True)
        if self.length_norm_alpha is not None:
            a = self.length_norm_alpha
            rank = lambda h: self._key(h) / max(len(h.y_star) - 1, 1) ** a
        else:  # reference ranking: seed blank counted (transducer.py:360)
            rank = lambda h: self._key(h) / len(h.y_star)
        nbest = sorted(B_hyps, key=rank,
                       reverse=True)[:(n_best or self.beam_width)]
        # strip the leading blank seed token
        return [h.y_star[1:] for h in nbest]

    def _merge_B(self, B_hyps: List[_Hyp]) -> List[_Hyp]:
        """Frame-boundary duplicate merge (``merge_duplicates``): identical
        token sequences combine with logsumexp; the better path keeps its
        prednet state.  The LM part of the key is a pure function of
        ``y_star`` (identical across duplicates), so it transfers to the
        merged score unchanged."""
        by_seq: dict = {}
        for h in B_hyps:
            key = tuple(h.y_star)
            ex = by_seq.get(key)
            if ex is None:
                by_seq[key] = h
                continue
            lm_part = ex.lm_score - ex.asr_score
            merged = float(np.logaddexp(ex.asr_score, h.asr_score))
            keep = ex if ex.asr_score >= h.asr_score else h
            keep.asr_score = merged
            keep.lm_score = merged + lm_part
            by_seq[key] = keep
        return list(by_seq.values())

    # ------------------------------------------------------------- decode
    def decode(self, feats, feat_lengths, n_best: Optional[int] = None
               ) -> List[List[int]]:
        """feats: (1, T, n_mels) — like the reference, real-time inference is
        batch-1 by design (transducer.py:267). Returns n-best token lists."""
        model, variables = self.model, self.variables
        enc = np.asarray(_encode(model, variables, feats, feat_lengths)[0])
        n_enc = int(model.cfg.transnet.output_lengths(int(feat_lengths[0])))
        session = self.open_session()
        self.decode_frames(session, enc[:n_enc])
        return self.finalize(session, n_best)

    def decode_frames(self, session: "HostBeamSession",
                      enc_frames: np.ndarray) -> None:
        """Advance the search over encoder frames (T, De), resumable."""
        for wave, enc_t in self._search_steps(session, enc_frames):
            self._score_wave(wave, enc_t)

    def _search_steps(self, session: "HostBeamSession",
                      enc_frames: np.ndarray):
        """The search loop as a generator of device-scoring requests.

        Yields ``(wave_hyps, enc_t)`` whenever the search needs a wave
        scored; the consumer must fill each hypothesis's ``.cache`` with
        ``(log_probs (V,), new_state)`` before resuming.  ``decode_frames``
        pumps it with one device call per request; the multilane pump
        (``decode_frames_multilane``) gathers requests from many sessions
        into one batched call — scoring is a pure function of
        (enc_t, last token, prednet state), so WHO fulfills a request never
        changes the search."""
        cached_lm = session.cached_lm
        cached_partial = session.cached_partial
        B_hyps = session.B_hyps

        for t in range(len(enc_frames)):
            enc_t = enc_frames[t:t + 1]  # numpy; transfers with the wave dispatch
            A_hyps = B_hyps
            B_hyps = []
            for hyp in A_hyps:
                hyp.cache = None  # scores are per-frame (enc_t changed)
            expansions = 0
            while A_hyps:
                most_prob_A = max(A_hyps, key=self._key)
                a_best = self._key(most_prob_A)
                b_best = max((self._key(h) for h in B_hyps),
                             default=float("-inf"))
                if self.improved and b_best >= self.state_beam + a_best:
                    break  # B is unbeatable (transducer.py:295-298)
                expansions += 1
                if expansions > self.max_expansions:
                    break  # safety valve (not in reference)
                if most_prob_A.cache is None:
                    # Score the top of the unscored pool by search key (pop
                    # order), capped: most A-hyps are never popped, so
                    # scoring all of them wastes device work when pruning is
                    # weak and A grows large. most_prob_A is the global max,
                    # hence the unscored max, hence always in the wave.
                    unscored = [h for h in A_hyps
                                if h.cache is None and h is not most_prob_A]
                    unscored.sort(key=self._key, reverse=True)
                    # most_prob_A goes in explicitly: under NaN scores the
                    # sort order is undefined and "max == top of sort" no
                    # longer holds — it must be scored regardless.
                    yield ([most_prob_A]
                           + unscored[:self.wave_size - 1], enc_t)
                A_hyps.remove(most_prob_A)

                log_probs, new_state = most_prob_A.cache
                best_prob = float(np.max(np.delete(log_probs, self.blank_id)))

                new_A: List[_Hyp] = []
                for k, asr_score in enumerate(log_probs):
                    cand = _Hyp(most_prob_A.asr_score + float(asr_score),
                                list(most_prob_A.y_star), most_prob_A.state,
                                most_prob_A.lm_score, most_prob_A.lm_state)
                    if k == self.blank_id:
                        # blank closes the hyp at this frame; lm_score is
                        # immediately settled (transducer.py:323-328)
                        cand.lm_score = most_prob_A.lm_score + float(asr_score)
                        B_hyps.append(cand)
                    else:
                        if self.improved and float(asr_score) < best_prob - self.expand_beam:
                            continue  # expand_beam prune (transducer.py:333-342)
                        if cand.y_star[-1] != k:  # consecutive-dup drop
                            cand.y_star.append(k)
                        cand.state = new_state
                        new_A.append(cand)
                A_hyps.extend(new_A)
                if self._use_lm and new_A:
                    # only the fresh expansions: _score_lm_beams is a pure
                    # per-hyp function of y_star (+ monotone caches), so
                    # re-scoring the surviving A members would only re-decode
                    # every full token history each expansion — O(|A|) decode
                    # calls per pop in the weak-pruning regime
                    self._score_lm_beams(new_A, cached_lm, cached_partial,
                                         is_eos=False)
                if len(A_hyps) > self.max_live:
                    # safety valve (not in reference): when pruning is weak
                    # (flat distributions) A grows without bound and the
                    # host-side max/remove go O(|A|); keep the top of the
                    # pop order. Runs AFTER LM rescoring so fresh expansions
                    # rank by their real key, not the parent's stale
                    # lm_score. No effect in the trained-model regime,
                    # where |A| stays near the beam width.
                    A_hyps.sort(key=self._key, reverse=True)
                    del A_hyps[self.max_live:]
                best_next_A = max((self._key(h) for h in A_hyps),
                                  default=float("-inf"))
                best_next_B = max(self._key(h) for h in B_hyps)
                if len(B_hyps) >= self.beam_width and best_next_B > best_next_A:
                    break
            if self.merge_duplicates and len(B_hyps) > 1:
                # after the frame's expansion loop: every B hyp is
                # blank-closed, so merging here is alignment-consistent
                B_hyps = self._merge_B(B_hyps)

        session.B_hyps = B_hyps
