"""RNN-T beam search with improved pruning and LM shallow fusion.

Capability-equivalent of the reference's ``recognize_beams``
(``networks/transducer.py:215-361``): the Graves A/B-set beam search with the
"improved" pruning of arXiv:1911.01629 (state_beam early exit, expand_beam
candidate pruning), KenLM-style shallow fusion gated on completed words
(``_get_lm_beams``, ``transducer.py:147-213``) and hotword boosting.

Device/host split: prediction-net step + joint + log-softmax run as one jitted
single-step function on device; hypothesis management, LM scoring and the
hotword trie are host work by nature (SURVEY.md §7 design stance 6).

Faithful reference quirks kept (documented):
* expansions feed ``y_star[-1]`` (last *appended* token) to the prediction
  net (``transducer.py:303``), not the last emitted one;
* the final ranking normalizes by ``len(y_star)`` which includes the initial
  blank (``transducer.py:360``);
* duplicate hypotheses are not merged (scores are per-expansion, not
  marginalized).
"""

from __future__ import annotations

from functools import partial
from typing import Iterable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from rnntransducer_tpu.decode.hotwords import DEFAULT_HOTWORD_WEIGHT, HotwordScorer
from rnntransducer_tpu.models.transducer import RNNTransducer


@partial(jax.jit, static_argnames=("model",))
def _encode(model: RNNTransducer, variables, feats, feat_lengths):
    enc, _ = model.apply(variables, feats, feat_lengths, method=model.encode)
    return enc


def _zero_prednet_state(model: RNNTransducer):
    cfg = model.cfg.prednet
    h = jnp.zeros((cfg.num_layers, 1, 1, cfg.hidden_size), jnp.float32)
    c = h if cfg.rnn_type.lower() == "lstm" else None
    from rnntransducer_tpu.models.cells import RNNState
    return RNNState(h, c)


@partial(jax.jit, static_argnames=("model",))
def _predict_joint_step(model: RNNTransducer, variables, enc_t, token, state):
    """enc_t: (1, De); token: (1,); state: RNNState. Returns (log_probs (V,),
    new_state)."""
    dec_out, new_state = model.apply(variables, token, state,
                                     method=model.predict_step)
    logits = model.apply(variables, enc_t, dec_out, method=model.joint_step)
    return jax.nn.log_softmax(logits[0]), new_state


class _Hyp:
    __slots__ = ("asr_score", "y_star", "state", "lm_score", "lm_state")

    def __init__(self, asr_score, y_star, state, lm_score, lm_state):
        self.asr_score = asr_score
        self.y_star = y_star
        self.state = state
        self.lm_score = lm_score
        self.lm_state = lm_state


class BeamSearchDecoder:
    def __init__(self, model: RNNTransducer, variables, blank_id: int = 0,
                 tokenizer=None, beam_width: int = 5, improved: bool = True,
                 state_beam: float = 4.6, expand_beam: float = 2.3,
                 lm=None, hotwords: Optional[Iterable[str]] = None,
                 hotword_weight: float = DEFAULT_HOTWORD_WEIGHT,
                 max_expansions_per_frame: int = 200):
        self.model = model
        self.variables = variables
        self.blank_id = blank_id
        self.tokenizer = tokenizer
        self.beam_width = beam_width
        self.improved = improved
        self.state_beam = state_beam
        self.expand_beam = expand_beam
        self.lm = lm
        self.hotword_scorer = HotwordScorer.build_scorer(hotwords,
                                                         weight=hotword_weight)
        self.max_expansions = max_expansions_per_frame
        self._use_lm = lm is not None or bool(self.hotword_scorer)
        if self._use_lm and tokenizer is None:
            raise ValueError("LM/hotword fusion requires a tokenizer")

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
                    continue
                hyp.lm_score = (hyp.asr_score + hw.score(text) +
                                hw.score_partial_token(text.split()[-1]))
            return

        delim_id = tok.word_delimiter_token_id
        for hyp in beams:
            lm_score = 0.0
            text = tok.decode(hyp.y_star, group_tokens=False)
            if not text:
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

    # ------------------------------------------------------------- decode
    def decode(self, feats, feat_lengths, n_best: Optional[int] = None
               ) -> List[List[int]]:
        """feats: (1, T, n_mels) — like the reference, real-time inference is
        batch-1 by design (transducer.py:267). Returns n-best token lists."""
        model, variables = self.model, self.variables
        enc = np.asarray(_encode(model, variables, feats, feat_lengths)[0])
        T = int(feat_lengths[0])

        start_lm_state = self.lm.get_start_state() if self.lm else None
        cached_lm = {"": (0.0, 0.0, start_lm_state)}
        cached_partial: dict = {}

        # zero prednet state template (== feeding with None in the reference)
        zero_state = _zero_prednet_state(model)

        B_hyps = [_Hyp(0.0, [self.blank_id], zero_state, 0.0, start_lm_state)]

        for t in range(T):
            enc_t = jnp.asarray(enc[t:t + 1])
            A_hyps = B_hyps
            B_hyps = []
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
                A_hyps.remove(most_prob_A)

                log_probs, new_state = _predict_joint_step(
                    model, variables, enc_t,
                    jnp.array([most_prob_A.y_star[-1]], jnp.int32),
                    most_prob_A.state)
                log_probs = np.asarray(log_probs, np.float64)
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
                    self._score_lm_beams(A_hyps, cached_lm, cached_partial,
                                         is_eos=False)
                best_next_A = max((self._key(h) for h in A_hyps),
                                  default=float("-inf"))
                best_next_B = max(self._key(h) for h in B_hyps)
                if len(B_hyps) >= self.beam_width and best_next_B > best_next_A:
                    break

        if self._use_lm:
            self._score_lm_beams(B_hyps, cached_lm, cached_partial, is_eos=True)
        nbest = sorted(B_hyps, key=lambda h: self._key(h) / len(h.y_star),
                       reverse=True)[:(n_best or self.beam_width)]
        # strip the leading blank seed token
        return [h.y_star[1:] for h in nbest]
