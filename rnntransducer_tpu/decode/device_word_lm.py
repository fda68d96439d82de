"""Device-resident WORD-boundary n-gram LM rescoring for the batched beam.

The reference fuses a word-level KenLM on the host: every beam expansion
that completes a word walks the Python/C++ scorer
(``/root/reference/networks/transducer.py:168-213``).  Round 4 measured
that design failing under streaming load — per-expansion host ARPA scoring
serializes all lanes on the serving host's cores and the with-LM session
sweep never completed its windows (BASELINE.md "Word-LM fusion under
streaming load").  This module is the TPU-native answer: the lexicon and
the word n-gram live in HBM as three dense tables, and word-boundary
rescoring happens INSIDE the compiled beam frame scan with zero host
round trips — the same design point as the char LM (``device_lm.py``),
lifted from graphemes to words.

How it works (per beam hypothesis, entirely on device):

* a **lexicon trie DFA** over graphemes tracks the in-progress word:
  ``trie_next[node, grapheme] -> node`` (root = 0; any prefix that leaves
  the lexicon falls into an absorbing DEAD node).  Appending a grapheme
  advances the node; appending the word delimiter resets it to root.
* ``node_word[node]`` maps a node to the word id it EXACTLY completes
  (``n_words`` = not-a-word → scored as OOV).
* when a hypothesis extends with the **word delimiter**, the candidate's
  score gains the fused LM bonus ``rows[state, node_word[node]]`` — the
  word n-gram probability of the just-completed word given the LM state —
  before top-K selection, i.e. true shallow fusion in the search, not
  post-hoc rescoring.  An empty current word (node == root) scores
  nothing, matching the reference's ``text.split()`` gating.
* the **LM state** is the previous in-vocab word id (``n_words`` = the
  start-of-stream ``<s>`` state); an OOV word leaves the state unchanged,
  exactly like the host scorer (``ngram_lm.py score``: OOV keeps
  ``prev_state``).

``rows`` bakes the full host-path scoring formula per (state, word):
``alpha * ln p(w | state) + beta`` (word-insertion bonus), with the OOV
column carrying ``alpha * unk_offset + beta`` — so device and host fusion
agree on the score of every completed word.  ``settle_word_lm`` applies
the host path's ``is_last_word`` behavior at end of stream: the
in-progress word (if any) is scored, then ``</s>`` from the resulting
state.

Scale: the tables are dense, so this path targets vocabularies up to a
few thousand words — ``rows`` is (W+1)^2 floats (a 4k-word LM = 64 MB
in HBM) and the trie is (nodes, V) int32.  Higher-order LMs project onto
their bigram marginals (context = last word) for the device tables; the
host A/B beam (``decode/beam.py``) remains the unlimited-order,
unlimited-vocabulary path for offline decoding.
"""

from __future__ import annotations

import math
from typing import List, Optional, Sequence

import numpy as np

import jax

_LOG10 = math.log(10.0)


class DeviceWordLM:
    """Dense device tables for word-boundary fusion (module docstring).

    ``trie_next``: (N, V) int32; ``node_word``: (N,) int32 (``n_words`` =
    OOV); ``rows``: (W+1, W+1) float32 fused scores, row = LM state
    (W = start), col = completed word (W = OOV); ``eos_col``: (W+1,)
    float32 ``alpha * ln p(</s> | state)``; ``delimiter_id``: the grapheme
    id that closes words."""

    def __init__(self, trie_next, node_word, rows, eos_col, next_state,
                 delimiter_id: int):
        import jax.numpy as jnp
        # device-resident once at build: jitted decode calls then reuse the
        # same buffers instead of re-transferring numpy constants per call
        trie_next, node_word, rows, eos_col, next_state = (
            jnp.asarray(a) for a in (trie_next, node_word, rows, eos_col,
                                     next_state))
        self.trie_next = trie_next
        self.node_word = node_word
        self.rows = rows
        self.eos_col = eos_col
        # next_state[w]: LM state after completing word w — w's own state
        # if the LM knows the word, else -1 = keep the previous state
        # (host semantics: OOV keeps prev_state, ngram_lm.py score())
        self.next_state = next_state
        self.delimiter_id = int(delimiter_id)

    @property
    def n_words(self) -> int:
        return self.rows.shape[1] - 1

    @property
    def start_state(self) -> int:
        return self.rows.shape[0] - 1

    def tables(self):
        """The pytree the jitted beam functions take (arrays only)."""
        import jax.numpy as jnp
        return (jnp.asarray(self.trie_next), jnp.asarray(self.node_word),
                jnp.asarray(self.rows), jnp.asarray(self.eos_col),
                jnp.asarray(self.next_state))


def _wlm_flatten(w: "DeviceWordLM"):
    return ((w.trie_next, w.node_word, w.rows, w.eos_col, w.next_state),
            w.delimiter_id)


def _wlm_unflatten(delimiter_id, children):
    # bypass __init__: under jit the children are tracers
    obj = object.__new__(DeviceWordLM)
    (obj.trie_next, obj.node_word, obj.rows, obj.eos_col,
     obj.next_state) = children
    obj.delimiter_id = delimiter_id
    return obj


jax.tree_util.register_pytree_node(DeviceWordLM, _wlm_flatten,
                                   _wlm_unflatten)


def build_device_word_lm(lm, tokenizer, words: Sequence[str],
                         delimiter_id: Optional[int] = None) -> DeviceWordLM:
    """Build the device tables from a host ``NGramLM`` and its lexicon.

    ``lm``: ``decode.ngram_lm.NGramLM`` (any format it loads — text ARPA,
    kenlm binary, pyctcdecode dir); its ``alpha``/``beta``/``unk_offset``
    are baked into the tables so device scores match the host ``score()``
    formula.  ``words``: the closed lexicon to spot words with (each a
    grapheme string the tokenizer can encode).  ``delimiter_id`` defaults
    to the tokenizer's word-delimiter token.
    """
    if delimiter_id is None:
        delimiter_id = tokenizer.word_delimiter_token_id
        if delimiter_id is None:
            raise ValueError("word-boundary fusion needs a word-delimiter "
                             "token (grapheme vocab.json)")
    V = tokenizer.vocab_size
    W = len(words)
    if W == 0:
        raise ValueError("empty lexicon")

    # ---- lexicon trie over grapheme ids (root 0, DEAD absorbing) ----
    # words may be grapheme STRINGS (encoded via the tokenizer) or
    # grapheme-ID sequences (used directly — the only safe form when a
    # vocab has multi-character token names like <extra_*>, whose strings
    # do not round-trip through encode())
    seqs: List[List[int]] = []
    for w in words:
        if isinstance(w, str):
            ids = tokenizer.encode(w)
            if (not ids or any(i == delimiter_id for i in ids)
                    or tokenizer.decode(ids, group_tokens=False) != w):
                raise ValueError(
                    f"lexicon word {w!r} does not round-trip through the "
                    "tokenizer (special/multi-char token names?) — pass "
                    "grapheme-id sequences instead")
        else:
            ids = [int(g) for g in w]
            if not ids or any(i == delimiter_id for i in ids):
                raise ValueError(f"lexicon id-sequence {w!r} is empty or "
                                 "contains the delimiter")
        seqs.append(ids)
    children: List[dict] = [{}]  # node -> {grapheme: node}
    node_of_word = {}
    for wi, ids in enumerate(seqs):
        n = 0
        for g in ids:
            nxt = children[n].get(g)
            if nxt is None:
                children.append({})
                nxt = len(children) - 1
                children[n][g] = nxt
            n = nxt
        node_of_word[n] = wi  # duplicate words: last one wins, like dicts
    N = len(children) + 1  # + DEAD
    DEAD = N - 1
    trie_next = np.full((N, V), DEAD, np.int32)
    for n, ch in enumerate(children):
        for g, nxt in ch.items():
            trie_next[n, g] = nxt
    node_word = np.full((N,), W, np.int32)
    for n, wi in node_of_word.items():
        node_word[n] = wi

    # ---- fused score rows per LM state (host formula, ngram_lm.py) ----
    # id-sequence words look up the LM by their joined token names — the
    # same convention an ARPA built from this lexicon uses
    wids = [lm.word_id(w if isinstance(w, str) else
                       "".join(tokenizer.ids_to_tokens[g] for g in w))
            for w in words]
    alpha, beta = lm.alpha, lm.beta
    unk_fused = alpha * lm.unk_offset + beta
    bos = lm.word_id("<s>")
    eos = lm.word_id("</s>")
    states = [((wid,) if wid >= 0 else ()) for wid in wids]
    states.append((bos,) if bos >= 0 else ())  # start state (index W)
    rows = np.full((W + 1, W + 1), unk_fused, np.float32)
    eos_col = np.zeros((W + 1,), np.float32)
    for s, ctx in enumerate(states):
        for j, wid in enumerate(wids):
            if wid >= 0:
                rows[s, j] = (alpha * _LOG10 * lm.raw_score(ctx, wid)
                              + beta)
            # else: stays at the OOV penalty (word absent from the LM)
        if eos >= 0:
            eos_col[s] = alpha * _LOG10 * lm.raw_score(ctx, eos)
    next_state = np.full((W + 1,), -1, np.int32)
    for j, wid in enumerate(wids):
        if wid >= 0:
            next_state[j] = j
    return DeviceWordLM(trie_next, node_word, rows, eos_col, next_state,
                        delimiter_id)
