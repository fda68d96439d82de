"""Device-resident character n-gram LM for frame-synchronous fusion.

The host LM-fusion path (``decode/ngram_lm.py`` + ``decode/beam.py`` /
``session_batch`` fused mode) mirrors the reference's word-level KenLM
shallow fusion (``/root/reference/networks/transducer.py:147-213``):
word-boundary rescoring on the host between device calls.  This module is
the TPU-native complement the reference has no analogue for: a
*grapheme-level* n-gram LM materialized as a dense backoff-resolved
log-prob table in HBM and added to the extension scores INSIDE the
compiled beam frame scan (``decode/beam_batched.py``) — LM fusion with
zero host synchronization, so it rides the batched serving tick at full
speed (one table gather per expansion round, no host round trips).

For the reference's 72-grapheme vocabulary the tables are tiny:
order 2 = 72^2 floats (20 KB), order 3 = 72^3 (1.5 MB).  Built once at
load from any LM file ``NGramLM.load`` accepts (text ARPA, kenlm
PROBING binary, pyctcdecode directory) whose vocabulary is the grapheme
set, then reused for every utterance and serving session.

Fusion semantics (deliberately simple and fully on-device): every
non-blank extension candidate's score gains ``weight * ln p(c | ctx)``,
where ``ctx`` is the hypothesis's last ``order-1`` *emitted* graphemes
(consecutive-duplicate drops follow the token buffer, exactly like the
reference's dedup rule); blank transitions are not LM events.  Contexts
shorter than ``order-1`` (sequence start) back off to the lower-order
distribution — the blank id in a context slot means "no history there".
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Tuple

import numpy as np

import jax

_LOG10 = math.log(10.0)

# score for graphemes with no LM word (specials, OOV): matches the host
# path's pyctcdecode-style UNK offset order of magnitude
DEFAULT_OOV_LOGP = -10.0


class DeviceCharLM:
    """A dense char-LM table plus its fusion weight.

    ``table``: numpy/jax array of shape ``(V,) * order`` holding natural-log
    ``p(c | c_{-order+1} .. c_{-1})`` with ARPA backoff resolved at build
    time.  ``weight``: shallow-fusion scale (the char-level analogue of the
    host path's alpha).
    """

    def __init__(self, table, weight: float = 0.3):
        if table.ndim < 2:
            raise ValueError("char-LM table must be at least order 2 "
                             f"(got ndim={table.ndim})")
        self.table = table
        self.weight = float(weight)

    @property
    def order(self) -> int:
        return self.table.ndim

    @property
    def context(self) -> int:
        """Tokens of history the beam carry must track (order - 1)."""
        return self.table.ndim - 1

    def _tree_flatten(self):
        return (self.table, self.weight), None

    @classmethod
    def _tree_unflatten(cls, aux, children):
        # bypass __init__: under jit the children are tracers and the
        # eager-only validation/coercion there must not run
        obj = object.__new__(cls)
        obj.table, obj.weight = children
        return obj

    @classmethod
    def load(cls, path: str, tokenizer, weight: float = 0.3,
             max_order: Optional[int] = None,
             oov_logp: float = DEFAULT_OOV_LOGP) -> "DeviceCharLM":
        """Build from any LM file ``NGramLM.load`` accepts; the LM's words
        must be the tokenizer's graphemes (a char-level LM)."""
        from rnntransducer_tpu.decode.ngram_lm import NGramLM

        lm = NGramLM.load(path)
        table = build_char_lm_table(lm, tokenizer, max_order=max_order,
                                    oov_logp=oov_logp)
        return cls(table, weight=weight)


jax.tree_util.register_pytree_node(
    DeviceCharLM, DeviceCharLM._tree_flatten, DeviceCharLM._tree_unflatten)


def _token_strings(tokenizer) -> List[Optional[str]]:
    """Token id -> LM word string; None for ids that are not LM events
    (blank/pad, unk, bos/eos, <extra_*> fillers).  The word delimiter maps
    to itself — a char LM trained on delimiter-separated text scores it
    like any grapheme."""
    V = tokenizer.vocab_size
    out: List[Optional[str]] = [None] * V
    special = getattr(tokenizer, "_special_ids", set())
    for i in range(V):
        tok = tokenizer.ids_to_tokens.get(i)
        if tok is None or i in special:
            continue
        out[i] = tok
    return out


def build_char_lm_table(lm, tokenizer, max_order: Optional[int] = None,
                        oov_logp: float = DEFAULT_OOV_LOGP,
                        dtype=np.float32) -> np.ndarray:
    """Materialize ``ln p(c | ctx)`` for every (context, char) pair as a
    dense ``(V,) * order`` array, ARPA backoff resolved by the native
    scorer (``ngram_lm.NGramLM.raw_score``).

    Context slots holding the blank id (or any non-LM token) are skipped
    when forming the LM history, so rows "containing blank" hold the
    correct lower-order distribution — which is exactly what the beam
    carry's blank-initialized context produces at sequence start.

    Cost: V^order backoff lookups through a resolved-context cache —
    instant at order 2, ~1 s at order 3 on the 72-grapheme vocab; order 4
    (27M entries, ~100 MB) is refused unless ``max_order`` lowers it.
    """
    import itertools

    order = lm.order if max_order is None else min(lm.order, max_order)
    if order < 2:
        raise ValueError(f"char LM must be at least order 2 (got {order})")
    V = tokenizer.vocab_size
    if V ** order > 1_000_000:
        raise ValueError(
            f"dense char-LM table V^order = {V}^{order} = {V ** order:,} "
            "entries is too large to materialize; pass max_order<=3 (the "
            "host LM-fusion path has no order limit)")
    words = _token_strings(tokenizer)
    wids = [lm.word_id(w) if w is not None else -1 for w in words]

    # one scored row per *resolved* context (blank-skipped word-id tuple):
    # contexts that only differ in where their blanks sit share rows
    row_cache: Dict[Tuple[int, ...], np.ndarray] = {}

    def row(ctx_wids: Tuple[int, ...]) -> np.ndarray:
        r = row_cache.get(ctx_wids)
        if r is None:
            r = np.full((V,), oov_logp, dtype)
            for v in range(V):
                if wids[v] >= 0:
                    r[v] = _LOG10 * lm.raw_score(ctx_wids, wids[v])
            row_cache[ctx_wids] = r
        return r

    table = np.empty((V,) * order, dtype)
    for ctx in itertools.product(range(V), repeat=order - 1):
        ctx_wids = tuple(wids[c] for c in ctx if wids[c] >= 0)
        table[ctx] = row(ctx_wids)
    return table
