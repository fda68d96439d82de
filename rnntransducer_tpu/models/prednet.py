"""Prediction network.

Capability-equivalent to the reference's ``TextPredNet``
(``networks/decoder.py:21-126``): embedding (pad row zeroed, matching
``nn.Embedding(padding_idx=pad_token_id)`` at ``networks/decoder.py:69``) ->
unidirectional RNN -> projection, with two modes:

* batch training mode over a full (blank-prepended) label sequence, and
* stateful single-step mode for decoding, where the carried ``RNNState``
  replaces the reference's ``prev_hidden_state`` threading
  (``networks/decoder.py:121-123``).

Beyond reference parity, ``rnn_type="stateless"`` selects the STATELESS
prediction network (Ghodsi et al. 2020, arXiv:2002.08898): the recurrent
stack is replaced by a fixed n-gram context — the concatenated embeddings
of the last ``num_layers + 1`` labels through one dense projection.  The
production-standard lightweight prednet: near-parity accuracy, and decode
ticks drop the prednet scan entirely (one embed + concat + GEMM).

The decode state trick: the context rides the SAME ``RNNState`` layout the
recurrent prednet uses — ``h[i] = embedding(y_{last-i})`` with shape
(num_layers, 1, B, hidden) — so every decode surface (greedy / batched
beam / host beam / streaming / continuous batching) works unchanged, and
the all-zeros initial state the surfaces build is semantically exact: the
pad/blank row embeds to zero (padding_idx), so "zero state" IS the
all-blank context.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from rnntransducer_tpu.config import PredNetConfig
from rnntransducer_tpu.models.cells import RNNState, StackedRNN


class PredictionNet(nn.Module):
    cfg: PredNetConfig
    unroll: int = 1

    def setup(self):
        self.embedding = nn.Embed(
            num_embeddings=self.cfg.embedding_size,
            features=self.cfg.hidden_size,
            embedding_init=nn.initializers.normal(stddev=1.0),
        )
        self.stateless = self.cfg.rnn_type.lower() == "stateless"
        if self.stateless:
            # context order C = num_layers + 1 labels (the carried state
            # holds C-1 = num_layers embeddings; bigram context at the
            # paper's sweet spot is num_layers=1)
            if self.cfg.dropout > 0:
                self.drop = nn.Dropout(rate=self.cfg.dropout)
        else:
            self.rnn = StackedRNN(
                input_size=self.cfg.hidden_size,
                hidden_size=self.cfg.hidden_size,
                num_layers=self.cfg.num_layers,
                rnn_type=self.cfg.rnn_type.lower(),
                dropout=self.cfg.dropout,
                bidirectional=False,
                unroll=self.unroll,
                use_pallas=self.cfg.use_pallas_cells,
            )
        self.out_proj = nn.Dense(self.cfg.output_size)

    def _embed(self, tokens):
        emb = self.embedding(tokens)
        # padding_idx semantics: pad rows embed to zero and receive no grad
        # through them (networks/decoder.py:69).
        pad_mask = (tokens != self.cfg.pad_token_id)[..., None]
        return jnp.where(pad_mask, emb, jnp.zeros_like(emb))

    # ---- stateless (n-gram context) mode -------------------------------
    def _stateless_call(self, tokens, lengths, initial_state, deterministic):
        """tokens: (B, U+1).  Position u conditions on tokens[u-C+1 .. u]
        (out-of-range context = blank = zero embedding, or the carried
        ``initial_state`` context when resuming a label stream)."""
        emb = self._embed(tokens)                      # (B, U1, H)
        B, U1, H = emb.shape
        nctx = self.cfg.num_layers                     # carried embeddings
        # extended timeline: the nctx pre-sequence context embeddings in
        # CHRONOLOGICAL order (h[i] = (i+1)-back label, so reverse), then
        # the sequence itself; every shifted view below reads from it
        if initial_state is None:
            pre = jnp.zeros((B, nctx, H), emb.dtype)
        else:
            pre = jnp.flip(jnp.swapaxes(initial_state.h[:, 0], 0, 1),
                           axis=1).astype(emb.dtype)   # (B, nctx, H)
        ext = jnp.concatenate([pre, emb], axis=1)      # (B, nctx+U1, H)
        feats = jnp.concatenate(
            [ext[:, nctx - s:nctx - s + U1] for s in range(nctx + 1)],
            axis=-1)                                   # (B, U1, (nctx+1)*H)
        if self.cfg.dropout > 0 and not deterministic:
            feats = self.drop(feats, deterministic=False)
        out = self.out_proj(feats)

        # final state: h[i] = embedding of the token at valid position
        # len-1-i, falling back into the inherited context (pre) for
        # positions before the sequence start; len=0 keeps `pre` verbatim
        ln = (jnp.full((B,), U1, jnp.int32) if lengths is None
              else lengths.astype(jnp.int32))
        hs = []
        for i in range(nctx):
            pos = jnp.clip(nctx + ln - 1 - i, 0, nctx + U1 - 1)
            hs.append(jnp.take_along_axis(
                ext, pos[:, None, None].repeat(H, -1), axis=1)[:, 0])
        h = jnp.stack(hs, 0)[:, None]                  # (nctx, 1, B, H)
        return out, RNNState(h, None)

    def _stateless_step(self, token, state):
        emb = self._embed(token)                       # (B, H)
        B, H = emb.shape
        nctx = self.cfg.num_layers
        if state is None:
            h = jnp.zeros((nctx, 1, B, H), emb.dtype)  # all-blank context
        else:
            h = state.h
        parts = [emb] + [h[i, 0].astype(emb.dtype) for i in range(nctx)]
        out = self.out_proj(jnp.concatenate(parts, axis=-1))
        new_h = jnp.concatenate([emb[None, None].astype(h.dtype), h[:-1]], 0) \
            if nctx > 1 else emb[None, None].astype(h.dtype)
        return out, RNNState(new_h, None)

    # ---- public API (both modes) ---------------------------------------
    def __call__(self, tokens, lengths=None, initial_state: Optional[RNNState] = None,
                 deterministic: bool = True) -> Tuple[jnp.ndarray, RNNState]:
        """tokens: (B, U+1) blank-prepended label ids. Returns
        ((B, U+1, output_size), final RNNState)."""
        if self.stateless:
            return self._stateless_call(tokens, lengths, initial_state,
                                        deterministic)
        emb = self._embed(tokens)
        out, state = self.rnn(emb, lengths, initial_state, deterministic)
        return self.out_proj(out), state

    def step(self, token, state: Optional[RNNState]) -> Tuple[jnp.ndarray, RNNState]:
        """Single decode step. token: (B,) int ids. Returns ((B, output_size),
        new state)."""
        if self.stateless:
            return self._stateless_step(token, state)
        emb = self._embed(token)
        out, state = self.rnn.step(emb, state)
        return self.out_proj(out), state
