"""Prediction network.

Capability-equivalent to the reference's ``TextPredNet``
(``networks/decoder.py:21-126``): embedding (pad row zeroed, matching
``nn.Embedding(padding_idx=pad_token_id)`` at ``networks/decoder.py:69``) ->
unidirectional RNN -> projection, with two modes:

* batch training mode over a full (blank-prepended) label sequence, and
* stateful single-step mode for decoding, where the carried ``RNNState``
  replaces the reference's ``prev_hidden_state`` threading
  (``networks/decoder.py:121-123``).
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

    def __call__(self, tokens, lengths=None, initial_state: Optional[RNNState] = None,
                 deterministic: bool = True) -> Tuple[jnp.ndarray, RNNState]:
        """tokens: (B, U+1) blank-prepended label ids. Returns
        ((B, U+1, output_size), final RNNState)."""
        emb = self._embed(tokens)
        out, state = self.rnn(emb, lengths, initial_state, deterministic)
        return self.out_proj(out), state

    def step(self, token, state: Optional[RNNState]) -> Tuple[jnp.ndarray, RNNState]:
        """Single decode step. token: (B,) int ids. Returns ((B, output_size),
        new state)."""
        emb = self._embed(token)
        out, state = self.rnn.step(emb, state)
        return self.out_proj(out), state
