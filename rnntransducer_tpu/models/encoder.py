"""Audio encoder ("transcription network").

Capability-equivalent to the reference's ``AudioTransNet``
(``networks/encoder.py:20-108``): multi-layer (bi)directional LSTM/GRU/RNN over
log-mel frames followed by an output projection — but built on masked
``lax.scan`` cells (static shapes) instead of sort/pack_padded/cuDNN/unsort.
The returned ``RNNState`` doubles as the streaming-chunk carry (the reference
has no streaming encoder API; its README bills the model as streaming-capable
via the decoder's hidden-state threading only).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from rnntransducer_tpu.config import TransNetConfig
from rnntransducer_tpu.models.cells import RNNState, StackedRNN


class AudioEncoder(nn.Module):
    cfg: TransNetConfig
    unroll: int = 1

    def setup(self):
        self.rnn = StackedRNN(
            input_size=self.cfg.input_size,
            hidden_size=self.cfg.hidden_size,
            num_layers=self.cfg.num_layers,
            rnn_type=self.cfg.rnn_type.lower(),
            dropout=self.cfg.dropout,
            bidirectional=self.cfg.bidirectional,
            unroll=self.unroll,
            remat=self.cfg.remat,
            scan_layers=self.cfg.scan_layers,
            use_pallas=self.cfg.use_pallas_cells,
        )
        # reference: out_proj = Linear(2H if bidir else H, output_size)
        # (networks/encoder.py:76,103)
        self.out_proj = nn.Dense(self.cfg.output_size)

    def __call__(self, inputs, lengths=None, initial_state: Optional[RNNState] = None,
                 deterministic: bool = True) -> Tuple[jnp.ndarray, RNNState]:
        """inputs: (B, T, n_mels) log-mel frames. Returns ((B, T, output_size),
        carry state for streaming chunks)."""
        out, state = self.rnn(inputs, lengths, initial_state, deterministic)
        return self.out_proj(out), state
