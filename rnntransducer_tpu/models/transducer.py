"""RNN-Transducer model: encoder + prediction net + joint.

Capability-equivalent to the reference's ``JointNet`` wrapper
(``networks/transducer.py:27-93``), which combines ``AudioTransNet``,
``TextPredNet`` and the joint projection into the training forward that emits
the (B, T, U+1, V) logits lattice.  Decoding lives in
``rnntransducer_tpu.decode`` (scan-based greedy, host/device beam) rather than
as methods here — the decode loops are framework features, not model layers.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from rnntransducer_tpu.config import ModelConfig
from rnntransducer_tpu.models.cells import RNNState
from rnntransducer_tpu.models.encoder import AudioEncoder
from rnntransducer_tpu.models.joint import JointNetwork
from rnntransducer_tpu.models.prednet import PredictionNet


class RNNTransducer(nn.Module):
    cfg: ModelConfig
    unroll: int = 1

    def setup(self):
        if self.cfg.transnet.arch == "conformer":
            from rnntransducer_tpu.models.conformer import ConformerEncoder
            self.encoder = ConformerEncoder(self.cfg.transnet, self.unroll)
        else:
            self.encoder = AudioEncoder(self.cfg.transnet, self.unroll)
        self.prednet = PredictionNet(self.cfg.prednet, self.unroll)
        # remat: recompute the broadcast/concat/GELU lattice in the backward
        # pass instead of storing (B,T,U,De+Dd) activations — trades one extra
        # joint matmul for the dominant HBM allocation at training time
        joint_cls = nn.remat(JointNetwork) if self.cfg.jointnet.remat \
            else JointNetwork
        self.joint = joint_cls(self.cfg.jointnet)

    def __call__(self, audio, audio_lengths, text, text_lengths,
                 deterministic: bool = True):
        """Training/validation forward (``networks/transducer.py:73-93``).

        audio: (B, T, n_mels); text: (B, U+1) blank-prepended labels.
        Returns (B, T, U+1, V) logits.
        """
        enc, _ = self.encoder(audio, audio_lengths, deterministic=deterministic)
        dec, _ = self.prednet(text, text_lengths, deterministic=deterministic)
        return self.joint(enc, dec)

    # -- decode-path building blocks (bound via nn.apply with method=...) ---
    def encode(self, audio, audio_lengths=None, initial_state: Optional[RNNState] = None,
               deterministic: bool = True) -> Tuple[jnp.ndarray, RNNState]:
        return self.encoder(audio, audio_lengths, initial_state, deterministic)

    def predict(self, text, text_lengths=None, initial_state: Optional[RNNState] = None,
                deterministic: bool = True) -> Tuple[jnp.ndarray, RNNState]:
        return self.prednet(text, text_lengths, initial_state, deterministic)

    def predict_step(self, token, state: Optional[RNNState]):
        return self.prednet.step(token, state)

    def joint_step(self, enc_t, dec_u):
        """Pointwise joint for decode: enc_t (B, De), dec_u (B, Dd) ->
        (B, V) logits."""
        return self.joint(enc_t, dec_u)

    def joint_factors(self, enc, dec):
        """Rank factors (A, C) of the concat joint over full sequences:
        enc (B, T, De), dec (B, U+1, Dd) -> A (B, T, V), C (B, U+1, V) with
        logits[b, t, u, :] == A[b, t, :] + C[b, u, :] (see
        ``JointNetwork.factors``)."""
        return self.joint.factors(enc, dec)

    def init_variables(self, rng, max_t: int = 8, max_u: int = 4):
        audio = jnp.zeros((1, max_t, self.cfg.transnet.input_size), jnp.float32)
        text = jnp.zeros((1, max_u), jnp.int32)
        return self.init(rng, audio, jnp.array([max_t]), text, jnp.array([max_u]))
