"""Joint network.

Capability-equivalent to the reference's ``JointNet.joint``
(``networks/transducer.py:41-71``): broadcast encoder (B,T,1,De) against
decoder (B,1,U+1,Dd), combine, GELU(tanh), Linear -> num_classes.

The reference deliberately uses **concat** rather than add
(``networks/transducer.py:64-67``).  We keep reference semantics under
``combine="concat"`` and offer ``combine="add"`` — the standard additive
joint: each side gets its own dense projection to ``hidden_size``, the
activation applies to the SUM, so the broadcast lattice carries hidden_size
(typically < De+Dd) activations and works for De != Dd.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from rnntransducer_tpu.config import JointNetConfig


class JointNetwork(nn.Module):
    cfg: JointNetConfig

    def setup(self):
        self.fc = nn.Dense(self.cfg.num_classes)
        if self.cfg.combine == "add":
            self.enc_proj = nn.Dense(self.cfg.hidden_size)
            self.dec_proj = nn.Dense(self.cfg.hidden_size)
        elif self.cfg.combine != "concat":
            raise ValueError(f"unknown combine: {self.cfg.combine}")

    @staticmethod
    def _broadcast(enc, dec):
        if enc.ndim == dec.ndim and enc.ndim >= 3:
            # (B, T, De) x (B, U, Dd) -> (B, T, U, *)
            T, U = enc.shape[-2], dec.shape[-2]
            enc = jnp.broadcast_to(enc[..., :, None, :],
                                   enc.shape[:-2] + (T, U, enc.shape[-1]))
            dec = jnp.broadcast_to(dec[..., None, :, :],
                                   dec.shape[:-2] + (T, U, dec.shape[-1]))
        return enc, dec

    def factors(self, enc, dec):
        """Rank factors of the concat joint: (A, C) with

            logits[..., t, u, :] == A[..., t, :] + C[..., u, :]

        (the fc bias is folded into A).  Same decomposition as the concat
        branch of ``__call__`` — GELU is elementwise and the concat halves
        never mix before the linear fc — but returned UNcombined, so callers
        (``ops.rnnt_loss_factored``) can consume the factors directly and the
        (T, U) lattice need never exist in any width.  concat-combine only:
        an additive joint applies the activation to the sum and does not
        factor."""
        if self.cfg.combine != "concat":
            raise ValueError("factors requires combine='concat'; "
                             f"got {self.cfg.combine!r}")
        ge = jax.nn.gelu(enc, approximate=True)
        gd = jax.nn.gelu(dec, approximate=True)
        De, Dd = ge.shape[-1], gd.shape[-1]
        # fc keeps its single (De+Dd, V) kernel (checkpoint-compatible); the
        # split is realized by SLICING it, so each projection is a
        # (rows, De) x (De, V) GEMM — zero-padding the activations instead
        # would double the FLOPs of the V-wide classifier (XLA does not
        # strength-reduce a dot against a concat-with-zeros)
        bias = self.fc(jnp.zeros((De + Dd,), ge.dtype))  # also materializes
        kernel = self.fc.variables["params"]["kernel"]   # the params at init
        ge, gd, kernel = nn.dtypes.promote_dtype(
            ge, gd, kernel, dtype=None)  # match nn.Dense's dtype promotion
        return ge @ kernel[:De], gd @ kernel[De:] + bias

    def __call__(self, enc, dec):
        """enc: (..., T, De) or (..., De); dec: (..., U, Dd) or (..., Dd).
        When both carry a sequence axis, broadcasts over (T, U).
        Returns logits over num_classes."""
        if self.cfg.combine == "add":
            # project per side BEFORE broadcasting (the lattice then carries
            # hidden_size activations instead of De+Dd)
            enc, dec = self.enc_proj(enc), self.dec_proj(dec)
            enc, dec = self._broadcast(enc, dec)
            x = enc + dec
            x = jax.nn.gelu(x, approximate=True)
            return self.fc(x)
        if enc.ndim == dec.ndim and enc.ndim >= 3:
            # Rank-decomposed concat joint.  GELU is elementwise and the
            # concat halves never mix before the (linear) fc, so
            #   fc(gelu(concat(e, d))) = gelu(e) @ W_enc + gelu(d) @ W_dec + b
            # — two per-SEQUENCE projections of the tiny (B,T,De)/(B,U,Dd)
            # tensors instead of one per-LATTICE-POINT GEMM: the broadcast
            # lattice carries V (=num_classes) logits, never the De+Dd
            # hidden.  Exact (same math, float reassociation only); measured
            # the difference on the flagship step in BASELINE.md.
            A, C = self.factors(enc, dec)
            return A[..., :, None, :] + C[..., None, :, :]
        enc, dec = self._broadcast(enc, dec)
        x = jnp.concatenate([enc, dec], axis=-1)
        # GELU(approximate="tanh") — networks/transducer.py:38,68
        x = jax.nn.gelu(x, approximate=True)
        return self.fc(x)
