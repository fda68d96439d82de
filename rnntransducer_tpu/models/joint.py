"""Joint network.

Capability-equivalent to the reference's ``JointNet.joint``
(``networks/transducer.py:41-71``): broadcast encoder (B,T,1,De) against
decoder (B,1,U+1,Dd), combine, GELU(tanh), Linear -> num_classes.

The reference deliberately uses **concat** rather than add
(``networks/transducer.py:64-67``).  Concat-then-dense is algebraically a pair
of dense projections applied to each side *after* the activation — but the
reference applies the activation to the concatenated raw features, so the
fusion trick does not apply verbatim.  We keep reference semantics under
``combine="concat"`` and offer ``combine="add"`` (activation after sum of
per-side projections) as the memory-lean variant where the (B,T,U,D) broadcast
can be avoided by the fused loss path.
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

    def __call__(self, enc, dec):
        """enc: (..., T, De) or (..., De); dec: (..., U, Dd) or (..., Dd).
        When both carry a sequence axis, broadcasts to (..., T, U, De+Dd).
        Returns logits over num_classes."""
        if enc.ndim == dec.ndim and enc.ndim >= 3:
            # (B, T, De) x (B, U, Dd) -> (B, T, U, *)
            T, U = enc.shape[-2], dec.shape[-2]
            enc = jnp.broadcast_to(enc[..., :, None, :], enc.shape[:-2] + (T, U, enc.shape[-1]))
            dec = jnp.broadcast_to(dec[..., None, :, :], dec.shape[:-2] + (T, U, dec.shape[-1]))
        if self.cfg.combine == "concat":
            x = jnp.concatenate([enc, dec], axis=-1)
        elif self.cfg.combine == "add":
            x = enc + dec
        else:
            raise ValueError(f"unknown combine: {self.cfg.combine}")
        # GELU(approximate="tanh") — networks/transducer.py:38,68
        x = jax.nn.gelu(x, approximate=True)
        return self.fc(x)
