"""Debug / sanitizer utilities — the JAX equivalents of the race/memory
sanitizers a CUDA framework would ship (SURVEY.md §5: the reference has none;
we provide the TPU-native toolkit):

* ``debug_nans(enable)`` — jax_debug_nans: fail fast at the op producing a
  NaN instead of reading garbage checkpoints later;
* ``checked_rnnt_loss`` — checkify-wrapped loss that turns silent numerical
  violations (non-finite loss, length overruns) into hard errors;
* Pallas kernels run under ``backend="pallas_interpret"`` for step-through
  debugging (ops.rnnt_loss), and ``force_interpret()`` flips every Pallas
  kernel in scope to interpreter mode.
"""

from __future__ import annotations

import contextlib

import jax
import jax.numpy as jnp
from jax.experimental import checkify


def debug_nans(enable: bool = True):
    jax.config.update("jax_debug_nans", enable)


@contextlib.contextmanager
def force_interpret():
    """Run every Pallas kernel in the block in interpreter mode."""
    from jax.experimental.pallas import tpu as pltpu
    with pltpu.force_tpu_interpret_mode():
        yield


def checked_rnnt_loss(logits, labels, logit_lengths, label_lengths,
                      blank: int = 0, reduction: str = "mean",
                      backend: str = "auto"):
    """rnnt_loss with runtime invariant checks (lengths within bounds, finite
    result). Returns (error, loss); raise with ``error.throw()``."""
    from rnntransducer_tpu.ops import rnnt_loss

    def f(lg, lb, tl, ul):
        checkify.check(jnp.all(tl >= 1), "logit_lengths must be >= 1")
        checkify.check(jnp.all(tl <= lg.shape[1]),
                       "logit_lengths exceed the time axis")
        checkify.check(jnp.all(ul <= lg.shape[2] - 1),
                       "label_lengths exceed U (logits U+1 axis)")
        checkify.check(jnp.all(ul >= 0), "negative label_lengths")
        checkify.check(jnp.all((lb >= 0) & (lb < lg.shape[-1])),
                       "label ids outside [0, vocab) — the loss gather would "
                       "silently clamp them (vocab/tokenizer mismatch?)")
        loss = rnnt_loss(lg, lb, tl, ul, blank=blank, reduction=reduction,
                         backend=backend)
        checkify.check(jnp.all(jnp.isfinite(jnp.atleast_1d(loss))),
                       "non-finite RNN-T loss")
        return loss

    checked = checkify.checkify(f)
    return checked(logits, labels, logit_lengths, label_lengths)
