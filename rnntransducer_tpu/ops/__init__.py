from rnntransducer_tpu.ops.rnnt_loss import (
    compact_lattice,
    factored_compact_lattice,
    rnnt_loss,
    rnnt_loss_factored,
    rnnt_loss_fused,
)

__all__ = ["rnnt_loss", "compact_lattice", "rnnt_loss_fused",
           "rnnt_loss_factored", "factored_compact_lattice"]
