from rnntransducer_tpu.ops.rnnt_loss import compact_lattice, rnnt_loss

__all__ = ["rnnt_loss", "compact_lattice"]
