from rnntransducer_tpu.utils.masking import flip_sequences, length_mask, mask_sequence

__all__ = ["flip_sequences", "length_mask", "mask_sequence"]
