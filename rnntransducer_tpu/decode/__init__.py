from rnntransducer_tpu.decode.greedy import greedy_decode

__all__ = ["greedy_decode"]
