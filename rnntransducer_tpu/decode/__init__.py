from rnntransducer_tpu.decode.beam import BeamSearchDecoder
from rnntransducer_tpu.decode.greedy import (
    GreedyCarry, greedy_decode, greedy_decode_frames, init_greedy_carry,
)
from rnntransducer_tpu.decode.hotwords import HotwordScorer
from rnntransducer_tpu.decode.streaming import StreamingFrontend, StreamingRecognizer

__all__ = [
    "BeamSearchDecoder", "GreedyCarry", "greedy_decode",
    "greedy_decode_frames", "init_greedy_carry", "HotwordScorer",
    "StreamingFrontend", "StreamingRecognizer",
]
