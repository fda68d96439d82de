from rnntransducer_tpu.decode.beam import BeamSearchDecoder
from rnntransducer_tpu.decode.beam_batched import batched_beam_decode
from rnntransducer_tpu.decode.device_lm import DeviceCharLM
from rnntransducer_tpu.decode.greedy import (
    GreedyCarry, greedy_decode, greedy_decode_frames,
    greedy_decode_with_times, init_greedy_carry,
)
from rnntransducer_tpu.decode.hotwords import HotwordScorer
from rnntransducer_tpu.decode.streaming import StreamingFrontend, StreamingRecognizer

__all__ = [
    "BeamSearchDecoder", "batched_beam_decode", "GreedyCarry", "greedy_decode",
    "greedy_decode_frames", "greedy_decode_with_times",
    "init_greedy_carry", "HotwordScorer", "DeviceCharLM",
    "StreamingFrontend", "StreamingRecognizer",
]
