"""rnntransducer_tpu — a TPU-native (JAX/XLA/Pallas/pjit) RNN-Transducer
framework, capability-equivalent to YooSungHyun/RNNTransducer re-designed for
TPU: static shapes, scanned RNN cells, a Pallas RNN-T loss, shard_map data
parallelism, and on-device audio frontend."""

__version__ = "0.1.0"

from rnntransducer_tpu.config import Config, base_config, tiny_config
from rnntransducer_tpu.tokenizer import (
    GraphemeTokenizer, compose_jamo, decompose_hangul,
)

__all__ = ["Config", "base_config", "tiny_config", "GraphemeTokenizer",
           "compose_jamo", "decompose_hangul", "__version__"]
