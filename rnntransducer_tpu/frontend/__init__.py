from rnntransducer_tpu.frontend.melspec import (
    LogMelFrontend,
    hann_window,
    hamming_window,
    mean_var_normalize,
    mel_filterbank,
    num_frames,
    stft_power,
)
from rnntransducer_tpu.frontend.pallas_frontend import logmel_pallas
from rnntransducer_tpu.frontend.specaugment import spec_augment

__all__ = [
    "LogMelFrontend", "hann_window", "hamming_window", "mean_var_normalize",
    "mel_filterbank", "num_frames", "stft_power", "spec_augment",
    "logmel_pallas",
]
