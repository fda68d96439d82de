from rnntransducer_tpu.data.bucketing import LengthBucketSampler, bucket_for
from rnntransducer_tpu.data.collate import collate, collate_waveforms
from rnntransducer_tpu.data.dataset import (
    ArrowAudioDataset, ArrowWaveformDataset, PatternedWaveformDataset, SyntheticAudioDataset,
    load_shards, logmel_np, prepare_logmel_dataset, read_ledger,
    save_waveform_dataset, shard_dirs, spec_augment_np,
    write_ledger_entry,
)
from rnntransducer_tpu.data.prefetch import DevicePrefetcher

__all__ = [
    "LengthBucketSampler", "bucket_for", "collate", "collate_waveforms",
    "ArrowAudioDataset", "ArrowWaveformDataset", "PatternedWaveformDataset",
    "SyntheticAudioDataset", "save_waveform_dataset",
    "load_shards", "logmel_np",
    "prepare_logmel_dataset", "read_ledger", "shard_dirs", "spec_augment_np",
    "write_ledger_entry", "DevicePrefetcher",
]
