"""Batch collation with static bucket shapes.

Capability-equivalent of the reference's ``AudioDataLoader._collate_fn``
(``dataloader.py:16-49``): pads features/labels, builds the prediction-net
input by prepending the blank/pad token to each target
(``dataloader.py:27-36``), and emits lengths — but as ONE set of int32 arrays
(the reference needs the same lengths twice, as CPU lists for pack_padded and
as device tensors for the loss, ``dataloader.py:45-49``; static shapes + masks
make that dual residency unnecessary), padded to fixed bucket shapes so every
bucket compiles exactly once.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np


def collate(items: Sequence[dict], max_frames: int, max_labels: int,
            pad_id: int = 0, n_mels: Optional[int] = None) -> Dict[str, np.ndarray]:
    """items: dicts with 'feats' (T, n_mels) float32 and 'labels' (U,) ints.
    Returns fixed-shape arrays: feats (B, max_frames, M), feat_lengths,
    text_in (B, max_labels+1) blank-prepended, text_lengths, targets
    (B, max_labels), target_lengths."""
    B = len(items)
    M = items[0]["feats"].shape[-1] if n_mels is None else n_mels
    feats = np.zeros((B, max_frames, M), np.float32)
    feat_lengths = np.zeros((B,), np.int32)
    targets = np.full((B, max_labels), pad_id, np.int32)
    target_lengths = np.zeros((B,), np.int32)
    text_in = np.full((B, max_labels + 1), pad_id, np.int32)

    for i, it in enumerate(items):
        f = np.asarray(it["feats"], np.float32)
        lab = np.asarray(it["labels"], np.int32)
        assert f.shape[-1] == M, (
            f"feature dim {f.shape[-1]} != configured n_mels {M}")  # dataloader.py:38
        t = min(f.shape[0], max_frames)
        u = min(len(lab), max_labels)
        feats[i, :t] = f[:t]
        feat_lengths[i] = t
        targets[i, :u] = lab[:u]
        target_lengths[i] = u
        # blank-prepend (dataloader.py:27-36); text_len == target_len + 1
        text_in[i, 1:u + 1] = lab[:u]

    return {
        "feats": feats,
        "feat_lengths": feat_lengths,
        "text_in": text_in,
        "text_lengths": target_lengths + 1,  # dataloader.py:40 invariant
        "targets": targets,
        "target_lengths": target_lengths,
    }


def collate_waveforms(items: Sequence[dict], max_samples: int, max_labels: int,
                      pad_id: int = 0) -> Dict[str, np.ndarray]:
    """Raw-waveform variant for the on-device frontend path: items carry
    'wav' (S,) float32 + 'labels'."""
    B = len(items)
    wav = np.zeros((B, max_samples), np.float32)
    wav_lengths = np.zeros((B,), np.int32)
    targets = np.full((B, max_labels), pad_id, np.int32)
    target_lengths = np.zeros((B,), np.int32)
    text_in = np.full((B, max_labels + 1), pad_id, np.int32)
    for i, it in enumerate(items):
        w = np.asarray(it["wav"], np.float32)
        lab = np.asarray(it["labels"], np.int32)
        s = min(len(w), max_samples)
        u = min(len(lab), max_labels)
        wav[i, :s] = w[:s]
        wav_lengths[i] = s
        targets[i, :u] = lab[:u]
        target_lengths[i] = u
        text_in[i, 1:u + 1] = lab[:u]
    return {
        "wav": wav,
        "wav_lengths": wav_lengths,
        "text_in": text_in,
        "text_lengths": target_lengths + 1,
        "targets": targets,
        "target_lengths": target_lengths,
    }
