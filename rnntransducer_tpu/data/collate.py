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

import ctypes
import os
import subprocess
from typing import Dict, Optional, Sequence

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_pack_lib = None


def _build_pack_lib(so: str) -> None:
    # build to a process-private name, then atomically rename —
    # concurrent first-call builds (multi-process input pipelines)
    # must never load a half-written .so
    tmp = f"{so}.build.{os.getpid()}"
    subprocess.run(
        ["g++", "-O3", "-std=c++17", "-fPIC", "-pthread", "-shared",
         "-o", tmp, os.path.join(_NATIVE_DIR, "batch_pack.cpp")],
        check=True, capture_output=True)
    os.replace(tmp, so)


def _load_pack_lib():
    """Native threaded batch packer (native/batch_pack.cpp); None if the
    toolchain is unavailable (numpy fallback is used)."""
    global _pack_lib
    if _pack_lib is not None:
        return _pack_lib
    so = os.path.join(_NATIVE_DIR, "libbatch_pack.so")
    try:
        if not os.path.exists(so):
            _build_pack_lib(so)
        lib = ctypes.CDLL(so)
        try:
            lib.pack_quantize_wav_i16
        except AttributeError:
            # stale .so from before the quantizer existed — rebuild once;
            # if the toolchain is gone, keep the old lib for pack_batch_f32
            # (it served that fine) and let the quantizer use numpy
            try:
                _build_pack_lib(so)
                lib = ctypes.CDLL(so)
            except (OSError, subprocess.CalledProcessError):
                pass
        lib.pack_batch_f32.argtypes = [
            ctypes.POINTER(ctypes.c_void_p),
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_void_p, ctypes.c_int]
        if hasattr(lib, "pack_quantize_wav_i16"):
            lib.pack_quantize_wav_i16.argtypes = [
                ctypes.POINTER(ctypes.c_void_p),
                ctypes.POINTER(ctypes.c_int32), ctypes.c_int, ctypes.c_int,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int]
        _pack_lib = lib
    except (OSError, AttributeError, subprocess.CalledProcessError):
        _pack_lib = False
    return _pack_lib


def pack_features(arrays: Sequence[np.ndarray], max_rows: int, cols: int,
                  n_threads: Optional[int] = None) -> np.ndarray:
    """Pack variable-length (rows_i, cols) float32 arrays into a zero-padded
    (B, max_rows, cols) buffer — native threaded copy when available."""
    B = len(arrays)
    out = np.empty((B, max_rows, cols), np.float32)
    if n_threads is None:
        # thread spawn only pays for itself on large buffers (memcpy-bound)
        n_threads = 4 if out.nbytes >= 64 * 1024 * 1024 else 1
    lib = _load_pack_lib()
    arrays = [np.ascontiguousarray(a[:max_rows], np.float32) for a in arrays]
    if lib:
        ptrs = (ctypes.c_void_p * B)(
            *[a.ctypes.data_as(ctypes.c_void_p) for a in arrays])
        rows = np.asarray([a.shape[0] for a in arrays], np.int32)
        lib.pack_batch_f32(ptrs, rows.ctypes.data_as(
            ctypes.POINTER(ctypes.c_int32)), B, max_rows, cols,
            out.ctypes.data_as(ctypes.c_void_p), n_threads)
        return out
    out.fill(0.0)
    for i, a in enumerate(arrays):
        out[i, :a.shape[0]] = a
    return out


def collate(items: Sequence[dict], max_frames: int, max_labels: int,
            pad_id: int = 0, n_mels: Optional[int] = None) -> Dict[str, np.ndarray]:
    """items: dicts with 'feats' (T, n_mels) float32 and 'labels' (U,) ints.
    Returns fixed-shape arrays: feats (B, max_frames, M), feat_lengths,
    text_in (B, max_labels+1) blank-prepended, text_lengths, targets
    (B, max_labels), target_lengths."""
    B = len(items)
    M = items[0]["feats"].shape[-1] if n_mels is None else n_mels
    feat_arrays = []
    feat_lengths = np.zeros((B,), np.int32)
    targets = np.full((B, max_labels), pad_id, np.int32)
    target_lengths = np.zeros((B,), np.int32)
    text_in = np.full((B, max_labels + 1), pad_id, np.int32)

    for i, it in enumerate(items):
        f = np.asarray(it["feats"], np.float32)
        lab = np.asarray(it["labels"], np.int32)
        assert f.shape[-1] == M, (
            f"feature dim {f.shape[-1]} != configured n_mels {M}")  # dataloader.py:38
        feat_arrays.append(f)
        feat_lengths[i] = min(f.shape[0], max_frames)
        u = min(len(lab), max_labels)
        targets[i, :u] = lab[:u]
        target_lengths[i] = u
        # blank-prepend (dataloader.py:27-36); text_len == target_len + 1
        text_in[i, 1:u + 1] = lab[:u]
    # the feature copy is the bulk of collate time — native threaded packer
    feats = pack_features(feat_arrays, max_frames, M)

    return {
        "feats": feats,
        "feat_lengths": feat_lengths,
        "text_in": text_in,
        "text_lengths": target_lengths + 1,  # dataloader.py:40 invariant
        "targets": targets,
        "target_lengths": target_lengths,
    }


def pack_waveforms(arrays: Sequence[np.ndarray], max_samples: int,
                   n_threads: int = 1) -> np.ndarray:
    """Pack variable-length (S_i,) float32 waveforms into a zero-padded
    (B, max_samples) float32 buffer (native memcpy when available)."""
    B = len(arrays)
    lib = _load_pack_lib()
    arrays = [np.ascontiguousarray(a[:max_samples], np.float32)
              for a in arrays]
    if lib:
        out = np.empty((B, max_samples), np.float32)
        ptrs = (ctypes.c_void_p * B)(
            *[a.ctypes.data_as(ctypes.c_void_p) for a in arrays])
        rows = np.asarray([a.shape[0] for a in arrays], np.int32)
        # a waveform is a (S, 1) feature matrix to the row packer
        lib.pack_batch_f32(ptrs, rows.ctypes.data_as(
            ctypes.POINTER(ctypes.c_int32)), B, max_samples, 1,
            out.ctypes.data_as(ctypes.c_void_p), n_threads)
        return out
    out = np.zeros((B, max_samples), np.float32)
    for i, a in enumerate(arrays):
        out[i, :a.shape[0]] = a
    return out


def quantize_waveforms(arrays: Sequence[np.ndarray], max_samples: int,
                       n_threads: int = 1):
    """Pack waveforms as (B, max_samples) int16 + per-row float32 scales
    (wav[b] ~= int16[b] * scale[b], 16-bit precision): halves host->device
    transfer bytes for the raw-PCM training path. Fused single-pass native
    kernel (native/batch_pack.cpp pack_quantize_wav_i16) with a two-pass
    numpy fallback."""
    B = len(arrays)
    arrays = [np.ascontiguousarray(a[:max_samples], np.float32)
              for a in arrays]
    lib = _load_pack_lib()
    if lib and hasattr(lib, "pack_quantize_wav_i16"):
        out = np.empty((B, max_samples), np.int16)
        scales = np.empty((B,), np.float32)
        ptrs = (ctypes.c_void_p * B)(
            *[a.ctypes.data_as(ctypes.c_void_p) for a in arrays])
        rows = np.asarray([a.shape[0] for a in arrays], np.int32)
        lib.pack_quantize_wav_i16(
            ptrs, rows.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            B, max_samples, out.ctypes.data_as(ctypes.c_void_p),
            scales.ctypes.data_as(ctypes.c_void_p), n_threads)
        return out, scales
    out = np.zeros((B, max_samples), np.int16)
    scales = np.zeros((B,), np.float32)
    for i, a in enumerate(arrays):
        peak = float(np.max(np.abs(a))) if a.size else 0.0
        scale = peak / 32767.0 if peak > 0 else 0.0
        scales[i] = scale
        if scale > 0:
            out[i, :a.shape[0]] = np.round(a / scale).astype(np.int16)
    return out, scales


def collate_waveforms(items: Sequence[dict], max_samples: int, max_labels: int,
                      pad_id: int = 0,
                      transfer_dtype: str = "float32") -> Dict[str, np.ndarray]:
    """Raw-waveform variant for the on-device frontend path: items carry
    'wav' (S,) float32 + 'labels'.

    ``transfer_dtype="int16"`` ships the batch as peak-scaled int16 PCM plus a
    (B,) 'wav_scale' column (dequantized on device by the training step) —
    half the host->device bytes at 16-bit precision, which per-utterance
    mean-var normalization (reference ``datamodule.py:87-90``) absorbs."""
    B = len(items)
    wav_arrays = []
    wav_lengths = np.zeros((B,), np.int32)
    targets = np.full((B, max_labels), pad_id, np.int32)
    target_lengths = np.zeros((B,), np.int32)
    text_in = np.full((B, max_labels + 1), pad_id, np.int32)
    for i, it in enumerate(items):
        w = np.asarray(it["wav"], np.float32)
        lab = np.asarray(it["labels"], np.int32)
        u = min(len(lab), max_labels)
        wav_arrays.append(w)
        wav_lengths[i] = min(len(w), max_samples)
        targets[i, :u] = lab[:u]
        target_lengths[i] = u
        text_in[i, 1:u + 1] = lab[:u]
    out = {
        "wav_lengths": wav_lengths,
        "text_in": text_in,
        "text_lengths": target_lengths + 1,
        "targets": targets,
        "target_lengths": target_lengths,
    }
    if transfer_dtype == "int16":
        wav, scales = quantize_waveforms(wav_arrays, max_samples)
        out["wav"], out["wav_scale"] = wav, scales
    elif transfer_dtype == "float32":
        out["wav"] = pack_waveforms(wav_arrays, max_samples)
    else:
        raise ValueError(f"unknown wav transfer_dtype {transfer_dtype!r} "
                         "(use 'float32' or 'int16')")
    return out
