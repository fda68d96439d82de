"""Datasets: sharded Arrow reader + offline preprocessing + synthetic data.

Capability-equivalent of the reference's HF-datasets layer:

* ``load_shards`` — ``utils/dataset_utils.get_concat_dataset``
  (``dataset_utils.py:40-87``): load every ``root/<split>/<shard_idx>`` dir via
  ``load_from_disk``, concatenate, replay any filters recorded in the
  ``postprocess_log.json`` ledger;
* ``prepare_logmel_dataset`` — ``datamodule.save_raw_to_logmelspect_datasets``
  (``datamodule.py:92-173``): raw float32 PCM -> mean-var norm -> log-mel ->
  (seq, mel) layout + length columns -> N shards saved to disk, idempotent
  (skip if target exists, ``datamodule.py:104-106``) with a cache ledger.
  SpecAugment is deliberately NOT baked in (it runs on-device per step);
  ``bake_spec_augment=True`` reproduces the reference's offline behavior for
  parity experiments;
* ``SyntheticAudioDataset`` — deterministic random utterances for tests/bench.

HF datasets / pyarrow are host-side IO only; nothing here touches the device.
"""

from __future__ import annotations

import json
import os
import time
from typing import List, Optional, Sequence

import numpy as np

from rnntransducer_tpu.config import AudioConfig
from rnntransducer_tpu.frontend.melspec import (
    WINDOWS, mel_filterbank, num_frames,
)


# ---------------------------------------------------------------- numpy DSP
def _stft_power_np(wav: np.ndarray, n_fft: int, hop: int,
                   window: np.ndarray) -> np.ndarray:
    """(S,) -> (frames, n_fft//2+1); same numerics as frontend.stft_power."""
    pad = n_fft // 2
    x = np.pad(wav, (pad, pad), mode="reflect")
    n_frm = num_frames(len(wav), hop)
    idx = np.arange(n_frm)[:, None] * hop + np.arange(n_fft)[None, :]
    frames = x[idx] * window[None, :]
    spec = np.fft.rfft(frames, axis=-1)
    return (spec.real ** 2 + spec.imag ** 2).astype(np.float32)


def logmel_np(wav: np.ndarray, cfg: AudioConfig) -> np.ndarray:
    """Offline (host) log-mel matching the on-device frontend: (S,) float32 ->
    (frames, n_mels).  Includes the per-utterance mean-var norm when
    cfg.normalize (datamodule.py:87-90)."""
    wav = np.asarray(wav, np.float32)
    if cfg.normalize:
        wav = (wav - wav.mean()) / np.sqrt(wav.var() + 1e-7)
    win = WINDOWS[cfg.window](cfg.win_length)
    fb = mel_filterbank(cfg.n_fft // 2 + 1, cfg.n_mels, cfg.sample_rate)
    power = _stft_power_np(wav, cfg.n_fft, cfg.hop_length, win)
    return np.log1p(power @ fb)


def spec_augment_np(feats: np.ndarray, cfg: AudioConfig,
                    rng: np.random.RandomState) -> np.ndarray:
    """Offline SpecAugment (reference bake-in parity, datamodule.py:74-85)."""
    T, M = feats.shape
    out = feats.copy()
    for _ in range(cfg.freq_mask_cnt):
        f = rng.uniform(0, cfg.freq_mask_para)
        f0 = int(rng.uniform(0, max(M - f, 1)))
        out[:, f0:f0 + int(f)] = 0.0
    for _ in range(cfg.time_mask_cnt):
        t = rng.uniform(0, cfg.time_mask_para)
        t0 = int(rng.uniform(0, max(T - t, 1)))
        out[t0:t0 + int(t)] = 0.0
    return out


# ---------------------------------------------------------- ledger helpers
def _ledger_path(dataset_dir: str) -> str:
    return os.path.join(dataset_dir, "postprocess_log.json")


def write_ledger_entry(dataset_dir: str, task: str, train_type: str,
                       **extra) -> None:
    """Cache ledger (dataset_utils.py:98-115 equivalent)."""
    path = _ledger_path(dataset_dir)
    log = {}
    if os.path.exists(path):
        with open(path) as f:
            log = json.load(f)
    log.setdefault(train_type, {})[task] = {"time": time.time(), **extra}
    os.makedirs(dataset_dir, exist_ok=True)
    with open(path, "w") as f:
        json.dump(log, f, indent=1)


def read_ledger(dataset_dir: str) -> dict:
    path = _ledger_path(dataset_dir)
    if not os.path.exists(path):
        return {}
    with open(path) as f:
        return json.load(f)


# ------------------------------------------------------------ Arrow shards
def shard_dirs(root: str, split: str) -> List[str]:
    """root/<split>/<idx> shard layout (dataset_utils.py:13-23)."""
    base = os.path.join(root, split)
    if not os.path.isdir(base):
        return []
    idxs = sorted((d for d in os.listdir(base) if d.isdigit()), key=int)
    return [os.path.join(base, d) for d in idxs]


def load_shards(roots: Sequence[str], split: str):
    """Concatenate every shard of every root (get_concat_dataset)."""
    from datasets import concatenate_datasets, load_from_disk

    parts = []
    for root in roots:
        for d in shard_dirs(root, split):
            parts.append(load_from_disk(d))
    if not parts:
        raise FileNotFoundError(f"no shards for split '{split}' under {roots}")
    return parts[0] if len(parts) == 1 else concatenate_datasets(parts)


def prepare_logmel_dataset(source_roots: Sequence[str], target_root: str,
                           split: str, audio_cfg: AudioConfig,
                           num_shards: int = 1, num_proc: int = 1,
                           bake_spec_augment: bool = False,
                           seed: int = 0) -> None:
    """Offline raw->log-mel pipeline (datamodule.py:92-173 equivalent).

    Source rows: {'input_values': raw float32 PCM @ sample_rate,
    'input_ids': grapheme label ids}.  Output rows: {'input_values':
    (frames, n_mels) float32, 'input_ids', 'audio_len', 'label_len'}.
    Idempotent: skips if the target split dir already exists.
    """
    target = os.path.join(target_root, split)
    marker = os.path.join(target, "_SUCCESS")
    if os.path.exists(marker):
        return  # datamodule.py:104-106 resume semantics (completion marker:
        # a bare isdir check would treat a crashed partial run as done)

    ds = load_shards(source_roots, split)

    def to_logmel(batch, idx):
        feats = logmel_np(np.asarray(batch["input_values"], np.float32),
                          audio_cfg)
        if bake_spec_augment:
            feats = spec_augment_np(
                feats, audio_cfg, np.random.RandomState(seed + idx))
        return {"input_values": feats, "audio_len": feats.shape[0],
                "label_len": len(batch["input_ids"])}

    ds = ds.map(to_logmel, with_indices=True, num_proc=num_proc or None)
    write_ledger_entry(target_root, "logmel", split,
                       baked_spec_augment=bake_spec_augment)
    num_shards = max(1, min(num_shards, len(ds)))  # small sets < shard count
    for shard_idx in range(num_shards):
        shard = ds.shard(num_shards=num_shards, index=shard_idx)
        shard.save_to_disk(os.path.join(target, str(shard_idx)))
    with open(marker, "w") as f:
        f.write("ok\n")


class ArrowAudioDataset:
    """Random-access view over preprocessed shards, feeding the bucketing
    sampler (lengths) and collate (feats/labels).

    Rows are read through HF datasets' numpy formatter, and ``get_batch``
    fetches a whole batch in ONE Arrow take — ~7x cheaper host CPU than B
    python-object row reads (the difference between the host pipeline keeping
    up with the chip or not on a narrow-CPU host; docs/TUNING.md)."""

    def __init__(self, roots: Sequence[str], split: str):
        self.ds = load_shards(roots, split)
        cols = self.ds.column_names
        self._len_col = "audio_len" if "audio_len" in cols else None
        self._np = self.ds.with_format("numpy",
                                       columns=["input_values", "input_ids"])

    def __len__(self):
        return len(self.ds)

    def lengths(self) -> np.ndarray:
        if self._len_col:
            return np.asarray(self.ds[self._len_col])
        return np.asarray([len(r["input_values"]) for r in self.ds])

    def label_lengths(self) -> np.ndarray:
        if "label_len" in self.ds.column_names:
            return np.asarray(self.ds["label_len"])
        return np.asarray([len(r["input_ids"]) for r in self.ds])

    @staticmethod
    def _item(values, ids) -> dict:
        return {"feats": np.asarray(values, np.float32),
                "labels": np.asarray(ids, np.int32)}

    def __getitem__(self, i: int) -> dict:
        row = self._np[int(i)]
        return self._item(row["input_values"], row["input_ids"])

    def get_batch(self, idxs) -> list:
        rows = self._np[[int(i) for i in idxs]]
        return [self._item(v, t)
                for v, t in zip(rows["input_values"], rows["input_ids"])]


class ArrowWaveformDataset(ArrowAudioDataset):
    """Random-access view over raw-PCM shards (rows: 'input_values' = float32
    waveform @ sample_rate, 'input_ids' = grapheme ids) for the raw-PCM
    training path: the Trainer collates waveforms and the log-mel frontend
    (+ SpecAugment) runs on device inside the jitted step — the TPU-native
    inversion of the reference's offline TB-scale preprocessing pass
    (``datamodule.py:92-173``). ``lengths()`` returns FRAME counts so audio
    bucketing is shared with the feature path."""

    def __init__(self, roots: Sequence[str], split: str, audio_cfg: AudioConfig):
        super().__init__(roots, split)
        self.audio_cfg = audio_cfg

    def lengths(self) -> np.ndarray:
        if self._len_col:  # audio_len column already holds frame counts
            return np.asarray(self.ds[self._len_col])
        hop = self.audio_cfg.hop_length
        return np.asarray([num_frames(len(r["input_values"]), hop)
                           for r in self.ds])

    @staticmethod
    def _item(values, ids) -> dict:
        return {"wav": np.asarray(values, np.float32),
                "labels": np.asarray(ids, np.int32)}


def save_waveform_dataset(items, target_root: str, split: str,
                          hop_length: int, num_shards: int = 1,
                          total: Optional[int] = None) -> None:
    """Materialize an iterable of {'wav' float32 (S,), 'labels' int (U,)}
    items as raw-PCM Arrow shards loadable by ArrowWaveformDataset (same
    shard layout / _SUCCESS marker / ledger as prepare_logmel_dataset).
    'audio_len' stores the FRAME count (bucketing unit of the Trainer).

    Pass ``total`` (the item count) to stream shard-by-shard: only one
    shard's rows are ever in memory — required for corpora whose PCM
    exceeds RAM (the 100k-utterance soak corpus is ~33 GB of float32).
    Without ``total`` the iterable is materialized first (small corpora)."""
    import itertools

    from datasets import Dataset

    target = os.path.join(target_root, split)
    marker = os.path.join(target, "_SUCCESS")
    if os.path.exists(marker):
        return

    it = iter(items)
    if total is None:
        rows = [{"wav": np.asarray(r["wav"], np.float32),
                 "labels": np.asarray(r["labels"], np.int32)} for r in it]
        total = len(rows)
        it = iter(rows)
    write_ledger_entry(target_root, "waveform", split)
    num_shards = max(1, min(num_shards, total))
    per = (total + num_shards - 1) // num_shards
    shard_idx = 0
    consumed = 0
    while True:
        chunk = list(itertools.islice(it, per))
        if not chunk:
            break
        consumed += len(chunk)
        shard = Dataset.from_dict({
            "input_values": [np.asarray(r["wav"], np.float32)
                             for r in chunk],
            "input_ids": [np.asarray(r["labels"], np.int32)
                          for r in chunk],
            "audio_len": [num_frames(len(r["wav"]), hop_length)
                          for r in chunk],
            "label_len": [len(r["labels"]) for r in chunk],
        })
        shard.save_to_disk(os.path.join(target, str(shard_idx)))
        shard_idx += 1
    if consumed != total:
        # a wrong caller-supplied `total` either over-shards (extra dirs
        # beyond num_shards) or marks a short corpus complete — refuse to
        # write the completion marker over a miscounted corpus
        raise ValueError(
            f"save_waveform_dataset: iterable yielded {consumed} items but "
            f"total={total}; no _SUCCESS marker written (partial shards "
            f"remain under {target})")
    with open(marker, "w") as f:
        f.write("ok\n")


class SyntheticAudioDataset:
    """Deterministic random utterances (for tests, bench, and smoke training):
    'speech' is filtered noise; labels are random grapheme ids."""

    def __init__(self, n: int, audio_cfg: AudioConfig, vocab_size: int = 72,
                 min_sec: float = 1.0, max_sec: float = 8.0,
                 min_labels: int = 4, max_labels: int = 48, seed: int = 0,
                 as_waveform: bool = False):
        self.n = n
        self.cfg = audio_cfg
        self.vocab_size = vocab_size
        self.min_sec, self.max_sec = min_sec, max_sec
        self.min_labels, self.max_labels = min_labels, max_labels
        self.seed = seed
        self.as_waveform = as_waveform
        rng = np.random.RandomState(seed)
        sr = audio_cfg.sample_rate
        self._samples = rng.randint(int(min_sec * sr), int(max_sec * sr), n)
        self._n_labels = rng.randint(min_labels, max_labels + 1, n)

    def __len__(self):
        return self.n

    def lengths(self) -> np.ndarray:
        return np.asarray([num_frames(int(s), self.cfg.hop_length)
                           for s in self._samples])

    def label_lengths(self) -> np.ndarray:
        return np.asarray(self._n_labels)

    def __getitem__(self, i: int) -> dict:
        rng = np.random.RandomState(self.seed + 1000 + int(i))
        s = int(self._samples[i])
        wav = rng.randn(s).astype(np.float32)
        # crude comb filter so the spectrum has structure
        wav[1:] += 0.8 * wav[:-1]
        labels = rng.randint(1, self.vocab_size, int(self._n_labels[i])) \
                    .astype(np.int32)
        if self.as_waveform:
            return {"wav": wav, "labels": labels}
        return {"feats": logmel_np(wav, self.cfg), "labels": labels}


class PatternedSyntheticDataset:
    """Learnable synthetic 'speech': each label stamps a label-specific noise
    pattern onto a contiguous feature segment (monotonic alignment), so a
    model trained on one set of utterances GENERALIZES to held-out utterances
    drawn from the same process — the framework's end-to-end learning +
    generalization testbed (real corpora are not available in this image).

    Emits log-mel-shaped features directly ('feats' (T, n_mels))."""

    def __init__(self, n: int, n_mels: int = 80, vocab_size: int = 72,
                 min_labels: int = 4, max_labels: int = 12,
                 frames_per_label: int = 8, noise: float = 0.3,
                 seed: int = 0, pattern_seed: int = 777):
        self.n = n
        self.n_mels = n_mels
        self.vocab_size = vocab_size
        self.frames_per_label = frames_per_label
        self.noise = noise
        self.seed = seed
        # the label->pattern codebook is the "language"; shared across
        # train/eval splits via pattern_seed
        self.patterns = np.random.RandomState(pattern_seed).randn(
            vocab_size, n_mels).astype(np.float32)
        rng = np.random.RandomState(seed)
        self._n_labels = rng.randint(min_labels, max_labels + 1, n)

    def __len__(self):
        return self.n

    def lengths(self) -> np.ndarray:
        return self._n_labels * self.frames_per_label

    def label_lengths(self) -> np.ndarray:
        return np.asarray(self._n_labels)

    def __getitem__(self, i: int) -> dict:
        rng = np.random.RandomState(self.seed + 5000 + int(i))
        U = int(self._n_labels[i])
        labels = rng.randint(1, self.vocab_size, U).astype(np.int32)
        for u in range(1, U):  # greedy decode dedups consecutive repeats
            while labels[u] == labels[u - 1]:
                labels[u] = rng.randint(1, self.vocab_size)
        T = U * self.frames_per_label
        feats = np.repeat(self.patterns[labels], self.frames_per_label, axis=0)
        feats = feats + self.noise * rng.randn(T, self.n_mels).astype(np.float32)
        return {"feats": feats.astype(np.float32), "labels": labels}


class PatternedWaveformDataset:
    """Waveform-level learnable testbed: each label stamps a label-specific
    multi-tone 16 kHz snippet (a chord of ``tones_per_label`` label-specific
    sinusoids — distinctive mel peaks, so the mapping generalizes; plain
    noise snippets blur together under mel pooling and get memorized), and
    each utterance applies a random GAIN and DC OFFSET so that the
    per-utterance mean-var norm of the reference pipeline
    (``datamodule.py:87-90``) is load-bearing: a model trained on normalized
    features degrades on unnormalized ones.  This is the testbed for
    validating streaming normalization modes against the offline norm (the
    reference's streaming story never resolves this; VERDICT r1 §6).

    ``__getitem__`` emits offline-pipeline features (norm per ``cfg``);
    ``waveform(i)`` exposes the raw (gain/offset applied) PCM for streaming.
    """

    def __init__(self, n: int, cfg: AudioConfig, vocab_size: int = 72,
                 min_labels: int = 4, max_labels: int = 12,
                 frames_per_label: int = 8, noise: float = 0.1,
                 gain_range=(0.25, 4.0), offset_range=(-0.5, 0.5),
                 tones_per_label: int = 3, seed: int = 0,
                 pattern_seed: int = 777):
        self.n = n
        self.cfg = cfg
        self.vocab_size = vocab_size
        self.frames_per_label = frames_per_label
        self.samples_per_label = frames_per_label * cfg.hop_length
        self.noise = noise
        self.gain_range = gain_range
        self.offset_range = offset_range
        self.seed = seed
        prng = np.random.RandomState(pattern_seed)
        t = np.arange(self.samples_per_label) / cfg.sample_rate
        freqs = prng.uniform(200.0, cfg.sample_rate * 0.45,
                             (vocab_size, tones_per_label))
        phases = prng.uniform(0, 2 * np.pi, (vocab_size, tones_per_label))
        self.patterns = np.sum(
            np.sin(2 * np.pi * freqs[:, :, None] * t[None, None, :]
                   + phases[:, :, None]),
            axis=1).astype(np.float32) / np.sqrt(tones_per_label)
        rng = np.random.RandomState(seed)
        self._n_labels = rng.randint(min_labels, max_labels + 1, n)
        self._cache: dict = {}

    def __len__(self):
        return self.n

    def lengths(self) -> np.ndarray:
        return np.asarray([
            num_frames(int(u) * self.samples_per_label, self.cfg.hop_length)
            for u in self._n_labels])

    def label_lengths(self) -> np.ndarray:
        return np.asarray(self._n_labels)

    def _labels(self, i: int, rng) -> np.ndarray:
        U = int(self._n_labels[i])
        labels = rng.randint(1, self.vocab_size, U).astype(np.int32)
        for u in range(1, U):  # greedy decode dedups consecutive repeats
            while labels[u] == labels[u - 1]:
                labels[u] = rng.randint(1, self.vocab_size)
        return labels

    def waveform(self, i: int):
        """(wav float32 (S,), labels int32 (U,)) with gain/offset applied."""
        rng = np.random.RandomState(self.seed + 5000 + int(i))
        labels = self._labels(i, rng)
        wav = self.patterns[labels].reshape(-1)
        wav = wav + self.noise * rng.randn(len(wav)).astype(np.float32)
        lo, hi = self.gain_range
        gain = float(np.exp(rng.uniform(np.log(lo), np.log(hi))))
        offset = float(rng.uniform(*self.offset_range))
        return (gain * wav + offset).astype(np.float32), labels

    def __getitem__(self, i: int) -> dict:
        # deterministic per index -> cache features across epochs (the
        # offline-pipeline stand-in; ~30 KB/utterance)
        hit = self._cache.get(i)
        if hit is None:
            wav, labels = self.waveform(i)
            hit = {"feats": logmel_np(wav, self.cfg), "labels": labels}
            self._cache[i] = hit
        return hit


class HardPatternedWaveformDataset:
    """The round-4 accuracy testbed — built so systems can FAIL.

    The earlier patterned testbeds saturated (several systems at CER
    0.000, BASELINE.md round 3), at which point they stopped ranking
    systems.  This one layers the difficulty axes of real speech (the
    reference's task is 620k real utterances, ``README.md:18-21``) onto
    the synthetic codebook so a non-trivial CER ladder survives:

    * **additive noise** at a per-utterance SNR drawn from
      ``snr_db_range`` (dB, uniform);
    * **tempo jitter**: each utterance stretches every label snippet by a
      log-uniform factor from ``tempo_range`` (the model never sees a
      fixed frames-per-label grid);
    * **speaker variation**: every utterance scales ALL tone frequencies
      by a log-uniform factor from ``speaker_range`` (formant shift);
    * **gain / DC offset** (as PatternedWaveformDataset — keeps
      normalization load-bearing);
    * **word structure with OOV control**: transcripts are sequences of
      multi-grapheme WORDS from a closed lexicon, joined by the
      word-delimiter token over silence gaps.  The lexicon's first
      ``n_words - n_oov_words`` entries are "in-vocabulary" (an LM built
      from training transcripts sees them); with ``oov_fraction > 0``
      a word position instead draws from the held-out OOV slice — so
      word-LM shallow fusion has both something to gain (in-vocab) and
      something to break (OOV), and its delta is measurable.

    ``__getitem__`` -> offline-pipeline features + labels;
    ``waveform(i)`` -> raw PCM (for streaming / on-device frontend);
    ``word_sequences(i)`` -> the word-id sequence (for LM corpora).
    """

    def __init__(self, n: int, cfg: AudioConfig, vocab_size: int = 72,
                 n_words: int = 80, n_oov_words: int = 16,
                 words_per_utt=(3, 7), word_len=(2, 4),
                 grapheme_lo: int = 5, grapheme_hi: Optional[int] = None,
                 delimiter_id: int = 4,
                 frames_per_label: int = 8,
                 tempo_range=(0.8, 1.25), speaker_range=(0.9, 1.12),
                 snr_db_range=(5.0, 20.0), gain_range=(0.25, 4.0),
                 offset_range=(-0.5, 0.5), oov_fraction: float = 0.0,
                 tones_per_label: int = 3, seed: int = 0,
                 pattern_seed: int = 777):
        self.n = n
        self.cfg = cfg
        self.vocab_size = vocab_size
        self.delimiter_id = delimiter_id
        self.samples_per_label = frames_per_label * cfg.hop_length
        self.tempo_range = tempo_range
        self.speaker_range = speaker_range
        self.snr_db_range = snr_db_range
        self.gain_range = gain_range
        self.offset_range = offset_range
        self.seed = seed

        prng = np.random.RandomState(pattern_seed)
        # label -> tone chord (frequencies regenerated per utterance with
        # the speaker warp, so only freqs/phases are stored)
        self.freqs = prng.uniform(200.0, cfg.sample_rate * 0.40,
                                  (vocab_size, tones_per_label))
        self.phases = prng.uniform(0, 2 * np.pi,
                                   (vocab_size, tones_per_label))
        self.tones_per_label = tones_per_label
        # closed word lexicon over graphemes [grapheme_lo, grapheme_hi).
        # grapheme_hi=None keeps the historical [grapheme_lo, vocab_size)
        # draw.  NOTE (round 5): with the reference 72-entry vocab, ids
        # 56-71 are <extra_*> SPECIAL tokens — decode drops them, so any
        # text surface (LM word strings, CER refs/hyps) silently loses
        # those graphemes.  Testbeds whose words must round-trip through
        # TEXT (LM fusion) should pass grapheme_hi=56 (the Confusable
        # dataset's default); the id-level decode paths are unaffected.
        if grapheme_hi is None:
            grapheme_hi = vocab_size
        lex = set()
        lex_list = []
        while len(lex_list) < n_words:
            L = prng.randint(word_len[0], word_len[1] + 1)
            w = []
            for _ in range(L):
                g = prng.randint(grapheme_lo, grapheme_hi)
                while w and g == w[-1]:  # greedy dedups consecutive repeats
                    g = prng.randint(grapheme_lo, grapheme_hi)
                w.append(int(g))
            w = tuple(w)
            if w not in lex:
                lex.add(w)
                lex_list.append(w)
        self.lexicon = lex_list
        self.n_in_vocab = n_words - n_oov_words

        # per-utterance draws, precomputed so lengths() is cheap + exact
        rng = np.random.RandomState(seed)
        self._word_seqs = []
        self._tempo = []
        self._speaker = []
        self._snr_db = []
        self._label_seqs = []
        lo_t, hi_t = tempo_range
        lo_s, hi_s = speaker_range
        for _ in range(n):
            k = rng.randint(words_per_utt[0], words_per_utt[1] + 1)
            ws = []
            for _ in range(k):
                if oov_fraction > 0 and rng.rand() < oov_fraction:
                    ws.append(int(rng.randint(self.n_in_vocab, n_words)))
                else:
                    ws.append(int(rng.randint(0, self.n_in_vocab)))
            self._word_seqs.append(ws)
            labels = []
            for j, w in enumerate(ws):
                if j:
                    labels.append(delimiter_id)
                labels.extend(self.lexicon[w])
            self._label_seqs.append(np.asarray(labels, np.int32))
            self._tempo.append(float(np.exp(
                rng.uniform(np.log(lo_t), np.log(hi_t)))))
            self._speaker.append(float(np.exp(
                rng.uniform(np.log(lo_s), np.log(hi_s)))))
            self._snr_db.append(float(rng.uniform(*snr_db_range)))
        self._cache: dict = {}

    def __len__(self):
        return self.n

    def _samples_per_label(self, i: int) -> int:
        return int(round(self.samples_per_label * self._tempo[i]))

    def lengths(self) -> np.ndarray:
        return np.asarray([
            num_frames(len(self._label_seqs[i]) * self._samples_per_label(i),
                       self.cfg.hop_length)
            for i in range(self.n)])

    def label_lengths(self) -> np.ndarray:
        return np.asarray([len(s) for s in self._label_seqs])

    def word_sequences(self, i: int):
        return list(self._word_seqs[i])

    def _render_labels(self, i: int) -> np.ndarray:
        """Grapheme sequence the AUDIO is rendered from — the transcript by
        default.  ConfusableWaveformDataset overrides this to render
        homophone words with their twin's graphemes (identical acoustics,
        different transcript), so acoustics underdetermine the text and LM
        fusion has something real to resolve."""
        return self._label_seqs[i]

    def waveform(self, i: int):
        """(wav float32 (S,), labels int32 (U,)) — tempo/speaker/SNR/gain/
        offset applied.  Audio renders from ``_render_labels``; the returned
        labels are always the TRANSCRIPT (``_label_seqs``)."""
        rng = np.random.RandomState(self.seed + 9000 + int(i))
        labels = self._render_labels(i)
        spl = self._samples_per_label(i)
        t = np.arange(spl) / self.cfg.sample_rate
        warp = self._speaker[i]
        segs = []
        for l in labels:
            if l == self.delimiter_id:
                segs.append(np.zeros(spl, np.float32))  # silence gap
                continue
            f = self.freqs[l] * warp
            seg = np.sum(
                np.sin(2 * np.pi * f[:, None] * t[None, :]
                       + self.phases[l][:, None]),
                axis=0) / np.sqrt(self.tones_per_label)
            segs.append(seg.astype(np.float32))
        wav = np.concatenate(segs)
        rms = float(np.sqrt(np.mean(wav ** 2)) + 1e-8)
        noise_std = rms * 10.0 ** (-self._snr_db[i] / 20.0)
        wav = wav + noise_std * rng.randn(len(wav)).astype(np.float32)
        lo, hi = self.gain_range
        gain = float(np.exp(rng.uniform(np.log(lo), np.log(hi))))
        offset = float(rng.uniform(*self.offset_range))
        return ((gain * wav + offset).astype(np.float32),
                self._label_seqs[i].copy())

    def __getitem__(self, i: int) -> dict:
        hit = self._cache.get(i)
        if hit is None:
            wav, labels = self.waveform(i)
            hit = {"feats": logmel_np(wav, self.cfg), "labels": labels}
            self._cache[i] = hit
        return hit


class ConfusableWaveformDataset(HardPatternedWaveformDataset):
    """The round-5 LM-fusion testbed: HOMOPHONES + predictive context.

    Round 4 proved the hard testbed measures only LM fusion's failure
    surface — its graphemes are acoustically distinct, so a word LM has no
    confusability to resolve and fusion is monotonically harmful
    (BASELINE.md LM-weight sweep).  Real Korean ASR integrates KenLM
    because real speech underdetermines text
    (``/root/reference/inference.py:29``).  This dataset builds that
    property synthetically:

    * ``n_homophone_pairs`` same-length word pairs (a, b) are TRUE
      homophones: b's audio renders with a's graphemes (``_render_labels``
      override) while its transcript keeps b's spelling — acoustics
      cannot tell them apart even at infinite SNR;
    * word sequences follow a TRIGGER grammar: a pair-slot emits
      ``trigger_a a`` or ``trigger_b b`` (the matching homophone with
      probability ``trigger_coupling``, the twin otherwise), interleaved
      with uniform filler words.  A bigram LM trained on the TRAIN
      transcripts learns p(a | trigger_a) == coupling and can resolve
      what the audio cannot;
    * with a context-free prediction network (the stateless bigram
      prednet sees one grapheme of history), the acoustic model provably
      cannot learn the disambiguation — the LM's upside is structural,
      not an artifact of an undertrained AM.

    ``homophone_slots(i)`` -> word-sequence positions holding a homophone,
    so evals can report accuracy ON the confusable decisions separately
    from overall CER/WER.
    """

    def __init__(self, n: int, cfg: AudioConfig,
                 n_homophone_pairs: int = 8,
                 trigger_coupling: float = 0.95,
                 pair_fraction: float = 0.6,
                 words_per_utt=(3, 7), seed: int = 0,
                 pattern_seed: int = 777, gap_segments: int = 1,
                 grapheme_hi: Optional[int] = 56, **kw):
        # gap_segments: silence segments rendered per word boundary (the
        # TRANSCRIPT keeps one delimiter token).  Raise it past the
        # acoustic model's context window (e.g. a chunked-causal encoder's
        # attention_left_chunks reach) so the trigger word's AUDIO is out
        # of reach at the homophone — then no AM component can resolve the
        # twin and the LM's upside is structural, not a training artifact
        # (measured round 5: at the default 80 ms gap the streaming
        # Conformer's 160 ms left context resolves triggers acoustically,
        # homophone accuracy 0.92 with no LM).
        self.gap_segments = int(gap_segments)
        super().__init__(n, cfg, words_per_utt=words_per_utt, seed=seed,
                         oov_fraction=0.0, pattern_seed=pattern_seed,
                         grapheme_hi=grapheme_hi, **kw)
        # pairs/triggers derive from PATTERN_seed, like the lexicon: train
        # and held-out splits (different `seed`) must share the homophone
        # structure, or eval renders twins the AM never saw as twins and
        # the LM's trigger statistics don't transfer
        prng = np.random.RandomState(pattern_seed + 4242)
        # pick same-length in-vocab pairs + two trigger words per pair
        by_len: dict = {}
        for wi in range(self.n_in_vocab):
            by_len.setdefault(len(self.lexicon[wi]), []).append(wi)
        pool = [g for g in by_len.values() if len(g) >= 2]
        pairs = []
        used = set()
        for group in pool:
            g = list(group)
            prng.shuffle(g)
            while len(g) >= 2 and len(pairs) < n_homophone_pairs:
                a, b = g.pop(), g.pop()
                pairs.append((a, b))
                used.update((a, b))
        if len(pairs) < n_homophone_pairs:
            raise ValueError(
                f"lexicon only admits {len(pairs)} same-length homophone "
                f"pairs (< {n_homophone_pairs}); widen word_len or n_words")
        rest = [wi for wi in range(self.n_in_vocab) if wi not in used]
        if len(rest) < 2 * len(pairs) + 1:
            raise ValueError("not enough non-homophone words for triggers "
                             "and fillers")
        triggers = [(rest[2 * j], rest[2 * j + 1])
                    for j in range(len(pairs))]
        trig_used = {w for t in triggers for w in t}
        fillers = [w for w in rest if w not in trig_used]
        self.pairs = pairs
        self.triggers = triggers
        self.trigger_coupling = float(trigger_coupling)
        # render twin: b sounds exactly like a
        self._twin = {b: a for a, b in pairs}

        # re-draw every utterance under the trigger grammar (the parent's
        # uniform draws carry no context for an LM to exploit)
        rng = np.random.RandomState(seed)
        lo_t, hi_t = self.tempo_range
        lo_s, hi_s = self.speaker_range
        self._word_seqs, self._label_seqs = [], []
        self._tempo, self._speaker, self._snr_db = [], [], []
        self._homophone_slots = []
        for _ in range(n):
            k = rng.randint(words_per_utt[0], words_per_utt[1] + 1)
            ws, slots = [], []
            while len(ws) < k:
                if len(ws) + 2 <= k and rng.rand() < pair_fraction:
                    j = rng.randint(len(pairs))
                    side = rng.rand() < 0.5
                    a, b = pairs[j]
                    t_a, t_b = triggers[j]
                    ws.append(t_a if side else t_b)
                    want = (a if side else b)
                    twin = (b if side else a)
                    slots.append(len(ws))
                    ws.append(want if rng.rand() < trigger_coupling
                              else twin)
                else:
                    ws.append(int(fillers[rng.randint(len(fillers))]))
            self._word_seqs.append(ws)
            self._homophone_slots.append(slots)
            labels = []
            for j, w in enumerate(ws):
                if j:
                    labels.append(self.delimiter_id)
                labels.extend(self.lexicon[w])
            self._label_seqs.append(np.asarray(labels, np.int32))
            self._tempo.append(float(np.exp(
                rng.uniform(np.log(lo_t), np.log(hi_t)))))
            self._speaker.append(float(np.exp(
                rng.uniform(np.log(lo_s), np.log(hi_s)))))
            self._snr_db.append(float(rng.uniform(*self.snr_db_range)))
        self._cache = {}

    def homophone_slots(self, i: int):
        """Word positions (into ``word_sequences(i)``) that hold a
        homophone — the confusable decisions an eval should score."""
        return list(self._homophone_slots[i])

    def _render_labels(self, i: int) -> np.ndarray:
        out = []
        for j, w in enumerate(self._word_seqs[i]):
            if j:
                out.extend([self.delimiter_id] * self.gap_segments)
            out.extend(self.lexicon[self._twin.get(w, w)])
        return np.asarray(out, np.int32)

    def lengths(self) -> np.ndarray:
        # audio length follows the RENDER sequence (gap_segments widens
        # the silence), not the transcript
        return np.asarray([
            num_frames(len(self._render_labels(i))
                       * self._samples_per_label(i), self.cfg.hop_length)
            for i in range(self.n)])
