"""Data pipeline: bucketing, collate invariants, Arrow shard round-trip,
offline log-mel parity with the on-device frontend, prefetcher."""

import numpy as np

import jax.numpy as jnp

from rnntransducer_tpu.config import AudioConfig
from rnntransducer_tpu.data import (
    ArrowAudioDataset, DevicePrefetcher, LengthBucketSampler,
    SyntheticAudioDataset, bucket_for, collate, collate_waveforms, logmel_np,
    prepare_logmel_dataset, read_ledger,
)
from rnntransducer_tpu.frontend import LogMelFrontend


def test_bucket_for():
    assert bucket_for(10, (16, 32, 64)) == 0
    assert bucket_for(16, (16, 32, 64)) == 0
    assert bucket_for(17, (16, 32, 64)) == 1
    assert bucket_for(999, (16, 32, 64)) == 2  # clamp into last


def test_sampler_covers_all_and_batches_within_bucket():
    rng = np.random.RandomState(0)
    lengths = rng.randint(5, 100, 103)
    s = LengthBucketSampler(lengths, boundaries=(32, 64, 100), batch_size=8,
                            seed=1)
    batches = s.epoch_batches(0)
    seen = []
    for b_idx, idxs, n_valid in batches:
        assert len(idxs) == 8
        assert 1 <= n_valid <= 8
        for i in idxs:
            assert bucket_for(int(lengths[i]), (32, 64, 100)) == b_idx
        seen.extend(idxs[:n_valid])
    assert set(seen) == set(range(103))  # full coverage, no duplicates hidden
    assert len(seen) == 103              # n_valid excludes wrap-padding
    # deterministic per epoch, different across epochs
    assert [tuple(i) for _, i, _ in s.epoch_batches(0)] == \
           [tuple(i) for _, i, _ in batches]
    assert [tuple(i) for _, i, _ in s.epoch_batches(1)] != \
           [tuple(i) for _, i, _ in batches]


def test_sampler_rank_sharding_partitions():
    lengths = np.random.RandomState(1).randint(5, 100, 64)
    all_ranks = []
    for rank in range(4):
        s = LengthBucketSampler(lengths, (100,), batch_size=4, seed=0,
                                rank=rank, world_size=4, drop_last=True)
        for _, idxs, _ in s.epoch_batches(0):
            all_ranks.extend(idxs)
    # rank-strided subsets are disjoint (datasampler.py:96 semantics)
    assert len(all_ranks) == len(set(all_ranks))


def test_collate_invariants():
    items = [
        {"feats": np.ones((10, 4), np.float32), "labels": np.array([1, 2, 3])},
        {"feats": np.full((6, 4), 2.0, np.float32), "labels": np.array([4])},
    ]
    out = collate(items, max_frames=12, max_labels=5, pad_id=0)
    assert out["feats"].shape == (2, 12, 4)
    assert list(out["feat_lengths"]) == [10, 6]
    # text_in = blank-prepended targets (dataloader.py:27-36)
    assert list(out["text_in"][0][:5]) == [0, 1, 2, 3, 0]
    assert list(out["targets"][0][:4]) == [1, 2, 3, 0]
    # text_len == target_len + 1 (dataloader.py:40)
    assert list(out["text_lengths"]) == [4, 2]
    assert out["feats"][1, 6:].sum() == 0.0


def test_collate_waveforms():
    items = [{"wav": np.ones(100, np.float32), "labels": np.array([1, 2])}]
    out = collate_waveforms(items, max_samples=160, max_labels=4)
    assert out["wav"].shape == (1, 160)
    assert int(out["wav_lengths"][0]) == 100
    assert list(out["text_in"][0][:3]) == [0, 1, 2]


def test_offline_logmel_matches_frontend():
    cfg = AudioConfig()
    wav = np.random.RandomState(0).randn(4800).astype(np.float32)
    offline = logmel_np(wav, cfg)
    fe = LogMelFrontend(cfg)
    online, lengths = fe(jnp.asarray(wav[None]), jnp.array([4800]))
    assert offline.shape == (int(lengths[0]), cfg.n_mels)
    np.testing.assert_allclose(offline, np.asarray(online[0]),
                               rtol=1e-4, atol=1e-4)


def test_arrow_shard_roundtrip(tmp_path):
    from datasets import Dataset

    cfg = AudioConfig()
    rng = np.random.RandomState(0)
    rows = {
        "input_values": [rng.randn(rng.randint(1600, 4800)).astype(np.float32)
                         for _ in range(10)],
        "input_ids": [rng.randint(1, 72, rng.randint(2, 8)).tolist()
                      for _ in range(10)],
    }
    src = tmp_path / "raw"
    Dataset.from_dict(rows).save_to_disk(str(src / "dev" / "0"))

    tgt = tmp_path / "logmel"
    prepare_logmel_dataset([str(src)], str(tgt), "dev", cfg, num_shards=2)
    # idempotent resume: second call is a no-op
    prepare_logmel_dataset([str(src)], str(tgt), "dev", cfg, num_shards=2)

    ds = ArrowAudioDataset([str(tgt)], "dev")
    assert len(ds) == 10
    lens = ds.lengths()
    item = ds[0]
    assert item["feats"].shape == (lens[0], cfg.n_mels)
    want = logmel_np(np.asarray(rows["input_values"][0]), cfg)
    np.testing.assert_allclose(item["feats"], want, rtol=1e-5, atol=1e-5)
    assert list(item["labels"]) == rows["input_ids"][0]
    ledger = read_ledger(str(tgt))
    assert "logmel" in ledger["dev"]


def test_synthetic_dataset_and_prefetcher():
    cfg = AudioConfig()
    ds = SyntheticAudioDataset(8, cfg, min_sec=0.3, max_sec=0.6, seed=0)
    lens = ds.lengths()
    assert len(ds) == 8 and len(lens) == 8
    item = ds[3]
    assert item["feats"].shape[0] == lens[3]
    # determinism
    np.testing.assert_array_equal(ds[3]["feats"], item["feats"])

    sampler = LengthBucketSampler(lens, (64, 128), batch_size=4, seed=0)
    def host_iter():
        for b_idx, idxs, _ in sampler.epoch_batches(0):
            yield collate([ds[i] for i in idxs], max_frames=(64, 128)[b_idx],
                          max_labels=48)
    got = list(DevicePrefetcher(host_iter(), size=2))
    assert len(got) == len(sampler.epoch_batches(0))
    assert all(hasattr(b["feats"], "devices") for b in got)


def test_prefetcher_propagates_errors():
    def bad_iter():
        yield {"x": np.zeros(2)}
        raise RuntimeError("boom")
    it = DevicePrefetcher(bad_iter(), size=2)
    next(it)
    try:
        next(it)
    except RuntimeError as e:
        assert "boom" in str(e)
    else:
        raise AssertionError("error not propagated")


def test_sampler_drops_overlong_utterances():
    """Regression: audio longer than the largest bucket must be dropped, not
    silently truncated (frame truncation with full labels corrupts
    supervision)."""
    lengths = [10, 20, 999, 30]
    s = LengthBucketSampler(lengths, boundaries=(32,), batch_size=2, seed=0,
                            shuffle=False)
    batches = s.epoch_batches(0)
    seen = [i for _, idxs, nv in batches for i in idxs[:nv]]
    assert 2 not in seen
    assert s.last_dropped == 1
    assert set(seen) == {0, 1, 3}


def test_native_pack_matches_numpy():
    """C++ threaded packer == numpy fallback, exactly."""
    from rnntransducer_tpu.data.collate import _load_pack_lib, pack_features
    rng = np.random.RandomState(0)
    arrays = [rng.randn(rng.randint(1, 40), 8).astype(np.float32)
              for _ in range(7)]
    got = pack_features(arrays, max_rows=32, cols=8)
    want = np.zeros((7, 32, 8), np.float32)
    for i, a in enumerate(arrays):
        t = min(a.shape[0], 32)
        want[i, :t] = a[:t]
    np.testing.assert_array_equal(got, want)
    assert _load_pack_lib(), "native packer should build in this image"


def test_prepare_clamps_shards_to_dataset_size(tmp_path):
    """Regression: num_shards > rows crashed preprocessing (IndexError)."""
    from datasets import Dataset
    cfg = AudioConfig()
    rng = np.random.RandomState(0)
    rows = {"input_values": [rng.randn(1600).astype(np.float32)
                             for _ in range(3)],
            "input_ids": [[1, 2], [3], [4, 5]]}
    Dataset.from_dict(rows).save_to_disk(str(tmp_path / "raw" / "train" / "0"))
    prepare_logmel_dataset([str(tmp_path / "raw")], str(tmp_path / "out"),
                           "train", cfg, num_shards=20)
    ds = ArrowAudioDataset([str(tmp_path / "out")], "train")
    assert len(ds) == 3


def test_sampler_drops_overlong_labels():
    from rnntransducer_tpu.data.bucketing import LengthBucketSampler
    lengths = [50, 60, 70, 80, 90, 100]
    label_lens = [5, 30, 6, 31, 7, 8]  # idx 1 and 3 exceed max_label_length=24
    s = LengthBucketSampler(lengths, boundaries=(128,), batch_size=2,
                            shuffle=False, label_lengths=label_lens,
                            max_label_length=24)
    batches = s.epoch_batches(0)
    assert s.last_label_dropped == 2
    used = {int(i) for _, idxs, n in batches for i in idxs[:n]}
    assert 1 not in used and 3 not in used
    assert used == {0, 2, 4, 5}


def test_quantize_waveforms_roundtrip_and_native_parity():
    """int16 wav transfer (data/collate.py quantize_waveforms): per-row
    peak-scaled quantization reconstructs the waveform to 16-bit precision;
    the native fused kernel (native/batch_pack.cpp) matches the numpy
    fallback; silent rows decode to exact zeros."""
    import importlib

    c = importlib.import_module("rnntransducer_tpu.data.collate")
    quantize_waveforms = c.quantize_waveforms

    rng = np.random.RandomState(0)
    arrays = [rng.randn(rng.randint(80, 200)).astype(np.float32)
              * rng.uniform(0.05, 4.0) for _ in range(6)]
    arrays.append(np.zeros(50, np.float32))  # silence
    q, s = quantize_waveforms(arrays, max_samples=180)
    assert q.shape == (7, 180) and q.dtype == np.int16
    assert s.dtype == np.float32 and s[-1] == 0.0
    for i, a in enumerate(arrays):
        n = min(len(a), 180)
        rec = q[i, :n].astype(np.float32) * s[i]
        peak = max(float(np.abs(a[:n]).max()), 1e-9)
        assert np.abs(rec - a[:n]).max() / peak < 1e-4
        assert not q[i, n:].any()  # zero-padded tail

    prev = c._pack_lib
    try:
        c._pack_lib = False  # force the numpy fallback
        q2, s2 = quantize_waveforms(arrays, max_samples=180)
    finally:
        c._pack_lib = prev
    np.testing.assert_array_equal(s, s2)
    # rounding ties (x.5) may differ by one code between implementations
    assert np.abs(q.astype(np.int32) - q2.astype(np.int32)).max() <= 1


def test_collate_waveforms_int16_matches_float32():
    rng = np.random.RandomState(1)
    items = [{"wav": rng.randn(rng.randint(60, 150)).astype(np.float32) * 2.5,
              "labels": np.array([1, 2, 3])} for _ in range(4)]
    f32 = collate_waveforms(items, max_samples=160, max_labels=4)
    i16 = collate_waveforms(items, max_samples=160, max_labels=4,
                            transfer_dtype="int16")
    assert i16["wav"].dtype == np.int16 and "wav_scale" in i16
    rec = i16["wav"].astype(np.float32) * i16["wav_scale"][:, None]
    peak = np.abs(f32["wav"]).max()
    assert np.abs(rec - f32["wav"]).max() / peak < 1e-4
    for k in ("wav_lengths", "text_in", "targets", "target_lengths",
              "text_lengths"):
        np.testing.assert_array_equal(f32[k], i16[k])


def test_arrow_waveform_dataset_roundtrip(tmp_path):
    """save_waveform_dataset -> ArrowWaveformDataset: frame-count lengths,
    batched get_batch == per-row access, idempotent re-save (_SUCCESS)."""
    from rnntransducer_tpu.data import (
        ArrowWaveformDataset, save_waveform_dataset,
    )
    from rnntransducer_tpu.data.dataset import num_frames

    audio = AudioConfig()
    src = SyntheticAudioDataset(10, audio, min_sec=0.1, max_sec=0.4,
                                min_labels=2, max_labels=6, seed=3,
                                as_waveform=True)
    root = str(tmp_path / "corpus")
    items = [src[i] for i in range(len(src))]
    save_waveform_dataset(items, root, "train",
                          hop_length=audio.hop_length, num_shards=3)
    save_waveform_dataset(items, root, "train",
                          hop_length=audio.hop_length, num_shards=3)  # no-op
    ds = ArrowWaveformDataset([root], "train", audio)
    assert len(ds) == 10
    for i in (0, 4, 9):
        it = ds[i]
        np.testing.assert_array_equal(it["wav"], items[i]["wav"])
        np.testing.assert_array_equal(it["labels"], items[i]["labels"])
        assert it["wav"].dtype == np.float32
    # lengths() is in FRAMES (the Trainer's bucketing unit)
    expect = [num_frames(len(items[i]["wav"]), audio.hop_length)
              for i in range(10)]
    np.testing.assert_array_equal(ds.lengths(), expect)
    np.testing.assert_array_equal(
        ds.label_lengths(), [len(items[i]["labels"]) for i in range(10)])
    # one-Arrow-take batched fetch == per-row fetch
    got = ds.get_batch([7, 2, 5])
    for g, i in zip(got, [7, 2, 5]):
        np.testing.assert_array_equal(g["wav"], items[i]["wav"])
        np.testing.assert_array_equal(g["labels"], items[i]["labels"])


def test_arrow_audio_dataset_get_batch(tmp_path):
    from datasets import Dataset

    cfg = AudioConfig()
    rng = np.random.RandomState(0)
    rows = {"input_values": [rng.randn(rng.randint(400, 900)).astype(np.float32)
                             for _ in range(6)],
            "input_ids": [rng.randint(1, 72, rng.randint(2, 6)).astype(np.int32)
                          for _ in range(6)]}
    src = tmp_path / "raw" / "dev" / "0"
    Dataset.from_dict(rows).save_to_disk(str(src))
    prepare_logmel_dataset([str(tmp_path / "raw")], str(tmp_path / "out"),
                           "dev", cfg, num_shards=2)
    ds = ArrowAudioDataset([str(tmp_path / "out")], "dev")
    got = ds.get_batch([3, 0, 5])
    for g, i in zip(got, [3, 0, 5]):
        ref = ds[i]
        np.testing.assert_array_equal(g["feats"], ref["feats"])
        np.testing.assert_array_equal(g["labels"], ref["labels"])


def test_hard_testbed_dataset_contract():
    """Round-4 hard testbed (VERDICT r3 item 4): lengths/labels exact,
    deterministic, word-structured with delimiter, OOV control works."""
    import numpy as np
    from rnntransducer_tpu.config import AudioConfig
    from rnntransducer_tpu.data.dataset import HardPatternedWaveformDataset

    ds = HardPatternedWaveformDataset(10, AudioConfig(), seed=3)
    for i in range(10):
        wav, labels = ds.waveform(i)
        feats = ds[i]["feats"]
        assert feats.shape[0] == ds.lengths()[i]
        assert len(labels) == ds.label_lengths()[i]
        # deterministic
        wav2, labels2 = ds.waveform(i)
        np.testing.assert_array_equal(wav, wav2)
        np.testing.assert_array_equal(labels, labels2)
        # word structure: delimiter joins words, words from the lexicon
        words = ds.word_sequences(i)
        expect = []
        for j, w in enumerate(words):
            if j:
                expect.append(ds.delimiter_id)
            expect.extend(ds.lexicon[w])
        np.testing.assert_array_equal(labels, np.asarray(expect))
        # greedy-decode compatibility: no consecutive repeats
        assert not np.any(labels[1:] == labels[:-1])
        # in-vocab only at oov_fraction=0
        assert all(w < ds.n_in_vocab for w in words)

    oov = HardPatternedWaveformDataset(60, AudioConfig(), seed=4,
                                       oov_fraction=0.3)
    flags = [w >= oov.n_in_vocab for i in range(60)
             for w in oov.word_sequences(i)]
    frac = sum(flags) / len(flags)
    assert 0.15 < frac < 0.45, frac

    # difficulty knobs actually vary per utterance
    assert len({round(t, 4) for t in ds._tempo}) > 3
    assert len({round(s, 4) for s in ds._speaker}) > 3
    assert len({round(s, 2) for s in ds._snr_db}) > 3


def test_hard_testbed_snr_controls_noise():
    import numpy as np
    from rnntransducer_tpu.config import AudioConfig
    from rnntransducer_tpu.data.dataset import HardPatternedWaveformDataset

    clean = HardPatternedWaveformDataset(
        4, AudioConfig(), seed=7, snr_db_range=(40.0, 40.0),
        gain_range=(1.0, 1.0), offset_range=(0.0, 0.0))
    noisy = HardPatternedWaveformDataset(
        4, AudioConfig(), seed=7, snr_db_range=(0.0, 0.0),
        gain_range=(1.0, 1.0), offset_range=(0.0, 0.0))
    for i in range(4):
        wc, _ = clean.waveform(i)
        wn, _ = noisy.waveform(i)
        # same tones, different noise floor: the residual energy at SNR 0
        # must dwarf the 40 dB one
        assert np.std(wn - wc[: len(wn)][: len(wn)]) > 5 * 10 ** (-40 / 20)


def test_confusable_dataset_structure():
    """ConfusableWaveformDataset (round-5 LM-fusion testbed): homophone
    pairs/triggers/twin map derive from pattern_seed and are IDENTICAL
    across split seeds (train/heldout must share the confusable structure
    — regression for the round-5 bug where they didn't); twins are
    same-length; a twin's audio renders with its partner's graphemes while
    labels keep its own; trigger coupling holds empirically."""
    import numpy as np

    from rnntransducer_tpu.config import AudioConfig
    from rnntransducer_tpu.data.dataset import ConfusableWaveformDataset

    acfg = AudioConfig(spec_augment=False)
    tr = ConfusableWaveformDataset(256, acfg, seed=0)
    ev = ConfusableWaveformDataset(32, acfg, seed=50_000)
    assert tr.pairs == ev.pairs
    assert tr.triggers == ev.triggers
    assert tr._twin == ev._twin
    for a, b in tr.pairs:
        assert len(tr.lexicon[a]) == len(tr.lexicon[b])
    # render/label divergence exactly at twin words
    saw_twin = False
    for i in range(16):
        ws = tr.word_sequences(i)
        render = tr._render_labels(i)
        labels = tr._label_seqs[i]
        assert len(render) == len(labels)
        if any(w in tr._twin for w in ws):
            saw_twin = True
            assert not np.array_equal(render, labels)
        else:
            np.testing.assert_array_equal(render, labels)
        # homophone slots point at pair members
        pair_words = {w for p in tr.pairs for w in p}
        for s in tr.homophone_slots(i):
            assert ws[s] in pair_words
    assert saw_twin
    # trigger coupling: given trigger_a, the next word is its pair's 'a'
    # side ~coupling of the time
    hits = tot = 0
    trig_side = {}
    for j, (ta, tb) in enumerate(tr.triggers):
        trig_side[ta] = tr.pairs[j][0]
        trig_side[tb] = tr.pairs[j][1]
    for i in range(256):
        ws = tr.word_sequences(i)
        for a, b in zip(ws, ws[1:]):
            if a in trig_side:
                tot += 1
                hits += b == trig_side[a]
    assert tot > 100
    assert 0.88 < hits / tot < 1.0, (hits, tot)


def test_confusable_gap_segments():
    """gap_segments widens the rendered silence per word boundary while the
    transcript keeps ONE delimiter; lengths() follows the render."""
    import math

    import numpy as np

    from rnntransducer_tpu.config import AudioConfig
    from rnntransducer_tpu.data.dataset import ConfusableWaveformDataset

    acfg = AudioConfig(spec_augment=False)
    ds1 = ConfusableWaveformDataset(4, acfg, seed=0, gap_segments=1)
    ds6 = ConfusableWaveformDataset(4, acfg, seed=0, gap_segments=6)
    for i in range(4):
        np.testing.assert_array_equal(ds1._label_seqs[i], ds6._label_seqs[i])
        n_words = len(ds6.word_sequences(i))
        r1, r6 = ds1._render_labels(i), ds6._render_labels(i)
        assert len(r6) - len(r1) == (n_words - 1) * 5  # +5 segments/boundary
        w6, lab6 = ds6.waveform(i)
        assert math.ceil(len(w6) / acfg.hop_length) == ds6.lengths()[i]
        np.testing.assert_array_equal(lab6, ds6._label_seqs[i])
