"""Frontend golden tests: JAX STFT vs torch.stft, HTK mel filterbank values,
full log-mel pipeline vs a torch-built oracle (replicating torchaudio
MelSpectrogram defaults with torch core ops), SpecAugment semantics."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from rnntransducer_tpu.config import AudioConfig
from rnntransducer_tpu.frontend import (
    LogMelFrontend, hann_window, mean_var_normalize, mel_filterbank,
    num_frames, spec_augment, stft_power,
)


def _torch_logmel(wav_np, cfg: AudioConfig):
    """Oracle: torchaudio MelSpectrogram defaults via torch core ops."""
    wav = torch.from_numpy(wav_np)
    win = torch.hann_window(cfg.win_length)
    spec = torch.stft(wav, n_fft=cfg.n_fft, hop_length=cfg.hop_length,
                      win_length=cfg.win_length, window=win, center=True,
                      pad_mode="reflect", return_complex=True, onesided=True)
    power = spec.abs() ** 2                                # (B, F, frames)
    fb = torch.from_numpy(mel_filterbank(cfg.n_fft // 2 + 1, cfg.n_mels,
                                         cfg.sample_rate))
    mel = torch.einsum("bft,fm->bmt", power, fb)
    return torch.log1p(mel).transpose(1, 2).numpy()       # (B, frames, mels)


def test_stft_matches_torch():
    cfg = AudioConfig()
    rng = np.random.RandomState(0)
    wav = rng.randn(2, 16000).astype(np.float32)
    win = hann_window(cfg.win_length)
    got = np.asarray(stft_power(jnp.asarray(wav), cfg.n_fft, cfg.hop_length,
                                jnp.asarray(win)))
    tspec = torch.stft(torch.from_numpy(wav), n_fft=cfg.n_fft,
                       hop_length=cfg.hop_length, win_length=cfg.win_length,
                       window=torch.from_numpy(win), center=True,
                       pad_mode="reflect", return_complex=True)
    want = (tspec.abs() ** 2).transpose(1, 2).numpy()
    assert got.shape == want.shape == (2, num_frames(16000, 160), 201)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_hann_window_matches_torch():
    np.testing.assert_allclose(hann_window(400),
                               torch.hann_window(400).numpy(), atol=1e-6)


def test_mel_filterbank_properties():
    fb = mel_filterbank(201, 80, 16000)
    assert fb.shape == (201, 80)
    assert fb.min() >= 0.0
    # every filter has support (narrow low-freq triangles under-sample the
    # unit analytic peak — matching torchaudio norm=None behavior)
    assert np.all(fb.max(axis=0) > 0.0)
    # HTK anchor: mel(1000 Hz) = 999.99 mel
    from rnntransducer_tpu.frontend.melspec import hz_to_mel, mel_to_hz
    np.testing.assert_allclose(hz_to_mel(1000.0), 999.9855, atol=1e-3)
    np.testing.assert_allclose(mel_to_hz(hz_to_mel(437.0)), 437.0, atol=1e-6)


def _goldens():
    import os
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "goldens", "frontend_goldens.npz")
    return np.load(path)


def test_mel_filterbank_matches_independent_golden():
    """Baked golden built by tests/make_frontend_goldens.py with an
    np.interp-based triangle construction — independent of the repo's
    slope-arithmetic mel_filterbank (breaks the round-1 oracle circularity)."""
    g = _goldens()
    fb = mel_filterbank(201, 80, 16000)
    np.testing.assert_allclose(fb, g["fbank_201_80_16000"], atol=1e-6)


def test_full_logmel_matches_baked_golden():
    """Full pipeline vs a committed golden computed with torch.stft + the
    independent filterbank (not recomputed from repo code at test time)."""
    g = _goldens()
    cfg = AudioConfig(normalize=False)
    feats, _ = LogMelFrontend(cfg)(jnp.asarray(g["wav_seed1_2x8000"]))
    np.testing.assert_allclose(np.asarray(feats), g["logmel_seed1"],
                               rtol=1e-4, atol=1e-4)


def test_full_logmel_pipeline_matches_oracle():
    cfg = AudioConfig(normalize=False)
    rng = np.random.RandomState(1)
    wav = (rng.randn(2, 8000) * 0.1).astype(np.float32)
    fe = LogMelFrontend(cfg)
    feats, lengths = fe(jnp.asarray(wav))
    want = _torch_logmel(wav, cfg)
    assert feats.shape == want.shape
    np.testing.assert_allclose(np.asarray(feats), want, rtol=1e-4, atol=1e-4)
    assert int(lengths[0]) == 8000 // 160 + 1


def test_mean_var_normalize_masked():
    rng = np.random.RandomState(2)
    wav = rng.randn(2, 100).astype(np.float32) * 3 + 1
    out = mean_var_normalize(jnp.asarray(wav), jnp.array([100, 60]))
    o = np.asarray(out)
    # valid region has ~zero mean / unit var
    np.testing.assert_allclose(o[0].mean(), 0.0, atol=1e-5)
    np.testing.assert_allclose(o[0].var(), 1.0, atol=1e-3)
    np.testing.assert_allclose(o[1, :60].mean(), 0.0, atol=1e-5)
    np.testing.assert_allclose(o[1, :60].var(), 1.0, atol=1e-3)
    assert np.all(o[1, 60:] == 0.0)
    # matches the reference's exact formula on full-length rows
    want = (wav[0] - wav[0].mean()) / np.sqrt(wav[0].var() + 1e-7)
    np.testing.assert_allclose(o[0], want, atol=1e-5)


def test_frontend_with_lengths_zeroes_consistently():
    cfg = AudioConfig()
    fe = LogMelFrontend(cfg)
    rng = np.random.RandomState(3)
    wav = rng.randn(2, 4800).astype(np.float32)
    feats, lengths = fe(jnp.asarray(wav), jnp.array([4800, 3200]))
    assert int(lengths[0]) == 31 and int(lengths[1]) == 21
    assert bool(jnp.isfinite(feats).all())


def test_spec_augment():
    rng = np.random.RandomState(4)
    feats = jnp.asarray(rng.rand(4, 100, 80).astype(np.float32) + 1.0)
    out = spec_augment(jax.random.PRNGKey(0), feats)
    o = np.asarray(out)
    assert o.shape == feats.shape
    # masked values are exactly zero; each utterance has some masking
    for b in range(4):
        zero_frac = (o[b] == 0).mean()
        assert 0.0 <= zero_frac < 0.6
    # masks differ across utterances (per-sample keys)
    assert not np.array_equal(o[0] == 0, o[1] == 0)
    # masks differ across keys
    out2 = spec_augment(jax.random.PRNGKey(1), feats)
    assert not np.array_equal(np.asarray(out2), o)
    # deterministic given the key
    out3 = spec_augment(jax.random.PRNGKey(0), feats)
    np.testing.assert_array_equal(np.asarray(out3), o)


def test_pallas_frontend_matches_xla():
    """Fused Pallas DFT/mel kernel (interpret mode on CPU) == rfft frontend."""
    from rnntransducer_tpu.frontend.pallas_frontend import logmel_pallas

    cfg = AudioConfig(normalize=True)
    rng = np.random.RandomState(5)
    wav = (rng.randn(2, 7350) * 0.3).astype(np.float32)
    lengths = np.array([7350, 5000], np.int32)

    want, wl = LogMelFrontend(cfg)(jnp.asarray(wav), jnp.asarray(lengths))
    for hp in (False, True):
        got, gl = logmel_pallas(jnp.asarray(wav), cfg, jnp.asarray(lengths),
                                high_precision=hp)
        assert got.shape == want.shape
        np.testing.assert_array_equal(np.asarray(gl), np.asarray(wl))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-3, atol=2e-3)


def test_batched_frontend_tail_matches_per_utterance():
    """Regression: shorter-than-max utterances in a batch previously read
    batch zero-padding at their tail frames instead of reflecting their own
    tail — breaking parity with the per-utterance offline pipeline."""
    from rnntransducer_tpu.data import logmel_np

    cfg = AudioConfig(normalize=False)
    rng = np.random.RandomState(7)
    w1 = rng.randn(4800).astype(np.float32)
    w2 = rng.randn(3333).astype(np.float32)
    batch = np.zeros((2, 4800), np.float32)
    batch[0] = w1
    batch[1, :3333] = w2
    feats, lengths = LogMelFrontend(cfg)(jnp.asarray(batch),
                                         jnp.array([4800, 3333]))
    for i, w in enumerate((w1, w2)):
        want = logmel_np(w, cfg)
        got = np.asarray(feats[i, :int(lengths[i])])
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_pallas_frontend_tail_parity():
    from rnntransducer_tpu.data import logmel_np
    from rnntransducer_tpu.frontend.pallas_frontend import logmel_pallas

    cfg = AudioConfig(normalize=False)
    rng = np.random.RandomState(8)
    w2 = rng.randn(3333).astype(np.float32)
    batch = np.zeros((1, 4800), np.float32)
    batch[0, :3333] = w2
    feats, lengths = logmel_pallas(jnp.asarray(batch), cfg, jnp.array([3333]))
    want = logmel_np(w2, cfg)
    np.testing.assert_allclose(np.asarray(feats[0, :int(lengths[0])]), want,
                               rtol=2e-3, atol=2e-3)


def test_streaming_frontend_empty_and_short_streams():
    from rnntransducer_tpu.decode.streaming import StreamingFrontend
    cfg = AudioConfig(normalize=False)
    sf = StreamingFrontend(cfg)
    assert sf.flush().shape[0] == 0  # empty stream: no crash, no frames
    sf.reset()
    sf.feed(np.random.RandomState(0).randn(50).astype(np.float32))
    out = sf.flush()  # shorter than the window: finite, no crash
    assert np.isfinite(out).all()


def test_spec_augment_time_masks_land_in_valid_region():
    """Regression: time masks sampled over padded T mostly landed in padding
    for short utterances; with lengths they must hit the valid region."""
    rng = np.random.RandomState(9)
    B, T, M = 8, 400, 80
    feats = jnp.asarray(rng.rand(B, T, M).astype(np.float32) + 1.0)
    lengths = jnp.full((B,), 40, jnp.int32)  # 10% valid
    hits = 0
    for k in range(20):
        out = np.asarray(spec_augment(jax.random.PRNGKey(k), feats, lengths,
                                      freq_cnt=0, time_cnt=1, time_para=20))
        # a time mask zeroes whole rows; count utterances masked in [0, 40)
        hits += sum((out[b, :40] == 0).all(axis=1).any() for b in range(B))
    # with valid-region sampling nearly every (utt, trial) has a mask in the
    # valid region (width can round to 0 occasionally)
    assert hits > 0.7 * 20 * B, hits


def test_frontend_instances_share_compilation():
    from rnntransducer_tpu.frontend.melspec import _logmel
    cfg = AudioConfig()
    wav = jnp.zeros((1, 1600))
    a = LogMelFrontend(cfg)(wav)
    misses0 = _logmel._cache_size()
    b = LogMelFrontend(AudioConfig())(wav)  # equal config, new instance
    assert _logmel._cache_size() == misses0


def test_frame_signal_lengths_matches_full_gather_oracle():
    """frame_signal's no-gather framing + tail fixup must equal the
    reflect-everywhere full gather it replaced (perf: the full gather
    serialized on TPU) on every VALID frame, for lengths on and off hop
    boundaries, full-length, and shorter-than-window utterances."""
    from rnntransducer_tpu.frontend.melspec import frame_signal

    rng = np.random.RandomState(11)
    B, S, n_fft, hop = 4, 1000, 400, 160
    pad = n_fft // 2
    wav = rng.randn(B, S).astype(np.float32)
    lengths = np.array([1000, 480, 437, 61], np.int32)  # full, on-hop, off, <win
    got = np.asarray(frame_signal(jnp.asarray(wav), n_fft, hop,
                                  jnp.asarray(lengths)))
    n_frm = num_frames(S, hop)
    assert got.shape == (B, n_frm, n_fft)
    pos = (np.arange(n_frm)[:, None] * hop
           + np.arange(n_fft)[None, :] - pad)
    for b in range(B):
        L = max(int(lengths[b]), 1)
        p = np.abs(pos)                      # reflect at 0
        over = p - (L - 1)
        p = np.where(over > 0, L - 1 - over, p)  # reflect at true tail
        p = np.clip(p, 0, S - 1)
        want = wav[b][p]
        n_valid = L // hop + 1
        np.testing.assert_array_equal(got[b, :n_valid], want[:n_valid])
