"""Inference CLI end-to-end (subprocess): offline decode + --stream mode.

Capability-parity surface of the reference's ``inference.py:13-66`` plus the
streaming extension (chunked frontend + carried encoder state).
"""

import os
import subprocess
import sys

import numpy as np
import pytest

from rnntransducer_tpu.config import (
    AudioConfig, Config, DataConfig, JointNetConfig, ModelConfig,
    PredNetConfig, TrainConfig, TransNetConfig,
)
from rnntransducer_tpu.data import SyntheticAudioDataset
from rnntransducer_tpu.train import Trainer
from rnntransducer_tpu.utils.audio_io import write_wav

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_inference_cli_offline_and_stream(tmp_path):
    cfg = Config(
        data=DataConfig(audio=AudioConfig(spec_augment=False),
                        audio_buckets=(64, 128), label_buckets=(16,)),
        model=ModelConfig(
            transnet=TransNetConfig(input_size=80, hidden_size=16,
                                    output_size=12, num_layers=1,
                                    rnn_type="lstm", dropout=0.0,
                                    bidirectional=False),
            prednet=PredNetConfig(embedding_size=72, hidden_size=16,
                                  output_size=12, num_layers=1,
                                  rnn_type="lstm", dropout=0.0),
            jointnet=JointNetConfig(num_classes=72),
        ),
        train=TrainConfig(max_steps=1, per_device_train_batch_size=1,
                          precision="fp32",
                          checkpoint_dir=str(tmp_path / "ckpt")),
    )
    ds = SyntheticAudioDataset(4, AudioConfig(), min_sec=0.3, max_sec=0.6,
                               min_labels=3, max_labels=6, seed=0)
    trainer = Trainer(cfg, ds, val_dataset=None)
    trainer.fit()
    trainer.ckpt.close()

    wav_path = str(tmp_path / "u.wav")
    write_wav(wav_path, np.random.RandomState(0).randn(6400) * 0.1)

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)

    def run(*extra):
        r = subprocess.run(
            [sys.executable, os.path.join(REPO, "inference.py"),
             "--checkpoint_dir", str(tmp_path / "ckpt"),
             "--wav", wav_path, *extra],
            env=env, cwd=REPO, capture_output=True, text=True, timeout=560)
        assert r.returncode == 0, r.stderr[-2000:]
        return r.stdout

    out = run("--decoder", "greedy")
    assert wav_path in out

    out = run("--decoder", "greedy", "--timestamps")
    assert "\ttimes\t" in out and "@" in out

    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "inference.py"),
         "--checkpoint_dir", str(tmp_path / "ckpt"), "--wav", wav_path,
         "--decoder", "beam_batched", "--timestamps"],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=560)
    assert r.returncode != 0 and "--timestamps" in (r.stderr + r.stdout)

    out = run("--stream", "--decoder", "greedy", "--chunk_ms", "200",
              "--normalize", "running")
    assert wav_path in out

    out = run("--stream", "--decoder", "beam_batched", "--beam_width", "2",
              "--normalize", "fixed", "--norm_mean", "0.0",
              "--norm_var", "1.0")
    assert wav_path in out


@pytest.mark.slow
def test_stream_lm_fusion_cli(tmp_path):
    """--stream --decoder beam --lm_path runs host-beam fusion streaming;
    --decoder beam_batched (no fusion there) still refuses loudly rather
    than silently dropping the LM."""
    cfg = Config(
        data=DataConfig(audio=AudioConfig(spec_augment=False),
                        audio_buckets=(64,), label_buckets=(16,)),
        model=ModelConfig(
            transnet=TransNetConfig(input_size=80, hidden_size=16,
                                    output_size=12, num_layers=1,
                                    rnn_type="lstm", dropout=0.0,
                                    bidirectional=False),
            prednet=PredNetConfig(embedding_size=72, hidden_size=16,
                                  output_size=12, num_layers=1,
                                  rnn_type="lstm", dropout=0.0),
            jointnet=JointNetConfig(num_classes=72),
        ),
        train=TrainConfig(max_steps=1, per_device_train_batch_size=1,
                          precision="fp32",
                          checkpoint_dir=str(tmp_path / "ckpt")),
    )
    ds = SyntheticAudioDataset(2, AudioConfig(), min_sec=0.3, max_sec=0.5,
                               min_labels=3, max_labels=5, seed=9)
    trainer = Trainer(cfg, ds, val_dataset=None)
    trainer.fit()
    trainer.ckpt.close()
    wav_path = str(tmp_path / "u.wav")
    write_wav(wav_path, np.random.RandomState(0).randn(4800) * 0.1)
    lm_path = str(tmp_path / "lm.arpa")
    open(lm_path, "w").write("\\data\\\nngram 1=1\n\n\\1-grams:\n-1.0 a\n\n\\end\\\n")

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "inference.py"),
         "--checkpoint_dir", str(tmp_path / "ckpt"), "--wav", wav_path,
         "--stream", "--decoder", "beam", "--lm_path", lm_path,
         "--hotwords", "cat", "--beam_width", "2"],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    assert wav_path in r.stdout

    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "inference.py"),
         "--checkpoint_dir", str(tmp_path / "ckpt"), "--wav", wav_path,
         "--stream", "--decoder", "beam_batched", "--lm_path", lm_path],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=300)
    assert r.returncode != 0
    out = r.stderr + r.stdout
    assert "no shallow fusion" in out or "no LM/hotword fusion" in out
