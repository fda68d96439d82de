"""Multi-host lockstep tests (VERDICT round-1 item 5).

The reference's DDP relies on torchrun + rank-strided sampling
(/root/reference/datasampler.py:96, scripts/run_train.sh:9).  Here multi-host
data parallelism requires every process to dispatch IDENTICAL bucket shapes in
lockstep (loop.py _host_batches) and the prefetcher to assemble the global
batch from per-process shards (prefetch.py).

Two tiers:
* fast: the _host_batches slicing/label-bucket logic under simulated process
  identities (monkeypatched jax.process_index/process_count);
* slow: two REAL jax.distributed CPU processes driving _host_batches ->
  DevicePrefetcher.make_array_from_process_local_data -> train_step on a
  4-device process-spanning mesh (tests/_multihost_worker.py).
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import jax

from rnntransducer_tpu.config import (
    AudioConfig, Config, DataConfig, JointNetConfig, ModelConfig,
    PredNetConfig, TrainConfig, TransNetConfig,
)
from rnntransducer_tpu.data import SyntheticAudioDataset
from rnntransducer_tpu.train import Trainer


def _cfg(tmp_path):
    return Config(
        data=DataConfig(audio=AudioConfig(spec_augment=False),
                        audio_buckets=(64, 128), label_buckets=(16, 24)),
        model=ModelConfig(
            transnet=TransNetConfig(input_size=80, hidden_size=16,
                                    output_size=12, num_layers=1,
                                    rnn_type="gru", dropout=0.0,
                                    bidirectional=True),
            prednet=PredNetConfig(embedding_size=72, hidden_size=16,
                                  output_size=12, num_layers=1,
                                  rnn_type="lstm", dropout=0.0),
            jointnet=JointNetConfig(num_classes=72),
        ),
        train=TrainConfig(max_steps=1, per_device_train_batch_size=1,
                          precision="fp32",
                          checkpoint_dir=str(tmp_path / "ckpt")),
    )


def _ds():
    return SyntheticAudioDataset(24, AudioConfig(), min_sec=0.3, max_sec=1.2,
                                 min_labels=3, max_labels=10, seed=0)


def _batches_as(trainer, ds, pi, pc, monkeypatch, n=4):
    """Materialize _host_batches under a simulated process identity."""
    with monkeypatch.context() as m:
        m.setattr(jax, "process_index", lambda: pi)
        m.setattr(jax, "process_count", lambda: pc)
        out = []
        for batch in trainer._host_batches(ds, epoch=0, batch_size=8):
            out.append(batch)
            if len(out) >= n:
                break
        return out


def test_processes_dispatch_identical_shapes_and_partition(tmp_path,
                                                           monkeypatch):
    """Every simulated process sees the same batch count and static shapes,
    and the union of per-process slices equals the single-process batch."""
    cfg = _cfg(tmp_path)
    ds = _ds()
    trainer = Trainer(cfg, ds)

    single = _batches_as(trainer, ds, 0, 1, monkeypatch)
    p0 = _batches_as(trainer, ds, 0, 2, monkeypatch)
    p1 = _batches_as(trainer, ds, 1, 2, monkeypatch)
    trainer.ckpt.close()

    assert len(single) == len(p0) == len(p1)
    for sb, b0, b1 in zip(single, p0, p1):
        # lockstep: identical static (bucket) shapes on both processes,
        # each holding half the global leading axis
        for k in sb:
            assert b0[k].shape == b1[k].shape, k
            assert b0[k].shape[0] * 2 == sb[k].shape[0], k
            assert b0[k].shape[1:] == sb[k].shape[1:], k
        # interleaving the process slices reconstructs the global batch
        # (loop.py slices idxs[pi::pc])
        for k in sb:
            rebuilt = np.empty_like(sb[k])
            rebuilt[0::2] = b0[k]
            rebuilt[1::2] = b1[k]
            np.testing.assert_array_equal(rebuilt, sb[k], err_msg=k)


def test_label_bucket_locksteps_across_processes(tmp_path, monkeypatch):
    """The label bucket must come from the FULL batch, not the local slice —
    otherwise processes compile different shapes and deadlock (loop.py)."""
    cfg = _cfg(tmp_path)
    # one long-label utterance: only ONE process's slice contains it
    ds = SyntheticAudioDataset(8, AudioConfig(), min_sec=0.3, max_sec=0.6,
                               min_labels=3, max_labels=5, seed=1)
    long_item = dict(ds[0])
    rng = np.random.RandomState(0)

    class Spiked:
        def __init__(self, base):
            self.base = base

        def __len__(self):
            return len(self.base)

        def __getitem__(self, i):
            if i == 0:
                it = dict(self.base[0])
                it["labels"] = rng.randint(
                    1, 70, size=(20,)).astype(np.int32)
                return it
            return self.base[i]

        def lengths(self):
            return self.base.lengths()

        def label_lengths(self):
            ll = np.array(self.base.label_lengths())
            ll[0] = 20
            return ll

    spiked = Spiked(ds)
    trainer = Trainer(cfg, spiked)
    p0 = _batches_as(trainer, spiked, 0, 2, monkeypatch, n=8)
    p1 = _batches_as(trainer, spiked, 1, 2, monkeypatch, n=8)
    trainer.ckpt.close()
    shapes0 = [b["targets"].shape for b in p0]
    shapes1 = [b["targets"].shape for b in p1]
    assert shapes0 == shapes1
    # the long utterance forced the 24-label bucket on BOTH processes
    assert any(s[1] == 24 for s in shapes0)
    del long_item


# Failure signatures that mean "environment raced us", not "the code is
# wrong": the coordination-service port was grabbed between our free-port
# probe and the worker's bind (TOCTOU), or barrier/heartbeat deadlines blew
# on a CPU-contended box (observed once in a 56-minute full-suite run where
# the test passes in isolation in <3 min).  Those attempts are retried on a
# fresh port; a genuine lockstep/assembly failure is NOT in this list and
# fails immediately.
_TRANSIENT = ("address already in use", "deadline_exceeded",
              "failed to connect", "barrier timed out",
              "coordination service", "unavailable:")


def _spawn_lockstep_workers(tmp_path, attempt):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    env["PYTHONPATH"] = os.pathsep.join(
        [os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
         env.get("PYTHONPATH", "")])
    worker = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "_multihost_worker.py")
    procs = [subprocess.Popen(
        [sys.executable, worker, str(port), str(i),
         str(tmp_path / f"a{attempt}c{i}")],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for i in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=900)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            if p.poll() is None:
                p.kill()
        for p in procs:
            out, _ = p.communicate()
            if len(outs) < len(procs):
                outs.append(out)
        return None, outs  # timeout: retryable under load
    for p, out in zip(procs, outs):
        if p.returncode != 0 and any(sig in out.lower()
                                     for sig in _TRANSIENT):
            return None, outs  # transient environment race: retryable
    return procs, outs


@pytest.mark.slow
def test_two_real_processes_lockstep_and_global_batch(tmp_path):
    """Two actual jax.distributed CPU processes: prefetcher assembles the
    global batch (make_array_from_process_local_data), its contents match the
    single-process reference, and a real train_step runs on the 4-device
    process-spanning mesh."""
    for attempt in range(3):
        procs, outs = _spawn_lockstep_workers(tmp_path, attempt)
        if procs is not None:
            break
    else:
        pytest.fail("3/3 attempts hit transient distributed-init failures:\n"
                    + "\n---\n".join(outs))
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert "WORKER_OK" in out, out
    lock0 = [l for l in outs[0].splitlines() if l.startswith("LOCKSTEP")]
    lock1 = [l for l in outs[1].splitlines() if l.startswith("LOCKSTEP")]
    assert lock0 and lock0 == lock1, (lock0, lock1)
