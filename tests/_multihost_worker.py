"""Worker for tests/test_multihost_lockstep.py: one of two real JAX processes
(jax.distributed over the CPU backend, 2 local devices each -> a 4-device
global mesh).  Exercises the actual multi-host branches:

* Trainer._host_batches process-local slicing + full-batch label bucket
  (loop.py), under real jax.process_index()/process_count();
* DevicePrefetcher's make_array_from_process_local_data assembly
  (prefetch.py);
* one real train_step over the process-spanning mesh.

Prints LOCKSTEP lines (parent asserts both processes emit identical ones) and
asserts the assembled global batch matches the single-process reference via
permutation-invariant checksums (shard order across processes is a permutation
of the single-process batch; training is permutation-invariant, SURVEY §2.2 N4).
"""

import itertools
import sys

port, pid = sys.argv[1], int(sys.argv[2])

import os

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2")

import jax

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(f"127.0.0.1:{port}", num_processes=2,
                           process_id=pid)

import numpy as np
import jax.numpy as jnp

from rnntransducer_tpu.config import (
    AudioConfig, Config, DataConfig, JointNetConfig, ModelConfig,
    PredNetConfig, TrainConfig, TransNetConfig,
)
from rnntransducer_tpu.data import (
    DevicePrefetcher, LengthBucketSampler, SyntheticAudioDataset, collate,
)
from rnntransducer_tpu.train import Trainer, train_step

assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 4, len(jax.devices())

ckpt_dir = sys.argv[3]
cfg = Config(
    data=DataConfig(audio=AudioConfig(spec_augment=False),
                    audio_buckets=(64, 128), label_buckets=(16, 24)),
    model=ModelConfig(
        transnet=TransNetConfig(input_size=80, hidden_size=16, output_size=12,
                                num_layers=1, rnn_type="gru", dropout=0.0,
                                bidirectional=True),
        prednet=PredNetConfig(embedding_size=72, hidden_size=16,
                              output_size=12, num_layers=1, rnn_type="lstm",
                              dropout=0.0),
        jointnet=JointNetConfig(num_classes=72),
    ),
    train=TrainConfig(max_steps=1, per_device_train_batch_size=2,
                      precision="fp32", checkpoint_dir=ckpt_dir,
                      learning_rate=1e-3),
)
# identical dataset on every process (the reference ships the same shards to
# every rank and stride-samples, datasampler.py:96; here the sampler runs
# identically everywhere and each process collates its own slice)
ds = SyntheticAudioDataset(24, AudioConfig(), min_sec=0.3, max_sec=1.2,
                           min_labels=3, max_labels=10, seed=0)

trainer = Trainer(cfg, ds)
assert trainer.n_devices == 4
global_bs = trainer._global_batch()  # 2 per device * 4 devices = 8

# ---- single-process reference (same sampler seed, no slicing) -------------
sampler = LengthBucketSampler(ds.lengths(), cfg.data.audio_buckets, global_bs,
                              seed=cfg.train.seed, shuffle=True,
                              label_lengths=ds.label_lengths(),
                              max_label_length=cfg.data.label_buckets[-1])
ref_batches = []
for b_idx, idxs, n_valid in sampler.epoch_batches(0)[:3]:
    items = [ds[i] for i in idxs]
    max_u = int(max(ds.label_lengths()[i] for i in idxs))
    ref_batches.append(collate(
        items, max_frames=cfg.data.audio_buckets[b_idx],
        max_labels=trainer._label_bucket_for(max_u),
        pad_id=cfg.data.text.pad_token_id))

# ---- the real multi-host path ---------------------------------------------
prefetch = DevicePrefetcher(
    trainer._host_batches(ds, 0, global_bs), mesh=trainer.mesh)

state = trainer.state
for i, (gb, ref) in enumerate(zip(itertools.islice(prefetch, 3),
                                  ref_batches)):
    shapes = {k: tuple(v.shape) for k, v in sorted(gb.items())}
    print(f"LOCKSTEP batch {i} shapes {shapes}", flush=True)
    for k, refv in ref.items():
        assert tuple(gb[k].shape) == refv.shape, (k, gb[k].shape, refv.shape)

    # permutation-invariant checksums of the assembled global array vs the
    # single-process reference (replicated scalars are fetchable everywhere;
    # fp32 accumulation order differs between the sharded and host arrays,
    # hence the tolerance)
    @jax.jit
    def sums(x):
        x = x.astype(jnp.float32)
        return jnp.sum(x), jnp.sum(x * x), jnp.sum(jnp.sum(x, axis=tuple(
            range(1, x.ndim))) ** 2)
    for k, refv in ref.items():
        got = tuple(float(v) for v in sums(gb[k]))
        want = tuple(float(v) for v in sums(jnp.asarray(refv)))
        np.testing.assert_allclose(got, want, rtol=1e-4, err_msg=k)

    state, metrics = train_step(cfg, trainer.tx, state, gb)
    loss = float(metrics["loss"])
    assert np.isfinite(loss), loss
    print(f"LOCKSTEP batch {i} loss {loss:.6f}", flush=True)

# ---- tensor parallel across hosts: (data=2 over processes, model=2 local) --
# The vocab psum rides intra-process devices; the data axis spans processes.
import dataclasses

from jax.sharding import PartitionSpec as P

from rnntransducer_tpu.parallel import MODEL_AXIS

cfg_tp = dataclasses.replace(cfg, train=dataclasses.replace(
    cfg.train, model_parallel=2, checkpoint_dir=ckpt_dir + "_tp"))
trainer_tp = Trainer(cfg_tp, ds)
assert trainer_tp.mesh.axis_names == ("data", "model")
assert trainer_tp.n_data_shards == 2
assert trainer_tp._global_batch() == 4  # 2 per device * 2 data shards
k = trainer_tp.state.params["joint"]["fc"]["kernel"]
assert k.sharding.spec == P(None, MODEL_AXIS), k.sharding
gb_tp = next(iter(DevicePrefetcher(
    trainer_tp._host_batches(ds, 0, trainer_tp._global_batch()),
    mesh=trainer_tp.mesh)))
with trainer_tp._mesh_context():
    st_tp, m_tp = train_step(cfg_tp, trainer_tp.tx, trainer_tp.state, gb_tp)
loss_tp = float(m_tp["loss"])
assert np.isfinite(loss_tp), loss_tp
assert st_tp.params["joint"]["fc"]["kernel"].sharding.spec == \
    P(None, MODEL_AXIS)
print(f"LOCKSTEP tp loss {loss_tp:.6f}", flush=True)

# ---- ZeRO-1 across hosts: Adam moments split over the process-spanning ----
# data axis; step math must match the replicated trainer bit-for-bit-close,
# and the sharded optimizer state must survive an orbax checkpoint
# round-trip with every process holding only its moment shards.
from rnntransducer_tpu.parallel import DATA_AXIS

# NB: the checkpoint directory must be the SAME path on every process —
# orbax coordinates a multiprocess save across ranks and deadlocks if each
# rank names its own directory (each waits for the other's shards there).
# The per-process ckpt_dir argv is fine for the sections above (they never
# save); here we derive a shared sibling.
zero_dir = os.path.join(os.path.dirname(ckpt_dir), "zero_shared")
cfg_z = dataclasses.replace(cfg, train=dataclasses.replace(
    cfg.train, shard_optimizer_state=True, checkpoint_dir=zero_dir))
trainer_z = Trainer(cfg_z, ds)
split = [l for p, l in
         jax.tree_util.tree_flatten_with_path(trainer_z.state.opt_state)[0]
         if hasattr(l, "sharding") and DATA_AXIS in tuple(l.sharding.spec)]
assert split, "no moment sharded over the process-spanning data axis"
# each device (4 global, 2 per process) addresses 1/4 of a split moment
probe = split[0]
assert probe.addressable_shards[0].data.size == probe.size // 4, \
    (probe.shape, probe.addressable_shards[0].data.shape)

gb_z = next(iter(DevicePrefetcher(
    trainer_z._host_batches(ds, 0, trainer_z._global_batch()),
    mesh=trainer_z.mesh)))
with trainer_z._mesh_context():
    st_z, m_z = train_step(cfg_z, trainer_z.tx, trainer_z.state, gb_z)
loss_z = float(m_z["loss"])

# replicated reference on the SAME global batch + same (seed-identical) init
trainer_r = Trainer(dataclasses.replace(cfg, train=dataclasses.replace(
    cfg.train, checkpoint_dir=ckpt_dir + "_zr")), ds)
st_r, m_r = train_step(cfg, trainer_r.tx, trainer_r.state, gb_z)
np.testing.assert_allclose(loss_z, float(m_r["loss"]), rtol=1e-6)
dmax = max(float(jnp.abs(a - b).max()) for a, b in zip(
    jax.tree.leaves(st_z.params), jax.tree.leaves(st_r.params)))
assert dmax < 1e-6, dmax
print(f"LOCKSTEP zero loss {loss_z:.6f} dmax_ok", flush=True)

# checkpoint round-trip of the process-spanning sharded state
trainer_z.ckpt.save(int(st_z.step), st_z, config=cfg_z)
restored = trainer_z.ckpt.restore(trainer_z.state)
trainer_z.ckpt.close()
for a, b in zip(jax.tree.leaves(st_z.opt_state),
                jax.tree.leaves(restored.opt_state)):
    np.testing.assert_array_equal(np.asarray(a.addressable_shards[0].data),
                                  np.asarray(b.addressable_shards[0].data))
rsum = float(jnp.sum(jax.tree.leaves(restored.opt_state)[1]))
zsum = float(jnp.sum(jax.tree.leaves(st_z.opt_state)[1]))
assert rsum == zsum, (rsum, zsum)
print(f"LOCKSTEP zero ckpt roundtrip ok {rsum:.6f}", flush=True)

# ---- multi-host top-k pruning: orbax delete() ends in a global barrier ----
# that every process must join — saves that push a step out of top-k must
# not deadlock or desynchronize the coordination service.
from rnntransducer_tpu.train.checkpoint import CheckpointManager

prune_dir = os.path.join(os.path.dirname(ckpt_dir), "prune_shared")
cm = CheckpointManager(prune_dir, save_top_k=1, monitor="val_cer")
# orbax refuses host-local arrays in a multi-host setting: replicate over
# the process-spanning mesh like real train state
st_small = {"w": jax.make_array_from_process_local_data(
    jax.sharding.NamedSharding(trainer.mesh, P()),
    np.ones((4,), np.float32))}
cm.save(1, st_small, metrics={"val_cer": 0.5})
cm.save(2, st_small, metrics={"val_cer": 0.9})  # prunes nothing (2 = latest)
cm.save(3, st_small, metrics={"val_cer": 0.1})  # prunes 1 and 2 -> barrier
kept = sorted(cm._mgr.all_steps())
cm.close()
print(f"LOCKSTEP prune kept {kept}", flush=True)
assert kept == [3], kept

# ---- multi-host validation: Trainer.validate() over the process-spanning --
# mesh must (a) run at all (it fetches only locally-addressable rows and
# allgathers corpus statistics), (b) agree across processes (LOCKSTEP), and
# (c) match an independent single-device reference computed from the same
# replicated params — covering every utterance exactly once.
from rnntransducer_tpu.data import SyntheticAudioDataset as _SDS
from rnntransducer_tpu.decode import greedy_decode
from rnntransducer_tpu.train.metrics import error_counts
from rnntransducer_tpu.train.state import eval_step

val_ds = _SDS(10, AudioConfig(), min_sec=0.3, max_sec=1.0,
              min_labels=3, max_labels=8, seed=5)
cfg_v = dataclasses.replace(cfg, train=dataclasses.replace(
    cfg.train, per_device_eval_batch_size=1, checkpoint_dir=ckpt_dir + "_v"))
trainer_v = Trainer(cfg_v, ds, val_dataset=val_ds)
got = trainer_v.validate()
print(f"LOCKSTEP val loss {got['val_loss']:.5f} wer {got['val_wer']:.5f} "
      f"cer {got['val_cer']:.5f}", flush=True)

# independent reference: same replicated params, one local device, full
# (unsliced) batches through the same sampler/collate/decode
params_h = jax.tree.map(np.asarray, trainer_v.state.params)
# the eval loop's global batch: per_device_eval_batch_size * data shards
vb = cfg_v.train.per_device_eval_batch_size * trainer_v.n_data_shards
vs = LengthBucketSampler(val_ds.lengths(), cfg.data.audio_buckets, vb,
                         seed=cfg.train.seed, shuffle=False,
                         label_lengths=val_ds.label_lengths(),
                         max_label_length=cfg.data.label_buckets[-1])
loss_sum = loss_n = 0
preds, refs = [], []
for b_idx, idxs, n_valid in vs.epoch_batches(0):
    items = [val_ds[i] for i in idxs]
    max_u = int(max(val_ds.label_lengths()[i] for i in idxs))
    b = collate(items, max_frames=cfg.data.audio_buckets[b_idx],
                max_labels=trainer_v._label_bucket_for(max_u),
                pad_id=cfg.data.text.pad_token_id)
    per = np.asarray(eval_step(cfg_v, params_h, b, reduction="none"))
    loss_sum += float(per[:n_valid].sum())
    loss_n += n_valid
    toks, lens = greedy_decode(
        trainer_v.model, {"params": params_h}, b["feats"],
        b["feat_lengths"], blank_id=cfg.data.text.pad_token_id,
        max_symbols=cfg.train.greedy_max_symbols,
        max_output_len=max(cfg.data.label_buckets))
    toks, lens = np.asarray(toks), np.asarray(lens)
    for i in range(n_valid):
        preds.append(trainer_v.tokenizer.decode(toks[i, :lens[i]],
                                                group_tokens=False))
        u = int(b["target_lengths"][i])
        refs.append(trainer_v.tokenizer.decode(b["targets"][i, :u],
                                               group_tokens=False))
assert loss_n == len(val_ds), (loss_n, len(val_ds))
we, wt, ce, ct = error_counts(preds, refs)
np.testing.assert_allclose(got["val_loss"], loss_sum / loss_n, rtol=1e-5)
np.testing.assert_allclose(got["val_wer"], we / max(wt, 1), atol=1e-9)
np.testing.assert_allclose(got["val_cer"], ce / max(ct, 1), atol=1e-9)
print("LOCKSTEP val reference ok", flush=True)

print("WORKER_OK", flush=True)
