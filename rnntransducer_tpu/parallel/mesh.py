"""Device mesh + sharding helpers.

Capability-equivalent of the reference's NCCL/DDP layer (``train.py:4,45``,
``scripts/run_train.sh:9``, SURVEY.md §2.2 N4) — but as a jax.sharding Mesh:
the batch is sharded over a 1-D ``data`` axis, params are replicated, and XLA
inserts the gradient/metric psums over ICI.  None of the reference's
CUDA-residency workarounds (``model.py:96-103``) exist here: collectives
compile into the step.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(devices: Optional[Sequence] = None, axis: str = DATA_AXIS) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.asarray(devices), (axis,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading batch axis split over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host batch so its leading axis is split across the mesh."""
    s = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)


def replicate(mesh: Mesh, tree):
    r = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, r), tree)
