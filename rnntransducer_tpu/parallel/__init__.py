from rnntransducer_tpu.parallel.mesh import (
    DATA_AXIS, MODEL_AXIS, batch_sharding, constrain_state, make_mesh,
    replicate, replicated, shard_batch, shard_tree, tree_shardings,
)

__all__ = ["DATA_AXIS", "MODEL_AXIS", "batch_sharding", "constrain_state",
           "make_mesh", "replicate", "replicated", "shard_batch",
           "shard_tree", "tree_shardings"]
