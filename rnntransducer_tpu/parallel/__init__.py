from rnntransducer_tpu.parallel.mesh import (
    DATA_AXIS, MODEL_AXIS, batch_sharding, constrain_state, make_mesh,
    replicate, replicated, shard_batch, shard_tree, tree_shardings,
)
from rnntransducer_tpu.parallel.pipeline import (
    STAGE_AXIS, make_stage_mesh, pipeline_encode, pipeline_scan,
)
from rnntransducer_tpu.parallel.wavefront import (
    TIME_AXIS, make_time_mesh, pad_time_to_multiple, wavefront_encode,
    wavefront_scan,
)

__all__ = ["DATA_AXIS", "MODEL_AXIS", "STAGE_AXIS", "TIME_AXIS",
           "batch_sharding", "constrain_state", "make_mesh",
           "make_stage_mesh", "make_time_mesh", "pad_time_to_multiple",
           "pipeline_encode", "pipeline_scan", "replicate", "replicated",
           "shard_batch", "shard_tree", "tree_shardings",
           "wavefront_encode", "wavefront_scan"]
