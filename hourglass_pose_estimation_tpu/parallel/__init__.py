from hourglass_pose_estimation_tpu.parallel.mesh import (
    make_mesh, batch_sharding, replicated_sharding, param_sharding_rules,
    shard_params,
)
from hourglass_pose_estimation_tpu.parallel.shard_map_step import (
    make_shard_map_train_step,
)
from hourglass_pose_estimation_tpu.parallel.multihost import (
    maybe_initialize_distributed, global_batch_from_local,
)
