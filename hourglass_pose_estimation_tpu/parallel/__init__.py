from hourglass_pose_estimation_tpu.parallel.mesh import (
    make_mesh, batch_sharding, replicated_sharding, param_sharding_rules,
    shard_params,
)
