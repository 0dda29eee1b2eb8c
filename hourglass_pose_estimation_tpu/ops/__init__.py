from hourglass_pose_estimation_tpu.ops.heatmap import render_gaussian_targets
from hourglass_pose_estimation_tpu.ops.warp import affine_warp
from hourglass_pose_estimation_tpu.ops.decode import (
    decode_quarter_offset,
    decode_dark,
    decode_simple_argmax,
)
