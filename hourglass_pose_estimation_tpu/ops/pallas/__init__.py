from hourglass_pose_estimation_tpu.ops.pallas.render import (
    render_gaussian_targets_pallas)
from hourglass_pose_estimation_tpu.ops.pallas.decode import (
    decode_peaks_pallas)
from hourglass_pose_estimation_tpu.ops.pallas.upsample import (
    upsample2x_add_pallas)
from hourglass_pose_estimation_tpu.ops.pallas.pool import (
    maxpool2x2_pallas)
