from hourglass_pose_estimation_tpu.utils.transforms import (
    get_affine_transform,
    affine_transform,
    fliplr_joints,
    transform_preds,
    batched_affine_transforms,
    batched_apply_affine,
)
from hourglass_pose_estimation_tpu.utils.evaluation import (
    get_preds,
    calc_dists,
    dist_acc,
    accuracy,
    AverageMeter,
)
from hourglass_pose_estimation_tpu.utils.summary import (
    summarize,
    count_params,
    profile_step,
    step_cost,
)
