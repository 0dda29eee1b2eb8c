from hourglass_pose_estimation_tpu.runner.trainer import Trainer
from hourglass_pose_estimation_tpu.runner.evaluator import Evaluator
from hourglass_pose_estimation_tpu.runner.estimator import Estimator
from hourglass_pose_estimation_tpu.runner.train_state import (
    TrainState, make_optimizer, init_state, make_train_step, make_eval_step)
from hourglass_pose_estimation_tpu.runner import checkpoint
