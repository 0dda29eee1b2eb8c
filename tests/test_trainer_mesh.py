"""Trainer on a multi-device mesh (dp and dp×tp) — the config-driven
path, not just the raw step (tests/test_parallel.py covers that)."""

import numpy as np
import jax
import pytest

from hourglass_pose_estimation_tpu.config import load_config
from hourglass_pose_estimation_tpu.runner import Trainer


def _cfg(tmp, dp, tp):
    return load_config(raw={
        'DATASET': {'name': 'synthetic', 'inp_res': 64, 'out_res': 16,
                    'sigma': 1, 'scale_factor': 0.25, 'rot_factor': 30,
                    'num_samples': 16},
        'MODEL': {'arch': 'hg', 'num_stacks': 1},
        'TRAIN': {'epochs': 1, 'train_batch': 8, 'val_batch': 8,
                  'precision': 'f32', 'data_parallel': dp,
                  'model_parallel': tp},
        'COMMON': {'checkpoint_dir': str(tmp), 'snapshot': 5, 'seed': 0},
    })


@pytest.mark.parametrize('dp,tp', [(8, 1), (4, 2)])
def test_trainer_trains_on_mesh(tmp_path, dp, tp):
    cfg = _cfg(tmp_path, dp, tp)
    trainer = Trainer(cfg, verbose=False)
    assert dict(trainer.mesh.shape) == {'data': dp, 'model': tp}
    best = trainer.train()
    assert np.isfinite(best)
    assert int(trainer.state.step) == trainer.steps_per_epoch
