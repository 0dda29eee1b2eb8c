"""MSPN structural parity and trainability (the reference's MSPN cannot
train end-to-end — SURVEY.md §2; ours must)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from hourglass_pose_estimation_tpu.models import MSPN, get_model
from hourglass_pose_estimation_tpu.ops.resize import (
    resize_bilinear_align_corners)

# verified by instantiating the reference torch MSPN (16 joints,
# out_res 64, up_channel_num 256, non-mobile)
REFERENCE_COUNTS = {1: 25_132_480, 2: 56_848_576}


def _count(params):
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))


def test_resize_align_corners_matches_torch(rng):
    for (H, W, h, w) in [(8, 8, 16, 16), (16, 16, 64, 64), (7, 5, 13, 9),
                         (16, 16, 8, 8)]:
        x = rng.normal(size=(2, H, W, 3)).astype(np.float32)
        ours = np.asarray(resize_bilinear_align_corners(x, (h, w)))
        ref = F.interpolate(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                            size=(h, w), mode='bilinear', align_corners=True)
        np.testing.assert_allclose(ours, ref.numpy().transpose(0, 2, 3, 1),
                                   rtol=1e-4, atol=1e-5)


def test_resize_halfpix_matches_cv2(rng):
    """cv2.resize INTER_LINEAR parity (half-pixel centers) for the
    Estimator's on-device preprocess (ops/resize.py halfpix variant)."""
    import cv2
    from hourglass_pose_estimation_tpu.ops.resize import (
        resize_bilinear_halfpix)
    for (H, W, h, w) in [(120, 160, 64, 64), (64, 64, 256, 256),
                         (33, 47, 64, 64), (64, 64, 64, 64)]:
        x = rng.normal(size=(2, H, W, 3)).astype(np.float32)
        ours = np.asarray(resize_bilinear_halfpix(x, (h, w)))
        ref = np.stack([cv2.resize(f, (w, h), interpolation=cv2.INTER_LINEAR)
                        for f in x])
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_mspn_param_count_parity():
    for stacks, expected in REFERENCE_COUNTS.items():
        m = MSPN(num_stacks=stacks, num_classes=16, out_res=16,
                 up_channel_num=256, dtype=jnp.float32)
        v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                   train=False)
        assert _count(v['params']) == expected, stacks


def test_mspn_output_shapes():
    m = MSPN(num_stacks=2, num_classes=16, out_res=16, dtype=jnp.float32)
    x = jnp.zeros((2, 64, 64, 3))
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    out = m.apply(v, x, train=False)
    # 2 stages x 4 resolution heads, all upsampled to out_res
    assert out.shape == (8, 2, 16, 16, 16)
    assert out.dtype == jnp.float32


def test_mspn_trains_one_step():
    """The documented fix: MSPN must run through the standard train step."""
    from hourglass_pose_estimation_tpu.runner.train_state import (
        make_optimizer, init_state, make_train_step)
    from hourglass_pose_estimation_tpu.data import Synthetic, make_spec

    ds = Synthetic(True, num_samples=4, inp_res=64, out_res=16, sigma=1,
                   scale_factor=0.25, rot_factor=30)
    spec = make_spec(ds)
    model = MSPN(num_stacks=1, num_classes=16, out_res=16,
                 up_channel_num=64, dtype=jnp.float32)
    tx = make_optimizer(2.5e-3, [], 0.1, 2)
    state = init_state(model, jax.random.PRNGKey(0), (1, 64, 64, 3), tx)
    step = make_train_step(spec, device_pipeline=True)
    raw = ds.canvas_batch([0, 1, 2, 3], canvas=64)
    state, m = step(state, raw, jax.random.PRNGKey(1))
    assert np.isfinite(float(m['loss']))
    assert int(state.step) == 1


def test_mspn_factory():
    m = get_model('mspn', num_stacks=2, num_classes=17, out_res=64,
                  mobile=False, num_blocks=1)
    assert isinstance(m, MSPN)
    assert m.up_channel_num == 256  # num_blocks is NOT up_channel_num here


def test_model_config_plumbs_out_res_and_width():
    """Regression: Trainer/export/importer must build the model the
    config describes — an MSPN validated at DATASET.out_res!=64 or a
    reference width!=256 checkpoint (its factory maps num_blocks to
    up_channel_num, mspn.py:310) previously got the class defaults."""
    from hourglass_pose_estimation_tpu.config import load_config
    from hourglass_pose_estimation_tpu.runner.trainer import Trainer

    cfg = load_config(raw={
        'DATASET': {'name': 'synthetic', 'inp_res': 64, 'out_res': 32,
                    'num_samples': 4},
        'MODEL': {'arch': 'mspn', 'num_stacks': 1, 'up_channel_num': 64},
        'TRAIN': {'epochs': 1, 'train_batch': 2, 'val_batch': 2},
        'COMMON': {'checkpoint_dir': '/tmp/mspn_cfg_test'},
    })
    tr = Trainer(cfg, verbose=False)
    assert tr.model.out_res == 32
    assert tr.model.up_channel_num == 64

    # arch=hg must reject the MSPN-only knob instead of ignoring it
    with pytest.raises(ValueError, match='up_channel_num'):
        get_model('hg', num_stacks=1, num_classes=16, up_channel_num=64)
