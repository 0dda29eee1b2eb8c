"""Evaluator tests: flip-test averaging, keypoint prediction path, and
the MPII PCKh evaluator against a fabricated gt .mat."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hourglass_pose_estimation_tpu.config import load_config
from hourglass_pose_estimation_tpu.runner.evaluator import (
    Evaluator, flip_heatmaps)


def test_flip_heatmaps_roundtrip(rng):
    """flip(forward(flip(x))) aligns with forward(x) for a symmetric map."""
    B, H, W, J = 2, 8, 8, 4
    perm = (1, 0, 2, 3)
    hm = rng.uniform(size=(B, H, W, J)).astype(np.float32)
    out = np.asarray(flip_heatmaps(jnp.asarray(hm), perm))
    assert out.shape == hm.shape
    # un-shift, un-mirror and compare to the permuted source (the one-
    # pixel alignment shift duplicates col 0 / drops the last col, so
    # only the interior is exactly recoverable)
    unshift = out[:, :, 1:, :]
    mirrored = hm[..., list(perm)][:, :, ::-1, :]
    np.testing.assert_allclose(unshift, mirrored[:, :, :-1, :])


def _tiny_cfg(**over):
    raw = {
        'DATASET': {'name': 'synthetic', 'inp_res': 64, 'out_res': 16,
                    'sigma': 1, 'scale_factor': 0.25, 'rot_factor': 30,
                    'num_samples': 8},
        'MODEL': {'arch': 'hg', 'num_stacks': 1},
        'TRAIN': {'val_batch': 4, 'precision': 'f32'},
        'COMMON': {'seed': 0},
    }
    for k, v in over.items():
        raw.setdefault(k, {}).update(v)
    return load_config(raw=raw)


def _state_for(cfg):
    from hourglass_pose_estimation_tpu.runner.train_state import (
        make_optimizer, init_state)
    from hourglass_pose_estimation_tpu.models import HourglassNet
    model = HourglassNet(num_stacks=1, num_blocks=1, num_classes=16,
                         dtype=jnp.float32)
    tx = make_optimizer(1e-3, [], 0.1, 1)
    return init_state(model, jax.random.PRNGKey(0), (1, 64, 64, 3), tx)


def test_evaluator_runs():
    cfg = _tiny_cfg()
    ev = Evaluator(cfg, verbose=False)
    state = _state_for(cfg)
    loss, acc = ev.evaluate(state)
    assert np.isfinite(loss)
    assert 0.0 <= acc <= 1.0


def test_evaluator_host_pipeline():
    """DATASET.device_pipeline=False (cv2-parity host crops): the
    standalone Evaluator must route host batches through
    prepare_host_batch for evaluate() and normalize-in-forward for
    predict_keypoints(), like the Trainer — this config crashed with
    KeyError before round 5."""
    cfg = _tiny_cfg(DATASET={'device_pipeline': False})
    ev = Evaluator(cfg, verbose=False)
    state = _state_for(cfg)
    loss, acc = ev.evaluate(state)
    assert np.isfinite(loss)
    assert 0.0 <= acc <= 1.0
    preds = ev.predict_keypoints(state, flip_test=False)
    assert preds.shape == (8, 16, 2)
    assert np.isfinite(preds).all()
    # the two pipelines see the same (eval-mode, deterministic)
    # geometry: decoded keypoints must agree to within a pixel
    ev_dev = Evaluator(_tiny_cfg(), verbose=False)
    preds_dev = ev_dev.predict_keypoints(state, flip_test=False)
    assert np.median(np.abs(preds - preds_dev)) <= 1.0


def test_predict_keypoints_shapes_and_fliptest():
    cfg = _tiny_cfg(EVAL={'flip_test': False})
    ev = Evaluator(cfg, verbose=False)
    state = _state_for(cfg)
    preds = ev.predict_keypoints(state)
    assert preds.shape == (8, 16, 2)
    preds_flip = ev.predict_keypoints(state, flip_test=True)
    assert preds_flip.shape == (8, 16, 2)
    # flip-test changes (averages) predictions but keeps them in-frame
    assert not np.allclose(preds, preds_flip)
    assert np.abs(preds_flip).max() < 500


def test_predict_keypoints_with_subset():
    """MODEL.subset: the model emits len(subset) channels; the official
    prediction path must scatter them into the dataset's full joint set
    (and re-index the flip permutation into subset space)."""
    subset = [0, 5]                       # flip-closed pair (0 <-> 5)
    cfg = _tiny_cfg(MODEL={'subset': subset, 'num_classes': 0},
                    EVAL={'flip_test': False})
    ev = Evaluator(cfg, verbose=False)
    from hourglass_pose_estimation_tpu.runner.train_state import (
        make_optimizer, init_state)
    from hourglass_pose_estimation_tpu.models import HourglassNet
    model = HourglassNet(num_stacks=1, num_blocks=1,
                         num_classes=len(subset), dtype=jnp.float32)
    tx = make_optimizer(1e-3, [], 0.1, 1)
    state = init_state(model, jax.random.PRNGKey(0), (1, 64, 64, 3), tx)

    preds, scores = ev.predict_keypoints(state, return_scores=True)
    assert preds.shape == (8, 16, 2)
    assert scores.shape == (8, 16)
    off = [j for j in range(16) if j not in subset]
    assert np.all(preds[:, off] == 0) and np.all(scores[:, off] == 0)
    assert np.any(preds[:, subset] != 0)
    # flip-closed subset: flip_test path must run (subset-space perm)
    preds_f = ev.predict_keypoints(state, flip_test=True)
    assert preds_f.shape == (8, 16, 2)
    # non-flip-closed subset + flip_test must fail loudly
    cfg_bad = _tiny_cfg(MODEL={'subset': [0, 1], 'num_classes': 0})
    ev_bad = Evaluator(cfg_bad, verbose=False)
    with pytest.raises(ValueError, match='flip'):
        ev_bad.predict_keypoints(state, flip_test=True)


def test_pckh_evaluator(tmp_path):
    """Fabricated gt .mat with known distances -> exact PCKh table."""
    from scipy.io import savemat
    from hourglass_pose_estimation_tpu.data.mpii import evaluate_pckh

    N, J = 4, 16
    names = ['rank', 'rkne', 'rhip', 'lhip', 'lkne', 'lank', 'pelv', 'thor',
             'neck', 'head', 'rwri', 'relb', 'rsho', 'lsho', 'lelb', 'lwri']
    rng = np.random.RandomState(0)
    gt = rng.uniform(50, 200, size=(J, 2, N))
    headboxes = np.zeros((2, 2, N))
    headboxes[0] = 100.0
    headboxes[1] = 160.0   # headsize = 60*sqrt(2)*0.6 ≈ 50.9
    jnt_missing = np.zeros((J, N))

    dataset_joints = np.array([names], dtype=object)
    savemat(tmp_path / 'gt_valid.mat', {
        'dataset_joints': dataset_joints,
        'jnt_missing': jnt_missing,
        'pos_gt_src': gt,
        'headboxes_src': headboxes,
    })

    # perfect predictions -> 100 everywhere (preds are 0-based; +1 inside)
    preds = gt.transpose(2, 0, 1) - 1.0
    table, mean = evaluate_pckh(preds, str(tmp_path / 'gt_valid.mat'))
    assert mean == 100.0
    assert table['Head'] == 100.0

    # shift all predictions by > 0.5*headsize -> 0 everywhere
    headsize = np.linalg.norm([60, 60]) * 0.6
    bad = preds + headsize * 0.6
    table, mean = evaluate_pckh(bad, str(tmp_path / 'gt_valid.mat'))
    assert mean == 0.0
