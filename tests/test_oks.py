"""OKS/AP evaluation tests."""

import numpy as np

from hourglass_pose_estimation_tpu.data.oks import (
    compute_oks, oks_ap, instance_areas_from_scales, COCO_SIGMAS)


def test_perfect_predictions_give_oks_one(rng):
    N, J = 8, 17
    gts = rng.uniform(0, 200, size=(N, J, 2))
    vis = np.ones((N, J))
    areas = np.full((N,), 120.0 * 180.0)
    oks = compute_oks(gts, gts, vis, areas)
    np.testing.assert_allclose(oks, 1.0)
    ap = oks_ap(gts, gts, vis, areas)
    assert ap['AP'] == 1.0 and ap['AP50'] == 1.0


def test_oks_decreases_with_distance(rng):
    N, J = 4, 17
    gts = rng.uniform(50, 150, size=(N, J, 2))
    vis = np.ones((N, J))
    areas = np.full((N,), 100.0 * 100.0)
    small = compute_oks(gts + 2.0, gts, vis, areas)
    large = compute_oks(gts + 20.0, gts, vis, areas)
    assert np.all(small > large)
    assert np.all(small < 1.0)


def test_unlabeled_keypoints_ignored(rng):
    J = 17
    gt = rng.uniform(0, 100, size=(1, J, 2))
    pred = gt.copy()
    pred[0, 0] += 500.0           # wreck one joint
    vis = np.ones((1, J))
    areas = np.array([10000.0])
    bad = compute_oks(pred, gt, vis, areas)[0]
    vis[0, 0] = 0                 # now unlabeled -> ignored
    good = compute_oks(pred, gt, vis, areas)[0]
    assert bad < good == 1.0


def test_matches_pycocotools_formula(rng):
    """Hand-rolled oracle of the pycocotools computeOks inner loop."""
    N, J = 6, 17
    gts = rng.uniform(0, 300, size=(N, J, 2))
    preds = gts + rng.normal(scale=5.0, size=(N, J, 2))
    vis = (rng.uniform(size=(N, J)) > 0.2).astype(float)
    areas = rng.uniform(5000, 50000, size=(N,))

    ours = compute_oks(preds, gts, vis, areas)
    vars_ = (COCO_SIGMAS * 2) ** 2
    for n in range(N):
        dx = preds[n, :, 0] - gts[n, :, 0]
        dy = preds[n, :, 1] - gts[n, :, 1]
        e = (dx ** 2 + dy ** 2) / vars_ / (areas[n] + np.spacing(1)) / 2
        k = vis[n] > 0
        if k.sum() == 0:
            continue
        expect = np.sum(np.exp(-e[k])) / k.sum()
        np.testing.assert_allclose(ours[n], expect, rtol=1e-12)


def test_instance_areas_from_scales():
    scales = np.array([[1.25, 1.25]])   # box 200x200 before expansion
    areas = instance_areas_from_scales(scales)
    np.testing.assert_allclose(areas, [200.0 * 200.0])
