"""OKS/AP evaluation tests."""

import numpy as np

from hourglass_pose_estimation_tpu.data.oks import (
    compute_oks, oks_recall, instance_areas_from_scales, COCO_SIGMAS)


def test_perfect_predictions_give_oks_one(rng):
    N, J = 8, 17
    gts = rng.uniform(0, 200, size=(N, J, 2))
    vis = np.ones((N, J))
    areas = np.full((N,), 120.0 * 180.0)
    oks = compute_oks(gts, gts, vis, areas)
    np.testing.assert_allclose(oks, 1.0)
    ar = oks_recall(gts, gts, vis, areas)
    assert ar['AR'] == 1.0 and ar['AR50'] == 1.0


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


def test_write_coco_results_roundtrip(tmp_path, rng):
    """Results-file writer: pycocotools keypoint format, value fidelity."""
    import json
    from hourglass_pose_estimation_tpu.data.oks import write_coco_results
    N, J = 3, 17
    preds = (rng.rand(N, J, 2) * 400).astype(np.float32)
    scores = rng.rand(N).astype(np.float32)
    kscores = rng.rand(N, J).astype(np.float32)
    image_ids = np.array([101, 202, 202])
    path = write_coco_results(preds, scores, image_ids,
                              str(tmp_path / 'res.json'), kpt_scores=kscores)
    with open(path) as fp:
        res = json.load(fp)
    assert len(res) == N
    for i, r in enumerate(res):
        assert set(r) == {'image_id', 'category_id', 'keypoints', 'score'}
        assert r['image_id'] == int(image_ids[i])
        assert r['category_id'] == 1
        assert len(r['keypoints']) == J * 3
        kp = np.asarray(r['keypoints']).reshape(J, 3)
        np.testing.assert_allclose(kp[:, :2], preds[i], atol=1e-3)
        np.testing.assert_allclose(kp[:, 2], kscores[i], atol=1e-3)
        assert abs(r['score'] - scores[i]) < 1e-4


def test_coco_eval_ap_graceful_without_pycocotools(tmp_path):
    from hourglass_pose_estimation_tpu.data.oks import coco_eval_ap
    try:
        import pycocotools  # noqa: F401
    except ImportError:
        assert coco_eval_ap('nonexistent.json', 'nonexistent.json') is None


def test_mpii_pred_mat_artifact(tmp_path):
    """Reference side effect (mpii.py:95-100): pred.mat saved 1-based;
    test split short-circuits to ('Null', 0.0)."""
    from scipy.io import loadmat
    from hourglass_pose_estimation_tpu.data.mpii import (
        evaluate_pckh, save_pred_mat)
    preds = np.arange(2 * 16 * 2, dtype=np.float32).reshape(2, 16, 2)
    path = save_pred_mat(preds, str(tmp_path))
    loaded = loadmat(path)['preds']
    np.testing.assert_allclose(loaded, preds + 1.0)

    table, mean = evaluate_pckh(preds, gt_file='', output_dir=str(tmp_path),
                                image_set='test')
    assert table == {'Null': 0.0} and mean == 0.0
