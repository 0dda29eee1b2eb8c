"""PCK metric parity vs a direct torch oracle of the reference semantics
(evaluation.py:8-76), including the 1-based argmax quirks."""

import numpy as np
import torch

from hourglass_pose_estimation_tpu.utils import evaluation as E


def _torch_get_preds(hm_nchw):
    maxval, idx = torch.max(hm_nchw.view(hm_nchw.size(0), hm_nchw.size(1), -1), 2)
    maxval = maxval.view(hm_nchw.size(0), hm_nchw.size(1), 1)
    idx = idx.view(hm_nchw.size(0), hm_nchw.size(1), 1)
    preds = idx.repeat(1, 1, 2).float()
    preds[:, :, 0] = (preds[:, :, 0] - 1) % hm_nchw.size(3) + 1
    preds[:, :, 1] = torch.floor((preds[:, :, 1] - 1) / hm_nchw.size(3)) + 1
    pred_mask = maxval.gt(0.).repeat(1, 1, 2).float()
    return preds * pred_mask


def _torch_accuracy(output, target, thr=0.5):
    preds = _torch_get_preds(output)
    gts = _torch_get_preds(target)
    norm = torch.ones(preds.size(0)) * output.size(3) / 10
    n, c = preds.size(0), preds.size(1)
    dists = np.zeros((c, n))
    for i in range(n):
        for j in range(c):
            if target is not None and gts[i, j, 0] > 1 and gts[i, j, 1] > 1:
                dists[j, i] = torch.dist(preds[i, j], gts[i, j]) / norm[i]
            else:
                dists[j, i] = -1
    accs = []
    for j in range(c):
        d = dists[j][dists[j] != -1]
        accs.append(1.0 * (d < thr).sum() / len(d) if len(d) > 0 else -1)
    valid = [a for a in accs if a >= 0]
    avg = sum(valid) / len(valid) if valid else 0.0
    return avg, accs


def _rand_heatmaps(rng, B, J, H, W, frac_zero=0.2):
    hm = rng.uniform(0, 1, size=(B, H, W, J)).astype(np.float32)
    # make some maps all non-positive so maxval <= 0 path is exercised
    kill = rng.uniform(size=(B, J)) < frac_zero
    hm = np.where(kill[:, None, None, :], -np.abs(hm), hm)
    return hm


def test_get_preds_parity(rng):
    hm = _rand_heatmaps(rng, 8, 17, 64, 64)
    ours, _ = E.get_preds(hm)
    theirs = _torch_get_preds(torch.from_numpy(hm.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), atol=1e-6)


def test_get_preds_idx0_quirk():
    # peak at flat index 0 -> reference yields (W, 0)
    hm = np.zeros((1, 4, 4, 1), np.float32)
    hm[0, 0, 0, 0] = 1.0
    ours, _ = E.get_preds(hm)
    theirs = _torch_get_preds(torch.from_numpy(hm.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy())
    assert np.asarray(ours)[0, 0, 0] == 4.0 and np.asarray(ours)[0, 0, 1] == 0.0


def test_accuracy_parity(rng):
    for trial in range(3):
        B, J, H, W = 6, 16, 64, 64
        pred = _rand_heatmaps(rng, B, J, H, W)
        gt = _rand_heatmaps(rng, B, J, H, W, frac_zero=0.3)
        avg, per_joint, cnt = E.accuracy(pred, gt, thr=0.5)
        t_avg, t_accs = _torch_accuracy(
            torch.from_numpy(pred.transpose(0, 3, 1, 2)),
            torch.from_numpy(gt.transpose(0, 3, 1, 2)), thr=0.5)
        np.testing.assert_allclose(float(avg), t_avg, atol=1e-6)
        np.testing.assert_allclose(np.asarray(per_joint), t_accs, atol=1e-6)


def test_accuracy_perfect_prediction(rng):
    gt = _rand_heatmaps(rng, 4, 16, 64, 64, frac_zero=0.0)
    avg, per_joint, cnt = E.accuracy(gt, gt)
    assert float(avg) == 1.0


def test_average_meter():
    m = E.AverageMeter()
    m.update(1.0, 2)
    m.update(4.0, 1)
    assert abs(m.avg - 2.0) < 1e-9
    assert m.count == 3
