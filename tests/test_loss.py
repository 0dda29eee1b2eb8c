"""Loss parity vs a direct torch oracle of the reference MSELoss
(mse.py:14-44): per-joint weighted 0.5*mean-MSE, joint-averaged,
stack-summed."""

import numpy as np
import torch

from hourglass_pose_estimation_tpu.loss import heatmap_mse_loss


def _torch_loss(outputs_list, target, weight, use_weight=True):
    crit = torch.nn.MSELoss(reduction='mean')
    total = 0.0
    for o in outputs_list:
        B, J = o.size(0), o.size(1)
        pred = o.reshape(B, J, -1)
        gt = target.reshape(B, J, -1)
        loss = 0.0
        for j in range(J):
            p, g = pred[:, j], gt[:, j]
            if use_weight:
                loss = loss + 0.5 * crit(p * weight[:, j:j + 1], g * weight[:, j:j + 1])
            else:
                loss = loss + 0.5 * crit(p, g)
        total = total + loss / J
    return float(total)


def test_loss_parity(rng):
    S, B, J, H, W = 3, 4, 16, 16, 16
    out = rng.normal(size=(S, B, H, W, J)).astype(np.float32)
    tgt = rng.uniform(size=(B, H, W, J)).astype(np.float32)
    w = (rng.uniform(size=(B, J)) > 0.3).astype(np.float32)

    ours = float(heatmap_mse_loss(out, tgt, w))
    theirs = _torch_loss(
        [torch.from_numpy(out[s].transpose(0, 3, 1, 2)) for s in range(S)],
        torch.from_numpy(tgt.transpose(0, 3, 1, 2)), torch.from_numpy(w))
    np.testing.assert_allclose(ours, theirs, rtol=1e-5)


def test_loss_no_weight(rng):
    S, B, J, H, W = 2, 3, 5, 8, 8
    out = rng.normal(size=(S, B, H, W, J)).astype(np.float32)
    tgt = rng.uniform(size=(B, H, W, J)).astype(np.float32)
    ours = float(heatmap_mse_loss(out, tgt, None, use_target_weight=False))
    theirs = _torch_loss(
        [torch.from_numpy(out[s].transpose(0, 3, 1, 2)) for s in range(S)],
        torch.from_numpy(tgt.transpose(0, 3, 1, 2)), None, use_weight=False)
    np.testing.assert_allclose(ours, theirs, rtol=1e-5)


def test_loss_zero_when_equal(rng):
    tgt = rng.uniform(size=(2, 8, 8, 4)).astype(np.float32)
    out = np.stack([tgt, tgt])
    assert float(heatmap_mse_loss(out, tgt, np.ones((2, 4), np.float32))) == 0.0
