"""Gaussian target rendering parity vs a direct numpy oracle with the
reference's windowed semantics (common.py:197-248)."""

import numpy as np

from hourglass_pose_estimation_tpu.ops.heatmap import render_gaussian_targets


def _oracle(joints, vis, heatmap_size, image_size, sigma):
    """Windowed per-joint render, written the way the reference does it."""
    J = joints.shape[0]
    W, H = heatmap_size
    target = np.zeros((J, H, W), np.float32)
    weight = np.asarray(vis, np.float32).copy()
    stride = np.array([image_size[0] / W, image_size[1] / H])
    tmp = sigma * 3
    for j in range(J):
        mu_x = int(joints[j, 0] / stride[0] + 0.5)
        mu_y = int(joints[j, 1] / stride[1] + 0.5)
        ul = [mu_x - tmp, mu_y - tmp]
        br = [mu_x + tmp + 1, mu_y + tmp + 1]
        if ul[0] >= W or ul[1] >= H or br[0] < 0 or br[1] < 0:
            weight[j] = 0
            continue
        if weight[j] > 0.5:
            size = 2 * tmp + 1
            x = np.arange(size, dtype=np.float32)
            y = x[:, None]
            x0 = y0 = size // 2
            g = np.exp(-((x - x0) ** 2 + (y - y0) ** 2) / (2 * sigma ** 2))
            gx = max(0, -ul[0]), min(br[0], W) - ul[0]
            gy = max(0, -ul[1]), min(br[1], H) - ul[1]
            ix = max(0, ul[0]), min(br[0], W)
            iy = max(0, ul[1]), min(br[1], H)
            target[j, iy[0]:iy[1], ix[0]:ix[1]] = g[gy[0]:gy[1], gx[0]:gx[1]]
    return target, weight


def test_render_matches_oracle(rng):
    B, J = 6, 16
    inp, out, sigma = (256, 256), (64, 64), 1
    # joints spread across in-bounds, near-edge, and off-map locations
    joints = rng.uniform(-80, 330, size=(B, J, 2)).astype(np.float32)
    vis = (rng.uniform(size=(B, J)) > 0.25).astype(np.float32)
    tgt, w = render_gaussian_targets(joints, vis, heatmap_size=out,
                                     image_size=inp, sigma=sigma)
    tgt = np.asarray(tgt)
    w = np.asarray(w)
    for b in range(B):
        ot, ow = _oracle(joints[b], vis[b], out, inp, sigma)
        np.testing.assert_allclose(w[b], ow, atol=0)
        np.testing.assert_allclose(tgt[b].transpose(2, 0, 1), ot, atol=1e-5)


def test_render_sigma2(rng):
    B, J = 3, 17
    joints = rng.uniform(0, 256, size=(B, J, 2)).astype(np.float32)
    vis = np.ones((B, J), np.float32)
    tgt, w = render_gaussian_targets(joints, vis, heatmap_size=(64, 64),
                                     image_size=(256, 256), sigma=2)
    tgt = np.asarray(tgt)
    for b in range(B):
        ot, ow = _oracle(joints[b], vis[b], (64, 64), (256, 256), 2)
        np.testing.assert_allclose(np.asarray(w)[b], ow)
        np.testing.assert_allclose(tgt[b].transpose(2, 0, 1), ot, atol=1e-5)


def test_peak_is_one_at_center():
    joints = np.array([[[128.0, 128.0]]], np.float32)
    vis = np.ones((1, 1), np.float32)
    tgt, w = render_gaussian_targets(joints, vis, heatmap_size=(64, 64),
                                     image_size=(256, 256), sigma=1)
    assert float(np.asarray(tgt).max()) == 1.0
    assert float(np.asarray(tgt)[0, 32, 32, 0]) == 1.0
