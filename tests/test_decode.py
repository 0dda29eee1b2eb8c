"""Decode parity vs direct oracles of the reference decoders
(inference.py:9-87, estimator.py:56-74), batched vs per-sample loops."""

import math

import numpy as np
import cv2
import pytest
import torch
import jax.numpy as jnp

from hourglass_pose_estimation_tpu.ops import decode as D
from hourglass_pose_estimation_tpu.utils.transforms import (
    get_affine_transform, affine_transform)
from tests.test_evaluation import _torch_get_preds


def _oracle_quarter_offset(hms_nchw, center, scale):
    """get_final_preds_v1 semantics for a single sample (B=1 slice)."""
    coords = _torch_get_preds(hms_nchw)[0].clone()
    H, W = hms_nchw.shape[2], hms_nchw.shape[3]
    for p in range(coords.size(0)):
        hm = hms_nchw[0][p]
        px = int(math.floor(coords[p][0] + 0.5))
        py = int(math.floor(coords[p][1] + 0.5))
        if 1 < px < W - 1 and 1 < py < H - 1:
            diff = torch.tensor([hm[py - 1][px] - hm[py - 1][px - 2],
                                 hm[py][px - 1] - hm[py - 2][px - 1]])
            coords[p] += diff.sign() * .25
    coords = coords.numpy()
    trans = get_affine_transform(center, scale, 0, (W, H), inv=True)
    return np.stack([affine_transform(c, trans) for c in coords])


def _rand_peaky_heatmaps(rng, B, J, H, W):
    """Heatmaps with clear Gaussian peaks (realistic decode input)."""
    hm = np.zeros((B, H, W, J), np.float32)
    ys, xs = np.mgrid[0:H, 0:W]
    for b in range(B):
        for j in range(J):
            cx, cy = rng.uniform(2, W - 3), rng.uniform(2, H - 3)
            hm[b, :, :, j] = np.exp(-((xs - cx) ** 2 + (ys - cy) ** 2) / 4.0)
    hm += rng.uniform(0, 0.05, size=hm.shape).astype(np.float32)
    return hm


def test_quarter_offset_parity(rng):
    B, J, H, W = 5, 16, 64, 64
    hm = _rand_peaky_heatmaps(rng, B, J, H, W)
    centers = rng.uniform(100, 200, size=(B, 2)).astype(np.float32)
    scales = rng.uniform(0.8, 2.0, size=(B,)).astype(np.float32)
    preds, maxvals = D.decode_quarter_offset(hm, centers, scales)
    preds = np.asarray(preds)
    for b in range(B):
        oracle = _oracle_quarter_offset(
            torch.from_numpy(hm[b:b + 1].transpose(0, 3, 1, 2)),
            centers[b], scales[b])
        np.testing.assert_allclose(preds[b], oracle, rtol=1e-3, atol=0.05)


def test_quarter_offset_edge_peaks(rng):
    # peaks at the border: offset must be skipped, not crash
    hm = np.zeros((2, 64, 64, 3), np.float32)
    hm[0, 0, 0, 0] = 1.0
    hm[0, 63, 63, 1] = 1.0
    hm[0, 0, 63, 2] = 1.0
    hm[1, 32, 32, :] = 1.0
    centers = np.array([[128, 128], [128, 128]], np.float32)
    scales = np.array([1.0, 1.0], np.float32)
    preds, _ = D.decode_quarter_offset(hm, centers, scales)
    for b in range(2):
        oracle = _oracle_quarter_offset(
            torch.from_numpy(hm[b:b + 1].transpose(0, 3, 1, 2)),
            centers[b], scales[b])
        np.testing.assert_allclose(np.asarray(preds)[b], oracle, atol=0.01)


def test_gaussian_blur_matches_cv2(rng):
    B, J, H, W = 2, 4, 64, 64
    hm = _rand_peaky_heatmaps(rng, B, J, H, W)
    ours = np.asarray(D.gaussian_blur(hm, 11))
    kernel, border = 11, 5
    for b in range(B):
        for j in range(J):
            m = hm[b, :, :, j]
            omax = m.max()
            dr = np.zeros((H + 2 * border, W + 2 * border))
            dr[border:-border, border:-border] = m
            dr = cv2.GaussianBlur(dr, (kernel, kernel), 0)
            ref = dr[border:-border, border:-border]
            ref = ref * omax / ref.max()
            np.testing.assert_allclose(ours[b, :, :, j], ref, rtol=1e-4, atol=1e-5)


def _oracle_taylor(hm2d, coord):
    """Reference taylor() semantics (inference.py:9-28) for one joint."""
    H, W = hm2d.shape
    px, py = int(coord[0]), int(coord[1])
    out = coord.astype(np.float64).copy()
    if 1 < px < W - 2 and 1 < py < H - 2:
        dx = 0.5 * (hm2d[py][px + 1] - hm2d[py][px - 1])
        dy = 0.5 * (hm2d[py + 1][px] - hm2d[py - 1][px])
        dxx = 0.25 * (hm2d[py][px + 2] - 2 * hm2d[py][px] + hm2d[py][px - 2])
        dxy = 0.25 * (hm2d[py + 1][px + 1] - hm2d[py - 1][px + 1]
                      - hm2d[py + 1][px - 1] + hm2d[py - 1][px - 1])
        dyy = 0.25 * (hm2d[py + 2][px] - 2 * hm2d[py][px] + hm2d[py - 2][px])
        det = dxx * dyy - dxy ** 2
        if det != 0:
            inv = np.linalg.inv(np.array([[dxx, dxy], [dxy, dyy]]))
            out += -(inv @ np.array([dx, dy]))
    return out


def _oracle_dark(hms_nchw, center, scale):
    """get_final_preds_v2 semantics for one sample (inference.py:70-87)."""
    from tests.test_evaluation import _torch_get_preds
    coords = _torch_get_preds(hms_nchw)[0].numpy().astype(np.float64)
    hms = hms_nchw.numpy().copy()
    kernel, border = 11, 5
    B, J, H, W = hms.shape
    for i in range(B):
        for j in range(J):
            omax = hms[i, j].max()
            dr = np.zeros((H + 2 * border, W + 2 * border))
            dr[border:-border, border:-border] = hms[i, j]
            dr = cv2.GaussianBlur(dr, (kernel, kernel), 0)
            hms[i, j] = dr[border:-border, border:-border]
            hms[i, j] *= omax / hms[i, j].max()
    hms = np.log(np.maximum(hms, 1e-10))
    for p in range(coords.shape[0]):
        coords[p] = _oracle_taylor(hms[0][p], coords[p])
    trans = get_affine_transform(center, scale, 0, (W, H), inv=True)
    return np.stack([affine_transform(c, trans) for c in coords])


def test_dark_decode_parity(rng):
    B, J, H, W = 3, 16, 64, 64
    hm = _rand_peaky_heatmaps(rng, B, J, H, W)
    centers = rng.uniform(100, 200, size=(B, 2)).astype(np.float32)
    scales = rng.uniform(0.8, 2.0, size=(B,)).astype(np.float32)
    preds, _ = D.decode_dark(hm, centers, scales)
    preds = np.asarray(preds)
    for b in range(B):
        oracle = _oracle_dark(
            torch.from_numpy(hm[b:b + 1].transpose(0, 3, 1, 2)),
            centers[b], scales[b])
        np.testing.assert_allclose(preds[b], oracle, rtol=1e-2, atol=0.1)


def test_dark_decode_runs_and_refines(rng):
    B, J, H, W = 3, 16, 64, 64
    hm = _rand_peaky_heatmaps(rng, B, J, H, W)
    centers = np.full((B, 2), 128.0, np.float32)
    scales = np.full((B,), 64 * 4 / 200.0, np.float32)  # identity-ish crop
    preds, _ = D.decode_dark(hm, centers, scales)
    coarse, _ = D.decode_quarter_offset(hm, centers, scales)
    # both map into the input-image frame; DARK should stay close to coarse
    assert np.all(np.abs(np.asarray(preds) - np.asarray(coarse)) < 8.0)


def test_simple_argmax_decode(rng):
    B, J, H, W = 2, 17, 64, 64
    hm = _rand_peaky_heatmaps(rng, B, J, H, W)
    hm[0, :, :, 0] = 0.001  # below threshold -> (0, 0)
    kps, maxv = D.decode_simple_argmax(hm, (256, 256), (512, 384))
    kps = np.asarray(kps)
    assert kps[0, 0, 0] == 0 and kps[0, 0, 1] == 0
    # manual check of one joint
    j = 3
    flat = hm[1, :, :, j]
    iy, ix = np.unravel_index(np.argmax(flat), flat.shape)
    assert kps[1, j, 0] == int(ix * (512 / 256) * 4)
    assert kps[1, j, 1] == int(iy * (384 / 256) * 4)


# ---------------------------------------------------------------------------
# NMS multi-peak decode (reference: openvino_visualizer/utils.py:35-55)

def _scipy_nms_oracle(hm_joint, sigma=1.0, window=3, threshold=1e-6):
    """The reference's per-map pipeline, verbatim semantics."""
    from scipy.ndimage import gaussian_filter, maximum_filter
    m = gaussian_filter(hm_joint.astype(np.float64), sigma=sigma)
    m[m < threshold] = 0
    return m * (m == maximum_filter(m, footprint=np.ones((window, window))))


def test_nms_heatmap_matches_scipy(rng):
    from hourglass_pose_estimation_tpu.ops.decode import nms_heatmap
    B, H, W, J = 2, 24, 20, 5
    hm = rng.rand(B, H, W, J).astype(np.float32)
    # add sharp peaks so suppression has structure
    for b in range(B):
        for j in range(J):
            hm[b, rng.randint(H), rng.randint(W), j] += 3.0
    got = np.asarray(nms_heatmap(jnp.asarray(hm)))
    for b in range(B):
        for j in range(J):
            want = _scipy_nms_oracle(hm[b, :, :, j])
            # nonzero support must match exactly; values to fp tolerance
            assert (got[b, :, :, j] > 0).tolist() == (want > 0).tolist(), (b, j)
            np.testing.assert_allclose(got[b, :, :, j], want,
                                       rtol=1e-4, atol=1e-6)


def test_decode_nms_peaks_matches_reference_loop(rng):
    from hourglass_pose_estimation_tpu.ops.decode import decode_nms_peaks
    B, H, W, J = 2, 24, 20, 4
    hm = (rng.rand(B, H, W, J) * 0.2).astype(np.float32)
    for b in range(B):
        for j in range(J):
            hm[b, 3 + 2 * j, 4 + 3 * j, j] = 2.0 + j
    got = np.asarray(decode_nms_peaks(jnp.asarray(hm)))
    for b in range(B):
        for j in range(J):
            peaks = _scipy_nms_oracle(hm[b, :, :, j])
            ys, xs = np.where(peaks == peaks.max())
            assert got[b, j, 0] == xs[0] and got[b, j, 1] == ys[0], (b, j)
            np.testing.assert_allclose(got[b, j, 2], peaks[ys[0], xs[0]],
                                       rtol=1e-4)


def test_decode_nms_peaks_all_zero_map():
    from hourglass_pose_estimation_tpu.ops.decode import decode_nms_peaks
    hm = np.zeros((1, 16, 16, 3), np.float32)
    got = np.asarray(decode_nms_peaks(jnp.asarray(hm)))
    np.testing.assert_array_equal(got, 0.0)


def test_decode_nms_topk(rng):
    from hourglass_pose_estimation_tpu.ops.decode import decode_nms_topk
    hm = np.zeros((1, 32, 32, 1), np.float32)
    hm[0, 5, 5, 0] = 3.0
    hm[0, 20, 25, 0] = 2.0
    xy, conf = decode_nms_topk(jnp.asarray(hm), k=3)
    xy, conf = np.asarray(xy), np.asarray(conf)
    assert tuple(xy[0, 0, 0]) == (5.0, 5.0)
    assert tuple(xy[0, 0, 1]) == (25.0, 20.0)
    assert conf[0, 0, 0] > conf[0, 0, 1] > 0
    assert conf[0, 0, 2] == 0.0


def test_draw_skeleton_smoke():
    """Skeleton renderer draws lines for confident pairs only."""
    cv2 = pytest.importorskip('cv2')
    from hourglass_pose_estimation_tpu.utils.visualize import (
        draw_skeleton, BODY_PARTS_KPT_IDS)
    img = np.zeros((256, 256, 3), np.uint8)
    kps = np.zeros((17, 3), np.float32)
    kps[:, 0] = np.linspace(5, 55, 17)   # heatmap-space x
    kps[:, 1] = np.linspace(5, 55, 17)
    kps[:, 2] = 1.0                       # all confident
    out = draw_skeleton(img, kps, scale_x=1.0, scale_y=1.0)
    assert out.sum() > 0
    blank = draw_skeleton(np.zeros_like(img), np.zeros((17, 3), np.float32))
    assert blank.sum() == 0               # all below thr: nothing drawn
    assert len(BODY_PARTS_KPT_IDS) == 18  # reference table incl. dup tail
