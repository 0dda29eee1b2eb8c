"""Affine-geometry parity: closed-form transforms vs cv2's 3-point method."""

import numpy as np
import cv2
import pytest

from hourglass_pose_estimation_tpu.utils import transforms as T


def _cv2_reference_transform(center, scale, rot, output_size, shift=(0, 0), inv=False):
    """The canonical 3-point construction (as used across public pose
    codebases, e.g. Microsoft SimpleBaselines) evaluated with cv2 —
    an independent oracle for our closed form."""
    scale = np.array([scale, scale]) if np.isscalar(scale) else np.asarray(scale)
    shift = np.asarray(shift, dtype=np.float32)
    scale_tmp = scale * 200.0
    src_w = scale_tmp[0]
    dst_w, dst_h = output_size

    rot_rad = np.pi * rot / 180
    sn, cs = np.sin(rot_rad), np.cos(rot_rad)
    src_dir = np.array([0 * cs - (-0.5 * src_w) * sn,
                        0 * sn + (-0.5 * src_w) * cs])
    dst_dir = np.array([0, dst_w * -0.5], np.float32)

    def third(a, b):
        d = a - b
        return b + np.array([-d[1], d[0]], dtype=np.float32)

    src = np.zeros((3, 2), dtype=np.float32)
    dst = np.zeros((3, 2), dtype=np.float32)
    src[0] = center + scale_tmp * shift
    src[1] = center + src_dir + scale_tmp * shift
    src[2] = third(src[0], src[1])
    dst[0] = [dst_w * 0.5, dst_h * 0.5]
    dst[1] = np.array([dst_w * 0.5, dst_h * 0.5]) + dst_dir
    dst[2] = third(dst[0], dst[1])

    if inv:
        return cv2.getAffineTransform(np.float32(dst), np.float32(src))
    return cv2.getAffineTransform(np.float32(src), np.float32(dst))


@pytest.mark.parametrize("rot", [0.0, 17.5, -30.0, 90.0])
@pytest.mark.parametrize("inv", [False, True])
def test_affine_matches_cv2_three_point(rot, inv):
    center = np.array([123.0, 88.5])
    scale = 1.7
    out = (256, 256)
    ours = T.get_affine_transform(center, scale, rot, out, inv=inv)
    ref = _cv2_reference_transform(center, scale, rot, out, inv=inv)
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_affine_with_shift_and_aniso_scale():
    center = np.array([50.0, 60.0])
    scale = np.array([1.2, 0.9])
    ours = T.get_affine_transform(center, scale, 12.0, (192, 256), shift=(0.1, -0.05))
    ref = _cv2_reference_transform(center, scale, 12.0, (192, 256), shift=(0.1, -0.05))
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_inverse_is_inverse():
    fwd = T.get_affine_transform([100, 100], 1.5, 33.0, (256, 256))
    inv = T.get_affine_transform([100, 100], 1.5, 33.0, (256, 256), inv=True)
    pt = np.array([40.0, 200.0])
    back = T.affine_transform(T.affine_transform(pt, fwd), inv)
    np.testing.assert_allclose(back, pt, atol=1e-3)


def test_batched_matches_host(rng):
    B = 16
    centers = rng.uniform(20, 400, size=(B, 2))
    scales = rng.uniform(0.5, 3.0, size=(B,))
    rots = rng.uniform(-45, 45, size=(B,))
    for inv in (False, True):
        batched = np.asarray(T.batched_affine_transforms(
            centers, scales, rots, (256, 256), inv=inv))
        for i in range(B):
            single = T.get_affine_transform(centers[i], scales[i], rots[i],
                                            (256, 256), inv=inv)
            np.testing.assert_allclose(batched[i], single, rtol=1e-4, atol=1e-3)


def test_batched_apply_affine(rng):
    B, N = 4, 16
    centers = rng.uniform(50, 300, size=(B, 2))
    scales = rng.uniform(0.8, 2.0, size=(B,))
    rots = rng.uniform(-30, 30, size=(B,))
    pts = rng.uniform(0, 256, size=(B, N, 2))
    trans = T.batched_affine_transforms(centers, scales, rots, (256, 256))
    out = np.asarray(T.batched_apply_affine(pts, trans))
    for b in range(B):
        t = T.get_affine_transform(centers[b], scales[b], rots[b], (256, 256))
        for n in range(N):
            np.testing.assert_allclose(out[b, n], T.affine_transform(pts[b, n], t),
                                       rtol=5e-3, atol=0.05)


def test_transform_preds_roundtrip():
    # heatmap coords -> image coords must equal applying the inverse affine
    coords = np.array([[10.0, 20.0], [63.0, 1.0], [32.0, 32.0]])
    center, scale = np.array([120.0, 90.0]), 1.3
    preds = T.transform_preds(coords, center, scale, (64, 64))
    inv = T.get_affine_transform(center, scale, 0, (64, 64), inv=True)
    expect = coords @ inv[:, :2].T + inv[:, 2]
    np.testing.assert_allclose(preds, expect, atol=1e-6)


def test_fliplr_joints():
    joints = np.array([[10.0, 5.0, 0], [20.0, 6.0, 0], [30.0, 7.0, 0]])
    vis = np.array([[1, 1, 0], [0, 0, 0], [1, 1, 0]], dtype=float)
    out, out_vis = T.fliplr_joints(joints, vis, width=100, matched_parts=[[0, 2]])
    # joint 0 <-> joint 2 swapped, x mirrored, invisible joint zeroed
    np.testing.assert_allclose(out[0], [(100 - 30 - 1) * 1, 7.0, 0.0])
    np.testing.assert_allclose(out[1], [0.0, 0.0, 0.0])  # vis=0 -> zeroed
    np.testing.assert_allclose(out[2], [(100 - 10 - 1) * 1, 5.0, 0.0])
    np.testing.assert_allclose(out_vis[0], [1, 1, 0])
