"""Native C++ host loader: build, decode parity vs cv2, batch wiring."""

import os

import numpy as np
import cv2
import pytest

from hourglass_pose_estimation_tpu.data import native


@pytest.fixture(scope='module')
def jpeg_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp('jpegs')
    rng = np.random.RandomState(0)
    sizes = [(300, 400), (512, 512), (123, 77)]
    paths = []
    for i, (h, w) in enumerate(sizes):
        # smooth image: JPEG-decoder differences stay tiny
        img = cv2.GaussianBlur(
            rng.randint(0, 255, (h, w, 3), np.uint8), (0, 0), 4)
        p = str(d / f'img{i}.jpg')
        cv2.imwrite(p, img, [cv2.IMWRITE_JPEG_QUALITY, 95])
        paths.append(p)
    return paths


def test_native_builds():
    assert native.available(), 'native host loader failed to build/load'


def test_native_matches_cv2_canvas(jpeg_dir):
    canvas = 256
    res = native.load_canvas_batch(jpeg_dir, canvas)
    assert res is not None
    imgs, scales, widths, ok = res
    assert ok.all()
    for k, p in enumerate(jpeg_dir):
        ref_img = cv2.imread(p)
        h, w = ref_img.shape[:2]
        assert widths[k] == w
        q = canvas / max(h, w)
        np.testing.assert_allclose(scales[k], q, rtol=1e-6)
        ref = np.zeros((canvas, canvas, 3), np.uint8)
        rs = cv2.resize(ref_img, (int(round(w * q)), int(round(h * q))),
                        interpolation=cv2.INTER_LINEAR)
        ref[:rs.shape[0], :rs.shape[1]] = rs
        diff = np.abs(imgs[k].astype(int) - ref.astype(int))
        # decode is libjpeg-vs-libjpeg (same family); resize rounding
        # differs by at most a couple of levels on smooth content
        assert np.percentile(diff, 99) <= 3, np.percentile(diff, 99)
        assert diff.mean() < 1.0, diff.mean()


def test_native_bad_path_falls_back(jpeg_dir, tmp_path):
    missing = str(tmp_path / 'nope.jpg')
    res = native.load_canvas_batch([jpeg_dir[0], missing], 128)
    assert res is not None
    imgs, scales, widths, ok = res
    assert ok[0] and not ok[1]
    assert imgs[1].sum() == 0


def test_canvas_batch_uses_native(jpeg_dir):
    """An on-disk JPEG dataset flows through canvas_batch correctly."""
    from hourglass_pose_estimation_tpu.data.common import (
        PoseDataset, PoseRecords)

    class Tiny(PoseDataset):
        name = 'synthetic'  # reuse meanstd
        n_joints = 4
        flip_pairs = [[0, 1]]

        def _load_records(self):
            n = len(jpeg_dir)
            return PoseRecords(
                centers=np.full((n, 2), 100, np.float32),
                scales=np.ones((n, 2), np.float32),
                joints=np.zeros((n, 4, 2), np.float32),
                vis=np.ones((n, 4), np.float32),
                widths=np.full((n,), -1, np.float32),
                image_paths=list(jpeg_dir))

    ds = Tiny(True, inp_res=64, out_res=16, sigma=1,
              scale_factor=0.25, rot_factor=30)
    batch = ds.canvas_batch([0, 1, 2], canvas=128)
    assert batch['canvas'].shape == (3, 128, 128, 3)
    assert (batch['canvas_scale'] > 0).all()
    ref0 = cv2.imread(jpeg_dir[0])
    assert batch['width'][0] == ref0.shape[1]
    assert batch['canvas'][0].sum() > 0


def test_native_region_batch_matches_cv2(jpeg_dir):
    """Crop-aware native packing vs the cv2-fallback math in
    canvas_batch: same affine convention x_canvas = q*(x_src - ox)."""
    canvas = 128
    centers = np.array([[200, 150], [60, 480], [38, 60]], np.float32)
    sides = np.array([100.0, 300.0, 90.0], np.float32)  # fit / bigger / edge
    res = native.load_region_batch(jpeg_dir, canvas, centers, sides)
    assert res is not None
    imgs, q, offs, widths, ok = res
    assert ok.all()
    for k, p in enumerate(jpeg_dir):
        src = cv2.imread(p)
        side = float(sides[k])
        cx, cy = centers[k]
        ox = np.floor(cx - side * 0.5 + 0.5)
        oy = np.floor(cy - side * 0.5 + 0.5)
        qq = min(1.0, canvas / side)
        M = np.array([[qq, 0, -qq * ox], [0, qq, -qq * oy]], np.float64)
        ref = cv2.warpAffine(src, M, (canvas, canvas), flags=cv2.INTER_LINEAR)
        assert abs(q[k] - qq) < 1e-5
        np.testing.assert_allclose(offs[k], (ox, oy))
        diff = np.abs(imgs[k].astype(np.int32) - ref.astype(np.int32))
        # JPEG-decoder + fixed-point-interp differences only
        assert np.median(diff) <= 1.0, (k, np.median(diff))
        assert np.percentile(diff, 99) <= 6.0, (k, np.percentile(diff, 99))


def test_native_region_q1_exact_copy(jpeg_dir):
    """When the region fits the canvas, packing is a raw pixel copy."""
    canvas = 128
    centers = np.array([[150, 100]], np.float32)
    sides = np.array([96.0], np.float32)
    res = native.load_region_batch(jpeg_dir[:1], canvas, centers, sides)
    imgs, q, offs, widths, ok = res
    assert ok[0] and q[0] == 1.0
    src = cv2.imread(jpeg_dir[0])
    ox, oy = int(offs[0][0]), int(offs[0][1])
    # q=1: the full canvas extent is a raw copy of the source region
    # (native decode may differ from cv2's by the odd LSB)
    region = src[oy:oy + canvas, ox:ox + canvas]
    diff = np.abs(imgs[0].astype(np.int32) - region.astype(np.int32))
    assert np.median(diff) <= 1.0
    assert np.percentile(diff, 99) <= 6.0


def test_native_pathological_sof_rejected_per_slot(jpeg_dir, tmp_path):
    """A JPEG whose SOF header declares absurd dimensions (a ~10.8 GB
    allocation) must fail ITS slot only — not abort the process with an
    escaped bad_alloc (the round-5-fixed per-slot failure contract)."""
    blob = bytearray(open(jpeg_dir[0], 'rb').read())
    # patch the SOF0 frame header: marker FFC0, then length(2) +
    # precision(1) + height(2) + width(2), big-endian
    i = blob.find(b'\xff\xc0')
    assert i > 0
    blob[i + 5:i + 7] = (60000).to_bytes(2, 'big')
    blob[i + 7:i + 9] = (60000).to_bytes(2, 'big')
    bad = str(tmp_path / 'huge.jpg')
    open(bad, 'wb').write(bytes(blob))

    res = native.load_canvas_batch([bad, jpeg_dir[1]], 64)
    assert res is not None
    _, scales, _, ok = res
    assert not ok[0] and scales[0] == 0.0
    assert ok[1]


def test_native_resize_rounding_matches_cv2_fallback(tmp_path):
    """Exact-.5 size products round identically on both documented-
    identical paths: native lrintf (half-even) == Python round()."""
    # w*q = 5 * (4/8) = 2.5 -> Python round() gives 2 (banker's)
    img = np.full((8, 5, 3), 128, np.uint8)
    p = str(tmp_path / 'odd.jpg')
    cv2.imwrite(p, img, [cv2.IMWRITE_JPEG_QUALITY, 95])
    res = native.load_canvas_batch([p], 4)
    assert res is not None
    imgs, scales, _, ok = res
    assert ok[0]
    # columns >= round(2.5) == 2 must be zero padding, exactly like the
    # cv2 fallback's cv2.resize(..., (int(round(w*q)), ...))
    assert (imgs[0][:, 2:, :] == 0).all()
    assert (imgs[0][:, :2, :] != 0).any()
