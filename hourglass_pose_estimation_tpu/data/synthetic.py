"""Synthetic pose dataset: procedurally generated figures with known
joints. Lets the full train/eval/bench stack run end-to-end with no
files on disk (the reference has no such capability; its smoke checks
need real MPII/COCO trees). Images are deterministic functions of the
index, so golden tests are reproducible.

Each sample is a stick-figure-ish pattern: bright Gaussian blobs at
each joint plus connecting line segments, over structured noise. A
model trained on this reaches high heatmap-PCK quickly, which makes it
a real end-to-end learning test, not just a shape check.
"""

from __future__ import annotations

import numpy as np

from hourglass_pose_estimation_tpu.data.common import (
    PoseRecords, PoseDataset, register)

_SKELETON = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (6, 7), (7, 8),
             (8, 9), (10, 11), (11, 12), (12, 13), (13, 14), (14, 15)]




def _make_sample(idx: int, res: int, n_joints: int):
    rng = np.random.RandomState(10_000 + idx)
    img = (rng.uniform(0, 60, size=(res, res, 3))).astype(np.float32)
    # joints roughly centered with jitter
    base = rng.uniform(0.2 * res, 0.8 * res, size=(n_joints, 2))
    joints = base.astype(np.float32)
    vis = (rng.uniform(size=(n_joints,)) > 0.1).astype(np.float32)

    # Flip-consistent labels: paired joints look identical (like real
    # left/right body parts), and the lower-indexed member is always the
    # image-left one — so horizontal flip + pair swap (the training
    # augmentation) yields *consistent* supervision.
    color_group = np.arange(n_joints)
    # single source of truth: the class attribute the flip augmentation
    # uses (data/common.py) — image generation can never disagree
    for a, b in Synthetic.flip_pairs:
        if a < n_joints and b < n_joints:
            color_group[b] = color_group[a]
            if joints[a, 0] > joints[b, 0]:
                joints[[a, b]] = joints[[b, a]]
                vis[[a, b]] = vis[[b, a]]

    ys, xs = np.mgrid[0:res, 0:res].astype(np.float32)
    for j in range(n_joints):
        if vis[j] == 0:
            continue
        cx, cy = joints[j]
        g = color_group[j]
        blob = np.exp(-((xs - cx) ** 2 + (ys - cy) ** 2) / (2 * 9.0))
        # widely separated palette so joint identity is visually clean
        color = np.array([40 + 215 * ((g * 37) % 7) / 6.0,
                          40 + 215 * ((g * 53) % 11) / 10.0,
                          40 + 215 * ((g * 29) % 13) / 12.0], np.float32)
        img += blob[..., None] * color
    for a, b in _SKELETON:
        if a < n_joints and b < n_joints and vis[a] > 0 and vis[b] > 0:
            for t in np.linspace(0, 1, 24):
                p = joints[a] * (1 - t) + joints[b] * t
                x0, y0 = int(p[0]), int(p[1])
                if 0 <= x0 < res and 0 <= y0 < res:
                    img[y0, x0] += 60.0
    return np.clip(img, 0, 255).astype(np.uint8), joints, vis


@register
class Synthetic(PoseDataset):
    name = 'synthetic'
    n_joints = 16
    flip_pairs = [[0, 5], [1, 4], [2, 3], [10, 15], [11, 14], [12, 13]]
    # stored scale is res/200 with NO 1.25 box expansion (unlike
    # mpii/coco loaders) — OKS area derivation must not divide it out
    scale_stored_expand = 1.0

    def __init__(self, is_train: bool, *, num_samples=512, image_path='',
                 annotation_path='', flip=True, label_type='Gaussian',
                 device_pipeline=True, **kwargs):
        self._num_samples = int(num_samples)
        self._seed_offset = 0 if is_train else 1_000_000
        super().__init__(is_train, **kwargs)

    _cache: dict = {}

    def _load_records(self) -> PoseRecords:
        N = self._num_samples
        res = max(self.inp_res, 64)
        key = (N, res, self._seed_offset, self.n_joints)
        if key in Synthetic._cache:
            return Synthetic._cache[key]
        images = np.zeros((N, res, res, 3), np.uint8)
        joints = np.zeros((N, self.n_joints, 2), np.float32)
        vis = np.zeros((N, self.n_joints), np.float32)
        for i in range(N):
            images[i], joints[i], vis[i] = _make_sample(
                i + self._seed_offset, res, self.n_joints)
        centers = np.full((N, 2), res / 2.0, np.float32)
        # scale chosen so the 200px-convention box covers the image
        scales = np.full((N, 2), res / 200.0, np.float32)
        widths = np.full((N,), float(res), np.float32)
        rec = PoseRecords(centers=centers, scales=scales, joints=joints,
                          vis=vis, widths=widths, images=images)
        Synthetic._cache[key] = rec
        return rec


def synthetic(is_train: bool, **kwargs):
    return Synthetic(is_train, **kwargs)


synthetic.n_joints = Synthetic.n_joints
