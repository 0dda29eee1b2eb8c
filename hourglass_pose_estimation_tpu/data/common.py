"""Dataset core: packed record arrays + host/device input pipelines.

Re-design of `/root/reference/src/datasets/common.py:33-248`. The
reference is a torch `Dataset` doing per-sample Python work in forked
dataloader workers (cv2 read -> augment -> warpAffine -> normalize ->
Gaussian render). Here a dataset is a set of *packed numpy arrays*
(struct-of-arrays), and there are two pipelines:

  * host pipeline (`host_batch`) — exact reference semantics with cv2,
    for parity and for real image files;
  * device pipeline — the host only supplies fixed-size image canvases;
    flip/scale/rotate sampling, the affine crop-warp, normalization and
    Gaussian target rendering all run inside the jitted train step
    (see `data/pipeline.py`). This is the TPU-first path: the only
    host->device transfer is the raw uint8 canvas batch.

Conventions kept from the reference: BGR channel order, pixel_std=200
scales, the augmentation distributions of common.py:117-131 (one
uniform draw gates both flip (p<=0.5) and rotation (p<=0.6); scale
jitter clip(randn*sf+1, 1-sf, 1+sf); rotation clip(randn*rf, ±2rf)).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from hourglass_pose_estimation_tpu.utils.transforms import (
    get_affine_transform, affine_transform, fliplr_joints)
from hourglass_pose_estimation_tpu.data.meanstd import get_meanstd

PIXEL_STD = 200.0


@dataclasses.dataclass
class PoseRecords:
    """Struct-of-arrays for N person instances."""

    centers: np.ndarray               # [N, 2] f32
    scales: np.ndarray                # [N, 2] f32 (units of 200 px)
    joints: np.ndarray                # [N, J, 2] f32 (source-image coords)
    vis: np.ndarray                   # [N, J] f32
    widths: np.ndarray                # [N] f32 source-image widths (for flip)
    image_paths: Optional[List[str]] = None
    images: Optional[np.ndarray] = None   # [N, H, W, 3] uint8, in-memory sets

    def __len__(self):
        return self.centers.shape[0]


class PoseDataset:
    """Base dataset: subclasses fill `records`, `flip_pairs`, `n_joints`."""

    name: str = 'base'
    n_joints: int = 0
    flip_pairs: Sequence[Sequence[int]] = ()
    pixel_std: float = PIXEL_STD

    def __init__(self, is_train: bool, *, inp_res=256, out_res=64, sigma=1,
                 scale_factor=0.25, rot_factor=30, **_unused):
        self.is_train = is_train
        self.inp_res = int(inp_res)
        self.out_res = int(out_res)
        self.sigma = int(sigma)
        self.scale_factor = float(scale_factor)
        self.rot_factor = float(rot_factor)
        self.mean, self.std = get_meanstd(self.name)
        self.records: PoseRecords = self._load_records()

    # -- subclass hooks ------------------------------------------------
    def _load_records(self) -> PoseRecords:
        raise NotImplementedError

    def _read_image(self, idx: int) -> np.ndarray:
        """Return the source image [H, W, 3] uint8 (BGR)."""
        r = self.records
        if r.images is not None:
            return r.images[idx]
        import cv2
        img = cv2.imread(r.image_paths[idx],
                         cv2.IMREAD_COLOR | cv2.IMREAD_IGNORE_ORIENTATION)
        if img is None:
            raise ValueError(f'failed to read {r.image_paths[idx]}')
        return img

    def __len__(self):
        return len(self.records)

    # -- data selection / statistics ------------------------------------
    def select_data(self) -> np.ndarray:
        """OKS-like quality filter over records; returns kept indices.

        Parity: `/root/reference/src/datasets/common.py:166-195` (there
        written per-record and commented out at every call site; here a
        vectorized, actually usable method): keep instances whose
        visible-joint centroid is close to the box center relative to
        the box area — ks = exp(-d^2 / (0.2^2 * 2 * area)) above a
        visibility-dependent threshold.
        """
        r = self.records
        vis = r.vis > 0
        num_vis = vis.sum(axis=1)
        safe = np.maximum(num_vis, 1)[:, None]
        centroid = (r.joints * vis[..., None]).sum(axis=1) / safe
        area = r.scales[:, 0] * r.scales[:, 1] * (self.pixel_std ** 2)
        d2 = ((centroid - r.centers) ** 2).sum(axis=1)
        ks = np.exp(-d2 / (0.2 ** 2 * 2.0 * np.maximum(area, 1e-6)))
        metric = (0.2 / 16) * num_vis + 0.45 - 0.2 / 16
        keep = (num_vis > 0) & (ks > metric)
        return np.nonzero(keep)[0]

    def apply_selection(self, idxs: np.ndarray) -> None:
        """Restrict records to `idxs` in place."""
        r = self.records
        self.records = PoseRecords(
            centers=r.centers[idxs], scales=r.scales[idxs],
            joints=r.joints[idxs], vis=r.vis[idxs], widths=r.widths[idxs],
            image_paths=([r.image_paths[i] for i in idxs]
                         if r.image_paths is not None else None),
            images=r.images[idxs] if r.images is not None else None)

    def compute_meanstd(self, max_samples: int = 512):
        """Channel mean/std over the dataset's images in [0, 1] BGR.

        Parity: `_compute_mean` (common.py:66-91) — per-image channel
        mean/std averaged over images (not pooled-pixel statistics).
        """
        n = min(len(self), max_samples)
        means, stds = [], []
        for i in range(n):
            img = self._read_image(i).astype(np.float64) / 255.0
            flat = img.reshape(-1, 3)
            means.append(flat.mean(axis=0))
            stds.append(flat.std(axis=0, ddof=1))
        return (tuple(np.mean(means, axis=0)), tuple(np.mean(stds, axis=0)))

    # -- flip-pair permutation (static, used by the device pipeline) ---
    def flip_permutation(self) -> np.ndarray:
        perm = np.arange(self.n_joints)
        for a, b in self.flip_pairs:
            perm[a], perm[b] = perm[b], perm[a]
        return perm

    # -- host (parity) pipeline ----------------------------------------
    def host_sample(self, idx: int, rng: np.random.RandomState,
                    train: Optional[bool] = None) -> Dict[str, np.ndarray]:
        """One augmented sample with the reference's exact host semantics
        (common.py:99-151). Returns the un-normalized crop plus geometry;
        normalization and target rendering happen on device.
        """
        train = self.is_train if train is None else train
        r = self.records
        img = self._read_image(idx)
        joints = np.concatenate([r.joints[idx].copy(),
                                 np.zeros((self.n_joints, 1))], axis=1)
        vis3 = np.stack([r.vis[idx]] * 3, axis=1).astype(np.float64)
        c = r.centers[idx].astype(np.float64).copy()
        s = r.scales[idx].astype(np.float64).copy()
        rot = 0.0

        if train:
            sf, rf = self.scale_factor, self.rot_factor
            prob = rng.random_sample()
            s = s * np.clip(rng.randn() * sf + 1, 1 - sf, 1 + sf)
            rot = float(np.clip(rng.randn() * rf, -rf * 2, rf * 2)) \
                if prob <= 0.6 else 0.0
            if prob <= 0.5:
                img = img[:, ::-1, :]
                joints, vis3 = fliplr_joints(joints, vis3, img.shape[1],
                                             self.flip_pairs)
                c[0] = img.shape[1] - c[0] - 1

        trans = get_affine_transform(c, s, rot, (self.inp_res, self.inp_res))
        import cv2
        crop = cv2.warpAffine(img, trans[:2].astype(np.float64),
                              (self.inp_res, self.inp_res),
                              flags=cv2.INTER_LINEAR)
        for j in range(self.n_joints):
            if vis3[j, 0] > 0:
                joints[j, :2] = affine_transform(joints[j, :2], trans)

        return {
            'image': crop.astype(np.float32),            # [R, R, 3] BGR 0-255
            'joints': joints[:, :2].astype(np.float32),  # input-crop coords
            'vis': vis3[:, 0].astype(np.float32),
            'center': c.astype(np.float32),
            'scale': s.astype(np.float32),
            'rotation': np.float32(rot),
            'index': np.int32(idx),
        }

    def host_batch(self, idxs: Sequence[int], rng: np.random.RandomState,
                   train: Optional[bool] = None) -> Dict[str, np.ndarray]:
        samples = [self.host_sample(i, rng, train) for i in idxs]
        return {k: np.stack([s[k] for s in samples]) for k in samples[0]}

    # -- device pipeline: raw canvases ----------------------------------
    def _region_sides(self, idxs) -> np.ndarray:
        """Side of the square source region the augmented crop can
        sample: s*200 grown by the max scale jitter (train) and the
        rotated square's bounding box (sqrt 2 covers any angle), plus a
        bilinear-tap margin."""
        r = self.records
        s = np.max(r.scales[idxs], axis=-1) * self.pixel_std
        margin = (1.0 + self.scale_factor) * np.sqrt(2.0) \
            if self.is_train else 1.0
        return (s * margin + 4.0).astype(np.float32)

    def canvas_batch(self, idxs: Sequence[int], canvas: int = 512,
                     crop_aware: bool = False) -> Dict[str, np.ndarray]:
        """Fixed-size uint8 canvases + geometry for on-device augmentation.

        Two packing modes (the device pipeline composes q, the region
        offset and the train-time flip into one crop affine either way):

          * whole-image (default): the source image scaled by
            q = canvas/max(H, W) and zero-padded bottom/right;
          * crop-aware (`crop_aware=True`): the person's reachable crop
            region packed around its center at NATIVE resolution (q=1)
            whenever it fits — the fidelity parity with the reference's
            single full-resolution warp
            (`/root/reference/src/datasets/common.py:133-138`) for small
            persons in large frames; only regions larger than the
            canvas are downscaled by q = canvas/side.

        JPEG files on disk take the native C++ loader (decode + crop +
        resize + pad with an internal thread pool, data/native.py);
        anything else — in-memory datasets, other formats, native-decode
        failures — uses the cv2 path per slot.
        """
        import cv2
        r = self.records
        B = len(idxs)
        out = np.zeros((B, canvas, canvas, 3), np.uint8)
        qs = np.zeros((B,), np.float32)
        offs = np.zeros((B, 2), np.float32)
        widths = r.widths[idxs].astype(np.float32).copy()
        done = np.zeros((B,), bool)
        sides = self._region_sides(idxs) if crop_aware else None
        centers = r.centers[idxs].astype(np.float32)

        if r.images is None and r.image_paths is not None:
            jpeg_slots = [k for k, i in enumerate(idxs)
                          if r.image_paths[i].lower().endswith(('.jpg', '.jpeg'))]
            if jpeg_slots:
                from hourglass_pose_estimation_tpu.data import native
                paths = [r.image_paths[idxs[k]] for k in jpeg_slots]
                if crop_aware:
                    res = native.load_region_batch(
                        paths, canvas, centers[jpeg_slots],
                        sides[jpeg_slots])
                    if res is not None:
                        imgs, q, off, ws, ok = res
                        for j, k in enumerate(jpeg_slots):
                            if ok[j]:
                                out[k], qs[k], offs[k] = imgs[j], q[j], off[j]
                                widths[k] = ws[j]
                                done[k] = True
                else:
                    res = native.load_canvas_batch(paths, canvas)
                    if res is not None:
                        imgs, scales, ws, ok = res
                        for j, k in enumerate(jpeg_slots):
                            if ok[j]:
                                out[k] = imgs[j]
                                qs[k] = scales[j]
                                # half-pixel resize convention: content
                                # sits at q*x_src + (q-1)/2 — record the
                                # equivalent source offset (see cv2
                                # branch below)
                                offs[k] = (1.0 - scales[j]) / \
                                    (2.0 * scales[j])
                                widths[k] = ws[j]
                                done[k] = True

        for k, i in enumerate(idxs):
            if done[k]:
                continue
            img = self._read_image(i)
            h, w = img.shape[:2]
            widths[k] = float(w)  # datasets may defer widths (e.g. MPII)
            if crop_aware and sides[k] >= 8.0:
                side = float(sides[k])
                cx, cy = centers[k]
                ox = np.floor(cx - side * 0.5 + 0.5)
                oy = np.floor(cy - side * 0.5 + 0.5)
                q = min(1.0, canvas / side)
                # x_canvas = q*(x_src - ox): cv2.warpAffine with the
                # same affine == the convention the device warp assumes
                # (q=1 degenerates to an exact intersection copy).
                M = np.array([[q, 0.0, -q * ox], [0.0, q, -q * oy]],
                             np.float64)
                out[k] = cv2.warpAffine(img, M, (canvas, canvas),
                                        flags=cv2.INTER_LINEAR)
                qs[k] = q
                offs[k] = (ox, oy)
            else:
                q = canvas / max(h, w)
                if q != 1.0:
                    img = cv2.resize(img,
                                     (int(round(w * q)), int(round(h * q))),
                                     interpolation=cv2.INTER_LINEAR)
                out[k, :img.shape[0], :img.shape[1]] = img
                qs[k] = q
                # cv2.resize samples with half-pixel centers: canvas
                # content sits at x_canvas = q*x_src + (q-1)/2, not
                # q*x_src. The device warp composes x_canvas =
                # q*(x_src - ox), so record ox = (1-q)/(2q) to make the
                # two maps identical — without it every whole-image
                # sample trains on pixels shifted (1-q)/(2q) source px
                # against its rendered targets.
                offs[k] = (1.0 - q) / (2.0 * q)
        return {
            'canvas': out,
            'canvas_scale': qs,
            'canvas_offset': offs,
            'center': centers,
            'scale': r.scales[idxs].astype(np.float32),
            'joints': r.joints[idxs].astype(np.float32),
            'vis': r.vis[idxs].astype(np.float32),
            'width': widths,
            'index': np.asarray(idxs, np.int32),
        }


class Loader:
    """Epoch iterator over batches of indices (static batch shapes).

    Training drops the ragged tail (jit wants static shapes); evaluation
    pads the final batch by repeating the last index and returns a
    validity mask so metrics ignore padding.
    """

    def __init__(self, dataset: PoseDataset, batch_size: int, *,
                 shuffle: bool, seed: int = 0, drop_last: bool = True,
                 shard: Tuple[int, int] = (0, 1)):
        """shard=(process_index, process_count): multi-host SPMD data
        sharding. `batch_size` stays the GLOBAL batch; every process
        sees the same number of steps and the same global sample order
        (same seed), but each epoch batch yields only this process's
        contiguous batch_size/process_count rows — exactly the
        process-local slice `parallel.multihost.global_batch_from_local`
        assembles into global arrays."""
        self.dataset = dataset
        self.batch_size = int(batch_size)
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.rng = np.random.RandomState(seed)
        self.shard_i, self.shard_n = int(shard[0]), int(shard[1])
        if self.batch_size % self.shard_n:
            raise ValueError(f'batch_size {batch_size} must divide by '
                             f'process_count {self.shard_n}')

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def epoch_indices(self) -> List[Tuple[np.ndarray, np.ndarray]]:
        n = len(self.dataset)
        order = self.rng.permutation(n) if self.shuffle else np.arange(n)
        batches = []
        for b in range(len(self)):
            idx = order[b * self.batch_size:(b + 1) * self.batch_size]
            valid = np.ones((self.batch_size,), np.float32)
            if len(idx) < self.batch_size:
                pad = self.batch_size - len(idx)
                valid[len(idx):] = 0.0
                idx = np.concatenate([idx, np.full((pad,), idx[-1] if len(idx) else 0)])
            if self.shard_n > 1:
                k = self.batch_size // self.shard_n
                lo = self.shard_i * k
                idx, valid = idx[lo:lo + k], valid[lo:lo + k]
            batches.append((idx.astype(np.int64), valid))
        return batches


# registry filled by dataset modules
REGISTRY: Dict[str, type] = {}


def register(cls):
    REGISTRY[cls.name] = cls
    return cls


def get_dataset(name: str, is_train: bool, **kwargs) -> PoseDataset:
    if name not in REGISTRY:
        raise KeyError(f"unknown dataset '{name}'; available: {sorted(REGISTRY)}")
    return REGISTRY[name](is_train, **kwargs)
