"""Heatmap-space PCK metrics, computed on device.

Numerical parity with `/root/reference/src/utils/evaluation.py:8-76`,
including its quirks, because the training-time metric must match:

  * `get_preds` converts the flat argmax to MATLAB-flavoured 1-based
    coordinates: x = (idx-1) % W + 1, y = floor((idx-1)/W) + 1, then
    zeroes predictions whose max activation is <= 0;
  * a joint only counts if its *ground-truth* coords are > 1 in that
    1-based space;
  * the PCK normalizer is heatmap_width / 10 and the threshold comes
    from config (`COMMON.pck`).

The reference computes this with per-sample Python loops and a device
->host sync every batch (`calc_dists`, evaluation.py:30-40). Here the
whole metric is one vectorized XLA program over the heatmap batch; only
two scalars leave the device.

Layout note: this module takes heatmaps as [B, H, W, J] (NHWC, the
framework-wide layout) and reduces over H*W per joint.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def get_preds(heatmaps):
    """Per-joint argmax in the reference's 1-based coordinate space.

    Args:
      heatmaps: [B, H, W, J].
    Returns:
      preds: [B, J, 2] float32 (x, y), 1-based, zeroed where max <= 0.
      maxvals: [B, J] float32.
    """
    B, H, W, J = heatmaps.shape
    flat = heatmaps.reshape(B, H * W, J)
    idx = jnp.argmax(flat, axis=1)                       # [B, J] int
    maxvals = jnp.max(flat, axis=1)                      # [B, J]
    idx0 = idx - 1
    x = (idx0 % W + 1).astype(jnp.float32)
    y = (jnp.floor_divide(idx0, W) + 1).astype(jnp.float32)
    preds = jnp.stack([x, y], axis=-1)
    mask = (maxvals > 0.0).astype(jnp.float32)[..., None]
    return preds * mask, maxvals


def calc_dists(preds, target, normalize):
    """Normalized distances; -1 where ground truth is degenerate.

    Args:
      preds, target: [B, J, 2] in the 1-based space of `get_preds`.
      normalize: [B] per-sample normalizer.
    Returns:
      [B, J] float32; -1.0 marks joints excluded from the metric.
    """
    valid = (target[..., 0] > 1.0) & (target[..., 1] > 1.0)
    d = jnp.linalg.norm(preds - target, axis=-1) / normalize[:, None]
    return jnp.where(valid, d, -1.0)


def dist_acc(dists, thr=0.5):
    """Fraction of valid joints below threshold; -1 if none valid.

    Args:
      dists: [B] distances for one joint across the batch.
    """
    valid = dists != -1.0
    n = jnp.sum(valid)
    hit = jnp.sum((dists < thr) & valid)
    return jnp.where(n > 0, hit / jnp.maximum(n, 1), -1.0)


def accuracy(output, target, idxs=None, thr=0.5):
    """Heatmap-space PCK. Returns (avg_acc, per_joint_acc [J], valid_count).

    Args:
      output, target: [B, H, W, J] heatmaps (already subset-selected if
        a joint subset is in use — mirroring how the reference applies
        `index_select` before calling accuracy).
      idxs: optional joint-id list — used for its LENGTH only (score
        the first len(idxs) joints), exactly like the reference, whose
        loop indexes `dists[i]` with the loop counter, not idxs[i]
        (evaluation.py:69): its callers pass the ORIGINAL subset ids
        alongside already-index_select'ed heatmaps, so the ids
        themselves would be out of range here. Default: all joints.
      thr:  PCK threshold (`COMMON.pck` in the reference config).

    Parity: `/root/reference/src/utils/evaluation.py:52-76` (norm =
    heatmap_width / 10, averaged over joints that have any valid
    ground truth).
    """
    hit, n = pck_counts(output, target, idxs=idxs, thr=thr)
    return combine_pck_counts(hit, n)


def pck_counts(output, target, idxs=None, thr=0.5):
    """Per-joint PCK numerators/denominators: (hit [J'], n [J']).

    The raw per-sample counts behind `accuracy` — data-parallel shards
    psum these across the mesh before `combine_pck_counts`, which makes
    the sharded metric EQUAL to single-device global-batch accuracy
    (averaging per-shard averages would weight joints and shards
    differently whenever joint visibility is uneven across shards).
    """
    B, H, W, J = output.shape
    preds, _ = get_preds(output)
    gts, _ = get_preds(target)
    norm = jnp.full((B,), W / 10.0, jnp.float32)
    dists = calc_dists(preds, gts, norm)                 # [B, J]
    if idxs is not None:
        dists = dists[:, :len(idxs)]
    valid = dists != -1.0
    n = jnp.sum(valid, axis=0)                           # [J']
    hit = jnp.sum((dists < thr) & valid, axis=0)
    return hit, n


def combine_pck_counts(hit, n):
    """(hit [J], n [J]) -> (avg_acc, per_joint_acc [J], valid_count)."""
    per_joint = jnp.where(n > 0, hit / jnp.maximum(n, 1), -1.0)
    scored = per_joint >= 0
    cnt = jnp.sum(scored)
    avg = jnp.where(
        cnt > 0,
        jnp.sum(jnp.where(scored, per_joint, 0.0)) / jnp.maximum(cnt, 1),
        0.0)
    return avg, per_joint, cnt


class AverageMeter:
    """Running mean of a host-side scalar stream."""

    def __init__(self):
        self.val = 0.0
        self.sum = 0.0
        self.count = 0
        self.avg = 0.0

    def update(self, val, n=1):
        val = float(val)
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / self.count
