"""Batched on-device heatmap decoding.

The reference decodes keypoints on the host with per-joint Python loops
(`/root/reference/src/utils/inference.py:48-87`,
`src/runner/estimator.py:56-74`). Here each decoder is one vectorized
XLA program over [B, H, W, J] heatmaps, so inference never round-trips
to the host; coordinates come back already mapped to source-image
pixels.

Three decoders (matching the reference surface):
  * `decode_quarter_offset` — argmax + 0.25-px shift toward the higher
    neighbour, then inverse-affine to image space (get_final_preds_v1).
  * `decode_dark`           — DARK/Taylor: Gaussian-blur, log, one
    Newton step on a finite-difference Hessian (get_final_preds_v2,
    including the reference's evaluation of derivatives at the 1-based
    coordinate — an off-by-one it inherits; reproduced for parity).
  * `decode_simple_argmax`  — thresholded argmax with x4 stride scaling
    (Estimator.post_process_heatmap_v1).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

from hourglass_pose_estimation_tpu.utils.evaluation import get_preds
from hourglass_pose_estimation_tpu.utils.transforms import (
    batched_affine_transforms,
    batched_apply_affine,
)


def _gather_bj(hm, ys, xs):
    """hm: [B, H, W, J]; ys/xs: [B, J] int -> values [B, J] (clipped)."""
    B, H, W, J = hm.shape
    ys = jnp.clip(ys, 0, H - 1)
    xs = jnp.clip(xs, 0, W - 1)
    j = jnp.broadcast_to(jnp.arange(J)[None, :], ys.shape)
    return jax.vmap(lambda m, yy, xx, jj: m[yy, xx, jj])(hm, ys, xs, j)


@jax.jit
def decode_quarter_offset(heatmaps, centers, scales):
    """Argmax + quarter-pixel offset decode, batched.

    Args:
      heatmaps: [B, H, W, J] last-stack heatmaps.
      centers:  [B, 2] person-box centers (source-image pixels).
      scales:   [B] or [B, 2] person scales (units of 200 px).

    Returns:
      preds: [B, J, 2] keypoints in source-image pixels.
      maxvals: [B, J] peak activations.

    Parity: `/root/reference/src/utils/inference.py:48-67` — coords stay
    in get_preds' 1-based space through the inverse affine, exactly as
    the reference does.
    """
    B, H, W, J = heatmaps.shape
    coords, maxvals = get_preds(heatmaps)                # [B, J, 2], 1-based
    px = jnp.floor(coords[..., 0] + 0.5).astype(jnp.int32)
    py = jnp.floor(coords[..., 1] + 0.5).astype(jnp.int32)
    ok = (px > 1) & (px < W - 1) & (py > 1) & (py < H - 1)

    # hm[py-1][px] - hm[py-1][px-2]  (x gradient at the 0-based peak)
    gx = _gather_bj(heatmaps, py - 1, px) - _gather_bj(heatmaps, py - 1, px - 2)
    # hm[py][px-1] - hm[py-2][px-1]  (y gradient)
    gy = _gather_bj(heatmaps, py, px - 1) - _gather_bj(heatmaps, py - 2, px - 1)
    offs = jnp.stack([jnp.sign(gx), jnp.sign(gy)], axis=-1) * 0.25
    coords = coords + jnp.where(ok[..., None], offs, 0.0)

    inv = batched_affine_transforms(centers, scales, jnp.zeros((B,)), (W, H), inv=True)
    return batched_apply_affine(coords, inv), maxvals


def _cv2_gaussian_kernel_1d(ksize: int) -> list:
    """cv2.getGaussianKernel(ksize, sigma=0): sigma = 0.3*((k-1)*0.5-1)+0.8."""
    sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    c = (ksize - 1) * 0.5
    vals = [math.exp(-((i - c) ** 2) / (2.0 * sigma * sigma)) for i in range(ksize)]
    s = sum(vals)
    return [v / s for v in vals]


@functools.partial(jax.jit, static_argnames=("kernel",))
def gaussian_blur(heatmaps, kernel: int = 11):
    """Per-map Gaussian blur with zero-padding, rescaled to original max.

    Parity: `/root/reference/src/utils/inference.py:31-45` (the zero
    pre-pad means the blur is effectively a zero-padded convolution).
    heatmaps: [B, H, W, J].
    """
    B, H, W, J = heatmaps.shape
    k1d = jnp.asarray(_cv2_gaussian_kernel_1d(kernel), jnp.float32)
    orig_max = jnp.max(heatmaps, axis=(1, 2), keepdims=True)
    x = heatmaps.astype(jnp.float32)
    # separable depthwise conv, zero padding (cv2 path pre-pads zeros)
    kh = k1d.reshape(kernel, 1, 1, 1)
    kw = k1d.reshape(1, kernel, 1, 1)
    dn = jax.lax.conv_dimension_numbers(x.shape, (kernel, 1, 1, 1), ('NHWC', 'HWIO', 'NHWC'))
    pad = (kernel - 1) // 2
    x = jax.lax.conv_general_dilated(
        x, jnp.tile(kh, (1, 1, 1, J)), (1, 1), [(pad, pad), (0, 0)],
        dimension_numbers=dn, feature_group_count=J,
        precision=jax.lax.Precision.HIGHEST)
    x = jax.lax.conv_general_dilated(
        x, jnp.tile(kw, (1, 1, 1, J)), (1, 1), [(0, 0), (pad, pad)],
        dimension_numbers=dn, feature_group_count=J,
        precision=jax.lax.Precision.HIGHEST)
    new_max = jnp.max(x, axis=(1, 2), keepdims=True)
    return x * (orig_max / jnp.maximum(new_max, 1e-20))


@jax.jit
def decode_dark(heatmaps, centers, scales):
    """DARK (Taylor-expansion) decode, batched.

    Parity: `/root/reference/src/utils/inference.py:70-87` including the
    reference's finite differences taken at the 1-based integer coords.
    """
    B, H, W, J = heatmaps.shape
    coords, maxvals = get_preds(heatmaps)                # 1-based
    hm = gaussian_blur(heatmaps, 11)
    hm = jnp.log(jnp.maximum(hm, 1e-10))

    px = jnp.trunc(coords[..., 0]).astype(jnp.int32)
    py = jnp.trunc(coords[..., 1]).astype(jnp.int32)
    ok = (px > 1) & (px < W - 2) & (py > 1) & (py < H - 2)

    g = lambda dy, dx: _gather_bj(hm, py + dy, px + dx)
    dxv = 0.5 * (g(0, 1) - g(0, -1))
    dyv = 0.5 * (g(1, 0) - g(-1, 0))
    dxx = 0.25 * (g(0, 2) - 2.0 * g(0, 0) + g(0, -2))
    dxy = 0.25 * (g(1, 1) - g(-1, 1) - g(1, -1) + g(-1, -1))
    dyy = 0.25 * (g(2, 0) - 2.0 * g(0, 0) + g(-2, 0))

    det = dxx * dyy - dxy * dxy
    ok = ok & (det != 0.0)
    safe_det = jnp.where(det == 0.0, 1.0, det)
    # -H^{-1} @ grad for 2x2 H
    off_x = -(dyy * dxv - dxy * dyv) / safe_det
    off_y = -(-dxy * dxv + dxx * dyv) / safe_det
    offs = jnp.stack([off_x, off_y], axis=-1)
    coords = coords + jnp.where(ok[..., None], offs, 0.0)

    inv = batched_affine_transforms(centers, scales, jnp.zeros((B,)), (W, H), inv=True)
    return batched_apply_affine(coords, inv), maxvals


@functools.partial(jax.jit, static_argnames=("input_size", "output_size", "threshold"))
def decode_simple_argmax(heatmaps, input_size, output_size, threshold=0.02):
    """Thresholded 0-based argmax decode with stride-4 upscale.

    Parity: `/root/reference/src/runner/estimator.py:56-74`.
    heatmaps: [B, H, W, J]. Returns int32 [B, J, 2] image-space kps.
    """
    B, H, W, J = heatmaps.shape
    flat = heatmaps.reshape(B, H * W, J)
    idx = jnp.argmax(flat, axis=1)
    maxv = jnp.max(flat, axis=1)
    x = (idx % W).astype(jnp.float32)
    y = jnp.floor_divide(idx, W).astype(jnp.float32)
    keep = maxv > threshold
    x = jnp.where(keep, x, 0.0)
    y = jnp.where(keep, y, 0.0)
    scale_x = output_size[0] / input_size[0]
    scale_y = output_size[1] / input_size[1]
    kps = jnp.stack([x * scale_x * 4.0, y * scale_y * 4.0], axis=-1)
    return kps.astype(jnp.int32), maxv
