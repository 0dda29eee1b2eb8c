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


# -- gather-free stencil extraction ------------------------------------
# Reading a handful of neighbours around each per-joint argmax is the
# expensive part of decoding on TPU if done with gathers (~300us for a
# 64-batch; the argmax itself is ~20us). Instead: build the shifted/
# derivative map once as elementwise ops and reduce it against the
# argmax one-hot — pure VPU traffic, no scatter/gather.

def _shift2d(hm, dy, dx):
    """shifted[y, x] = hm[y+dy, x+dx], zero outside. hm: [B, H, W, J]."""
    B, H, W, J = hm.shape
    p = 3
    padded = jnp.pad(hm, ((0, 0), (p, p), (p, p), (0, 0)))
    return padded[:, p + dy:p + dy + H, p + dx:p + dx + W, :]


def _argmax_onehot(heatmaps):
    """One-hot of the row-major-first per-joint argmax: [B, H, W, J] bool."""
    B, H, W, J = heatmaps.shape
    flat = heatmaps.reshape(B, H * W, J)
    idx = jnp.argmax(flat, axis=1)                       # [B, J]
    ys = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    lin = (ys * W + xs)[None, :, :, None]
    return lin == idx[:, None, None, :]


def _at_peak(maps, onehot):
    """Evaluate each [B, H, W, J] map at the argmax -> [B, J]."""
    return jnp.sum(jnp.where(onehot, maps, 0.0), axis=(1, 2))


def get_preds_zero_based(heatmaps):
    """Clean 0-based per-joint argmax: [B, H, W, J] -> ([B, J, 2], [B, J])."""
    B, H, W, J = heatmaps.shape
    flat = heatmaps.reshape(B, H * W, J)
    idx = jnp.argmax(flat, axis=1)
    maxvals = jnp.max(flat, axis=1)
    coords = jnp.stack([(idx % W).astype(jnp.float32),
                        jnp.floor_divide(idx, W).astype(jnp.float32)], -1)
    return coords, maxvals


@functools.partial(jax.jit, static_argnames=("zero_based", "affine_size"))
def decode_quarter_offset(heatmaps, centers, scales, zero_based: bool = False,
                          affine_size=None):
    """Argmax + quarter-pixel offset decode, batched.

    Args:
      heatmaps: [B, H, W, J] last-stack heatmaps.
      centers:  [B, 2] person-box centers (source-image pixels).
      scales:   [B] or [B, 2] person scales (units of 200 px).
      zero_based: False reproduces the reference exactly — coords stay in
        get_preds' 1-based space through the inverse affine
        (`/root/reference/src/utils/inference.py:48-67`), which carries a
        systematic +1-heatmap-pixel offset into image space. True uses
        correct 0-based peak coordinates (deliberate fix; use for
        dataset-official metrics like PCKh / OKS).

    Returns:
      preds: [B, J, 2] keypoints in source-image pixels.
      maxvals: [B, J] peak activations.
    """
    B, H, W, J = heatmaps.shape
    heatmaps = jnp.asarray(heatmaps, jnp.float32)
    # Gather-free neighbour reads: shifted maps reduced at the argmax
    # one-hot. NOTE the reference's "1-based" coords from get_preds are
    # (x̂, ŷ+1) — x stays 0-based while y gains 1 (evaluation.py:22-23) —
    # so its reads hm[py-1][px] - hm[py-1][px-2] / hm[py][px-1] -
    # hm[py-2][px-1] land on hm[ŷ][x̂] - hm[ŷ][x̂-2] and
    # hm[ŷ+1][x̂-1] - hm[ŷ-1][x̂-1]: a lopsided stencil, reproduced
    # bit-for-bit in parity mode. zero_based uses the centered stencil.
    onehot = _argmax_onehot(heatmaps)
    if zero_based:
        gx_map = _shift2d(heatmaps, 0, 1) - _shift2d(heatmaps, 0, -1)
        gy_map = _shift2d(heatmaps, 1, 0) - _shift2d(heatmaps, -1, 0)
    else:
        gx_map = heatmaps - _shift2d(heatmaps, 0, -2)
        gy_map = _shift2d(heatmaps, 1, -1) - _shift2d(heatmaps, -1, -1)
    gx = _at_peak(gx_map, onehot)
    gy = _at_peak(gy_map, onehot)

    if zero_based:
        coords, maxvals = get_preds_zero_based(heatmaps)
        px = coords[..., 0].astype(jnp.int32)
        py = coords[..., 1].astype(jnp.int32)
        ok = (px > 0) & (px < W - 1) & (py > 0) & (py < H - 1)
    else:
        coords, maxvals = get_preds(heatmaps)            # [B, J, 2], 1-based
        px = jnp.floor(coords[..., 0] + 0.5).astype(jnp.int32)
        py = jnp.floor(coords[..., 1] + 0.5).astype(jnp.int32)
        ok = (px > 1) & (px < W - 1) & (py > 1) & (py < H - 1)
    offs = jnp.stack([jnp.sign(gx), jnp.sign(gy)], axis=-1) * 0.25
    coords = coords + jnp.where(ok[..., None], offs, 0.0)

    # affine_size defaults to the heatmap dims (the standard decode);
    # the reference's Estimator v2 path passes the FRAME dims here
    # (estimator.py:81 -> transform_preds(..., output_size)).
    size = affine_size if affine_size is not None else (W, H)
    inv = batched_affine_transforms(centers, scales, jnp.zeros((B,)), size, inv=True)
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


@functools.partial(jax.jit, static_argnames=("zero_based", "affine_size"))
def decode_dark(heatmaps, centers, scales, zero_based: bool = False,
                affine_size=None):
    """DARK (Taylor-expansion) decode, batched.

    Parity (zero_based=False): `/root/reference/src/utils/inference.py:
    70-87` including the reference's finite differences taken at the
    1-based integer coords (an off-by-one vs the DARK paper).
    zero_based=True evaluates derivatives at the true 0-based peak.
    `affine_size`: (w, h) the inverse affine maps FROM — defaults to
    the heatmap dims; the reference's estimator passes frame dims with
    a matching scale (estimator.py:76-82, via transform_preds'
    output_size).
    """
    B, H, W, J = heatmaps.shape
    if zero_based:
        coords, maxvals = get_preds_zero_based(heatmaps)
    else:
        coords, maxvals = get_preds(heatmaps)            # 1-based
    hm = gaussian_blur(heatmaps, 11)
    hm = jnp.log(jnp.maximum(hm, 1e-10))

    px = jnp.trunc(coords[..., 0]).astype(jnp.int32)
    py = jnp.trunc(coords[..., 1]).astype(jnp.int32)
    ok = (px > 1) & (px < W - 2) & (py > 1) & (py < H - 2)

    # Derivatives evaluated at (py, px) = argmax + (base_y, 0): the
    # reference's get_preds coords are (x̂, ŷ+1) — see the note in
    # decode_quarter_offset — so parity mode reads one row below the
    # peak (base_y=1) at the peak column; corrected mode reads the peak.
    # Gather-free: shifted maps reduced against the argmax one-hot.
    base_y = 0 if zero_based else 1
    onehot = _argmax_onehot(heatmaps)
    g = lambda dy, dx: _at_peak(_shift2d(hm, base_y + dy, dx), onehot)
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

    size = affine_size if affine_size is not None else (W, H)
    inv = batched_affine_transforms(centers, scales, jnp.zeros((B,)), size,
                                    inv=True)
    return batched_apply_affine(coords, inv), maxvals


def _scipy_gaussian_kernel_1d(sigma: float, truncate: float = 4.0) -> list:
    """scipy.ndimage.gaussian_filter's 1-D kernel: radius =
    int(truncate*sigma + 0.5), exp(-0.5 (x/sigma)^2), normalized."""
    radius = int(truncate * sigma + 0.5)
    vals = [math.exp(-0.5 * (i / sigma) ** 2)
            for i in range(-radius, radius + 1)]
    s = sum(vals)
    return [v / s for v in vals]


@functools.partial(jax.jit, static_argnames=("sigma", "window", "threshold"))
def nms_heatmap(heatmaps, sigma: float = 1.0, window: int = 3,
                threshold: float = 1e-6):
    """Batched blur + threshold + local-max suppression.

    The TPU re-design of the reference's per-joint host loop
    (`/root/reference/tools/openvino_visualizer/utils.py:35-55`):
    gaussian_filter(sigma) -> zero sub-threshold -> keep only pixels
    equal to their 3x3 maximum_filter (all joints, all batch elements
    in one fused XLA program; max filter = lax.reduce_window).

    scipy parity notes: gaussian_filter pads mode='reflect' (numpy
    'symmetric'), reproduced via jnp.pad; for a MAX filter, scipy's
    reflect padding equals -inf padding (the reflected values duplicate
    in-window ones), so reduce_window's SAME padding matches exactly.

    heatmaps: [B, H, W, J] -> suppressed map [B, H, W, J] float32.
    """
    B, H, W, J = heatmaps.shape
    x = heatmaps.astype(jnp.float32)
    k1d = jnp.asarray(_scipy_gaussian_kernel_1d(sigma), jnp.float32)
    k = k1d.shape[0]
    pad = (k - 1) // 2
    x = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode='symmetric')
    dn = jax.lax.conv_dimension_numbers(x.shape, (k, 1, 1, 1),
                                        ('NHWC', 'HWIO', 'NHWC'))
    x = jax.lax.conv_general_dilated(
        x, jnp.tile(k1d.reshape(k, 1, 1, 1), (1, 1, 1, J)), (1, 1),
        [(0, 0), (0, 0)], dimension_numbers=dn, feature_group_count=J,
        precision=jax.lax.Precision.HIGHEST)
    x = jax.lax.conv_general_dilated(
        x, jnp.tile(k1d.reshape(1, k, 1, 1), (1, 1, 1, J)), (1, 1),
        [(0, 0), (0, 0)], dimension_numbers=dn, feature_group_count=J,
        precision=jax.lax.Precision.HIGHEST)
    x = jnp.where(x < threshold, 0.0, x)
    local_max = jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, window, window, 1), (1, 1, 1, 1),
        'SAME')
    return x * (x == local_max)


@functools.partial(jax.jit, static_argnames=("sigma", "window", "threshold"))
def decode_nms_peaks(heatmaps, sigma: float = 1.0, window: int = 3,
                     threshold: float = 1e-6):
    """Top NMS peak per joint: [B, H, W, J] -> [B, J, 3] (x, y, conf).

    Parity: `post_process_heatmap`
    (`/root/reference/tools/openvino_visualizer/utils.py:35-48`) — the
    first (row-major) occurrence of the per-map maximum of the
    suppressed map; an all-zero map decodes to (0, 0, 0).
    """
    B, H, W, J = heatmaps.shape
    peaks = nms_heatmap(heatmaps, sigma, window, threshold)
    flat = peaks.reshape(B, H * W, J)
    idx = jnp.argmax(flat, axis=1)
    conf = jnp.max(flat, axis=1)
    x = (idx % W).astype(jnp.float32)
    y = jnp.floor_divide(idx, W).astype(jnp.float32)
    return jnp.stack([x, y, conf], axis=-1)


@functools.partial(jax.jit,
                   static_argnames=("k", "sigma", "window", "threshold"))
def decode_nms_topk(heatmaps, k: int = 4, sigma: float = 1.0,
                    window: int = 3, threshold: float = 1e-6):
    """Multi-peak variant: the k strongest NMS peaks per joint.

    Returns ([B, J, k, 2] float (x, y), [B, J, k] conf); slots beyond
    the real peak count carry conf 0. (The reference keeps only the top
    peak; the suppressed map holds every peak — exposed here for
    multi-person serving on top of the same kernel.)
    """
    B, H, W, J = heatmaps.shape
    peaks = nms_heatmap(heatmaps, sigma, window, threshold)
    flat = peaks.reshape(B, H * W, J).transpose(0, 2, 1)   # [B, J, HW]
    conf, idx = jax.lax.top_k(flat, k)
    x = (idx % W).astype(jnp.float32)
    y = jnp.floor_divide(idx, W).astype(jnp.float32)
    return jnp.stack([x, y], axis=-1), conf


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
