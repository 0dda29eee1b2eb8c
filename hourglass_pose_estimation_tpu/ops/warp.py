"""Batched on-device affine warp (the person-crop + augmentation resample).

Replaces the reference's per-sample host `cv2.warpAffine` call
(`/root/reference/src/datasets/common.py:133-138`, INTER_LINEAR with
constant-0 border) with one gather-based bilinear sampler over the whole
batch. Combined with `utils.transforms.batched_affine_transforms`, the
entire augmentation pipeline (flip / scale / rotate / crop) runs inside
the jitted train step.

For each destination pixel p_dst the source location is
M_inv @ [x, y, 1]; bilinear interpolation with zero padding outside the
source extent matches cv2's BORDER_CONSTANT(0).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("out_size",))
def affine_warp(images, inv_trans, out_size):
    """Warp a batch of images with per-image inverse affines.

    Args:
      images:    [B, Hs, Ws, C] float. Source images (may be padded; the
                 valid extent is the full array — pad with zeros).
      inv_trans: [B, 2, 3] dst->src transforms (use
                 `batched_affine_transforms(..., inv=True)` or invert a
                 forward transform).
      out_size:  static (w, h) destination size.

    Returns:
      [B, h, w, C] warped images, zero outside the source.
    """
    images = jnp.asarray(images)
    B, Hs, Ws, C = images.shape
    w, h = int(out_size[0]), int(out_size[1])

    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    # elementwise VPU math (a tiny f32 matmul would take bf16 MXU passes)
    t = jnp.asarray(inv_trans, jnp.float32)
    sx = (t[:, 0, 0, None, None] * xs + t[:, 0, 1, None, None] * ys
          + t[:, 0, 2, None, None])                              # [B, h, w]
    sy = (t[:, 1, 0, None, None] * xs + t[:, 1, 1, None, None] * ys
          + t[:, 1, 2, None, None])

    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = sx - x0
    fy = sy - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def sample(xi, yi):
        inb = (xi >= 0) & (xi < Ws) & (yi >= 0) & (yi < Hs)
        xc = jnp.clip(xi, 0, Ws - 1)
        yc = jnp.clip(yi, 0, Hs - 1)
        # one gather per corner over the batch
        v = jax.vmap(lambda img, yy, xx: img[yy, xx])(images, yc, xc)  # [B,h,w,C]
        return jnp.where(inb[..., None], v, 0.0)

    v00 = sample(x0i, y0i)
    v01 = sample(x0i + 1, y0i)
    v10 = sample(x0i, y0i + 1)
    v11 = sample(x0i + 1, y0i + 1)

    wx = fx[..., None]
    wy = fy[..., None]
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return (top * (1 - wy) + bot * wy).astype(images.dtype)
