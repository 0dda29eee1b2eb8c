"""Batched on-device affine warp (the person-crop + augmentation resample).

Replaces the reference's per-sample host `cv2.warpAffine` call
(`/root/reference/src/datasets/common.py:133-138`, INTER_LINEAR with
constant-0 border) with one bilinear sampler over the whole batch.

TPU design notes (this op was the train-step bottleneck before tuning):
  * the four bilinear corner taps are pre-packed into the lane dimension
    with cheap shifted copies, so sampling is ONE embedding-style gather
    of [B, R*R] rows instead of four scattered gathers (4.2M gathered
    rows -> 1.05M);
  * for uint8 sources (the canvas batches), the 12 neighborhood bytes
    are bitcast-packed into three int32 lanes — TPU gathers are
    row-overhead/bandwidth bound, and 12B rows cut the op from 180 ms
    to 44 ms at batch 64 / 256^2 (measured, v5e);
  * a 2-pixel zero-pad ring reproduces cv2's BORDER_CONSTANT(0)
    masking exactly for every tap, with plain index clipping.

For each destination pixel p_dst the source location is
M_inv @ [x, y, 1]; results are bit-identical to the four-gather
formulation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _source_coords(inv_trans, w, h):
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    # elementwise VPU math (a tiny f32 matmul would take bf16 MXU passes)
    t = jnp.asarray(inv_trans, jnp.float32)
    sx = (t[:, 0, 0, None, None] * xs + t[:, 0, 1, None, None] * ys
          + t[:, 0, 2, None, None])                              # [B, h, w]
    sy = (t[:, 1, 0, None, None] * xs + t[:, 1, 1, None, None] * ys
          + t[:, 1, 2, None, None])
    return sx, sy


def _neighborhood_operand(images):
    """Pack each padded pixel's 2x2 neighborhood into lanes.

    Returns (flat operand [B, L*L, lanes], L, unpack) where unpack maps
    gathered rows [B, N, lanes] -> [B, N, 4, C] float32 taps ordered
    (v00, v01, v10, v11).
    """
    B, Hs, Ws, C = images.shape
    P = jnp.pad(images, ((0, 0), (2, 2), (2, 2), (0, 0)))
    Lh, Lw = Hs + 3, Ws + 3
    NB = jnp.concatenate([P[:, :Lh, :Lw], P[:, :Lh, 1:Lw + 1],
                          P[:, 1:Lh + 1, :Lw], P[:, 1:Lh + 1, 1:Lw + 1]],
                         axis=-1)                                # [B,Lh,Lw,4C]
    if images.dtype == jnp.uint8 and (4 * C) % 4 == 0:
        packed = jax.lax.bitcast_convert_type(
            NB.reshape(B, Lh, Lw, C, 4), jnp.int32)              # [B,Lh,Lw,C]
        flat = packed.reshape(B, Lh * Lw, C)

        def unpack(rows):
            b, n = rows.shape[:2]
            bytes_ = jax.lax.bitcast_convert_type(rows, jnp.uint8)
            return bytes_.reshape(b, n, 4, C).astype(jnp.float32)
        return flat, (Lh, Lw), unpack

    flat = NB.reshape(B, Lh * Lw, 4 * C).astype(jnp.float32)

    def unpack(rows):
        b, n = rows.shape[:2]
        return rows.reshape(b, n, 4, C)
    return flat, (Lh, Lw), unpack


@functools.partial(jax.jit, static_argnames=("out_size",))
def affine_warp(images, inv_trans, out_size):
    """Warp a batch of images with per-image inverse affines.

    Args:
      images:    [B, Hs, Ws, C]. Source images (uint8 fast path, or any
                 float dtype). The valid extent is the full array — pad
                 with zeros.
      inv_trans: [B, 2, 3] dst->src transforms (use
                 `batched_affine_transforms(..., inv=True)`).
      out_size:  static (w, h) destination size.

    Returns:
      [B, h, w, C] float32 warped images, zero outside the source.
    """
    images = jnp.asarray(images)
    B, Hs, Ws, C = images.shape
    w, h = int(out_size[0]), int(out_size[1])

    sx, sy = _source_coords(inv_trans, w, h)
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = (sx - x0)[..., None]
    fy = (sy - y0)[..., None]

    flat, (Lh, Lw), unpack = _neighborhood_operand(images)
    xp = jnp.clip(x0.astype(jnp.int32) + 2, 0, Lw - 1)
    yp = jnp.clip(y0.astype(jnp.int32) + 2, 0, Lh - 1)
    idx = (yp * Lw + xp).reshape(B, h * w, 1)
    rows = jnp.take_along_axis(flat, idx, axis=1)                # [B,hw,lanes]
    g = unpack(rows).reshape(B, h, w, 4, C)

    top = g[:, :, :, 0] * (1 - fx) + g[:, :, :, 1] * fx
    bot = g[:, :, :, 2] * (1 - fx) + g[:, :, :, 3] * fx
    return top * (1 - fy) + bot * fy
