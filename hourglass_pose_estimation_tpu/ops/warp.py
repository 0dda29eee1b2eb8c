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
    if images.dtype == jnp.uint8:
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


@functools.partial(jax.jit, static_argnames=("out_size", "patch"))
def affine_warp_quad(images, inv_trans, out_size, patch: int = 6):
    """Quad-packed warp: ONE gathered row serves a 2x2 output quad.

    The single-gather warp is row-count bound (measured: 4.19M rows of
    12B cost ~4.3x more than 1.05M rows of 48B for the same bytes), and
    adjacent output pixels sample source points only ~scale px apart.
    So: pack each padded source pixel's `patch`x`patch` byte
    neighborhood into int32 lanes, gather one row per 2x2 OUTPUT QUAD
    at the quad's min corner, and resolve each of the 4 bilinear taps
    from the patch with weighted one-hot contractions (exact zeros plus
    the two lerp terms in the same order as `affine_warp` — results
    match to one f32 ulp; the compiler may fuse the contraction's
    multiply-add (FMA), re-rounding the last bit).

    Requirements: uint8 source, even output dims, and the quad source
    spread must fit the patch: max |d src| across a quad =
    scale*(|cos|+|sin|) <= patch-3 (patch=6 covers scale <= 2.1 at any
    rotation — the augmentation pipeline's worst case is ~1.56).
    """
    images = jnp.asarray(images)
    assert images.dtype == jnp.uint8, 'quad path is uint8-only'
    B, Hs, Ws, C = images.shape
    w, h = int(out_size[0]), int(out_size[1])
    assert h % 2 == 0 and w % 2 == 0, (h, w)
    K = patch
    assert (K * K * C) % 4 == 0, (K, C)

    sx, sy = _source_coords(inv_trans, w, h)
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = (sx - x0)[..., None]
    fy = (sy - y0)[..., None]

    # pack KxK byte neighborhoods into lanes (zero ring of width K)
    P = jnp.pad(images, ((0, 0), (K, K), (K, K), (0, 0)))
    Lh, Lw = Hs + K, Ws + K          # valid window-origin extent
    NB = jnp.concatenate(
        [P[:, dy:dy + Lh, dx:dx + Lw]
         for dy in range(K) for dx in range(K)], axis=-1)  # [B,Lh,Lw,K²C]
    packed = jax.lax.bitcast_convert_type(
        NB.reshape(B, Lh, Lw, (K * K * C) // 4, 4), jnp.int32)
    flat = packed.reshape(B, Lh * Lw, (K * K * C) // 4)

    # quad window origin: min tap corner over the 2x2 quad (padded
    # coords), clamped into the valid window range
    xq = x0.reshape(B, h // 2, 2, w // 2, 2).min(axis=(2, 4))
    yq = y0.reshape(B, h // 2, 2, w // 2, 2).min(axis=(2, 4))
    bx = jnp.clip(xq.astype(jnp.int32) + K, 0, Lw - 1)
    by = jnp.clip(yq.astype(jnp.int32) + K, 0, Lh - 1)
    idx = (by * Lw + bx).reshape(B, (h // 2) * (w // 2), 1)
    rows = jnp.take_along_axis(flat, idx, axis=1)        # [B,q,lanes]
    bytes_ = jax.lax.bitcast_convert_type(rows, jnp.uint8)
    patchb = bytes_.reshape(B, h // 2, w // 2, K, K, C)  # uint8

    # resolve the 4 quad positions at quad resolution (no full-res
    # patch materialization); x-contraction first, then y — the same
    # order as affine_warp's top/bot lerp (two nonzero lerp terms +
    # exact zeros; only FMA re-rounding can differ)
    kx = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, K), 3)
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    quads = []
    for dy in range(2):
        for dx in range(2):
            ox = jnp.clip(x0i[:, dy::2, dx::2] + K - bx, 0, K - 2)
            oy = jnp.clip(y0i[:, dy::2, dx::2] + K - by, 0, K - 2)
            fxq = fx[:, dy::2, dx::2]
            fyq = fy[:, dy::2, dx::2]
            wx = ((kx == ox[..., None]) * (1.0 - fxq)
                  + (kx == ox[..., None] + 1) * fxq)     # [B,hq,wq,K]
            wy = ((kx == oy[..., None]) * (1.0 - fyq)
                  + (kx == oy[..., None] + 1) * fyq)
            rows2 = jnp.einsum('bhwklc,bhwl->bhwkc',
                               patchb.astype(jnp.float32), wx)
            quads.append(jnp.einsum('bhwkc,bhwk->bhwc', rows2, wy))
    top = jnp.stack(quads[0:2], axis=3).reshape(B, h // 2, w, C)
    bot = jnp.stack(quads[2:4], axis=3).reshape(B, h // 2, w, C)
    return jnp.stack([top, bot], axis=2).reshape(B, h, w, C)


def _axis_onehot(coords, in_size):
    """[B, n] f32 source coordinates -> [B, in_size, n] bilinear one-hot
    weight matrices. Out-of-range taps get zero weight — exactly
    cv2.warpAffine's BORDER_CONSTANT(0)."""
    B, n = coords.shape
    i0 = jnp.floor(coords)
    f = coords - i0
    taps = jax.lax.broadcasted_iota(jnp.float32, (1, in_size, 1), 1)
    i0 = i0[:, None, :]
    return ((taps == i0) * (1.0 - f[:, None, :])
            + (taps == i0 + 1.0) * f[:, None, :])


@functools.partial(jax.jit, static_argnames=("out_size",))
def affine_warp_separable(images, inv_trans, out_size):
    """Axis-aligned affine warp (no rotation terms) as two batched
    one-hot matmuls — MXU work instead of the gather path.

    Valid when inv_trans[:, 0, 1] == inv_trans[:, 1, 0] == 0 (scale +
    translation + flip, which folds into a negative x-scale): sampling
    then separates into a vertical and a horizontal 1-D bilinear
    resample, each a [out, in] one-hot matrix contraction. This is the
    eval/inference crop shape (`augment_batch(train=False)` draws no
    rotation) — measured ~30x cheaper than the gather warp on v5e.
    The train path keeps the gather: rotation makes the sample lattice
    non-separable (a shear's per-row shifts cannot be one matrix).

    Matches `affine_warp` to f32 rounding (not bit-exact: lerp vs
    HIGHEST-precision matmul accumulate); borders are exact zeros.
    """
    images = jnp.asarray(images)
    B, Hs, Ws, C = images.shape
    w, h = int(out_size[0]), int(out_size[1])
    t = jnp.asarray(inv_trans, jnp.float32)
    xs = jax.lax.broadcasted_iota(jnp.float32, (1, w), 1)
    ys = jax.lax.broadcasted_iota(jnp.float32, (1, h), 1)
    sx = t[:, 0, 0, None] * xs + t[:, 0, 2, None]          # [B, w]
    sy = t[:, 1, 1, None] * ys + t[:, 1, 2, None]          # [B, h]
    wy = _axis_onehot(sy, Hs)                              # [B, Hs, h]
    wx = _axis_onehot(sx, Ws)                              # [B, Ws, w]
    img = images.astype(jnp.float32)
    mid = jnp.einsum('bYy,bYXc->byXc', wy, img,
                     precision=jax.lax.Precision.HIGHEST)
    return jnp.einsum('bXx,byXc->byxc', wx, mid,
                      precision=jax.lax.Precision.HIGHEST)


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
