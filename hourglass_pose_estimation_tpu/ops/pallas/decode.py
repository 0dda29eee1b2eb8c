"""Pallas kernel: batched heatmap peak decode (argmax + quarter offset).

One grid step per batch element. The per-joint argmax and its
neighbour-gradient sign are extracted WITHOUT gathers (TPU-unfriendly):
shifted-difference maps are built with jnp.roll-style slicing, and
"value at the peak" is a masked reduction against the argmax one-hot —
pure VPU reductions over the [H, W, J] block. This is the device-side
replacement for the reference's per-joint host loops
(`/root/reference/src/utils/inference.py:48-67`).

Returns 0-based peak coords with the ±0.25 refinement applied; the
(cheap, [B, J]-sized) inverse-affine map back to image space stays in
XLA at the wrapper level.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _decode_kernel(hm_ref, coords_ref, maxval_ref):
    _, H, W, J = hm_ref.shape
    hm = hm_ref[0]                                       # [H, W, J]

    maxv = jnp.max(hm, axis=(0, 1))                      # [J]
    ys = jax.lax.broadcasted_iota(jnp.int32, (H, W, J), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (H, W, J), 1)
    flat = ys * W + xs
    is_max = hm >= maxv[None, None, :]
    # first maximal element in row-major order (argmax tie-break parity)
    big = H * W
    idx = jnp.min(jnp.where(is_max, flat, big), axis=(0, 1))    # [J]
    px = idx % W
    py = idx // W
    onehot = flat == idx[None, None, :]

    # x/y gradient maps: hm[y, x+1] - hm[y, x-1] with zero edges
    zcol = jnp.zeros((H, 1, J), hm.dtype)
    gx_map = (jnp.concatenate([hm[:, 1:, :], zcol], axis=1)
              - jnp.concatenate([zcol, hm[:, :-1, :]], axis=1))
    zrow = jnp.zeros((1, W, J), hm.dtype)
    gy_map = (jnp.concatenate([hm[1:, :, :], zrow], axis=0)
              - jnp.concatenate([zrow, hm[:-1, :, :]], axis=0))
    gx = jnp.sum(jnp.where(onehot, gx_map, 0.0), axis=(0, 1))   # [J]
    gy = jnp.sum(jnp.where(onehot, gy_map, 0.0), axis=(0, 1))

    ok = (px > 0) & (px < W - 1) & (py > 0) & (py < H - 1)
    fx = px.astype(jnp.float32) + jnp.where(ok, jnp.sign(gx) * 0.25, 0.0)
    fy = py.astype(jnp.float32) + jnp.where(ok, jnp.sign(gy) * 0.25, 0.0)

    coords_ref[0] = jnp.stack([fx, fy], axis=-1)
    maxval_ref[0, 0] = maxv


@functools.partial(jax.jit, static_argnames=("interpret",))
def decode_peaks_pallas(heatmaps, interpret: bool = False):
    """[B, H, W, J] -> (coords [B, J, 2] 0-based quarter-refined,
    maxvals [B, J]).

    Implements the CORRECTED 0-based convention only (the boundary
    gate is 0 < p < dim-1 on true peak coords) — i.e. it substitutes
    for `decode_quarter_offset(zero_based=True)`. It is NOT a drop-in
    for the reference-parity mode (zero_based=False), whose 1-based
    coords gate edge-adjacent peaks differently (effective
    1 <= p <= dim-3); use the XLA decoder for bit-parity evals.
    """
    heatmaps = jnp.asarray(heatmaps, jnp.float32)
    B, H, W, J = heatmaps.shape
    coords, maxvals = pl.pallas_call(
        _decode_kernel,
        grid=(B,),
        in_specs=[pl.BlockSpec((1, H, W, J), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((1, J, 2), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            # [B, 1, J]: trailing block dims must equal the array's
            pl.BlockSpec((1, 1, J), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, J, 2), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, J), jnp.float32),
        ),
        interpret=interpret,
    )(heatmaps)
    return coords, maxvals[:, 0, :]
