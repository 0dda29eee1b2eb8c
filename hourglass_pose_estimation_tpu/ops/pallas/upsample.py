"""Pallas kernel: fused nearest-2x-upsample + skip-add (+ custom VJP).

The hourglass decoder merge `up1 + upsample(low3)` (`/root/reference/
src/models/modules.py:90-95`) as a single VMEM-resident kernel: the
low-resolution block is expanded in registers and added to the skip —
the upsampled intermediate never round-trips to HBM. Backward pass:
d_up1 = g (identity) and d_low = 2x2 block-sum of g, also a kernel.

Layout: NHWC, gridded over (batch, row-tiles) so blocks stay well under
the ~16 MB VMEM budget at any batch size; channels stay the lane dim.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _row_tile(H: int) -> int:
    # low-res rows per block (out block = (2*hT, 2W, C)). Must DIVIDE H:
    # grid = H // hT silently drops trailing rows otherwise (e.g. H=12
    # from a 192-px input with a fixed hT=8 left rows 8-11 unread and
    # the corresponding output rows uninitialized) — take the largest
    # divisor of H <= 8
    for d in range(min(H, 8), 0, -1):
        if H % d == 0:
            return d
    return 1


def _fwd_kernel(low_ref, skip_ref, out_ref):
    _, H, W, C = low_ref.shape
    low = low_ref[0]                                     # [hT, W, C]
    # nearest upsample = element repeat (a a b b) on both spatial dims
    up = low[:, None, :, None, :]
    up = jnp.broadcast_to(up, (H, 2, W, 2, C)).reshape(2 * H, 2 * W, C)
    out_ref[0] = up + skip_ref[0]


def _bwd_kernel(g_ref, dlow_ref):
    _, H2, W2, C = g_ref.shape
    g = g_ref[0]
    dlow_ref[0] = g.reshape(H2 // 2, 2, W2 // 2, 2, C).sum(axis=(1, 3))


def _fwd(low, skip, interpret):
    B, H, W, C = low.shape
    hT = _row_tile(H)
    return pl.pallas_call(
        _fwd_kernel,
        grid=(B, H // hT),
        in_specs=[
            pl.BlockSpec((1, hT, W, C), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * hT, 2 * W, C), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 2 * hT, 2 * W, C),
                               lambda b, h: (b, h, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 2 * H, 2 * W, C), skip.dtype),
        interpret=interpret,
    )(low, skip)


def _bwd_low(g, interpret):
    B, H2, W2, C = g.shape
    hT = _row_tile(H2 // 2)
    return pl.pallas_call(
        _bwd_kernel,
        grid=(B, (H2 // 2) // hT),
        in_specs=[pl.BlockSpec((1, 2 * hT, W2, C), lambda b, h: (b, h, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, hT, W2 // 2, C),
                               lambda b, h: (b, h, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H2 // 2, W2 // 2, C), g.dtype),
        interpret=interpret,
    )(g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def upsample2x_add_pallas(low, skip, interpret: bool = False):
    """nearest_upsample_2x(low) + skip, fused. low: [B,H,W,C],
    skip: [B,2H,2W,C]."""
    return _fwd(low, skip, interpret)


def _vjp_fwd(low, skip, interpret):
    return _fwd(low, skip, interpret), None


def _vjp_bwd(interpret, _res, g):
    return _bwd_low(g, interpret), g


upsample2x_add_pallas.defvjp(_vjp_fwd, _vjp_bwd)
