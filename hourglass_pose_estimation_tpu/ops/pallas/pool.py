"""Pallas kernel: 2x2/2 max-pool with a mask-based custom VJP.

XLA lowers max-pool backward to SelectAndScatter, which serializes on
TPU; here the backward is pure VPU arithmetic: recompute the window max,
mask the positions that attain it, and split the incoming gradient
equally among ties (the subgradient convention; torch/XLA route it to
one arbitrary tie member instead — differences only arise on exact
ties). Forward matches `flax.linen.max_pool(x, (2,2), (2,2))` exactly.

Used for the hourglass encoder pools (`/root/reference/src/models/
modules.py:82`, `hourglass.py:24`) when enabled; the default model path
keeps nn.max_pool (measured: SelectAndScatter is only ~5 ms of the
221 ms train step at batch 64, so this kernel is about availability
and the SURVEY §7 kernel inventory, not a large win).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _row_tile(H_out: int) -> int:
    # must DIVIDE H_out: grid = H_out // hT silently drops trailing
    # rows otherwise (H_out=12 with a fixed hT=8 left output rows 8-11
    # uninitialized) — largest divisor of H_out <= 8
    for d in range(min(H_out, 8), 0, -1):
        if H_out % d == 0:
            return d
    return 1


def _fwd_kernel(x_ref, out_ref):
    _, H2, W2, C = x_ref.shape
    x = x_ref[0]
    out_ref[0] = x.reshape(H2 // 2, 2, W2 // 2, 2, C).max(axis=(1, 3))


def _bwd_kernel(x_ref, g_ref, dx_ref):
    _, H2, W2, C = x_ref.shape
    x = x_ref[0]
    g = g_ref[0]                                         # [H2/2, W2/2, C]
    xw = x.reshape(H2 // 2, 2, W2 // 2, 2, C)
    m = xw.max(axis=(1, 3), keepdims=True)
    mask = (xw == m).astype(x.dtype)
    ties = mask.sum(axis=(1, 3), keepdims=True)
    gw = (g[:, None, :, None, :] / ties) * mask
    dx_ref[0] = gw.reshape(H2, W2, C)


def _fwd(x, interpret):
    B, H2, W2, C = x.shape
    hT = _row_tile(H2 // 2)
    return pl.pallas_call(
        _fwd_kernel,
        grid=(B, (H2 // 2) // hT),
        in_specs=[pl.BlockSpec((1, 2 * hT, W2, C), lambda b, h: (b, h, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, hT, W2 // 2, C), lambda b, h: (b, h, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H2 // 2, W2 // 2, C), x.dtype),
        interpret=interpret,
    )(x)


def _bwd(x, g, interpret):
    B, H2, W2, C = x.shape
    hT = _row_tile(H2 // 2)
    return pl.pallas_call(
        _bwd_kernel,
        grid=(B, (H2 // 2) // hT),
        in_specs=[
            pl.BlockSpec((1, 2 * hT, W2, C), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hT, W2 // 2, C), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 2 * hT, W2, C), lambda b, h: (b, h, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H2, W2, C), x.dtype),
        interpret=interpret,
    )(x, g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def maxpool2x2_pallas(x, interpret: bool = False):
    """[B, H, W, C] -> [B, H/2, W/2, C], stride-2 2x2 max pool."""
    return _fwd(x, interpret)


def _vjp_fwd(x, interpret):
    return _fwd(x, interpret), x


def _vjp_bwd(interpret, x, g):
    return (_bwd(x, g, interpret),)


maxpool2x2_pallas.defvjp(_vjp_fwd, _vjp_bwd)
