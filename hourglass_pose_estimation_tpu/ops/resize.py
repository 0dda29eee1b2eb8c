"""Bilinear resize with align_corners=True semantics (MSPN parity).

The reference's MSPN uses `F.interpolate(..., mode='bilinear',
align_corners=True)` (`/root/reference/src/models/mspn.py:169,177`).
jax.image.resize uses half-pixel (align_corners=False) sampling, so
this implements the align-corners grid directly: src = dst * (in-1) /
(out-1). Written as two 1-D interpolation matmuls (H then W), which XLA
maps onto the MXU — on TPU a dense [out, in] interpolation matrix beats
gather for these small spatial sizes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=64)
def _interp_matrix(in_size: int, out_size: int) -> np.ndarray:
    """[out, in] row-stochastic bilinear weights, align_corners=True."""
    m = np.zeros((out_size, in_size), np.float32)
    if out_size == 1:
        m[0, 0] = 1.0
        return m
    scale = (in_size - 1) / (out_size - 1)
    for o in range(out_size):
        s = o * scale
        i0 = int(np.floor(s))
        i1 = min(i0 + 1, in_size - 1)
        f = s - i0
        m[o, i0] += 1.0 - f
        m[o, i1] += f
    return m


@functools.lru_cache(maxsize=64)
def _interp_matrix_halfpix(in_size: int, out_size: int) -> np.ndarray:
    """[out, in] bilinear weights with half-pixel centers (cv2
    INTER_LINEAR / align_corners=False): src = (dst+0.5)*in/out - 0.5,
    clamped to the valid range (cv2 border replication at the edges)."""
    m = np.zeros((out_size, in_size), np.float32)
    scale = in_size / out_size
    for o in range(out_size):
        s = (o + 0.5) * scale - 0.5
        s = min(max(s, 0.0), in_size - 1.0)
        i0 = int(np.floor(s))
        i1 = min(i0 + 1, in_size - 1)
        f = s - i0
        m[o, i0] += 1.0 - f
        m[o, i1] += f
    return m


def _separable_resize(x, mh, mw):
    dt = x.dtype
    y = jnp.einsum('hH,bHWc->bhWc', mh, x.astype(jnp.float32),
                   precision=jax.lax.Precision.HIGHEST)
    y = jnp.einsum('wW,bhWc->bhwc', mw, y,
                   precision=jax.lax.Precision.HIGHEST)
    return y.astype(dt)


@functools.partial(jax.jit, static_argnames=("out_hw",))
def resize_bilinear_halfpix(x: jax.Array, out_hw) -> jax.Array:
    """x: [B, H, W, C] -> [B, h, w, C], cv2.resize INTER_LINEAR parity
    (half-pixel centers). Same MXU-friendly two-matmul formulation as
    the align-corners variant; used by the Estimator's on-device
    preprocess (`/root/reference/src/runner/estimator.py:50` does this
    resize on the host with cv2)."""
    B, H, W, C = x.shape
    h, w = int(out_hw[0]), int(out_hw[1])
    if (H, W) == (h, w):
        return x
    return _separable_resize(x, jnp.asarray(_interp_matrix_halfpix(H, h)),
                             jnp.asarray(_interp_matrix_halfpix(W, w)))


@functools.partial(jax.jit, static_argnames=("out_hw",))
def resize_bilinear_align_corners(x: jax.Array, out_hw) -> jax.Array:
    """x: [B, H, W, C] -> [B, h, w, C], align_corners=True bilinear."""
    B, H, W, C = x.shape
    h, w = int(out_hw[0]), int(out_hw[1])
    if (H, W) == (h, w):
        return x
    return _separable_resize(x, jnp.asarray(_interp_matrix(H, h)),
                             jnp.asarray(_interp_matrix(W, w)))
