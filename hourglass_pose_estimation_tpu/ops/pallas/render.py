"""Pallas kernel: Gaussian heatmap target rendering.

One grid step per batch element; the whole [H, W, J] target block is
produced in VMEM from [J, 2] peak coordinates with pure VPU math — the
TPU replacement for the reference's host-side per-joint window loop
(`/root/reference/src/datasets/common.py:216-246`). Semantics are
identical to `ops.heatmap.render_gaussian_targets` (the pure-XLA
version), which serves as the test oracle.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _render_kernel(mu_ref, weight_ref, target_ref, *, sigma: int):
    _, H, W, J = target_ref.shape
    tmp = 3 * sigma
    mux = mu_ref[0, :, 0]                                # [J] int32
    muy = mu_ref[0, :, 1]
    w = weight_ref[0, 0, :]                              # [J] f32

    ys = jax.lax.broadcasted_iota(jnp.int32, (H, 1, J), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (1, W, J), 1)
    dy = ys - muy[None, None, :]
    dx = xs - mux[None, None, :]
    d2 = (dy * dy).astype(jnp.float32) + (dx * dx).astype(jnp.float32)
    g = jnp.exp(-d2 / (2.0 * float(sigma) ** 2))
    in_window = (jnp.abs(dy) <= tmp) & (jnp.abs(dx) <= tmp)
    active = (w > 0.5)[None, None, :]
    target_ref[0] = jnp.where(in_window & active, g, 0.0)


@functools.partial(jax.jit,
                   static_argnames=("heatmap_size", "image_size", "sigma",
                                    "interpret"))
def render_gaussian_targets_pallas(joints, joints_vis, *, heatmap_size,
                                   image_size, sigma, interpret=False):
    """Drop-in replacement for ops.heatmap.render_gaussian_targets."""
    from hourglass_pose_estimation_tpu.ops.heatmap import render_preamble
    B, J = jnp.asarray(joints_vis).shape
    Wh, Hh = int(heatmap_size[0]), int(heatmap_size[1])
    # shared peak-quantization/off-map rules — one source of truth with
    # the XLA renderer (its parity test is this kernel's oracle)
    mu, weight = render_preamble(joints, joints_vis, heatmap_size,
                                 image_size, sigma)

    target = pl.pallas_call(
        functools.partial(_render_kernel, sigma=int(sigma)),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, J, 2), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            # [B, 1, J] so the block's trailing dims equal the array's
            # (TPU lowering constraint on small blocks)
            pl.BlockSpec((1, 1, J), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Hh, Wh, J), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Hh, Wh, J), jnp.float32),
        interpret=interpret,
    )(mu, weight[:, None, :])
    return target, weight
