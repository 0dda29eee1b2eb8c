"""On-device Gaussian heatmap target rendering.

The reference renders targets joint-by-joint in Python with numpy window
slicing on the host dataloader workers
(`/root/reference/src/datasets/common.py:197-248`). On TPU this becomes
a single broadcasted VPU expression over the whole [B, H, W, J] target
tensor — no windows, no loops, no host work.

Exact semantics reproduced:
  * peak location mu = trunc(joint / feat_stride + 0.5)  (int() cast);
  * unnormalized Gaussian exp(-((x-mu_x)^2 + (y-mu_y)^2) / (2 sigma^2))
    restricted to the (6*sigma+1)-wide square window around mu
    (pixels outside the window are exactly 0, as in the reference's
    windowed rendering);
  * target_weight = visibility, zeroed when the window misses the map
    entirely (ul >= size or br < 0);
  * nothing is rendered for weight-0 joints.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def render_preamble(joints, joints_vis, heatmap_size, image_size, sigma):
    """Shared peak-quantization + off-map-weight preamble of the XLA
    renderer AND its Pallas twin (ops/pallas/render.py) — one place for
    the reference's int()-truncation and window-miss rules
    (common.py:218-227), so the two renderers cannot diverge.

    Returns (mu [B, J, 2] int32 peak coords, weight [B, J] float32)."""
    joints = jnp.asarray(joints, jnp.float32)
    vis = jnp.asarray(joints_vis, jnp.float32)
    Wh, Hh = int(heatmap_size[0]), int(heatmap_size[1])
    Wi, Hi = int(image_size[0]), int(image_size[1])
    stride = jnp.array([Wi / Wh, Hi / Hh], jnp.float32)
    tmp = int(3 * sigma)

    # int() truncation semantics of the reference (common.py:218-219)
    mu = jnp.trunc(joints / stride + 0.5).astype(jnp.int32)      # [B, J, 2]
    ul = mu - tmp
    br = mu + tmp + 1
    size = jnp.array([Wh, Hh], jnp.int32)
    off_map = jnp.any(ul >= size, axis=-1) | jnp.any(br < 0, axis=-1)
    weight = jnp.where(off_map, 0.0, vis)                        # [B, J]
    return mu, weight


@functools.partial(jax.jit, static_argnames=("heatmap_size", "image_size", "sigma"))
def render_gaussian_targets(joints, joints_vis, *, heatmap_size, image_size, sigma):
    """Render Gaussian targets for a batch.

    Args:
      joints:     [B, J, 2] float (x, y) in input-image pixels.
      joints_vis: [B, J] float/bool visibility (reference: joints_vis[:, 0]).
      heatmap_size: static (w, h) of the target maps.
      image_size:   static (w, h) of the network input.
      sigma: static int/float Gaussian sigma in heatmap pixels.

    Returns:
      target: [B, Hh, Wh, J] float32.
      target_weight: [B, J] float32.
    """
    mu, weight = render_preamble(joints, joints_vis, heatmap_size,
                                 image_size, sigma)
    Wh, Hh = int(heatmap_size[0]), int(heatmap_size[1])
    tmp = int(3 * sigma)                     # 6σ+1 window half-extent

    xs = jax.lax.broadcasted_iota(jnp.int32, (Hh, Wh), 1)
    ys = jax.lax.broadcasted_iota(jnp.int32, (Hh, Wh), 0)
    dx = xs[None, :, :, None] - mu[:, None, None, :, 0]          # [B, H, W, J]
    dy = ys[None, :, :, None] - mu[:, None, None, :, 1]
    g = jnp.exp(-(dx.astype(jnp.float32) ** 2 + dy.astype(jnp.float32) ** 2)
                / (2.0 * float(sigma) ** 2))
    in_window = (jnp.abs(dx) <= tmp) & (jnp.abs(dy) <= tmp)
    active = (weight > 0.5)[:, None, None, :]
    target = jnp.where(in_window & active, g, 0.0)
    return target, weight
