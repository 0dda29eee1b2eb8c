"""On-device augmentation + target-rendering pipeline (jittable).

The TPU-first replacement for the reference's host dataloader work
(`/root/reference/src/datasets/common.py:99-164`): given a batch of
fixed-size uint8 canvases and person geometry, everything below runs
inside the jitted (and sharded) train step:

  1. draw augmentation params with `jax.random` (same distributions as
     the reference: one U(0,1) gates flip (p<=0.5) and rotation
     (p<=0.6); scale jitter clip(N(1, sf), 1±sf); rotation
     clip(N(0, rf), ±2rf)),
  2. build the batch of crop affines in closed form,
  3. bilinear-warp the canvases to the input resolution (the flip and
     the canvas pre-scale are composed into the same single warp — one
     resample end to end, like the reference's single cv2.warpAffine),
  4. normalize with dataset mean/std (BGR),
  5. map joints through the same affine and render Gaussian targets.

Everything is static-shaped; the host->device transfer is uint8.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp

from hourglass_pose_estimation_tpu.utils.transforms import (
    batched_affine_transforms, batched_apply_affine)
from hourglass_pose_estimation_tpu.ops.warp import (
    affine_warp, affine_warp_quad, affine_warp_separable)
from hourglass_pose_estimation_tpu.ops.heatmap import render_gaussian_targets


class PipelineSpec(NamedTuple):
    """Static configuration of the device pipeline."""
    inp_res: int
    out_res: int
    sigma: int
    scale_factor: float
    rot_factor: float
    flip_perm: Tuple[int, ...]       # joint permutation under horizontal flip
    mean: Tuple[float, float, float]
    std: Tuple[float, float, float]


def sample_augmentations(rng, scales, *, scale_factor, rot_factor, train):
    """Per-sample (scale, rot_deg, flip) draws, reference distributions."""
    B = scales.shape[0]
    k_prob, k_scale, k_rot = jax.random.split(rng, 3)
    if not train:
        return scales, jnp.zeros((B,), jnp.float32), jnp.zeros((B,), bool)
    prob = jax.random.uniform(k_prob, (B,))
    sf = scale_factor
    s_mult = jnp.clip(jax.random.normal(k_scale, (B,)) * sf + 1.0,
                      1.0 - sf, 1.0 + sf)
    scales = scales * s_mult[:, None]
    rf = rot_factor
    rots = jnp.clip(jax.random.normal(k_rot, (B,)) * rf, -2.0 * rf, 2.0 * rf)
    rots = jnp.where(prob <= 0.6, rots, 0.0)
    flips = prob <= 0.5
    return scales, rots, flips


@functools.partial(jax.jit, static_argnames=("spec", "train"))
def augment_batch(batch, rng, spec: PipelineSpec, train: bool):
    """Full device pipeline: canvases -> (normalized inputs, targets, weights).

    Args:
      batch: dict from `PoseDataset.canvas_batch` (device or host arrays):
        canvas [B, S, S, 3] uint8, canvas_scale [B], center [B,2],
        scale [B,2], joints [B,J,2], vis [B,J], width [B].
      rng: jax PRNG key.
      spec: static PipelineSpec.
      train: apply augmentation or not.

    Returns dict: image [B,R,R,3] f32 normalized, target [B,h,w,J] f32,
      target_weight [B,J], joints_input [B,J,2], center/scale (post-aug).
    """
    R = spec.inp_res
    canvas = jnp.asarray(batch['canvas'])
    q = jnp.asarray(batch['canvas_scale'], jnp.float32)
    B0 = canvas.shape[0]
    if 'canvas_offset' in batch:          # crop-aware packing
        canvas_off = jnp.asarray(batch['canvas_offset'], jnp.float32)
    else:                                 # legacy whole-image canvases
        canvas_off = jnp.zeros((B0, 2), jnp.float32)
    centers = jnp.asarray(batch['center'], jnp.float32)
    scales = jnp.asarray(batch['scale'], jnp.float32)
    joints = jnp.asarray(batch['joints'], jnp.float32)
    vis = jnp.asarray(batch['vis'], jnp.float32)
    widths = jnp.asarray(batch['width'], jnp.float32)
    B, J = joints.shape[:2]

    scales_a, rots, flips = sample_augmentations(
        rng, scales, scale_factor=spec.scale_factor,
        rot_factor=spec.rot_factor, train=train)

    # --- flip in source-image coordinates (common.py:127-131) ---------
    centers_f = jnp.stack(
        [jnp.where(flips, widths - centers[:, 0] - 1.0, centers[:, 0]),
         centers[:, 1]], axis=-1)
    perm = jnp.asarray(spec.flip_perm, jnp.int32)
    joints_sw = joints[:, perm, :]
    vis_sw = vis[:, perm]
    joints_f = jnp.where(
        flips[:, None, None],
        jnp.stack([widths[:, None] - joints_sw[..., 0] - 1.0,
                   joints_sw[..., 1]], axis=-1),
        joints)
    vis_f = jnp.where(flips[:, None], vis_sw, vis)

    # --- crop affine (source coords -> input crop) --------------------
    fwd = batched_affine_transforms(centers_f, scales_a, rots, (R, R))
    inv = batched_affine_transforms(centers_f, scales_a, rots, (R, R), inv=True)

    # compose: crop -> source(flipped) -> source -> canvas
    # x_src = width-1-x_flipped when flipped; then
    # x_canvas = q * (x_src - ox) (ox/oy = 0 for whole-image canvases).
    a, b, c = inv[:, 0, 0], inv[:, 0, 1], inv[:, 0, 2]
    d, e, f = inv[:, 1, 0], inv[:, 1, 1], inv[:, 1, 2]
    sgn = jnp.where(flips, -1.0, 1.0)
    off = jnp.where(flips, widths - 1.0, 0.0)
    ox, oy = canvas_off[:, 0], canvas_off[:, 1]
    row0 = jnp.stack([q * sgn * a, q * sgn * b,
                      q * (sgn * c + off - ox)], axis=-1)
    row1 = jnp.stack([q * d, q * e, q * (f - oy)], axis=-1)
    inv_canvas = jnp.stack([row0, row1], axis=1)          # [B, 2, 3]

    # uint8 canvases hit the packed-byte gather fast path in affine_warp.
    # (affine_warp_quad — one gathered row per 2x2 output quad — was
    # measured SLOWER in the full step (288.5 -> 249.2 img/s): the real
    # warp's spatially coherent gather is far cheaper than the random-
    # index probe suggested, and the quad's one-hot tap resolution adds
    # more VPU work than the row savings buy. Kept as an op with parity
    # tests; see BENCH_NOTES.md.)
    #
    # Rotation-free programs (eval always; train when rot_factor == 0 —
    # flips fold into a negative x-scale) sample an axis-aligned
    # lattice, where the warp is two one-hot MXU matmuls instead of the
    # gather: 5.6 vs 44 ms at B=64/256^2 on v5e (tools/warp_spike.py).
    if train and spec.rot_factor > 0:
        imgs = affine_warp(canvas, inv_canvas, (R, R))
    else:
        imgs = affine_warp_separable(canvas, inv_canvas, (R, R))
    mean = jnp.asarray(spec.mean, jnp.float32)
    std = jnp.asarray(spec.std, jnp.float32)
    imgs = (imgs / 255.0 - mean) / std

    joints_inp = batched_apply_affine(joints_f, fwd)
    target, tw = render_gaussian_targets(
        joints_inp, vis_f, heatmap_size=(spec.out_res, spec.out_res),
        image_size=(R, R), sigma=spec.sigma)

    return {
        'image': imgs,
        'target': target,
        'target_weight': tw,
        'joints_input': joints_inp,
        'center': centers_f,
        'scale': scales_a,
        'rotation': rots,
    }


@functools.partial(jax.jit, static_argnames=("spec",))
def prepare_host_batch(batch, spec: PipelineSpec):
    """Device-side tail of the HOST (cv2-parity) pipeline.

    The host did read+augment+warp (`PoseDataset.host_batch`, exact
    reference semantics); this normalizes the raw crops and renders the
    Gaussian targets on device, producing the same contract as
    `augment_batch`.
    """
    imgs = jnp.asarray(batch['image'], jnp.float32)
    mean = jnp.asarray(spec.mean, jnp.float32)
    std = jnp.asarray(spec.std, jnp.float32)
    imgs = (imgs / 255.0 - mean) / std
    target, tw = render_gaussian_targets(
        jnp.asarray(batch['joints'], jnp.float32),
        jnp.asarray(batch['vis'], jnp.float32),
        heatmap_size=(spec.out_res, spec.out_res),
        image_size=(spec.inp_res, spec.inp_res), sigma=spec.sigma)
    return {'image': imgs, 'target': target, 'target_weight': tw}


def make_spec(dataset, train_cfg=None) -> PipelineSpec:
    """Build a PipelineSpec from a PoseDataset."""
    return PipelineSpec(
        inp_res=dataset.inp_res,
        out_res=dataset.out_res,
        sigma=dataset.sigma,
        scale_factor=dataset.scale_factor,
        rot_factor=dataset.rot_factor,
        flip_perm=tuple(int(i) for i in dataset.flip_permutation()),
        mean=tuple(dataset.mean),
        std=tuple(dataset.std),
    )
