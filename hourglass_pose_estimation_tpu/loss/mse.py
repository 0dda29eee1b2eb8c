"""Visibility-weighted per-stack heatmap MSE.

Exact semantics of `/root/reference/src/loss/mse.py:14-44`: for each
stack s and joint j,

    l_{s,j} = 0.5 * mean_{b, pixels} ( w_{b,j} * (pred - gt) )^2

(the reference multiplies both pred and gt by the weight before a mean
MSE, so the weight enters squared), then the loss is

    L = sum_s mean_j l_{s,j}.

The reference computes this with a per-joint Python loop over tensor
splits; here it is one fused reduction over [S, B, H, W, J].
"""

from __future__ import annotations

import jax.numpy as jnp


def heatmap_mse_loss(outputs, target, target_weight=None, use_target_weight=True):
    """Args:
      outputs: [S, B, H, W, J] per-stack predictions (float32).
      target:  [B, H, W, J] ground-truth heatmaps.
      target_weight: [B, J] visibility weights (or None).
    Returns scalar float32 loss.
    """
    if use_target_weight and target_weight is None:
        # the reference crashes here; a silent unweighted loss would
        # let occluded joints contribute full gradient with no signal
        raise ValueError('use_target_weight=True requires target_weight '
                         '(pass use_target_weight=False for the '
                         'unweighted loss)')
    # upcast to at least f32 (bf16 inputs -> f32; f64 parity runs stay f64)
    dt = jnp.promote_types(jnp.float32, outputs.dtype)
    outputs = outputs.astype(dt)
    target = target.astype(dt)[None]                    # [1, B, H, W, J]
    diff = outputs - target
    if use_target_weight:
        w = target_weight.astype(dt)[None, :, None, None, :]
        diff = diff * w
    # mean over (B, H, W) per (stack, joint); then mean over joints,
    # sum over stacks == S * mean over everything.
    per_sj = 0.5 * jnp.mean(diff * diff, axis=(1, 2, 3))   # [S, J]
    return jnp.sum(jnp.mean(per_sj, axis=1))
