"""Stacked-hourglass network (Newell et al., ECCV 2016), TPU-native.

Re-design of `/root/reference/src/models/hourglass.py:7-97` in
flax.linen / NHWC. Structural parity with the reference (verified by
param-count tests: 1/2/8 stacks = 3.59M/6.73M/25.59M full,
1.21M/2.31M/8.88M mobile):

  stem:  conv7x7/2 (3->64) + BN + ReLU -> bottleneck(64->128)
         -> maxpool/2 -> bottleneck(128->256) -> bottleneck(256->256)
  stack: hourglass(depth 4, 256ch) -> bottleneck chain -> 1x1 conv +
         BN + ReLU ("fc") -> 1x1 score head (J maps);
         inter-stack fusion x <- x + fc_(y) + score_(score).

Output is a single stacked array [S, B, Hh, Wh, J] (the per-stack
intermediate-supervision heatmaps), float32 regardless of compute
dtype so the loss and metrics run in full precision.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import flax.linen as nn

from hourglass_pose_estimation_tpu.models.modules import (
    Bottleneck, Hourglass, ResidualChain)
from hourglass_pose_estimation_tpu.models.norm import BatchNorm


class HourglassNet(nn.Module):
    num_stacks: int = 2
    num_blocks: int = 1
    num_classes: int = 16
    mobile: bool = False
    skip_mode: str = 'sum'
    num_feats: int = 128
    dtype: Any = jnp.bfloat16
    # dtype of the stacked heatmap outputs; the loss upcasts to f32, so
    # bf16 here halves the traffic of the [S, B, H, W, J] stack
    out_dtype: Any = jnp.float32
    # route decoder merges through the Pallas fused upsample+add kernel
    fuse_upsample: bool = False
    # run eligible bottlenecks as ONE Pallas kernel whenever BN uses
    # running averages (eval / export / serving / frozen-BN training);
    # see models/modules.py Bottleneck.fuse_block
    fuse_block: bool = False
    # rematerialize each hourglass in the backward pass (trades ~1/3
    # extra forward FLOPs for activation memory)
    remat: bool = False
    # BN batch statistics from the first k samples only (0 = full batch;
    # see models/norm.py — ghost-stat BN, an HBM-traffic optimization)
    bn_stat_samples: int = 0
    # mesh axis over which train-mode BN statistics sync (models/norm.py
    # axis_name); set by the explicit shard_map path when sync_bn=True
    bn_axis_name: str = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: [B, H, W, 3] -> [S, B, H/4, W/4, num_classes] float32."""
        dt = self.dtype
        conv1x1 = lambda feats, name: nn.Conv(
            feats, (1, 1), use_bias=True, dtype=dt,
            param_dtype=jnp.float32, name=name)

        x = x.astype(dt)
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=True, dtype=dt, param_dtype=jnp.float32,
                    name='conv1')(x)
        x = BatchNorm(use_running_average=not train, momentum=0.9,
                      epsilon=1e-5, dtype=jnp.promote_types(jnp.float32, dt),
                      stat_samples=self.bn_stat_samples,
                      axis_name=self.bn_axis_name, name='bn1')(x)
        x = nn.relu(x).astype(dt)
        # stem residuals mirror the reference's inplanes bookkeeping
        # (hourglass.py:21-24): 64 -> 128, pool, 128 -> 256, 256 -> 256.
        bneck = lambda planes, name: Bottleneck(
            planes, mobile=self.mobile, dtype=dt,
            bn_stat_samples=self.bn_stat_samples,
            bn_axis_name=self.bn_axis_name,
            fuse_block=self.fuse_block, name=name)
        x = bneck(64, 'layer1')(x, train=train)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = bneck(128, 'layer2')(x, train=train)
        x = bneck(self.num_feats, 'layer3')(x, train=train)

        ch = self.num_feats * 2
        # nn.remat(Hourglass) keeps param names identical; `train` must
        # be positional (static argnum 2, after (module, x)).
        HG = (nn.remat(Hourglass, static_argnums=(2,)) if self.remat
              else Hourglass)
        outs = []
        for i in range(self.num_stacks):
            y = HG(self.num_feats, depth=4, num_blocks=self.num_blocks,
                   mobile=self.mobile, skip_mode=self.skip_mode,
                   dtype=dt, fuse_upsample=self.fuse_upsample,
                   fuse_block=self.fuse_block,
                   bn_stat_samples=self.bn_stat_samples,
                   bn_axis_name=self.bn_axis_name,
                   name=f'hg{i}')(x, train)
            y = ResidualChain(self.num_feats, self.num_blocks, self.mobile,
                              dt, bn_stat_samples=self.bn_stat_samples,
                              bn_axis_name=self.bn_axis_name,
                              fuse_block=self.fuse_block,
                              name=f'res{i}')(y, train=train)
            y = conv1x1(ch, f'fc{i}')(y)
            y = BatchNorm(use_running_average=not train, momentum=0.9,
                          epsilon=1e-5, dtype=jnp.promote_types(jnp.float32, dt),
                          stat_samples=self.bn_stat_samples,
                          axis_name=self.bn_axis_name,
                          name=f'fc_bn{i}')(y)
            y = nn.relu(y).astype(dt)
            score = conv1x1(self.num_classes, f'score{i}')(y)
            outs.append(score.astype(self.out_dtype))
            if i < self.num_stacks - 1:
                fc_b = conv1x1(ch, f'fc_back{i}')(y)
                score_b = conv1x1(ch, f'score_back{i}')(score)
                x = x + fc_b + score_b

        return jnp.stack(outs, axis=0)


class HourglassStem(nn.Module):
    """The pre-stack trunk of HourglassNet (conv1 .. layer3).

    Param names match HourglassNet exactly (conv1, bn1, layer1-3) so a
    trained HourglassNet checkpoint splits losslessly into
    (stem, stacks) for the pipeline-parallel formulation
    (parallel/pipeline.py). Mirrors the reference's inplanes bookkeeping
    (/root/reference/src/models/hourglass.py:21-24).
    """
    num_feats: int = 128
    mobile: bool = False
    dtype: Any = jnp.bfloat16
    bn_stat_samples: int = 0
    bn_axis_name: str = None
    bn_fast_variance: bool = True
    fuse_block: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        x = x.astype(dt)
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=True, dtype=dt, param_dtype=jnp.float32,
                    name='conv1')(x)
        x = BatchNorm(use_running_average=not train, momentum=0.9,
                      epsilon=1e-5, dtype=jnp.promote_types(jnp.float32, dt),
                      stat_samples=self.bn_stat_samples,
                      axis_name=self.bn_axis_name,
                      fast_variance=self.bn_fast_variance, name='bn1')(x)
        x = nn.relu(x).astype(dt)
        bneck = lambda planes, name: Bottleneck(
            planes, mobile=self.mobile, dtype=dt,
            bn_stat_samples=self.bn_stat_samples,
            bn_axis_name=self.bn_axis_name,
            bn_fast_variance=self.bn_fast_variance,
            fuse_block=self.fuse_block, name=name)
        x = bneck(64, 'layer1')(x, train=train)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = bneck(128, 'layer2')(x, train=train)
        x = bneck(self.num_feats, 'layer3')(x, train=train)
        return x


class HourglassStack(nn.Module):
    """ONE hourglass stack: hg + res + fc/fc_bn + score + feedback.

    Returns (score [B, H/4, W/4, J], x_next). Param names match
    HourglassNet's per-stack names minus the index (hg, res, fc, fc_bn,
    score, fc_back, score_back), so stacks vmap/scan into a single
    stacked tree with a leading stack axis — the unit of pipeline
    parallelism. The feedback convs exist on EVERY stack (HourglassNet
    omits them on the last) to keep the stacked tree homogeneous; the
    last stage simply discards x_next.
    """
    num_feats: int = 128
    num_blocks: int = 1
    num_classes: int = 16
    mobile: bool = False
    skip_mode: str = 'sum'
    # production parity is depth 4 (the reference hardcodes it); smaller
    # depths are legitimate model configs and give numerically
    # well-conditioned parity fixtures (depth 4's 1x1 bottom level makes
    # train-mode BN chaotically sensitive at tiny microbatch sizes)
    depth: int = 4
    dtype: Any = jnp.bfloat16
    out_dtype: Any = jnp.float32
    bn_stat_samples: int = 0
    bn_axis_name: str = None
    bn_fast_variance: bool = True
    fuse_block: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        ch = self.num_feats * 2
        conv1x1 = lambda feats, name: nn.Conv(
            feats, (1, 1), use_bias=True, dtype=dt,
            param_dtype=jnp.float32, name=name)
        y = Hourglass(self.num_feats, depth=self.depth,
                      num_blocks=self.num_blocks,
                      mobile=self.mobile, skip_mode=self.skip_mode,
                      dtype=dt, bn_stat_samples=self.bn_stat_samples,
                      bn_axis_name=self.bn_axis_name,
                      bn_fast_variance=self.bn_fast_variance,
                      fuse_block=self.fuse_block,
                      name='hg')(x, train)
        y = ResidualChain(self.num_feats, self.num_blocks, self.mobile,
                          dt, bn_stat_samples=self.bn_stat_samples,
                          bn_axis_name=self.bn_axis_name,
                          bn_fast_variance=self.bn_fast_variance,
                          fuse_block=self.fuse_block,
                          name='res')(y, train=train)
        y = conv1x1(ch, 'fc')(y)
        y = BatchNorm(use_running_average=not train, momentum=0.9,
                      epsilon=1e-5, dtype=jnp.promote_types(jnp.float32, dt),
                      stat_samples=self.bn_stat_samples,
                      axis_name=self.bn_axis_name,
                      fast_variance=self.bn_fast_variance, name='fc_bn')(y)
        y = nn.relu(y).astype(dt)
        score = conv1x1(self.num_classes, 'score')(y)
        fc_b = conv1x1(ch, 'fc_back')(y)
        score_b = conv1x1(ch, 'score_back')(score)
        x_next = x + fc_b + score_b
        return score.astype(self.out_dtype), x_next


def hg(**kwargs):
    """Factory with the reference's kwarg surface (hourglass.py:93-97).

    Accepts and ignores `out_res` exactly like the reference factory.
    """
    if kwargs.get('up_channel_num', 256) != 256:
        raise ValueError('arch=hg does not support up_channel_num '
                         '(MSPN decoder width); got '
                         f"{kwargs['up_channel_num']!r}")
    return HourglassNet(
        num_stacks=kwargs['num_stacks'],
        num_blocks=kwargs.get('num_blocks', 1),
        num_classes=kwargs['num_classes'],
        mobile=kwargs.get('mobile', False),
        skip_mode=kwargs.get('skip_mode', 'sum'),
        dtype=kwargs.get('dtype', jnp.bfloat16),
        remat=kwargs.get('remat', False),
        bn_stat_samples=kwargs.get('bn_stat_samples', 0),
        bn_axis_name=kwargs.get('bn_axis_name', None),
        fuse_block=kwargs.get('fuse_block', False),
    )


hg.n_outputs = 'num_stacks'
