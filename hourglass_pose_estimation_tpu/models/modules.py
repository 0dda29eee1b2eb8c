"""Building blocks: pre-activation bottleneck and the hourglass module.

TPU-first re-design of `/root/reference/src/models/modules.py:6-99`:

  * NHWC layout (channels-last feeds the MXU's 128-lane tiling; the
    256-channel trunk maps to exactly two lane registers),
  * bfloat16 compute with float32 params and float32 batch-norm math,
  * the hourglass encoder-decoder is written as an *iterative* loop over
    levels (the reference recurses in Python; same dataflow, but an
    explicit loop keeps the traced graph flat and readable),
  * nearest-upsample + skip-add is a single fusable expression (see
    `ops/` for the Pallas fast path).

Structural parity (so checkpoints/param-counts line up with the
reference):
  * Bottleneck (expansion 2): BN-ReLU-conv1x1(planes) -> BN-ReLU-
    conv3x3(planes, depthwise if mobile) -> BN-ReLU-conv1x1(2*planes),
    plus identity or 1x1-conv shortcut (modules.py:6-47).
  * Hourglass: depth-4; per level 3 residual chains (+1 extra at the
    bottleneck); down = maxpool 2x2/2; up = nearest 2x; skip merge =
    sum or concat + grouped 1x1 (modules.py:50-99).
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from hourglass_pose_estimation_tpu.models.norm import BatchNorm

EXPANSION = 2


def _fused_upsample_add(x, up1):
    """Pallas fused nearest-upsample + skip-add (lazy import at module
    level would pull the TPU-only kernel into CPU test collection)."""
    from hourglass_pose_estimation_tpu.ops.pallas import upsample2x_add_pallas
    return upsample2x_add_pallas(x, up1)


def upsample2x_nearest(x: jax.Array) -> jax.Array:
    """Nearest-neighbour 2x spatial upsample, NHWC."""
    B, H, W, C = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (B, H, 2, W, 2, C))
    return x.reshape(B, 2 * H, 2 * W, C)


class Bottleneck(nn.Module):
    """Pre-activation residual bottleneck, expansion 2.

    Parity: `/root/reference/src/models/modules.py:6-47` (HGBottleneck).
    `mobile=True` makes the 3x3 depthwise (feature_group_count=planes).
    A 1x1-conv shortcut is added iff stride != 1 or C_in != 2*planes.
    """

    planes: int
    stride: int = 1
    mobile: bool = False
    dtype: Any = jnp.bfloat16
    bn_stat_samples: int = 0    # 0 = full-batch BN statistics (parity)
    bn_axis_name: str = None    # cross-shard BN stat sync (norm.py)
    bn_fast_variance: bool = True  # False = two-pass variance (norm.py)
    # run the whole block as ONE Pallas kernel (ops/pallas/bottleneck.py)
    # when BN uses running averages (train=False apply — eval, export,
    # serving, and the frozen-BN train step): the two intermediate conv
    # activations stay VMEM-resident. Identity-residual stride-1
    # non-mobile blocks only; others fall through to the standard path.
    fuse_block: bool = False
    # fuse only at spatial sizes >= this (tiny 4x4/8x8 grids pay more in
    # per-program overhead than they save in HBM traffic)
    fuse_min_hw: int = 16

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_in = x.shape[-1]
        c_out = self.planes * EXPANSION
        if (self.fuse_block and not train and not self.is_initializing()
                and self.stride == 1 and c_in == c_out and not self.mobile
                and min(x.shape[1], x.shape[2]) >= self.fuse_min_hw):
            from hourglass_pose_estimation_tpu.ops.pallas.bottleneck import (
                fused_bottleneck, params_from_variables)
            prm = params_from_variables(
                {'params': self.variables['params'],
                 'batch_stats': self.variables['batch_stats']},
                dtype=self.dtype)
            return fused_bottleneck(x.astype(self.dtype), prm,
                                    jax.default_backend() != 'tpu')
        norm = lambda name: BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=jnp.promote_types(jnp.float32, self.dtype),
            stat_samples=self.bn_stat_samples,
            axis_name=self.bn_axis_name,
            fast_variance=self.bn_fast_variance, name=name)
        conv = lambda feats, k, s, groups, name: nn.Conv(
            feats, (k, k), strides=(s, s), padding=[(k // 2, k // 2)] * 2,
            feature_group_count=groups, use_bias=True,
            dtype=self.dtype, param_dtype=jnp.float32, name=name)

        out = conv(self.planes, 1, 1, 1, 'conv1')(nn.relu(norm('bn1')(x)))
        groups = self.planes if self.mobile else 1
        out = conv(self.planes, 3, self.stride, groups, 'conv2')(nn.relu(norm('bn2')(out)))
        out = conv(c_out, 1, 1, 1, 'conv3')(nn.relu(norm('bn3')(out)))

        residual = x
        if self.stride != 1 or c_in != c_out:
            residual = conv(c_out, 1, self.stride, 1, 'downsample')(x)
        return out + residual.astype(out.dtype)


class ResidualChain(nn.Module):
    """`num_blocks` bottlenecks in sequence (ref `_make_residual`)."""

    planes: int
    num_blocks: int = 1
    mobile: bool = False
    dtype: Any = jnp.bfloat16
    bn_stat_samples: int = 0
    bn_axis_name: str = None
    bn_fast_variance: bool = True
    fuse_block: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(self.num_blocks):
            x = Bottleneck(self.planes, mobile=self.mobile, dtype=self.dtype,
                           bn_stat_samples=self.bn_stat_samples,
                           bn_axis_name=self.bn_axis_name,
                           bn_fast_variance=self.bn_fast_variance,
                           fuse_block=self.fuse_block,
                           name=f'block{i}')(x, train=train)
        return x


class Hourglass(nn.Module):
    """Depth-`depth` encoder-decoder at constant channel width.

    Parity: `/root/reference/src/models/modules.py:50-99`. The
    reference's recursion `_hour_glass_forward(n, x)` is unrolled into
    an encoder loop (collecting skip branches) + bottleneck + decoder
    loop. Naming maps level n to the reference's `hg[n-1][0..3]`.
    """

    planes: int
    depth: int = 4
    num_blocks: int = 1
    mobile: bool = False
    skip_mode: str = 'sum'
    dtype: Any = jnp.bfloat16
    # use the Pallas fused nearest-upsample+skip-add kernel for the
    # decoder merge (sum mode only; TPU backend only)
    fuse_upsample: bool = False
    # use the Pallas fused bottleneck for running-average-BN forwards
    fuse_block: bool = False
    bn_stat_samples: int = 0
    bn_axis_name: str = None
    bn_fast_variance: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert self.skip_mode in ('sum', 'concat')
        chain = lambda name: ResidualChain(
            self.planes, self.num_blocks, self.mobile, self.dtype,
            bn_stat_samples=self.bn_stat_samples,
            bn_axis_name=self.bn_axis_name,
            bn_fast_variance=self.bn_fast_variance,
            fuse_block=self.fuse_block, name=name)

        # Encoder: at each level n = depth..1, the skip branch hg[n-1][0]
        # sees the pre-pool features; the trunk is pooled then hg[n-1][1].
        skips = []
        for n in range(self.depth, 0, -1):
            skips.append(chain(f'up1_l{n}')(x, train=train))
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
            x = chain(f'low1_l{n}')(x, train=train)

        # Bottleneck extra chain: hg[0][3]
        x = chain('low2_l1')(x, train=train)

        # The reference shares ONE concat merge conv across all levels
        # (modules.py:59-61) — keep that for param-count parity.
        concat_conv = None
        if self.skip_mode == 'concat':
            concat_conv = nn.Conv(self.planes * EXPANSION, (1, 1),
                                  feature_group_count=2, use_bias=True,
                                  dtype=self.dtype, param_dtype=jnp.float32,
                                  name='concat_conv')

        # Decoder: low3 = hg[n-1][2], then nearest-2x upsample + merge.
        for n in range(1, self.depth + 1):
            x = chain(f'low3_l{n}')(x, train=train)
            up1 = skips.pop()
            if self.skip_mode == 'sum':
                if self.fuse_upsample:
                    x = _fused_upsample_add(x, up1)
                else:
                    x = up1 + upsample2x_nearest(x)
            else:
                x = concat_conv(
                    jnp.concatenate([up1, upsample2x_nearest(x)], axis=-1))
        return x
