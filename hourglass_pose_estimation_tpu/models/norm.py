"""BatchNorm with optional sampled batch statistics (ghost-stat BN).

Drop-in for `flax.linen.BatchNorm` (same param / batch_stats layout:
params {scale, bias}, batch_stats {mean, var}, fast-variance single
pass) with one extension: `stat_samples=k` computes the train-mode
batch statistics from only the first k samples of the batch while
normalizing (and training on) the full batch.

Why: on TPU the BN statistic reductions are pure HBM reads that XLA
cannot fuse into the producing convolutions — they were ~34 ms of the
221 ms 8-stack train step (BENCH_NOTES round 1). Sampling k of B
samples cuts that traffic by B/k. Statistically this is the well-known
ghost-batch-norm estimator (smaller-sample statistics; if anything a
mild regularizer); `stat_samples=0` (default) is exact full-batch
parity. The running averages always update from the same (sampled)
statistics that normalized the batch.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn


class BatchNorm(nn.Module):
    use_running_average: Optional[bool] = None
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Any = None
    stat_samples: int = 0      # 0 = full batch (flax parity)
    # Cross-device statistic sync (flax nn.BatchNorm's axis_name): when
    # set, train-mode batch mean and E[x^2] are pmean'd over that mesh
    # axis BEFORE the variance is formed, giving exact global-batch
    # statistics (pmean of per-shard variances would drop the variance
    # of the shard means). Train-mode apply then requires the axis to
    # be bound (shard_map/pmap); eval mode never emits the collective.
    axis_name: Optional[str] = None
    # fast_variance=True (default, flax use_fast_variance parity):
    # var = E[x^2] - E[x]^2 in ONE pass over HBM. That formula is
    # catastrophically cancelling when |mean| >> std — measured in the
    # pipeline dryrun at the hourglass's 1x1 bottom levels with
    # 2-sample microbatch statistics (f32 parity error 1e-2 -> 1e-6
    # with the two-pass form). False = two-pass E[(x-mean)^2]; used by
    # numerical-parity checks; incompatible with axis_name sync.
    fast_variance: bool = True

    @nn.compact
    def __call__(self, x, use_running_average: Optional[bool] = None):
        use_ra = (self.use_running_average
                  if use_running_average is None else use_running_average)
        assert use_ra is not None, 'use_running_average must be given'
        C = x.shape[-1]
        scale = self.param('scale', nn.initializers.ones, (C,), jnp.float32)
        bias = self.param('bias', nn.initializers.zeros, (C,), jnp.float32)
        ra_mean = self.variable('batch_stats', 'mean',
                                lambda: jnp.zeros((C,), jnp.float32))
        ra_var = self.variable('batch_stats', 'var',
                               lambda: jnp.ones((C,), jnp.float32))

        # statistics in >= f32: f32 for bf16/f32 activations (TPU path),
        # f64 when the caller runs a float64 numerical-parity check
        sdt = jnp.promote_types(jnp.float32, x.dtype)
        if use_ra:
            mean, var = ra_mean.value, ra_var.value
        else:
            xs = x
            k = self.stat_samples
            if k and 0 < k < x.shape[0]:
                xs = x[:k]
            xf = xs.astype(sdt)
            axes = tuple(range(xf.ndim - 1))
            mean = jnp.mean(xf, axis=axes)
            if not self.fast_variance:
                assert self.axis_name is None, (
                    'fast_variance=False is a single-shard numerical-'
                    'parity mode; axis_name sync needs the one-pass form')
                var = jnp.mean(jnp.square(xf - mean), axis=axes)
            else:
                # fast variance: E[x^2] - E[x]^2 (flax use_fast_variance)
                mean2 = jnp.mean(jnp.square(xf), axis=axes)
                if (self.axis_name is not None
                        and not self.is_initializing()):
                    mean = jax.lax.pmean(mean, self.axis_name)
                    mean2 = jax.lax.pmean(mean2, self.axis_name)
                var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1.0 - m) * mean
                ra_var.value = m * ra_var.value + (1.0 - m) * var

        mul = scale.astype(sdt) * jax.lax.rsqrt(var.astype(sdt) + self.epsilon)
        y = (x.astype(sdt) - mean) * mul + bias
        dtype = self.dtype or x.dtype
        return y.astype(dtype)
