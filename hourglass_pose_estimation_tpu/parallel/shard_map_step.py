"""Explicit-collectives data-parallel train step (shard_map + psum).

The jit+NamedSharding step (runner/train_state.py) expresses data
parallelism implicitly — the SPMD partitioner inserts the gradient
all-reduce. This module is the explicit formulation over the same
('data','model') mesh: each shard augments and steps its local batch,
gradients (and optionally batch-norm statistics) cross ICI via
`jax.lax.psum`, and every shard applies the identical optimizer update.

Why both exist:
  * the implicit path is the production default (works with tensor
    parallelism, simplest code);
  * the explicit path pins down semantics the implicit one can't
    choose: `sync_bn=False` reproduces torch DataParallel's silent
    per-replica BatchNorm statistics (the reference's actual training
    behavior, SURVEY.md §7 "hard parts"); `sync_bn=True` matches the
    implicit path's global-batch statistics — PROVIDED the model was
    built with `bn_axis_name='data'` (models/norm.py), which pmeans
    the batch mean and E[x^2] across shards inside the forward so the
    normalization (and gradients) see global statistics. The Trainer
    wires this automatically for TRAIN.explicit_collectives +
    TRAIN.sync_bn. The post-step running-stat pmean below is then a
    numeric no-op kept as an invariant; on a model built WITHOUT
    bn_axis_name it is the only sync and merely averages per-shard
    running stats (forward still normalizes per-shard — DataParallel
    semantics with merged running stats, NOT global-batch BN).
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from hourglass_pose_estimation_tpu.loss import heatmap_mse_loss
from hourglass_pose_estimation_tpu.utils.evaluation import (
    pck_counts, combine_pck_counts)
from hourglass_pose_estimation_tpu.data.pipeline import augment_batch
from hourglass_pose_estimation_tpu.runner.train_state import _select_subset


def make_shard_map_train_step(spec, mesh: Mesh, *, subset=None,
                              pck_thr: float = 0.5, sync_bn: bool = True):
    """Build a donated, jitted shard_map train step over mesh axis 'data'.

    Signature matches make_train_step: (state, raw_batch, rng) ->
    (state, metrics). Params/opt state replicated; batch sharded on its
    leading axis. Requires model_parallel == 1.
    """
    assert mesh.shape.get('model', 1) == 1, 'explicit path is dp-only'
    subset_t = tuple(subset) if subset is not None else None
    axis = 'data'

    def _local_step(state, batch, rng):
        # distinct augmentation stream per shard
        rng = jax.random.fold_in(rng, jax.lax.axis_index(axis))
        rng = jax.random.fold_in(rng, state.step)
        data = augment_batch(batch, rng, spec, True)
        target, tw = _select_subset(data['target'],
                                    data['target_weight'], subset_t)

        def loss_fn(params):
            outs, mutated = state.apply_fn(
                {'params': params, 'batch_stats': state.batch_stats},
                data['image'], train=True, mutable=['batch_stats'])
            return heatmap_mse_loss(outs, target, tw), (outs, mutated['batch_stats'])

        (loss, (outs, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)

        # the collectives: gradient (and loss) all-reduce over ICI
        grads = jax.lax.pmean(grads, axis)
        loss = jax.lax.pmean(loss, axis)
        if sync_bn:
            new_stats = jax.lax.pmean(new_stats, axis)
        # GLOBAL-batch PCK: psum the per-joint hit/valid counts before
        # combining — a pmean of per-shard averages weights joints and
        # shards differently whenever joint visibility is uneven,
        # diverging from the implicit path's single-batch accuracy
        hit, nv = pck_counts(outs[-1], target, thr=pck_thr)
        hit = jax.lax.psum(hit, axis)
        nv = jax.lax.psum(nv, axis)
        acc, _, _ = combine_pck_counts(hit, nv)

        updates, new_opt = state.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=new_params,
                                  batch_stats=new_stats, opt_state=new_opt)
        return new_state, {'loss': loss, 'acc': acc}

    def _wrapped(state, batch, rng):
        batch_specs = jax.tree.map(lambda _: P(axis), batch)
        fn = shard_map(
            _local_step, mesh=mesh,
            in_specs=(P(), batch_specs, P()),
            out_specs=(P(), P()),
            check_rep=False)
        return fn(state, batch, rng)

    return jax.jit(_wrapped, donate_argnums=(0,))
