"""Explicit shard_map+psum data parallelism vs the implicit jit path."""

import numpy as np
import jax
import jax.numpy as jnp

from hourglass_pose_estimation_tpu.parallel import (
    make_mesh, batch_sharding, replicated_sharding)
from hourglass_pose_estimation_tpu.parallel.shard_map_step import (
    make_shard_map_train_step)
from hourglass_pose_estimation_tpu.runner.train_state import (
    make_optimizer, init_state, make_train_step)
from hourglass_pose_estimation_tpu.models import HourglassNet
from hourglass_pose_estimation_tpu.data import Synthetic, make_spec


def _setup():
    ds = Synthetic(True, num_samples=16, inp_res=64, out_res=16,
                   sigma=1, scale_factor=0.25, rot_factor=30)
    spec = make_spec(ds)
    model = HourglassNet(num_stacks=1, num_blocks=1, num_classes=16,
                         dtype=jnp.float32)
    tx = make_optimizer(2.5e-3, [], 0.1, 4)
    state = init_state(model, jax.random.PRNGKey(0), (1, 64, 64, 3), tx)
    raw = ds.canvas_batch(list(range(16)), canvas=64)
    return spec, state, raw


def test_shard_map_step_runs_and_learns():
    spec, state, raw = _setup()
    mesh = make_mesh(8, 1)
    step = make_shard_map_train_step(spec, mesh, sync_bn=True)
    state = jax.device_put(state, replicated_sharding(mesh))
    raw = {k: jax.device_put(v, batch_sharding(mesh)) for k, v in raw.items()}
    losses = []
    for i in range(6):
        state, m = step(state, raw, jax.random.PRNGKey(5))
        losses.append(float(m['loss']))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    assert int(jax.device_get(state.step)) == 6


def test_per_replica_bn_differs_from_sync():
    """sync_bn=False (DataParallel semantics) must produce different
    batch statistics than sync_bn=True on heterogeneous shards."""
    spec, state, raw = _setup()
    mesh = make_mesh(8, 1)
    rep = replicated_sharding(mesh)
    bsh = batch_sharding(mesh)
    raw = {k: jax.device_put(v, bsh) for k, v in raw.items()}

    s_sync = jax.device_put(jax.tree.map(jnp.copy, state), rep)
    s_local = jax.device_put(jax.tree.map(jnp.copy, state), rep)
    step_sync = make_shard_map_train_step(spec, mesh, sync_bn=True)
    step_local = make_shard_map_train_step(spec, mesh, sync_bn=False)
    s_sync, _ = step_sync(s_sync, raw, jax.random.PRNGKey(1))
    s_local, _ = step_local(s_local, raw, jax.random.PRNGKey(1))

    diffs = [float(np.abs(np.asarray(a) - np.asarray(b)).max())
             for a, b in zip(jax.tree.leaves(s_sync.batch_stats),
                             jax.tree.leaves(s_local.batch_stats))]
    assert max(diffs) > 1e-6, 'per-replica stats should differ from synced'


def test_bn_axis_name_matches_global_batch_stats():
    """A model built with bn_axis_name='data' and applied under
    shard_map over a heterogeneous sharded batch must produce the SAME
    train-mode outputs and running statistics as the plain model on the
    full batch — i.e. the in-forward pmean of (mean, E[x^2]) yields
    exact global-batch BatchNorm, not DataParallel's per-shard stats."""
    from jax.sharding import PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    mesh = make_mesh(8, 1)
    kw = dict(num_stacks=1, num_blocks=1, num_classes=16,
              dtype=jnp.float32)
    model_sync = HourglassNet(bn_axis_name='data', **kw)
    model_ref = HourglassNet(**kw)
    variables = model_ref.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 64, 64, 3)), train=False)

    # heterogeneous shards: per-sample scale so shard means differ (the
    # case where pmean-of-variance would be biased low)
    x = jax.random.uniform(jax.random.PRNGKey(1), (16, 64, 64, 3))
    x = x * (0.2 + jnp.arange(16.0)[:, None, None, None] / 8.0)

    def fwd(v, xs):
        outs, mut = model_sync.apply(v, xs, train=True,
                                     mutable=['batch_stats'])
        return outs, mut['batch_stats']

    fn = shard_map(fwd, mesh=mesh, in_specs=(P(), P('data')),
                   out_specs=(P(None, 'data'), P()), check_rep=False)
    outs_s, stats_s = jax.jit(fn)(variables, x)

    outs_r, mut_r = model_ref.apply(variables, x, train=True,
                                    mutable=['batch_stats'])
    np.testing.assert_allclose(np.asarray(outs_s), np.asarray(outs_r),
                               rtol=2e-4, atol=2e-4)
    for a, b in zip(jax.tree.leaves(stats_s),
                    jax.tree.leaves(mut_r['batch_stats'])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_shard_map_matches_implicit_path():
    """Same data, same rng handling -> loss close to the implicit jit
    path (identical math up to reduction order)."""
    spec, state, raw = _setup()
    mesh = make_mesh(8, 1)
    rep = replicated_sharding(mesh)
    bsh = batch_sharding(mesh)
    raw_d = {k: jax.device_put(v, bsh) for k, v in raw.items()}

    # explicit path with sync_bn: per-shard rng differs from the
    # implicit path's single-stream augmentation, so compare with
    # augmentation disabled (deterministic eval-mode pipeline).
    import dataclasses
    spec_noaug = spec._replace(scale_factor=0.0, rot_factor=0.0)

    s1 = jax.device_put(jax.tree.map(jnp.copy, state), rep)
    s2 = jax.device_put(jax.tree.map(jnp.copy, state), rep)
    step_imp = make_train_step(spec_noaug, device_pipeline=True)
    step_exp = make_shard_map_train_step(spec_noaug, mesh, sync_bn=True)

    # both flip based on prob<=0.5 per sample — rng streams differ, so
    # push rotation/scale to zero and compare only the loss magnitude
    s1, m1 = step_imp(s1, raw_d, jax.random.PRNGKey(3))
    s2, m2 = step_exp(s2, raw_d, jax.random.PRNGKey(3))
    l1, l2 = float(m1['loss']), float(m2['loss'])
    assert np.isfinite(l1) and np.isfinite(l2)
    # flips still differ per stream; losses agree loosely
    assert abs(l1 - l2) / max(l1, 1e-6) < 0.25, (l1, l2)
