"""Pipeline parallelism (parallel/pipeline.py): parity + training.

Oracle: the sequential program — stem then stacks applied in order on
one device with identical params. The pipelined schedule (shard_map +
ppermute over a ('data','pipe') mesh, microbatched) must reproduce its
loss and gradients exactly in train=False (running-stat BN) mode.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hourglass_pose_estimation_tpu.models.hourglass import (
    HourglassNet, HourglassStem, HourglassStack)
from hourglass_pose_estimation_tpu.parallel.pipeline import (
    PipelineState, init_pipeline, make_pipeline_train_step,
    pipeline_specs, shard_pipeline_state, split_hourglass_variables)
from hourglass_pose_estimation_tpu.runner.train_state import make_optimizer
from hourglass_pose_estimation_tpu.loss import heatmap_mse_loss
from jax.sharding import Mesh


S, J, B, RES, M = 4, 4, 8, 64, 2
FEATS = 64


def _mesh():
    devs = np.asarray(jax.devices()[:8]).reshape(2, 4)
    return Mesh(devs, ('data', 'pipe'))


def _modules():
    stem = HourglassStem(num_feats=FEATS, dtype=jnp.float32)
    stack = HourglassStack(num_feats=FEATS, num_blocks=1, num_classes=J,
                           dtype=jnp.float32)
    return stem, stack


def _batch(key):
    k1, k2, k3 = jax.random.split(key, 3)
    images = jax.random.normal(k1, (B, RES, RES, 3), jnp.float32)
    target = jax.nn.sigmoid(
        jax.random.normal(k2, (B, RES // 4, RES // 4, J), jnp.float32))
    tw = (jax.random.uniform(k3, (B, J)) > 0.2).astype(jnp.float32)
    return images, target, tw


def _sequential_loss(stem, stack, state, images, target, tw):
    def loss_fn(stem_params, stacked_params):
        x = stem.apply({'params': stem_params,
                        'batch_stats': state.stem_stats},
                       images, train=False)
        scores = []
        for i in range(S):
            pv = jax.tree.map(lambda a: a[i], stacked_params)
            sv = jax.tree.map(lambda a: a[i], state.stacked_stats)
            score, x = stack.apply({'params': pv, 'batch_stats': sv},
                                   x, train=False)
            scores.append(score)
        return heatmap_mse_loss(jnp.stack(scores), target, tw)
    return loss_fn


def test_pipeline_matches_sequential_loss_and_grads():
    stem, stack = _modules()
    tx = make_optimizer(2.5e-3, [35], 0.1, 100, flat=False)
    state = init_pipeline(stem, stack, jax.random.PRNGKey(0), S, tx,
                          inp_res=RES)
    images, target, tw = _batch(jax.random.PRNGKey(1))

    loss_fn = _sequential_loss(stem, stack, state, images, target, tw)
    ref_loss, (ref_gs, ref_gk) = jax.value_and_grad(
        loss_fn, argnums=(0, 1))(state.stem_params, state.stacked_params)

    mesh = _mesh()
    step = make_pipeline_train_step(stem, stack, mesh,
                                    num_microbatches=M, train=False,
                                    update=False)
    sstate = shard_pipeline_state(state, mesh)
    _, metrics = step(sstate, images, target, tw)

    np.testing.assert_allclose(float(metrics['loss']), float(ref_loss),
                               rtol=1e-5)
    def close(a, b):
        # f32 accumulation order differs (microbatch means, per-batch
        # conv algorithms), and near-zero entries of large-scale leaves
        # see catastrophic cancellation — so compare with an absolute
        # tolerance scaled to each leaf's magnitude.
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), 1.0)
        np.testing.assert_allclose(a, b, rtol=5e-3, atol=1e-3 * scale)

    for ref, got in ((ref_gs, metrics['g_stem']),
                     (ref_gk, metrics['g_stack'])):
        jax.tree.map(close, ref, got)


def test_pipeline_train_mode_grads_match_sequential_f64():
    """STRICT schedule invariant (the driver's multichip gate, promoted
    here so it cannot rot unwatched): in train mode (per-microbatch BN
    statistics) the pipelined loss and EVERY grad must equal a
    sequential oracle that sees the identical microbatch slices.

    Runs in float64 on a depth-2 stack: in f32 the comparison is
    ill-conditioned, not the schedule — grads of scale ~1e-3 flowing
    backward through 2-sample-microbatch BN amplify f32 roundoff to
    1e-2..1e-1 relative (even between two orderings of the SAME
    sequential program), while the identical f64 program agrees to
    ~1e-12. f64 removes the conditioning noise so a <=1e-9 tolerance
    pins the schedule itself.
    """
    dp2, pp = 2, 4
    jax.config.update('jax_enable_x64', True)
    try:
        f64 = lambda t: jax.tree.map(lambda a: a.astype(jnp.float64), t)
        stem = HourglassStem(num_feats=FEATS, dtype=jnp.float64,
                             bn_fast_variance=False)
        stack = HourglassStack(num_feats=FEATS, num_blocks=1,
                               num_classes=J, depth=2,
                               dtype=jnp.float64, out_dtype=jnp.float64,
                               bn_fast_variance=False)
        tx = make_optimizer(2.5e-3, [35], 0.1, 100, flat=False)
        state = init_pipeline(stem, stack, jax.random.PRNGKey(0), S, tx,
                              inp_res=RES)
        state = state.replace(
            stem_params=f64(state.stem_params),
            stem_stats=f64(state.stem_stats),
            stacked_params=f64(state.stacked_params),
            stacked_stats=f64(state.stacked_stats))
        images, target, tw = map(f64, _batch(jax.random.PRNGKey(1)))
        # scale inputs so the feedback-accumulating stacks keep the
        # losses O(1) (raw N(0,1) pushes them to O(1e5))
        images = 0.05 * images

        def loss_fn(stem_params, stacked_params):
            # sequential oracle, microbatched exactly like the
            # pipeline: per 'data' shard, M equal microbatches, BN
            # normalizing each microbatch by its own statistics
            shard = B // dp2
            mb = shard // M
            shard_losses = []
            for d in range(dp2):
                losses = []
                for m in range(M):
                    sl = slice(d * shard + m * mb,
                               d * shard + (m + 1) * mb)
                    x, _ = stem.apply(
                        {'params': stem_params,
                         'batch_stats': state.stem_stats},
                        images[sl], train=True, mutable=['batch_stats'])
                    scores = []
                    for i in range(S):
                        pv = jax.tree.map(lambda a: a[i], stacked_params)
                        sv = jax.tree.map(lambda a: a[i],
                                          state.stacked_stats)
                        (score, x), _ = stack.apply(
                            {'params': pv, 'batch_stats': sv},
                            x, train=True, mutable=['batch_stats'])
                        scores.append(score)
                    losses.append(heatmap_mse_loss(
                        jnp.stack(scores), target[sl], tw[sl]))
                shard_losses.append(sum(losses) / M)
            return sum(shard_losses) / dp2

        ref_loss, (ref_gs, ref_gk) = jax.value_and_grad(
            loss_fn, argnums=(0, 1))(state.stem_params,
                                     state.stacked_params)

        mesh = _mesh()
        step = make_pipeline_train_step(stem, stack, mesh,
                                        num_microbatches=M, train=True,
                                        update=False)
        sstate = shard_pipeline_state(state, mesh)
        _, metrics = step(sstate, images, target, tw)

        assert abs(float(metrics['loss']) - float(ref_loss)) <= (
            1e-9 * max(abs(float(ref_loss)), 1.0))
        for ref, got in ((ref_gs, metrics['g_stem']),
                         (ref_gk, metrics['g_stack'])):
            for ra, ga in zip(jax.tree.leaves(ref), jax.tree.leaves(got)):
                ra, ga = np.asarray(ra), np.asarray(ga)
                scale = max(float(np.abs(ra).max()), 1e-3)
                rel = float(np.abs(ra - ga).max()) / scale
                assert rel <= 1e-9, f'grad mismatch: rel err {rel:.2e}'
    finally:
        jax.config.update('jax_enable_x64', False)


def test_pipeline_train_step_updates_params_and_stats():
    stem, stack = _modules()
    tx = make_optimizer(2.5e-3, [35], 0.1, 100, flat=False)
    state = init_pipeline(stem, stack, jax.random.PRNGKey(0), S, tx,
                          inp_res=RES)
    images, target, tw = _batch(jax.random.PRNGKey(2))

    mesh = _mesh()
    step = make_pipeline_train_step(stem, stack, mesh,
                                    num_microbatches=M, train=True)
    sstate = shard_pipeline_state(state, mesh)
    p_before = jax.tree.map(np.asarray, jax.device_get(sstate.stem_params))
    st_before = jax.tree.map(np.asarray,
                             jax.device_get(sstate.stacked_stats))
    new_state, metrics = step(sstate, images, target, tw)

    assert np.isfinite(float(metrics['loss']))
    assert int(new_state.step) == 1
    d = jax.tree.map(lambda a, b: float(np.abs(np.asarray(a) - b).max()),
                     jax.device_get(new_state.stem_params), p_before)
    assert max(jax.tree.leaves(d)) > 0
    ds = jax.tree.map(lambda a, b: float(np.abs(np.asarray(a) - b).max()),
                      jax.device_get(new_state.stacked_stats), st_before)
    assert max(jax.tree.leaves(ds)) > 0
    # two more chained steps: loss must stay finite and state flows
    for _ in range(2):
        new_state, metrics = step(new_state, images, target, tw)
    assert np.isfinite(float(metrics['loss']))


def test_split_hourglass_variables_roundtrip_forward():
    """HourglassNet ckpt -> (stem, stacked) reproduces its forward."""
    net = HourglassNet(num_stacks=2, num_blocks=1, num_classes=J,
                       num_feats=FEATS, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(3), (2, RES, RES, 3))
    variables = net.init(jax.random.PRNGKey(4), x, train=False)
    ref = net.apply(variables, x, train=False)

    stem_v, stacked_v = split_hourglass_variables(variables, 2)
    stem, stack = _modules()
    h = stem.apply(stem_v, x, train=False)
    outs = []
    for i in range(2):
        v = {'params': jax.tree.map(lambda a: a[i], stacked_v['params']),
             'batch_stats': jax.tree.map(lambda a: a[i],
                                         stacked_v['batch_stats'])}
        score, h = stack.apply(v, h, train=False)
        outs.append(score)
    got = jnp.stack(outs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_trainer_pipeline_parallel_mode(tmp_path):
    """Trainer end-to-end under TRAIN.pipeline_parallel=4: trains,
    evaluates (merged view), snapshots in the standard layout, and
    resumes back into the pipeline layout."""
    import os
    from hourglass_pose_estimation_tpu.config import load_config
    from hourglass_pose_estimation_tpu.runner import Trainer

    def cfg(**extra):
        raw = {
            'DATASET': {'name': 'synthetic', 'inp_res': 64, 'out_res': 16,
                        'sigma': 1, 'scale_factor': 0.25, 'rot_factor': 30,
                        'num_samples': 16},
            'MODEL': {'arch': 'hg', 'num_stacks': 4},
            'TRAIN': {'epochs': 1, 'train_batch': 8, 'val_batch': 8,
                      'precision': 'f32', 'learning_rate': 2.5e-3,
                      'pipeline_parallel': 4, 'microbatches': 2},
            'COMMON': {'checkpoint_dir': str(tmp_path), 'snapshot': 1,
                       'seed': 0},
        }
        for k, v in extra.items():
            raw.setdefault(k, {}).update(v)
        return load_config(raw=raw)

    trainer = Trainer(cfg(), verbose=False)
    assert dict(trainer.mesh.shape) == {'data': 2, 'pipe': 4}
    best = trainer.train()
    assert np.isfinite(best)
    ckpt = os.path.join(str(tmp_path), 'ckpts', 'checkpoint_1')
    assert os.path.isdir(ckpt)

    # the snapshot is standard-layout: a NON-pipeline Trainer resumes it
    t_std = Trainer(cfg(TRAIN={'pipeline_parallel': 1},
                        COMMON={'resume': ckpt}), verbose=False)
    assert t_std.start_epoch == 1

    # and the pipeline Trainer resumes it back into pipeline layout
    t_pp = Trainer(cfg(COMMON={'resume': ckpt}), verbose=False)
    assert t_pp.start_epoch == 1
    for a, b in zip(jax.tree.leaves(t_pp.state.stacked_params),
                    jax.tree.leaves(trainer.state.stacked_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
