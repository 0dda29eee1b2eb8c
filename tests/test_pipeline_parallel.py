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
