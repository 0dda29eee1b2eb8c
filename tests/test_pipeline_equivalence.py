"""End-to-end pipeline-equivalence test (VERDICT round-2 item 2).

Shortened in-suite version of `tools/pipeline_parity_experiment.py`
(whose full 30-epoch results are recorded in PARITY.md): train the same
tiny config under the device (whole-image canvas) and host (reference
cv2) input pipelines, cross-evaluate both models under both eval
pipelines, and assert they converge to the same accuracy.

Gated behind HPE_SLOW_TESTS=1 (two ~12-epoch training runs are several
minutes on the 1-core CPU host).
"""

import argparse
import os

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get('HPE_SLOW_TESTS'),
    reason='two multi-epoch training runs: minutes on the 1-core host; '
           'set HPE_SLOW_TESTS=1')


def test_device_and_host_pipelines_converge_alike():
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..',
                                    'tools'))
    from pipeline_parity_experiment import (build_common, train_one,
                                            eval_one)

    args = argparse.Namespace(epochs=12, samples=48, batch=8,
                              schedule=[9, 11])
    train_ds, val_ds, spec, model = build_common(args)

    results = {}
    for mode in ('device/image', 'host'):
        state, _ = train_one(mode, args, train_ds, spec, model)
        results[mode] = {ev: eval_one(state, ev, args, val_ds, spec)
                         for ev in ('device', 'host')}

    # 1) the two training pipelines converge to the same val loss
    dev_loss = results['device/image']['device'][0]
    host_loss = results['host']['host'][0]
    assert abs(dev_loss - host_loss) <= 0.15 * max(dev_loss, host_loss), \
        results
    # 2) no train/serve shift: each model scores the same under either
    #    eval pipeline
    for mode, row in results.items():
        l_dev, a_dev = row['device']
        l_host, a_host = row['host']
        assert abs(l_dev - l_host) <= 0.10 * max(l_dev, l_host), (mode, row)
        assert abs(a_dev - a_host) <= 0.05, (mode, row)
    # 3) PCK parity between the pipelines (loose: PCK is the noisier
    #    statistic at this budget)
    a_dev = results['device/image']['device'][1]
    a_host = results['host']['host'][1]
    assert abs(a_dev - a_host) <= 0.06, results


def test_overfit_reaches_grid_limit_localization():
    """The full stack localizes to the heatmap grid limit: overfitting
    16 samples drives the median prediction-to-target argmax distance
    to ~0 heatmap px (PCK@0.5 at out_res=16 demands EXACT argmax, so
    raw distances are the meaningful convergence signal — see
    PARITY.md). 100 epochs ~3 min on the 1-core host."""
    import jax
    import jax.numpy as jnp
    from hourglass_pose_estimation_tpu.data import (Synthetic, make_spec,
                                                    Loader)
    from hourglass_pose_estimation_tpu.data.pipeline import augment_batch
    from hourglass_pose_estimation_tpu.models import HourglassNet
    from hourglass_pose_estimation_tpu.runner.train_state import (
        make_optimizer, init_state, make_train_step)
    from hourglass_pose_estimation_tpu.utils.evaluation import get_preds

    N = 16
    ds = Synthetic(True, num_samples=N, inp_res=64, out_res=16, sigma=2,
                   scale_factor=0.0, rot_factor=0.0)
    spec = make_spec(ds)
    model = HourglassNet(num_stacks=1, num_blocks=1, num_classes=16,
                         dtype=jnp.float32)
    tx = make_optimizer(2.5e-3, [80], 0.1, 2)
    state = init_state(model, jax.random.PRNGKey(0), (1, 64, 64, 3), tx)
    step = make_train_step(spec, device_pipeline=True)
    loader = Loader(ds, 8, shuffle=True, seed=0)
    rng = jax.random.PRNGKey(1)
    for epoch in range(100):
        rng, sub = jax.random.split(rng)
        for idx, _ in loader.epoch_indices():
            state, m = step(state, ds.canvas_batch(idx, canvas=64), sub)

    raw = ds.canvas_batch(list(range(N)), canvas=64)
    data = augment_batch(raw, jax.random.PRNGKey(0), spec, False)
    outs = state.apply_fn(
        {'params': state.params, 'batch_stats': state.batch_stats},
        data['image'], train=False)
    pred, _ = get_preds(outs[-1])
    gt, _ = get_preds(data['target'])
    tw = np.asarray(data['target_weight'])
    d = np.linalg.norm(np.asarray(pred) - np.asarray(gt), axis=-1)[tw > 0]
    # distances are lattice-discrete (0, 1, 1.41, 2, ...): at 100
    # epochs the 200-epoch reference run sat at median 1.0 with 90%
    # under 1.6 px (PARITY.md); bounds leave one lattice step of slack
    assert np.median(d) <= 1.45, np.median(d)
    assert np.mean(d < 1.6) >= 0.8, np.mean(d < 1.6)
