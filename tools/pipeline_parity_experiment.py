#!/usr/bin/env python
"""Pipeline-equivalence experiment: device vs host (cv2) input pipeline.

The strongest accuracy-parity evidence obtainable without real MPII
images (none exist in this container): train the SAME tiny config —
synthetic data, 64^2, 1-stack, fixed seeds — once per input pipeline

  * device/crop   on-device warp from crop-aware canvases
  * device/image  on-device warp from whole-image canvases
  * host          exact reference cv2 augmentation on the host
                  (`/root/reference/src/datasets/common.py:99-164`)

then evaluate EVERY trained model under BOTH eval pipelines (device
center-crop and host cv2 crop). If the pipelines are equivalent, the
train-mode x eval-mode matrix is flat: same converged val loss / PCK
regardless of which pipeline trained the model and which evaluated it
(cross-cell degradation would mean a train/serve distribution shift).

Run on CPU (forced below): deterministic, no TPU contention.
Results recorded in PARITY.md; the gated test
tests/test_pipeline_equivalence.py runs a shortened version.

Usage: python tools/pipeline_parity_experiment.py [--epochs 30]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np


def build_common(args):
    import jax.numpy as jnp
    from hourglass_pose_estimation_tpu.models import HourglassNet
    from hourglass_pose_estimation_tpu.data import Synthetic, make_spec
    ds_kw = dict(num_samples=args.samples, inp_res=64, out_res=16,
                 sigma=2, scale_factor=0.25, rot_factor=30)
    train_ds = Synthetic(True, **ds_kw)
    val_ds = Synthetic(False, **ds_kw)
    spec = make_spec(train_ds)
    model = HourglassNet(num_stacks=1, num_blocks=1, num_classes=16,
                         dtype=jnp.float32)
    return train_ds, val_ds, spec, model


def train_one(mode, args, train_ds, spec, model):
    """mode: 'device/crop' | 'device/image' | 'host'."""
    import jax
    from hourglass_pose_estimation_tpu.data import Loader
    from hourglass_pose_estimation_tpu.data.pipeline import prepare_host_batch
    from hourglass_pose_estimation_tpu.runner.train_state import (
        make_optimizer, init_state, make_train_step)

    loader = Loader(train_ds, args.batch, shuffle=True, seed=0,
                    drop_last=True)
    steps_per_epoch = len(loader)
    tx = make_optimizer(2.5e-3, args.schedule, 0.1, steps_per_epoch)
    state = init_state(model, jax.random.PRNGKey(0), (1, 64, 64, 3), tx)
    device = mode.startswith('device')
    crop = mode.endswith('crop')
    step = make_train_step(spec, device_pipeline=device)

    rng = jax.random.PRNGKey(1)
    for epoch in range(args.epochs):
        rng, sub = jax.random.split(rng)
        host_rng = np.random.RandomState(1000003 * epoch + 17)
        for idx, _ in loader.epoch_indices():
            if device:
                raw = train_ds.canvas_batch(idx, canvas=64, crop_aware=crop)
            else:
                raw = prepare_host_batch(
                    train_ds.host_batch(idx, host_rng, train=True), spec)
            state, m = step(state, raw, sub)
    return state, float(m['loss'])


def eval_one(state, eval_mode, args, val_ds, spec):
    import jax
    import jax.numpy as jnp
    from hourglass_pose_estimation_tpu.data import Loader
    from hourglass_pose_estimation_tpu.data.pipeline import prepare_host_batch
    from hourglass_pose_estimation_tpu.runner.train_state import make_eval_step

    device = eval_mode == 'device'
    estep = make_eval_step(spec, device_pipeline=device)
    loader = Loader(val_ds, args.batch, shuffle=False, seed=0,
                    drop_last=False)
    rows = []
    rng = np.random.RandomState(0)
    for idx, valid in loader.epoch_indices():
        if device:
            raw = val_ds.canvas_batch(idx, canvas=64, crop_aware=True)
        else:
            raw = prepare_host_batch(
                val_ds.host_batch(idx, rng, train=False), spec)
        m = estep(state, raw, jnp.asarray(valid))
        rows.append([float(m['loss']), float(m['acc']), float(m['n'])])
    rows = np.asarray(rows)
    n = rows[:, 2]
    return (float((rows[:, 0] * n).sum() / n.sum()),
            float((rows[:, 1] * n).sum() / n.sum()))


def run(args):
    import jax
    jax.config.update('jax_platforms', 'cpu')
    jax.config.update('jax_num_cpu_devices', 1)

    train_ds, val_ds, spec, model = build_common(args)
    results = {}
    for mode in args.modes:
        t0 = time.time()
        state, train_loss = train_one(mode, args, train_ds, spec, model)
        row = {}
        for eval_mode in ('device', 'host'):
            row[eval_mode] = eval_one(state, eval_mode, args, val_ds, spec)
        results[mode] = row
        print(f'train={mode:13s} final_train_loss={train_loss:.5f} '
              f'[{time.time() - t0:.0f}s]')
        for eval_mode, (l, a) in row.items():
            print(f'    eval={eval_mode:7s} val_loss={l:.5f} pck={a:.4f}')
    return results


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('--epochs', type=int, default=30)
    p.add_argument('--samples', type=int, default=48)
    p.add_argument('--batch', type=int, default=8)
    p.add_argument('--schedule', type=int, nargs='*', default=[20, 26])
    p.add_argument('--modes', nargs='*',
                   default=['device/crop', 'device/image', 'host'])
    args = p.parse_args(argv)
    run(args)
    return 0


if __name__ == '__main__':
    sys.exit(main())
