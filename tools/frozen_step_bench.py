#!/usr/bin/env python
"""Measure the frozen-BN train step and eval forward, fused vs XLA.

Round-4 adjudication runs (VERDICT items 1/2): the flagship 8-stack
256x256 bf16 config, timed with the honest value-fetch protocol
(CLAUDE.md hazard 1: every loop is chained through data dependencies
and bounded by a host float() fetch).

Variants:
  * train-standard : batch-stat BN train step (the BENCH_r03 headline)
  * train-frozen   : TRAIN.freeze_bn_after_epoch step (running-average
                     BN; stats immutable) — XLA blocks
  * train-frozen-fused : same step with MODEL.fuse_block=True (Pallas
                     fused bottleneck forward + rematerialized backward)
  * eval / eval-fused  : the eval forward step (Evaluator inner loop)

Usage: python tools/frozen_step_bench.py [--iters 10] [--stacks 8]
       [--res 256] [--batch 64] [--which all|train|eval]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def build(stacks, res, batch, fuse_block):
    import jax
    import jax.numpy as jnp
    from hourglass_pose_estimation_tpu.models import HourglassNet
    from hourglass_pose_estimation_tpu.data import Synthetic, make_spec
    from hourglass_pose_estimation_tpu.runner.train_state import (
        make_optimizer, init_state)

    ds = Synthetic(True, num_samples=batch, inp_res=res, out_res=res // 4,
                   sigma=1, scale_factor=0.25, rot_factor=30)
    spec = make_spec(ds)
    model = HourglassNet(num_stacks=stacks, num_blocks=1, num_classes=16,
                         mobile=False, skip_mode='sum', dtype=jnp.bfloat16,
                         fuse_block=fuse_block)
    tx = make_optimizer(2.5e-3, [35, 45], 0.1, 100)
    state = init_state(model, jax.random.PRNGKey(0), (1, res, res, 3), tx)
    raw = ds.canvas_batch(list(range(batch)), canvas=res)
    raw = {k: jax.device_put(v) for k, v in raw.items()}
    return spec, state, raw


def time_train(step, state, raw, rng, iters, batch):
    """Returns (ms/step, img/s, final_state). The step donates its
    input state, so the caller must thread the returned state."""
    for _ in range(3):
        state, metrics = step(state, raw, rng)
    float(metrics['loss'])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step(state, raw, rng)
    loss = float(metrics['loss'])
    assert loss > 0, f'non-positive/NaN loss after timing: {loss}'
    dt = time.perf_counter() - t0
    return dt / iters * 1e3, batch * iters / dt, state


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('--iters', type=int, default=10)
    p.add_argument('--stacks', type=int, default=8)
    p.add_argument('--res', type=int, default=256)
    p.add_argument('--batch', type=int, default=64)
    p.add_argument('--which', default='all',
                   choices=['all', 'train', 'eval'])
    def positive_int(v):
        n = int(v)
        if n < 1:
            # the frozen variants normalize with running BN statistics
            # warmed by these steps; at the flax (0, 1) placeholders an
            # 8-stack bf16 forward overflows
            raise argparse.ArgumentTypeError('--warm-steps must be >= 1')
        return n
    p.add_argument('--warm-steps', type=positive_int, default=12)
    p.add_argument('--only', default='',
                   help='substring filter on variant names '
                        '(train AND eval variants)')
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np
    from hourglass_pose_estimation_tpu.runner.train_state import (
        make_train_step, make_eval_step)

    print(f'devices: {jax.devices()}')
    rng = jax.random.PRNGKey(1)
    B = args.batch

    rows = []
    if args.which in ('all', 'train'):
        rows += [('train-standard', False, False),
                 ('train-frozen', True, False),
                 ('train-frozen-fused', True, True)]
    if args.only:
        rows = [r for r in rows if args.only in r[0]]
    spec = state = raw = cur_fuse = None
    for name, freeze, fuse in rows:
        # fresh state per variant (the step donates its input)
        spec, state, raw = build(args.stacks, args.res, B, fuse)
        cur_fuse = fuse
        # warm the RUNNING BatchNorm statistics with standard steps first:
        # frozen-BN normalizes with them, and at init they are the flax
        # (0, 1) placeholders — an 8-stack bf16 forward overflows through
        # unnormalized feedback sums. Real use (Trainer) freezes only
        # after >=1 full epoch of standard training.
        warm = make_train_step(spec, device_pipeline=True)
        for i in range(args.warm_steps):
            state, wm = warm(state, raw, jax.random.fold_in(rng, i))
        assert np.isfinite(float(wm['loss'])), float(wm['loss'])
        step = make_train_step(spec, device_pipeline=True, freeze_bn=freeze)
        ms, img_s, state = time_train(step, state, raw, rng, args.iters, B)
        print(f'{name:22s} {ms:8.2f} ms/step  {img_s:8.1f} img/s')

    if args.which in ('all', 'eval'):
        eval_rows = [('eval', False), ('eval-fused', True)]
        if args.only:
            eval_rows = [r for r in eval_rows if args.only in r[0]]
        for name, fuse in eval_rows:
            if spec is None or cur_fuse != fuse:
                spec, state, raw = build(args.stacks, args.res, B, fuse)
                cur_fuse = fuse
                # freshly-built states carry the flax (0, 1) placeholder
                # running BN statistics, which the eval (running-average)
                # forward normalizes with — warm them with standard
                # steps exactly like the frozen train variants above
                warm = make_train_step(spec, device_pipeline=True)
                for i in range(args.warm_steps):
                    state, wm = warm(state, raw, jax.random.fold_in(rng, i))
                assert np.isfinite(float(wm['loss'])), float(wm['loss'])
            estep = make_eval_step(spec, device_pipeline=True)
            valid = jnp.ones((B,), jnp.float32)
            for _ in range(3):
                metrics = estep(state, raw, valid)
            assert np.isfinite(float(metrics['loss']))
            # chain through a fresh fetch each iter: eval step has no
            # state to thread, so re-feed the (device-resident) raw and
            # fetch the loss every call — per-call RTT is ~26 ms, so
            # report the differential of 2N vs N fetch-bounded loops.
            def loop(n):
                t0 = time.perf_counter()
                for _ in range(n):
                    metrics = estep(state, raw, valid)
                    float(metrics['loss'])
                return time.perf_counter() - t0
            n = args.iters
            t1, t2 = loop(n), loop(2 * n)
            ms = (t2 - t1) / n * 1e3
            print(f'{name:22s} {ms:8.2f} ms/step  {B / ms * 1e3:8.1f} img/s '
                  f'(differential, fetch-bounded)')


if __name__ == '__main__':
    main()
