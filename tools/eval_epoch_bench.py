#!/usr/bin/env python
"""End-to-end Evaluator.evaluate throughput at the flagship config.

VERDICT round-3 item 7: the reference's `_evaluate` loop
(/root/reference/src/runner/trainer.py:110-144) is half of every epoch's
wall clock; this measures its TPU replacement end to end — host canvas
assembly + H2D + jitted eval-mode augment + forward + device-side
metric accumulation + the single host fetch in `Evaluator.evaluate`.

The first pass warms compiles AND the host canvas buffers (CLAUDE.md
hazard 8: first-touch page faults make cold host numbers garbage);
the timed passes follow. `evaluate` itself ends in a host value fetch,
so the timing is honestly bounded.

Usage: python tools/eval_epoch_bench.py [--samples 256] [--batch 64]
       [--stacks 8] [--res 256]   (runs fuse_block False AND True)
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('--samples', type=int, default=256)
    p.add_argument('--batch', type=int, default=64)
    p.add_argument('--stacks', type=int, default=8)
    p.add_argument('--res', type=int, default=256)
    p.add_argument('--reps', type=int, default=3)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from hourglass_pose_estimation_tpu.config import load_config
    from hourglass_pose_estimation_tpu.runner.evaluator import Evaluator
    from hourglass_pose_estimation_tpu.runner.train_state import (
        make_optimizer, init_state)
    from hourglass_pose_estimation_tpu.models import HourglassNet

    print(f'devices: {jax.devices()}')
    cfg = load_config('configs/train_synthetic_tiny.yaml', overrides=[
        f'DATASET.inp_res={args.res}', f'DATASET.out_res={args.res // 4}',
        f'DATASET.num_samples={args.samples}',
        f'MODEL.num_stacks={args.stacks}',
        f'TRAIN.val_batch={args.batch}'])

    for fuse in (False, True):
        model = HourglassNet(num_stacks=args.stacks, num_blocks=1,
                             num_classes=16, dtype=jnp.bfloat16,
                             fuse_block=fuse)
        tx = make_optimizer(2.5e-3, [35, 45], 0.1, 100)
        state = init_state(model, jax.random.PRNGKey(0),
                           (1, args.res, args.res, 3), tx)
        ev = Evaluator(cfg, verbose=False)
        ev.evaluate(state)                       # warm: compile + buffers
        best = float('inf')
        for _ in range(args.reps):
            t0 = time.perf_counter()
            ev.evaluate(state)
            best = min(best, time.perf_counter() - t0)
        n = args.samples
        print(f'eval-epoch fuse_block={fuse!s:5} {n} imgs in {best:6.3f} s '
              f'-> {n / best:8.1f} img/s end-to-end')


if __name__ == '__main__':
    main()
