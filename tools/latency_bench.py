#!/usr/bin/env python
"""Single-image inference latency benchmark (BASELINE.md <5 ms target).

Measures the 8-stack (and 2-stack mobile) 256x256 single-frame forward
on the attached accelerator, with the deploy-surface optimizations
selectable: folded batch-norm constants, bf16 conv kernels, and the
keypoint decode fused into the same XLA program (the exported artifact
surface — frames in, keypoints out).

Timing discipline (CLAUDE.md): every sample is bounded by a host VALUE
fetch; the tunnel's round-trip floor is measured with a trivial 1-op
program and reported alongside, so device-side latency =
measured - rtt_floor. Do not run while another TPU process is live.

Usage: python tools/latency_bench.py [--stacks 8] [--iters 30]
       [--no-fold] [--no-bf16] [--decode quarter|dark|none]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np


def measure(fn, arg, iters):
    out = fn(arg)
    fetch = (lambda o: [np.asarray(x) for x in o]) \
        if isinstance(out, tuple) else (lambda o: np.asarray(o))
    fetch(out)                                   # compile + warm
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fetch(fn(arg))                           # value fetch bounds it
        ts.append(time.perf_counter() - t0)
    return np.asarray(ts) * 1000.0


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('--stacks', type=int, default=8)
    p.add_argument('--mobile', action='store_true')
    p.add_argument('--res', type=int, default=256)
    p.add_argument('--iters', type=int, default=30)
    p.add_argument('--decode', default='quarter',
                   choices=['quarter', 'dark', 'none'])
    p.add_argument('--no-fold', action='store_true')
    p.add_argument('--no-bf16', action='store_true')
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from hourglass_pose_estimation_tpu.models import HourglassNet
    from hourglass_pose_estimation_tpu.export import make_inference_fn

    # tunnel round-trip floor: a 1-op program, value-fetched
    one = jax.jit(lambda x: x + 1.0)
    rtt = measure(one, jnp.zeros((8,), jnp.float32), args.iters)
    rtt_ms = float(np.median(rtt))

    model = HourglassNet(num_stacks=args.stacks, num_blocks=1,
                         num_classes=16, mobile=args.mobile,
                         skip_mode='sum', dtype=jnp.bfloat16,
                         out_dtype=jnp.float32)
    x = jnp.zeros((1, args.res, args.res, 3), jnp.float32)
    # params/stats are resolution-independent: init at 64^2 to avoid
    # compiling a second full-res forward program just for init
    x0 = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x0, train=False)

    fn = jax.jit(make_inference_fn(
        model, variables,
        decode=None if args.decode == 'none' else args.decode,
        fold_bn=not args.no_fold,
        weights_dtype=None if args.no_bf16 else jnp.bfloat16))
    ts = measure(fn, x, args.iters)
    med = float(np.median(ts))
    name = f'{args.stacks}-stack{" mobile" if args.mobile else ""}'
    print(f'{name} {args.res}^2 decode={args.decode} '
          f'fold={not args.no_fold} bf16w={not args.no_bf16}: '
          f'median {med:.2f} ms raw | rtt floor {rtt_ms:.2f} ms | '
          f'device-side ~{med - rtt_ms:.2f} ms '
          f'(min {ts.min():.2f}, p90 {np.percentile(ts, 90):.2f})')
    return 0


if __name__ == '__main__':
    sys.exit(main())
