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


def measure_chain(fn, arg, chain, reps):
    """Median per-call latency over `reps` chains of `chain` calls.

    The tunnel round trip is ~26-45 ms and JITTERS by >15 ms run to run,
    so single-call-minus-RTT timing is garbage. Instead each rep runs
    `chain` calls serialized through a data dependency (the next input
    is perturbed by a scalar from the previous output) and pays ONE
    value fetch; the RTT amortizes to RTT/chain and its jitter with it.
    """
    import jax
    import jax.numpy as jnp

    def chained(x, salt):
        out = fn(x + salt * 1e-30)
        first = out[0] if isinstance(out, tuple) else out
        return out, first.ravel()[0].astype(jnp.float32)

    run = jax.jit(chained)
    out, salt = run(arg, jnp.float32(0))
    float(salt)                                  # compile + warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        salt = jnp.float32(0)
        for _ in range(chain):
            out, salt = run(arg, salt)
        float(salt)                              # one fetch bounds all
        ts.append((time.perf_counter() - t0) / chain)
    return np.asarray(ts) * 1000.0


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('--stacks', type=int, default=8)
    p.add_argument('--mobile', action='store_true')
    p.add_argument('--res', type=int, default=256)
    p.add_argument('--iters', type=int, default=10)
    p.add_argument('--chain', type=int, default=25)
    p.add_argument('--decode', default='quarter',
                   choices=['quarter', 'dark', 'none'])
    p.add_argument('--no-fold', action='store_true')
    p.add_argument('--no-bf16', action='store_true')
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from hourglass_pose_estimation_tpu.models import HourglassNet
    from hourglass_pose_estimation_tpu.export import make_inference_fn

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

    # residual per-call overhead floor measured the same chained way
    # with a trivial 1-op program (dispatch + amortized RTT)
    probe = jnp.zeros((16, 2), jnp.float32)
    rtt = measure_chain(lambda t: t + 1, probe, args.chain, args.iters)
    rtt_ms = float(np.median(rtt))

    ts = measure_chain(fn, x, args.chain, args.iters)
    med = float(np.median(ts))
    name = f'{args.stacks}-stack{" mobile" if args.mobile else ""}'
    print(f'{name} {args.res}^2 decode={args.decode} '
          f'fold={not args.no_fold} bf16w={not args.no_bf16}: '
          f'median {med:.2f} ms/call (chain={args.chain}) | '
          f'per-call floor {rtt_ms:.2f} ms | '
          f'device-side ~{med - rtt_ms:.2f} ms '
          f'(min {ts.min():.2f}, p90 {np.percentile(ts, 90):.2f})')
    return 0


if __name__ == '__main__':
    sys.exit(main())
