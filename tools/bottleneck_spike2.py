#!/usr/bin/env python
"""Round-4 spike, v2 methodology: Pallas fused bottleneck vs XLA.

The v1 spike (tools/bottleneck_spike.py) chained separate dispatches,
so per-program overhead (~3-5 ms on this tunnel) drowned the small
shapes and produced impossible >100% "MFU" marginals. Here the repeat
loop lives INSIDE one jitted program (`lax.fori_loop` over k block
applications, the loop carry feeding each next block so nothing can be
elided), the output is fully reduced (no dead batch elements), and the
marginal per-block cost is the difference quotient between two loop
counts — one dispatch and one value fetch per measurement, per
CLAUDE.md timing rules.

Usage: python tools/bottleneck_spike2.py [--batch 64] [--shapes 64,32,16]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('--batch', type=int, default=64)
    p.add_argument('--k1', type=int, default=8)
    p.add_argument('--k2', type=int, default=40)
    p.add_argument('--reps', type=int, default=3)
    p.add_argument('--shapes', type=str, default='64,32,16')
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from hourglass_pose_estimation_tpu.ops.pallas.bottleneck import (
        fused_bottleneck_pallas, bottleneck_reference, random_params)

    print(f'devices: {jax.devices()}')
    B = args.batch

    def make(block, params, k):
        @jax.jit
        def f(x):
            def body(_, o):
                return block(o, params)
            o = jax.lax.fori_loop(0, k, body, x)
            return o.astype(jnp.float32).sum()
        return f

    def run(f, x):
        out = f(x)
        float(out)                       # compile + warm
        best = float('inf')
        for _ in range(args.reps):
            t0 = time.perf_counter()
            float(f(x))
            best = min(best, time.perf_counter() - t0)
        return best * 1000.0

    for s in args.shapes.split(','):
        H = int(s)
        C, P = 256, 128
        key = jax.random.PRNGKey(0)
        x = (0.5 * jax.random.normal(key, (B, H, H, C))).astype(jnp.bfloat16)
        params = random_params(jax.random.PRNGKey(1), C, P)
        flops1 = B * H * H * 2 * (C * P * 2 + 9 * P * P)
        print(f'--- B={B} {H}x{H}x{C} (P={P}) [{flops1/1e9:.1f} GF/block] '
              f'k={args.k1}->{args.k2} ---')
        for label, block in (('xla', bottleneck_reference),
                             ('pallas', fused_bottleneck_pallas)):
            t1 = run(make(block, params, args.k1), x)
            t2 = run(make(block, params, args.k2), x)
            m = (t2 - t1) / (args.k2 - args.k1)
            mfu = flops1 / (m * 1e-3) / 197e12 * 100
            print(f'{label:8s} k{args.k1} {t1:8.2f} ms  k{args.k2} '
                  f'{t2:8.2f} ms  marginal {m:7.3f} ms/block '
                  f'({mfu:5.1f}% MFU)')


if __name__ == '__main__':
    main()
