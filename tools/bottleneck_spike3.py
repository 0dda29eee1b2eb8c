#!/usr/bin/env python
"""Round-4 spike, v3 methodology: exactly the in-model context.

v1 chained separate dispatches (per-program overhead ~3-5 ms drowned
the signal); v2 used `fori_loop` (adds per-iteration loop overhead and
blocks cross-block scheduling, unlike the model's unrolled graph).
Here the chain is UNROLLED inside one jitted program with DIFFERENT
params per block — byte-for-byte the structure flax traces for the
hourglass residual chains — output fully reduced, one dispatch + one
value fetch; marginal = difference quotient of two chain lengths.

Usage: python tools/bottleneck_spike3.py [--batch 64] [--shapes 64,32,16]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('--batch', type=int, default=64)
    p.add_argument('--k1', type=int, default=4)
    p.add_argument('--k2', type=int, default=16)
    p.add_argument('--reps', type=int, default=5)
    p.add_argument('--shapes', type=str, default='64,32,16')
    p.add_argument('--grad', action='store_true',
                   help='also measure the backward (value_and_grad wrt '
                        'params) marginal per block')
    args = p.parse_args(argv)

    import functools

    import jax
    import jax.numpy as jnp
    from hourglass_pose_estimation_tpu.ops.pallas.bottleneck import (
        fused_bottleneck_pallas, bottleneck_reference,
        bottleneck_backward_reference, fused_bottleneck, random_params)

    # XLA fwd + the explicit backward (the mixed-precision reference is
    # not vjp-transposable; this custom_vjp pairing measures the same
    # remat-style backward the fused path uses, so the f+b marginal
    # difference isolates the Pallas forward's in-training win)
    @functools.partial(jax.custom_vjp, nondiff_argnums=())
    def xla_block_vjp(x, params):
        return bottleneck_reference(x, params)

    xla_block_vjp.defvjp(
        lambda x, params: (bottleneck_reference(x, params), (x, params)),
        lambda res, g: bottleneck_backward_reference(res[0], res[1], g))

    print(f'devices: {jax.devices()}')
    B = args.batch

    def make(block, plist):
        @jax.jit
        def f(x):
            o = x
            for prm in plist:
                o = block(o, prm)
            return o.astype(jnp.float32).sum()
        return f

    def make_grad(block, plist):
        def loss(plist, x):
            o = x
            for prm in plist:
                o = block(o, prm)
            return o.astype(jnp.float32).sum()

        @jax.jit
        def f(x):
            l, g = jax.value_and_grad(loss)(plist, x)
            return l + sum(jnp.sum(t.astype(jnp.float32))
                           for p in g for t in p)
        return f

    def run(f, x):
        float(f(x))                       # compile + warm
        best = float('inf')
        for _ in range(args.reps):
            t0 = time.perf_counter()
            float(f(x))
            best = min(best, time.perf_counter() - t0)
        return best * 1000.0

    for s in args.shapes.split(','):
        H = int(s)
        C, P = 256, 128
        x = (0.5 * jax.random.normal(jax.random.PRNGKey(0),
                                     (B, H, H, C))).astype(jnp.bfloat16)
        plist = [random_params(jax.random.PRNGKey(10 + i), C, P)
                 for i in range(args.k2)]
        flops1 = B * H * H * 2 * (C * P * 2 + 9 * P * P)
        print(f'--- B={B} {H}x{H}x{C} (P={P}) [{flops1/1e9:.1f} GF/block]'
              f' unrolled k={args.k1}->{args.k2} ---')
        pallas_img = functools.partial(fused_bottleneck_pallas,
                                       impl='image')
        pallas_chunk = functools.partial(fused_bottleneck_pallas,
                                         impl='chunked')
        for label, block in (('xla', bottleneck_reference),
                             ('pal-img', pallas_img),
                             ('pal-chunk', pallas_chunk)):
            t1 = run(make(block, plist[:args.k1]), x)
            t2 = run(make(block, plist), x)
            m = (t2 - t1) / (args.k2 - args.k1)
            mfu = flops1 / (m * 1e-3) / 197e12 * 100
            print(f'fwd  {label:8s} k{args.k1} {t1:8.2f} ms  k{args.k2} '
                  f'{t2:8.2f} ms  marginal {m:7.3f} ms/block '
                  f'({mfu:5.1f}% MFU)')
        if args.grad:
            for label, block in (('xla', xla_block_vjp),
                                 ('pallas', fused_bottleneck)):
                t1 = run(make_grad(block, plist[:args.k1]), x)
                t2 = run(make_grad(block, plist), x)
                m = (t2 - t1) / (args.k2 - args.k1)
                mfu = 3 * flops1 / (m * 1e-3) / 197e12 * 100
                print(f'f+b  {label:8s} k{args.k1} {t1:8.2f} ms  '
                      f'k{args.k2} {t2:8.2f} ms  marginal {m:7.3f} '
                      f'ms/block ({mfu:5.1f}% MFU of 3x fwd flops)')


if __name__ == '__main__':
    main()
