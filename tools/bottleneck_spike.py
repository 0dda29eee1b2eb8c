#!/usr/bin/env python
"""Round-4 spike: the Pallas fully-fused pre-act bottleneck vs XLA.

The one unexplored perf cell from three rounds of dead-end logging: the
8-stack forward runs ~1.9x above its HBM floor, and its FLOPs are
dominated by identity-residual bottlenecks (2 per stack at 64x64x256 +
12 more inside the hourglass per stack). `ops/pallas/bottleneck.py`
executes BN-ReLU-1x1 / BN-ReLU-3x3 / BN-ReLU-1x1 + residual as one
VMEM-resident kernel (affine BN: eval / frozen-BN semantics).

Measures, per shape, chained + value-fetch bounded (CLAUDE.md):
  xla        the identical affine-BN block as plain XLA ops
  pallas     the fused kernel
  xla xN     N blocks chained (in-model context: residual chains)
  pallas xN  ditto

Usage: python tools/bottleneck_spike.py [--batch 64] [--iters 10]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np


def timed(label, fn, arg, iters, flops=None):
    import jax.numpy as jnp

    out = fn(arg, jnp.float32(0))
    float(out)                                    # compile + warm
    t0 = time.perf_counter()
    salt = jnp.float32(0)
    for _ in range(iters):
        salt = fn(arg, salt)
    float(salt)
    dt = (time.perf_counter() - t0) / iters * 1000
    mfu = ''
    if flops:
        mfu = f'  ({flops / (dt * 1e-3) / 197e12 * 100:5.1f}% MFU)'
    print(f'{label:22s} {dt:8.3f} ms/iter{mfu}')
    return dt


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('--batch', type=int, default=64)
    p.add_argument('--iters', type=int, default=10)
    p.add_argument('--chain', type=int, default=3)
    p.add_argument('--shapes', type=str, default='64,32,16',
                   help='comma-separated spatial sizes to measure')
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from hourglass_pose_estimation_tpu.ops.pallas.bottleneck import (
        fused_bottleneck_pallas, bottleneck_reference, random_params)

    print(f'devices: {jax.devices()}')
    B, N = args.batch, args.chain

    shapes = [(int(s), 256, 128) for s in args.shapes.split(',')]
    for (H, C, P) in shapes:
        key = jax.random.PRNGKey(0)
        x = (0.5 * jax.random.normal(key, (B, H, H, C))).astype(jnp.bfloat16)
        params = random_params(jax.random.PRNGKey(1), C, P)
        flops1 = B * H * H * 2 * (C * P * 2 + 9 * P * P)

        @jax.jit
        def f_xla(img, salt, params=params):
            o = bottleneck_reference(img + salt.astype(img.dtype) * 1e-30,
                                     params)
            return o.astype(jnp.float32).ravel()[0] + salt * 1e-30

        @jax.jit
        def f_pal(img, salt, params=params):
            o = fused_bottleneck_pallas(
                img + salt.astype(img.dtype) * 1e-30, params)
            return o.astype(jnp.float32).ravel()[0] + salt * 1e-30

        @jax.jit
        def f_xla_n(img, salt, params=params):
            o = img + salt.astype(img.dtype) * 1e-30
            for _ in range(N):
                o = bottleneck_reference(o, params)
            return o.astype(jnp.float32).ravel()[0] + salt * 1e-30

        @jax.jit
        def f_pal_n(img, salt, params=params):
            o = img + salt.astype(img.dtype) * 1e-30
            for _ in range(N):
                o = fused_bottleneck_pallas(o, params)
            return o.astype(jnp.float32).ravel()[0] + salt * 1e-30

        print(f'--- B={B} {H}x{H}x{C} (P={P}) '
              f'[{flops1 / 1e9:.1f} GF/block] ---')
        # numeric check first (compiled, on-device)
        ref = bottleneck_reference(x, params)
        got = fused_bottleneck_pallas(x, params)
        err = float(jnp.abs(ref.astype(jnp.float32) -
                            got.astype(jnp.float32)).max())
        scale = float(jnp.abs(ref.astype(jnp.float32)).max())
        print(f'compiled max|err| = {err:.3e} (scale {scale:.2f})')

        t1x = timed('xla', f_xla, x, args.iters, flops1)
        t1p = timed('pallas', f_pal, x, args.iters, flops1)
        tnx = timed(f'xla x{N}', f_xla_n, x, args.iters, N * flops1)
        tnp = timed(f'pallas x{N}', f_pal_n, x, args.iters, N * flops1)
        # marginal per-block cost: dispatch floor and chain overhead
        # cancel — this is the in-model (in-program) number
        mx = (tnx - t1x) / (N - 1)
        mp = (tnp - t1p) / (N - 1)
        print(f'marginal/block: xla {mx:.3f} ms '
              f'({flops1 / (mx * 1e-3) / 197e12 * 100:.1f}% MFU)  '
              f'pallas {mp:.3f} ms '
              f'({flops1 / (mp * 1e-3) / 197e12 * 100:.1f}% MFU)')


if __name__ == '__main__':
    main()
