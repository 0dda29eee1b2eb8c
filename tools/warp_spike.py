#!/usr/bin/env python
"""Round-3 warp spike: measure the candidate formulations that could
beat the 35 ms packed-gather warp (BENCH_NOTES "Pallas warp spike").

  gather     the production packed-neighborhood single-gather warp
  separable  axis-aligned 2-matmul warp (valid for the EVAL shape:
             no rotation; structurally cannot express the train
             path's rotations)
  roll-K     the masked-roll primitive floor: K select-accumulate
             rolls over the output tensor — the minimum VPU work a
             per-sublane shift-resolve (shear-decomposition) kernel
             would do for a K-row shift range. Train rotations
             (+-60 deg) span ~200 rows; small-rot samples ~8-32.

All timings chained + value-fetch bounded (CLAUDE.md discipline).

Usage: python tools/warp_spike.py [--batch 64] [--res 256] [--iters 8]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np


def timed(label, fn, arg, iters):
    import jax.numpy as jnp

    out = fn(arg, jnp.float32(0))
    float(out)                                    # compile + warm
    t0 = time.perf_counter()
    salt = jnp.float32(0)
    for _ in range(iters):
        salt = fn(arg, salt)
    float(salt)
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f'{label:18s} {dt:8.2f} ms/iter')
    return dt


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('--batch', type=int, default=64)
    p.add_argument('--res', type=int, default=256)
    p.add_argument('--iters', type=int, default=8)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from hourglass_pose_estimation_tpu.ops.warp import (
        affine_warp, affine_warp_separable)

    B, R = args.batch, args.res
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randint(0, 256, (B, R, R, 3), dtype=np.uint8))

    rot = []
    axis = []
    for i in range(B):
        th = rng.uniform(-np.pi / 3, np.pi / 3)
        s = rng.uniform(0.75, 1.25)
        c, sn = s * np.cos(th), s * np.sin(th)
        tx, ty = rng.uniform(-10, 10, 2)
        rot.append([[c, -sn, tx], [sn, c, ty]])
        axis.append([[s, 0.0, tx], [0.0, s, ty]])
    rot = jnp.asarray(np.asarray(rot, np.float32))
    axis = jnp.asarray(np.asarray(axis, np.float32))

    @jax.jit
    def g_rot(img, salt):
        o = affine_warp(img, rot + salt * 1e-30, (R, R))
        return o.ravel()[0] + salt * 1e-30

    @jax.jit
    def g_axis(img, salt):
        o = affine_warp(img, axis + salt * 1e-30, (R, R))
        return o.ravel()[0] + salt * 1e-30

    @jax.jit
    def sep(img, salt):
        o = affine_warp_separable(img, axis + salt * 1e-30, (R, R))
        return o.ravel()[0] + salt * 1e-30

    timed('gather (rotated)', g_rot, images, args.iters)
    timed('gather (axis)', g_axis, images, args.iters)
    timed('separable matmul', sep, images, args.iters)

    # masked-roll floor: K rolls + select-accumulate over the f32
    # output-sized tensor (one shear pass's shift-resolve lower bound)
    x = jnp.asarray(rng.normal(size=(B, R, R, 3)).astype(np.float32))
    shifts = jnp.asarray(rng.randint(0, 64, (B, 1, R, 1)), jnp.int32)

    for K in (8, 32):
        @jax.jit
        def roll_k(img, salt, K=K):
            acc = jnp.zeros_like(img)
            s = shifts % K
            for k in range(K):
                acc = acc + jnp.roll(img, k, axis=1) * (s == k)
            return acc.ravel()[0] + salt * 1e-30
        timed(f'roll-{K} floor', roll_k, x, args.iters)
    return 0


if __name__ == '__main__':
    sys.exit(main())
