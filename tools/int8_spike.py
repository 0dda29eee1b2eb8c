#!/usr/bin/env python
"""Spike: does int8 conv (s8 x s8 -> s32) beat bf16 on this chip?

The v5e MXU lists int8 at 2x the bf16 rate (394 vs 197 TOPS). If
s8 conv lowers to the fast path, a quantized serving mode could raise
the batched-serving throughput (BENCH_NOTES "Batched serving"). This
measures the raw conv, plus the realistic dynamic-quant round trip
(absmax reduce + quantize + conv + rescale), at the shapes that
dominate the hourglass forward (256-channel 3x3/1x1 at 64^2..8^2).

Honest timing per CLAUDE.md: iterations chained through a data
dependency, bounded by a host value fetch.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, x, iters=20):
    fn = jax.jit(fn)
    y = fn(x)
    float(jnp.sum(y.astype(jnp.float32)))  # warm + sync
    t0 = time.perf_counter()
    acc = x
    for _ in range(iters):
        acc = fn(acc)
    float(jnp.sum(acc.astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters * 1e3


def conv(x, k, out_dtype):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), 'SAME',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        preferred_element_type=out_dtype)


def main():
    print('device:', jax.devices()[0])
    B = 64
    shapes = [(64, 3, 256), (32, 3, 256), (16, 3, 256), (64, 1, 256),
              (64, 3, 128)]
    key = jax.random.PRNGKey(0)
    for (R, K, C) in shapes:
        kf = jax.random.normal(key, (K, K, C, C), jnp.float32) * 0.05
        xf = jax.random.normal(key, (B, R, R, C), jnp.float32)

        xb = xf.astype(jnp.bfloat16)
        kb = kf.astype(jnp.bfloat16)
        t_bf16 = timed(lambda x: conv(x, kb, jnp.bfloat16), xb)

        # static-quantized weights, per-tensor scale
        ks = jnp.max(jnp.abs(kf)) / 127.0
        k8 = jnp.clip(jnp.round(kf / ks), -127, 127).astype(jnp.int8)

        x8 = jnp.clip(jnp.round(xf * 4.0), -127, 127).astype(jnp.int8)

        def raw_int8(x):
            y = conv(x, k8, jnp.int32)
            return jnp.clip(y >> 7, -127, 127).astype(jnp.int8)
        try:
            t_i8 = timed(raw_int8, x8)
        except Exception as e:
            t_i8 = None
            print(f'{R}^2 c{C} k{K}: int8 conv FAILED: {type(e).__name__} {e}')

        # dynamic-quant round trip from bf16 activations
        def dyn_int8(x):
            s = jnp.max(jnp.abs(x).astype(jnp.float32)) / 127.0
            q = jnp.clip(jnp.round(x.astype(jnp.float32) / s), -127,
                         127).astype(jnp.int8)
            y = conv(q, k8, jnp.int32)
            return (y.astype(jnp.float32) * (s * ks)).astype(jnp.bfloat16)
        try:
            t_dyn = timed(dyn_int8, xb)
        except Exception:
            t_dyn = None

        gf = 2 * B * R * R * K * K * C * C / 1e9
        def mfu(ms, peak):
            return '' if ms is None else f'{gf / (ms / 1e3) / peak * 100:.0f}%'
        print(f'{R:3}^2 c{C} {K}x{K}: bf16 {t_bf16:6.2f} ms ({mfu(t_bf16, 197e3)} MFU)'
              f'  int8 {t_i8 if t_i8 is None else f"{t_i8:6.2f}"} ms ({mfu(t_i8, 394e3)})'
              f'  dyn-q {t_dyn if t_dyn is None else f"{t_dyn:6.2f}"} ms')


if __name__ == '__main__':
    main()
