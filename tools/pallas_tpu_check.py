"""Validate the Pallas TPU kernels COMPILED on the real chip.

The pytest suite exercises ops/pallas in interpreter mode on CPU
(tests/test_pallas.py) — that proves the kernel *logic*, not that
Mosaic compiles and executes them correctly on hardware. This tool
runs each kernel compiled (interpret=False) on the attached TPU and
checks it against the same pure-XLA oracle the tests use, printing one
PASS/FAIL line per kernel. Run it alone (CLAUDE.md: one TPU client at
a time); values are host-fetched so results are real, not acked.
"""

from __future__ import annotations

import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, '/root/repo')

from hourglass_pose_estimation_tpu.ops.pallas import (
    render_gaussian_targets_pallas, decode_peaks_pallas,
    upsample2x_add_pallas, maxpool2x2_pallas)
from hourglass_pose_estimation_tpu.ops.heatmap import render_gaussian_targets
from hourglass_pose_estimation_tpu.models.modules import upsample2x_nearest
import flax.linen as nn


def check(name, got, ref, atol=1e-5):
    got = np.asarray(got)
    ref = np.asarray(ref)
    err = float(np.max(np.abs(got - ref)))
    ok = err <= atol
    print(f'{"PASS" if ok else "FAIL"} {name}: max|err|={err:.2e}')
    return ok


def main():
    dev = jax.devices()[0]
    print(f'device: {dev.platform} {dev.device_kind}')
    rng = np.random.default_rng(0)
    ok = True

    # render: [B,J,2] joints -> Gaussian heatmaps
    B, J, Hh, Wh, R = 8, 16, 64, 64, 256
    joints = rng.uniform(0, R, size=(B, J, 2)).astype(np.float32)
    vis = (rng.uniform(size=(B, J)) > 0.2).astype(np.float32)
    kw = dict(heatmap_size=(Hh, Wh), image_size=(R, R), sigma=1.0)
    t1, w1 = jax.jit(
        lambda j, v: render_gaussian_targets_pallas(j, v, **kw))(joints, vis)
    t0, w0 = render_gaussian_targets(joints, vis, **kw)
    ok &= check('render_gaussian_targets_pallas (target)', t1, t0)
    ok &= check('render_gaussian_targets_pallas (weight)', w1, w0)

    # decode: heatmaps -> quarter-offset peak coords. Full-coordinate
    # numpy oracle (argmax + centered-stencil sign * 0.25, interior
    # peaks only) — the pytest oracle only checks integer parts.
    hm = rng.normal(size=(B, 64, 64, J)).astype(np.float32)
    coords, maxv = jax.jit(decode_peaks_pallas)(hm)
    flat = hm.reshape(B, -1, J)
    idx = flat.argmax(axis=1)
    py_, px_ = idx // 64, idx % 64
    rc = np.stack([px_, py_], -1).astype(np.float32)
    for b in range(B):
        for j in range(J):
            x, y = int(px_[b, j]), int(py_[b, j])
            if 0 < x < 63 and 0 < y < 63:
                rc[b, j, 0] += np.sign(hm[b, y, x + 1, j]
                                       - hm[b, y, x - 1, j]) * 0.25
                rc[b, j, 1] += np.sign(hm[b, y + 1, x, j]
                                       - hm[b, y - 1, x, j]) * 0.25
    ok &= check('decode_peaks_pallas (coords)', coords, rc)
    ok &= check('decode_peaks_pallas (maxval)', maxv, flat.max(axis=1))

    # fused upsample2x + add (value and both grads)
    low = rng.normal(size=(4, 32, 32, 256)).astype(np.float32)
    skip = rng.normal(size=(4, 64, 64, 256)).astype(np.float32)
    out = jax.jit(upsample2x_add_pallas)(low, skip)
    ref = upsample2x_nearest(jnp.asarray(low)) + skip
    ok &= check('upsample2x_add_pallas (fwd)', out, ref)
    f_p = lambda l, s: jnp.sum(jnp.sin(upsample2x_add_pallas(l, s)))
    f_r = lambda l, s: jnp.sum(jnp.sin(upsample2x_nearest(l) + s))
    gl, gs = jax.jit(jax.grad(f_p, argnums=(0, 1)))(low, skip)
    rl, rs = jax.grad(f_r, argnums=(0, 1))(jnp.asarray(low), jnp.asarray(skip))
    ok &= check('upsample2x_add_pallas (grad low)', gl, rl, atol=1e-4)
    ok &= check('upsample2x_add_pallas (grad skip)', gs, rs, atol=1e-4)

    # 2x2 maxpool (value and grad)
    x = rng.normal(size=(4, 64, 64, 128)).astype(np.float32)
    out = jax.jit(maxpool2x2_pallas)(x)
    ref = nn.max_pool(jnp.asarray(x), (2, 2), strides=(2, 2))
    ok &= check('maxpool2x2_pallas (fwd)', out, ref)
    g_p = jax.jit(jax.grad(lambda a: jnp.sum(jnp.sin(maxpool2x2_pallas(a)))))(x)
    g_r = jax.grad(lambda a: jnp.sum(jnp.sin(
        nn.max_pool(a, (2, 2), strides=(2, 2)))))(jnp.asarray(x))
    ok &= check('maxpool2x2_pallas (grad)', g_p, g_r, atol=1e-4)

    # fused pre-act bottleneck, both grid formulations (fwd; the
    # backward is the XLA remat reference by construction). f32 at
    # half width (the full f32 trunk shape exceeds the per-image
    # kernel's 16 MB VMEM budget — the kernel targets bf16), plus the
    # REAL deploy dtype/shape: bf16 at the 64x64x256 trunk (oracle runs
    # the same bf16-operand/f32-accumulate convs; residual reduction
    # order differs, hence the bf16-scale tolerance).
    from hourglass_pose_estimation_tpu.ops.pallas.bottleneck import (
        fused_bottleneck_pallas, bottleneck_reference, random_params)
    # f32 atol is 5e-4, not the CPU suite's 1e-5: TPU f32 matmuls/convs
    # execute as bf16 MXU passes (platform behavior), and the kernel's
    # 9-tap matmul order differs from XLA's conv — measured 2.4e-4.
    for dt, C, P, atol in ((jnp.float32, 128, 64, 5e-4),
                           (jnp.bfloat16, 256, 128, 3e-2)):
        xb = jnp.asarray(
            0.5 * rng.normal(size=(4, 64, 64, C)), jnp.float32).astype(dt)
        prm = random_params(jax.random.PRNGKey(3), C, P, dtype=dt)
        ref = bottleneck_reference(jnp.asarray(xb), prm).astype(jnp.float32)
        for impl in ('image', 'chunked'):
            got = jax.jit(lambda a, impl=impl: fused_bottleneck_pallas(
                a, prm, impl=impl))(xb).astype(jnp.float32)
            ok &= check(
                f'fused_bottleneck_pallas[{impl}] ({dt.__name__} fwd)',
                got, ref, atol=atol)

    print('ALL PASS' if ok else 'FAILURES PRESENT')
    return 0 if ok else 1


if __name__ == '__main__':
    raise SystemExit(main())
