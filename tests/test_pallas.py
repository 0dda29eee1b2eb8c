"""Pallas kernels vs their pure-XLA oracles (interpreter mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from hourglass_pose_estimation_tpu.ops.heatmap import render_gaussian_targets
from hourglass_pose_estimation_tpu.ops.decode import get_preds_zero_based
from hourglass_pose_estimation_tpu.ops.pallas import (
    render_gaussian_targets_pallas, decode_peaks_pallas, upsample2x_add_pallas)
from hourglass_pose_estimation_tpu.models.modules import upsample2x_nearest


def test_render_kernel_matches_xla(rng):
    B, J = 4, 16
    joints = rng.uniform(-50, 300, size=(B, J, 2)).astype(np.float32)
    vis = (rng.uniform(size=(B, J)) > 0.2).astype(np.float32)
    kw = dict(heatmap_size=(64, 64), image_size=(256, 256), sigma=2)
    t0, w0 = render_gaussian_targets(joints, vis, **kw)
    t1, w1 = render_gaussian_targets_pallas(joints, vis, interpret=True, **kw)
    np.testing.assert_allclose(np.asarray(w0), np.asarray(w1))
    np.testing.assert_allclose(np.asarray(t0), np.asarray(t1), atol=1e-6)


def test_decode_kernel_matches_xla(rng):
    B, J, H, W = 3, 17, 64, 64
    hm = rng.uniform(0, 1, size=(B, H, W, J)).astype(np.float32)
    coords, maxv = decode_peaks_pallas(hm, interpret=True)
    ref_coords, ref_maxv = get_preds_zero_based(jnp.asarray(hm))
    np.testing.assert_allclose(np.asarray(maxv), np.asarray(ref_maxv),
                               atol=1e-6)
    # integer parts must agree; kernel adds the quarter offset
    ci = np.floor(np.asarray(coords) + 0.5)  # reverse ±0.25 to the peak
    np.testing.assert_allclose(ci, np.asarray(ref_coords), atol=0)


def test_decode_kernel_quarter_offset(rng):
    # single clean peak with a known gradient direction
    hm = np.zeros((1, 16, 16, 1), np.float32)
    hm[0, 8, 8, 0] = 1.0
    hm[0, 8, 9, 0] = 0.5     # right neighbour bigger than left -> +0.25
    hm[0, 7, 8, 0] = 0.3     # top bigger than bottom -> -0.25
    coords, _ = decode_peaks_pallas(hm, interpret=True)
    np.testing.assert_allclose(np.asarray(coords)[0, 0], [8.25, 7.75])


def test_upsample_add_matches_and_grads(rng):
    B, H, W, C = 2, 8, 8, 128
    low = rng.normal(size=(B, H, W, C)).astype(np.float32)
    skip = rng.normal(size=(B, 2 * H, 2 * W, C)).astype(np.float32)

    out = upsample2x_add_pallas(jnp.asarray(low), jnp.asarray(skip), True)
    ref = upsample2x_nearest(jnp.asarray(low)) + skip
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)

    def f_pallas(l, s):
        return jnp.sum(jnp.sin(upsample2x_add_pallas(l, s, True)))

    def f_ref(l, s):
        return jnp.sum(jnp.sin(upsample2x_nearest(l) + s))

    gl, gs = jax.grad(f_pallas, argnums=(0, 1))(jnp.asarray(low), jnp.asarray(skip))
    rl, rs = jax.grad(f_ref, argnums=(0, 1))(jnp.asarray(low), jnp.asarray(skip))
    np.testing.assert_allclose(np.asarray(gl), np.asarray(rl), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gs), np.asarray(rs), rtol=1e-5, atol=1e-6)


def test_maxpool_kernel_matches_flax(rng):
    import flax.linen as nn
    from hourglass_pose_estimation_tpu.ops.pallas import maxpool2x2_pallas
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 128)).astype(np.float32))
    out = maxpool2x2_pallas(x, True)
    ref = nn.max_pool(x, (2, 2), strides=(2, 2))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref))


def test_maxpool_kernel_grads(rng):
    import flax.linen as nn
    from hourglass_pose_estimation_tpu.ops.pallas import maxpool2x2_pallas
    # unique values -> no ties -> gradient must match XLA exactly
    base = np.arange(2 * 16 * 16 * 128, dtype=np.float32)
    rng.shuffle(base)
    x = jnp.asarray(base.reshape(2, 16, 16, 128))

    def f_pallas(x):
        return jnp.sum(jnp.sin(maxpool2x2_pallas(x, True)))

    def f_ref(x):
        return jnp.sum(jnp.sin(nn.max_pool(x, (2, 2), strides=(2, 2))))

    g1 = jax.grad(f_pallas)(x)
    g2 = jax.grad(f_ref)(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-5)

    # ties: gradient mass per window is conserved (split among ties)
    xt = jnp.ones((1, 4, 4, 128))
    gt = jax.grad(lambda x: jnp.sum(maxpool2x2_pallas(x, True)))(xt)
    np.testing.assert_allclose(np.asarray(gt).sum(), 2 * 2 * 128)
    np.testing.assert_allclose(np.asarray(gt), 0.25)


def test_fused_bottleneck_matches_xla(rng):
    from hourglass_pose_estimation_tpu.ops.pallas.bottleneck import (
        fused_bottleneck_pallas, bottleneck_reference, random_params)
    x = jnp.asarray(rng.normal(size=(2, 32, 16, 32)).astype(np.float32))
    params = random_params(jax.random.PRNGKey(0), 32, 16, dtype=jnp.float32)
    ref = bottleneck_reference(x, params)
    got = fused_bottleneck_pallas(x, params, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fused_bottleneck_chunked_matches_xla(rng):
    """Batched-grid formulation (grid=(B, H/CH), halo recompute): both
    impls must match the oracle at 1-chunk, 2-chunk (edge-only), and
    4-chunk (interior-chunk) heights."""
    from hourglass_pose_estimation_tpu.ops.pallas.bottleneck import (
        fused_bottleneck_pallas, bottleneck_reference, random_params)
    params = random_params(jax.random.PRNGKey(0), 32, 16,
                           dtype=jnp.float32)
    # 24 and 17 exercise the non-16-divisible / prime heights (chunk
    # height falls back to the largest divisor of H <= 16)
    for H in (16, 17, 24, 32, 64):
        x = jnp.asarray(rng.normal(size=(2, H, 16, 32)).astype(np.float32))
        ref = bottleneck_reference(x, params)
        for impl in ('image', 'chunked'):
            got = fused_bottleneck_pallas(x, params, interpret=True,
                                          impl=impl)
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       rtol=1e-5, atol=1e-5,
                                       err_msg=f'H={H} impl={impl}')


def test_fused_bottleneck_matches_flax_block(rng):
    """The kernel must reproduce the actual model block (eval mode):
    fold a trained-ish flax Bottleneck's variables and compare."""
    from hourglass_pose_estimation_tpu.models.modules import Bottleneck
    from hourglass_pose_estimation_tpu.ops.pallas.bottleneck import (
        fused_bottleneck_pallas, params_from_variables)
    blk = Bottleneck(planes=16, dtype=jnp.float32)
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 32)).astype(np.float32))
    variables = blk.init(jax.random.PRNGKey(0), x, train=True)
    # make the running stats non-trivial
    _, mut = blk.apply(variables, x, train=True, mutable=['batch_stats'])
    variables = {'params': variables['params'],
                 'batch_stats': mut['batch_stats']}
    ref = blk.apply(variables, x, train=False)
    p = params_from_variables(variables, dtype=jnp.float32)
    got = fused_bottleneck_pallas(x, p, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_bottleneck_fuse_block_forward_and_grad(rng):
    """Bottleneck(fuse_block=True) engages the Pallas kernel on
    running-average-BN forwards and is differentiable (custom VJP with
    rematerialized XLA backward) — the frozen-BN train contract."""
    from hourglass_pose_estimation_tpu.models.modules import Bottleneck

    x = jnp.asarray(rng.normal(size=(2, 16, 16, 32)).astype(np.float32))
    ref_blk = Bottleneck(planes=16, dtype=jnp.float32)
    fused_blk = Bottleneck(planes=16, dtype=jnp.float32, fuse_block=True)
    variables = ref_blk.init(jax.random.PRNGKey(0), x, train=True)
    _, mut = ref_blk.apply(variables, x, train=True, mutable=['batch_stats'])
    variables = {'params': variables['params'],
                 'batch_stats': mut['batch_stats']}

    ref = ref_blk.apply(variables, x, train=False)
    got = fused_blk.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)

    def loss(blk):
        def f(params, x):
            out = blk.apply({'params': params,
                             'batch_stats': variables['batch_stats']},
                            x, train=False)
            return jnp.sum(out.astype(jnp.float32) ** 2)
        return f

    gr_p, gr_x = jax.grad(loss(ref_blk), argnums=(0, 1))(
        variables['params'], x)
    gf_p, gf_x = jax.grad(loss(fused_blk), argnums=(0, 1))(
        variables['params'], x)
    np.testing.assert_allclose(np.asarray(gf_x), np.asarray(gr_x),
                               rtol=1e-4, atol=1e-4)
    for a, b in zip(jax.tree.leaves(gf_p), jax.tree.leaves(gr_p)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_fused_bottleneck_grads_chunked_impl(rng):
    """The custom-VJP dispatch honors the module-level DEFAULT_IMPL
    switch: with the chunked forward selected, values still match the
    oracle and the (shared, rematerializing) backward produces the
    same grads."""
    from hourglass_pose_estimation_tpu.ops.pallas import bottleneck as bk

    x = jnp.asarray(rng.normal(size=(2, 32, 16, 32)).astype(np.float32))
    params = bk.random_params(jax.random.PRNGKey(0), 32, 16,
                              dtype=jnp.float32)

    def loss_ref(x, p):
        return jnp.sum(bk.bottleneck_reference(x, p) ** 2)

    def loss_fused(x, p):
        return jnp.sum(bk.fused_bottleneck(x, p, True) ** 2)

    gr_x, gr_p = jax.grad(loss_ref, argnums=(0, 1))(x, params)
    prev = bk.DEFAULT_IMPL
    bk.DEFAULT_IMPL = 'chunked'
    try:
        val = bk.fused_bottleneck(x, params, True)
        gf_x, gf_p = jax.grad(loss_fused, argnums=(0, 1))(x, params)
    finally:
        bk.DEFAULT_IMPL = prev
    np.testing.assert_allclose(np.asarray(val),
                               np.asarray(bk.bottleneck_reference(x, params)),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gf_x), np.asarray(gr_x),
                               rtol=1e-4, atol=1e-4)
    for a, b in zip(jax.tree.leaves(gf_p._asdict()),
                    jax.tree.leaves(gr_p._asdict())):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_bottleneck_fuse_block_gating(rng):
    """Fusion must NOT engage in train mode (batch-stat BN), on strided
    / channel-changing blocks, or below fuse_min_hw — those fall back to
    the standard path bit-for-bit."""
    from hourglass_pose_estimation_tpu.models.modules import Bottleneck

    x = jnp.asarray(rng.normal(size=(2, 16, 16, 32)).astype(np.float32))
    for kw, xx in [
            (dict(planes=16), x),                      # train=True below
            (dict(planes=8), x),                       # projection shortcut
            (dict(planes=16, stride=2), x),            # strided
            (dict(planes=16, fuse_min_hw=32), x),      # too small
    ]:
        ref_blk = Bottleneck(dtype=jnp.float32, **kw)
        fused_blk = Bottleneck(dtype=jnp.float32, fuse_block=True, **kw)
        variables = ref_blk.init(jax.random.PRNGKey(0), xx, train=True)
        train = kw == dict(planes=16)
        r = ref_blk.apply(variables, xx, train=train,
                          mutable=['batch_stats'] if train else False)
        f = fused_blk.apply(variables, xx, train=train,
                            mutable=['batch_stats'] if train else False)
        for a, b in zip(jax.tree.leaves(r), jax.tree.leaves(f)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_hourglassnet_fuse_block_eval_parity(rng):
    """Full HourglassNet with fuse_block=True: eval forward matches the
    standard path (only >=16px identity blocks fuse; the rest fall
    through), exercising fused blocks inside the real architecture."""
    from hourglass_pose_estimation_tpu.models import HourglassNet

    kw = dict(num_stacks=1, num_blocks=1, num_classes=4,
              num_feats=16, dtype=jnp.float32)
    model = HourglassNet(**kw)
    fused = HourglassNet(fuse_block=True, **kw)
    x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    ref = model.apply(variables, x, train=False)
    got = fused.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=5e-5, atol=5e-5)


def test_bottleneck_backward_reference_matches_vjp(rng):
    """The explicit backward (used by fused_bottleneck's custom VJP and
    the blueprint for a Pallas backward kernel) must equal jax.vjp of
    the XLA reference in f32 (where the vjp is transposable)."""
    from hourglass_pose_estimation_tpu.ops.pallas.bottleneck import (
        bottleneck_reference, bottleneck_backward_reference, random_params)

    x = jnp.asarray(rng.normal(size=(2, 8, 8, 32)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(2, 8, 8, 32)).astype(np.float32))
    params = random_params(jax.random.PRNGKey(3), 32, 16, dtype=jnp.float32,
                           scale=0.3)
    _, vjp = jax.vjp(bottleneck_reference, x, params)
    dx_ref, dp_ref = vjp(g)
    dx, dp = bottleneck_backward_reference(x, params, g)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_ref),
                               rtol=1e-4, atol=1e-4)
    for a, b in zip(dp, dp_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_fused_bottleneck_grad_bf16():
    """The custom VJP must work end-to-end in bf16 (the TPU train
    dtype) — this is exactly where jax.vjp of the mixed-precision
    reference fails to transpose."""
    from hourglass_pose_estimation_tpu.ops.pallas.bottleneck import (
        fused_bottleneck, random_params)

    x = (0.5 * jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 32))
         ).astype(jnp.bfloat16)
    params = random_params(jax.random.PRNGKey(1), 32, 16)

    def loss(params, x):
        return fused_bottleneck(x, params, True).astype(jnp.float32).sum()

    l, (gp, gx) = jax.value_and_grad(loss, argnums=(0, 1))(params, x)
    assert np.isfinite(float(l))
    assert gx.dtype == x.dtype
    for a, b in zip(gp, params):
        assert a.dtype == b.dtype and np.isfinite(
            np.asarray(a, np.float32)).all()
    assert float(jnp.abs(gx.astype(jnp.float32)).sum()) > 0


def test_upsample_and_pool_non_multiple_of_8_heights(rng):
    """H=12 (a 192-px-derived level) previously truncated the row-tile
    grid (hT fixed at 8, grid=H//hT=1) and left output rows
    uninitialized; the tile height must divide H."""
    from hourglass_pose_estimation_tpu.ops.pallas import (
        upsample2x_add_pallas, maxpool2x2_pallas)
    import flax.linen as nn

    low = jnp.asarray(rng.normal(size=(2, 12, 12, 32)).astype(np.float32))
    skip = jnp.asarray(rng.normal(size=(2, 24, 24, 32)).astype(np.float32))
    got = upsample2x_add_pallas(low, skip, True)
    ref = upsample2x_nearest(low) + skip
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)
    gl, gs = jax.grad(lambda l, s: jnp.sum(
        jnp.sin(upsample2x_add_pallas(l, s, True))), argnums=(0, 1))(
            low, skip)
    rl, rs = jax.grad(lambda l, s: jnp.sum(
        jnp.sin(upsample2x_nearest(l) + s)), argnums=(0, 1))(low, skip)
    np.testing.assert_allclose(np.asarray(gl), np.asarray(rl), atol=1e-5)
    np.testing.assert_allclose(np.asarray(gs), np.asarray(rs), atol=1e-5)

    x = jnp.asarray(rng.normal(size=(2, 24, 24, 32)).astype(np.float32))
    got = maxpool2x2_pallas(x, True)
    ref = nn.max_pool(x, (2, 2), strides=(2, 2))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref))
    gp = jax.grad(lambda a: jnp.sum(jnp.sin(
        maxpool2x2_pallas(a, True))))(x)
    rp = jax.grad(lambda a: jnp.sum(jnp.sin(
        nn.max_pool(a, (2, 2), strides=(2, 2)))))(x)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(rp), atol=1e-5)
