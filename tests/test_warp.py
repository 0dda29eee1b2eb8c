"""affine_warp_quad parity vs the single-gather warp."""

import numpy as np
import jax.numpy as jnp




def test_affine_warp_quad_bit_identical():
    """Quad-packed warp == single-gather warp (to 1 f32 ulp) across
    scales, rotations, flip-composed affines, out-of-bounds regions."""
    import jax
    from hourglass_pose_estimation_tpu.ops.warp import (
        affine_warp, affine_warp_quad)

    rng = np.random.RandomState(7)
    B, Hs, Ws, R = 5, 57, 49, 32
    images = rng.randint(0, 256, (B, Hs, Ws, 3), dtype=np.uint8)
    invs = []
    for i in range(B):
        th = rng.uniform(-np.pi / 6, np.pi / 6)
        s = rng.uniform(0.6, 2.0)        # incl. scale up to the bound
        c, sn = s * np.cos(th), s * np.sin(th)
        tx, ty = rng.uniform(-20, 40, 2)
        invs.append([[c, -sn, tx], [sn, c, ty]])
    inv = jnp.asarray(np.asarray(invs, np.float32))

    ref = np.asarray(affine_warp(jnp.asarray(images), inv, (R, R)))
    got = np.asarray(affine_warp_quad(jnp.asarray(images), inv, (R, R)))
    # identical up to one f32 ulp: the quad path's lerp runs through a
    # contraction the compiler may fuse (FMA), re-rounding the last bit
    np.testing.assert_allclose(got, ref, rtol=0, atol=6e-5)
    assert np.mean(got == ref) > 0.5          # mostly literally equal


def test_affine_warp_separable_matches_gather():
    """Matmul (separable) warp == gather warp for axis-aligned affines
    (the eval/inference shape: scale + translation + mirrored x for
    flip), including out-of-bounds zero borders."""
    from hourglass_pose_estimation_tpu.ops.warp import (
        affine_warp, affine_warp_separable)

    rng = np.random.RandomState(3)
    B, Hs, Ws, R = 5, 57, 49, 32
    images = rng.randint(0, 256, (B, Hs, Ws, 3), dtype=np.uint8)
    invs = []
    for i in range(B):
        sx = rng.uniform(0.6, 2.0) * (-1 if i % 2 else 1)   # flip fold
        sy = rng.uniform(0.6, 2.0)
        tx, ty = rng.uniform(-20, 60, 2)
        invs.append([[sx, 0.0, tx], [0.0, sy, ty]])
    inv = jnp.asarray(np.asarray(invs, np.float32))

    ref = np.asarray(affine_warp(jnp.asarray(images), inv, (R, R)))
    got = np.asarray(affine_warp_separable(jnp.asarray(images), inv,
                                           (R, R)))
    np.testing.assert_allclose(got, ref, rtol=0, atol=2e-3)
    # borders: both exactly zero outside the source extent
    assert np.array_equal(got == 0, ref == 0) or \
        np.mean((got == 0) == (ref == 0)) > 0.999
