"""HourglassNet structural parity: parameter counts (verified against the
reference by instantiation — see SURVEY.md §2 / BASELINE.md), output
shapes, and gradient flow."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hourglass_pose_estimation_tpu.models import get_model, HourglassNet


def _count_params(params):
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))


def _init(model, res=256):
    x = jnp.zeros((1, res, res, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    return variables


# Verified reference counts (instantiated the reference torch model,
# num_blocks=1, num_classes=16, skip_mode='sum'): (stacks, mobile) -> params
REFERENCE_COUNTS = {
    (1, False): 3_586_960,
    (2, False): 6_730_912,
    (8, False): 25_594_624,
    (1, True): 1_209_808,
    (2, True): 2_305_504,
    (8, True): 8_879_680,
}
REFERENCE_COUNT_CONCAT_1STACK = 3_652_752


@pytest.mark.parametrize("stacks,mobile", [(1, False), (2, False), (1, True), (2, True)])
def test_param_count_parity(stacks, mobile):
    model = HourglassNet(num_stacks=stacks, num_blocks=1, num_classes=16,
                         mobile=mobile, skip_mode='sum')
    variables = _init(model, res=64)  # spatial size doesn't affect counts
    n = _count_params(variables['params'])
    expected = REFERENCE_COUNTS[(stacks, mobile)]
    assert n == expected, f"{n} != reference {expected}"


def test_output_shapes():
    model = HourglassNet(num_stacks=2, num_blocks=1, num_classes=17)
    x = jnp.zeros((2, 256, 256, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(variables, x, train=False)
    assert out.shape == (2, 2, 64, 64, 17)
    assert out.dtype == jnp.float32


def test_concat_skip_mode():
    model = HourglassNet(num_stacks=1, num_blocks=1, num_classes=16,
                         skip_mode='concat')
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(variables, x, train=False)
    assert out.shape == (1, 1, 16, 16, 16)
    assert _count_params(variables['params']) == REFERENCE_COUNT_CONCAT_1STACK


def test_batchnorm_state_updates():
    model = HourglassNet(num_stacks=1, num_blocks=1, num_classes=4)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out, mutated = model.apply(variables, x, train=True, mutable=['batch_stats'])
    before = jax.tree.leaves(variables['batch_stats'])
    after = jax.tree.leaves(mutated['batch_stats'])
    changed = any(not np.allclose(b, a) for b, a in zip(before, after))
    assert changed, "train=True must update running stats"


def test_gradients_flow_to_all_params():
    model = HourglassNet(num_stacks=2, num_blocks=1, num_classes=4)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)

    def loss_fn(params):
        out = model.apply({'params': params,
                           'batch_stats': variables['batch_stats']},
                          x, train=False)
        return jnp.mean(out ** 2)

    grads = jax.grad(loss_fn)(variables['params'])
    flat = jax.tree_util.tree_leaves_with_path(grads)
    dead = [jax.tree_util.keystr(k) for k, g in flat
            if float(jnp.max(jnp.abs(g))) == 0.0]
    assert not dead, f"zero gradients at: {dead[:8]}"


def test_factory_kwarg_surface():
    m = get_model('hg', num_stacks=1, num_blocks=1, num_classes=16,
                  mobile=True, skip_mode='sum', out_res=64)
    assert isinstance(m, HourglassNet)
    with pytest.raises(KeyError):
        get_model('nope')


def test_remat_preserves_params_and_outputs():
    """nn.remat(Hourglass) must not change param names, counts, or
    forward outputs (same weights, same result)."""
    import jax
    from hourglass_pose_estimation_tpu.models import HourglassNet
    a = HourglassNet(num_stacks=2, num_blocks=1, num_classes=4,
                     dtype=jnp.float32, remat=False)
    b = HourglassNet(num_stacks=2, num_blocks=1, num_classes=4,
                     dtype=jnp.float32, remat=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 64, 3))
    va = a.init(jax.random.PRNGKey(1), x, train=False)
    vb = b.init(jax.random.PRNGKey(1), x, train=False)
    assert jax.tree_util.tree_structure(va) == jax.tree_util.tree_structure(vb)
    ya = a.apply(va, x, train=False)
    yb = b.apply(va, x, train=False)      # same weights through remat
    np.testing.assert_allclose(np.asarray(ya), np.asarray(yb),
                               rtol=1e-5, atol=1e-5)


def test_bn_stat_samples_trains_and_matches_fullbatch_at_k_eq_B():
    """ghost-stat BN: k=B is exactly full-batch; k<B still trains."""
    import jax
    from hourglass_pose_estimation_tpu.models import HourglassNet
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 64, 64, 3))
    full = HourglassNet(num_stacks=1, num_blocks=1, num_classes=4,
                        dtype=jnp.float32, bn_stat_samples=0)
    same = HourglassNet(num_stacks=1, num_blocks=1, num_classes=4,
                        dtype=jnp.float32, bn_stat_samples=4)
    sub = HourglassNet(num_stacks=1, num_blocks=1, num_classes=4,
                       dtype=jnp.float32, bn_stat_samples=2)
    v = full.init(jax.random.PRNGKey(1), x, train=False)
    yf, mf = full.apply(v, x, train=True, mutable=['batch_stats'])
    ys, ms = same.apply(v, x, train=True, mutable=['batch_stats'])
    np.testing.assert_allclose(np.asarray(yf), np.asarray(ys),
                               rtol=1e-5, atol=1e-5)
    yk, mk = sub.apply(v, x, train=True, mutable=['batch_stats'])
    assert np.isfinite(np.asarray(yk)).all()
    # subset stats differ from full-batch stats
    d = jax.tree.map(lambda p, q: float(np.abs(np.asarray(p) -
                                               np.asarray(q)).max()),
                     mf['batch_stats'], mk['batch_stats'])
    assert max(jax.tree.leaves(d)) > 0
