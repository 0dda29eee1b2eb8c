"""Model summary / cost utilities."""

import jax
import jax.numpy as jnp

from hourglass_pose_estimation_tpu.utils.summary import (
    summarize, count_params, step_cost)
from hourglass_pose_estimation_tpu.models import HourglassNet


def test_summarize_table():
    model = HourglassNet(num_stacks=1, num_blocks=1, num_classes=4,
                         dtype=jnp.float32)
    table = summarize(model, (1, 64, 64, 3))
    assert 'HourglassNet' in table
    assert 'hg0' in table


def test_count_params_matches_tree():
    model = HourglassNet(num_stacks=1, num_blocks=1, num_classes=16,
                         dtype=jnp.float32)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                   train=False)
    assert count_params(v['params']) == 3_586_960


def test_step_cost_reports_flops():
    def f(x):
        return jnp.sum(x @ x)
    c = step_cost(f, jnp.ones((128, 128)))
    assert c.get('flops', 0) > 0
