"""Model summaries and profiling helpers.

The reference prints a torchsummary table at every model build
(`/root/reference/src/runner/trainer.py:34`) and wall-clock-times
inference (`estimator.py:87-90`); its only autotuning is
`cudnn.benchmark` (XLA's compiler subsumes that). Equivalents here:

  * `summarize(model, input_shape)` — flax tabulate: per-module
    shapes/params table + total param count;
  * `profile_step(fn, *args, trace_dir=...)` — capture a jax profiler
    trace of one call (open with TensorBoard/XProf or Perfetto);
  * `step_cost(fn, *args)` — XLA's own FLOP/bytes estimates for the
    compiled step (`cost_analysis`).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def count_params(params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))


def summarize(model, input_shape: Tuple[int, ...], train: bool = False,
              depth: Optional[int] = 2) -> str:
    """Tabulated module summary (torchsummary parity, flax-native)."""
    import flax.linen as nn
    x = jnp.zeros(input_shape, jnp.float32)
    return nn.tabulate(
        model, jax.random.PRNGKey(0), depth=depth,
        compute_flops=False, compute_vjp_flops=False)(x, train=train)


def profile_step(fn, *args, trace_dir: str = '/tmp/jax-trace',
                 allow_remote_tpu: bool = False):
    """Run fn once under the jax profiler; returns the trace dir.

    WARNING: over a tunneled/remote TPU transport (platform 'axon'),
    `jax.profiler.trace` can block indefinitely (observed >25 min at 0%
    CPU; see CLAUDE.md hazard 7) — on such backends this raises unless
    `allow_remote_tpu=True`; use tools/decompose_bench.py (chained
    value-fetch phase timing) there instead.
    """
    # the axon tunnel reports platform 'tpu' — detect the remote
    # transport by the backend's platform_version string instead
    import jax.extend.backend
    ver = getattr(jax.extend.backend.get_backend(), 'platform_version', '')
    if 'axon' in ver and not allow_remote_tpu:
        raise RuntimeError(
            "jax.profiler.trace hangs on the axon remote transport; "
            "pass allow_remote_tpu=True to force, or use "
            "tools/decompose_bench.py for phase timing")
    jax.block_until_ready(fn(*args))         # compile outside the trace
    with jax.profiler.trace(trace_dir):
        jax.block_until_ready(fn(*args))
    return trace_dir


def step_cost(fn, *args) -> dict:
    """XLA cost analysis of the compiled fn: flops, bytes accessed."""
    lowered = jax.jit(fn).lower(*args)
    compiled = lowered.compile()
    try:
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return dict(cost or {})
    except Exception:
        return {}
