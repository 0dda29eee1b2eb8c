#!/usr/bin/env python
"""Adjudicate the render / pool / decode Pallas kernels IN CONTEXT.

VERDICT round-3 item 4: each kernel is validated vs its oracle but its
perf verdict must be measured where it would actually run:

  * render — inside the jitted train-mode augment program
    (data/pipeline.py augment_batch) at the flagship shape;
  * pool   — inside the full 8-stack eval forward and standard train
    step (flax.linen.max_pool is routed to maxpool2x2_pallas for the
    measurement; it has a custom VJP so the backward is exercised too);
  * decode — the deploy decode core (ops/decode.get_preds_zero_based +
    quarter refinement vs ops/pallas/decode.decode_peaks_pallas) on
    [B, 64, 64, J] heatmaps.

Honest timing per CLAUDE.md: every repetition is chained through a data
dependency inside ONE jitted program (difference quotient of two chain
lengths removes dispatch+fetch overhead), bounded by a host value fetch.

Usage: python tools/kernel_adjudicate.py [render|pool|decode|all]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

BATCH = int(os.environ.get('ADJ_BATCH', '64'))
RES = int(os.environ.get('ADJ_RES', '256'))
REPS = 5
K1, K2 = 2, 8


def _timed(fn, *args):
    """Best-of-REPS wall time of float(fn(*args)) after a warm call."""
    float(fn(*args))
    best = float('inf')
    for _ in range(REPS):
        t0 = time.perf_counter()
        float(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best * 1000.0


def _flagship_raw():
    from hourglass_pose_estimation_tpu.data import Synthetic, make_spec
    import jax
    ds = Synthetic(True, num_samples=BATCH, inp_res=RES, out_res=RES // 4,
                   sigma=1, scale_factor=0.25, rot_factor=30)
    spec = make_spec(ds)
    raw = ds.canvas_batch(list(range(BATCH)), canvas=RES)
    raw = {k: jax.device_put(v) for k, v in raw.items()}
    return ds, spec, raw


def adjudicate_render():
    import jax
    import jax.numpy as jnp
    from hourglass_pose_estimation_tpu.data import pipeline as pl_mod
    from hourglass_pose_estimation_tpu.ops.heatmap import (
        render_gaussian_targets)
    from hourglass_pose_estimation_tpu.ops.pallas import (
        render_gaussian_targets_pallas)

    ds, spec, raw = _flagship_raw()
    orig = pl_mod.render_gaussian_targets

    def chain(k):
        @jax.jit
        def f(raw, rng):
            acc = jnp.float32(0)
            for i in range(k):
                data = pl_mod.augment_batch(raw, jax.random.fold_in(rng, i),
                                            spec, True)
                s = data['target'].sum() + data['image'].sum()
                acc = acc + s
                rng = jax.random.fold_in(rng, (s * 0).astype(jnp.int32))
            return acc
        return f

    rng = jax.random.PRNGKey(0)
    for label, render in (('xla', render_gaussian_targets),
                          ('pallas', render_gaussian_targets_pallas)):
        pl_mod.render_gaussian_targets = render
        try:
            t1 = _timed(chain(K1), raw, rng)
            t2 = _timed(chain(K2), raw, rng)
        finally:
            pl_mod.render_gaussian_targets = orig
        m = (t2 - t1) / (K2 - K1)
        print(f'render {label:8s} augment-program marginal {m:7.3f} ms '
              f'(k{K1} {t1:.2f} -> k{K2} {t2:.2f})')


def adjudicate_pool():
    import jax
    import jax.numpy as jnp
    import flax.linen as nn
    from hourglass_pose_estimation_tpu.ops.pallas import maxpool2x2_pallas
    from hourglass_pose_estimation_tpu.runner.train_state import (
        make_train_step, make_eval_step, make_optimizer, init_state)
    from hourglass_pose_estimation_tpu.models import HourglassNet

    ds, spec, raw = _flagship_raw()
    orig = nn.max_pool

    def routed(x, window, strides=None, padding='VALID'):
        if (window == (2, 2) and strides == (2, 2) and padding == 'VALID'
                and jax.default_backend() == 'tpu'):
            return maxpool2x2_pallas(x)
        return orig(x, window, strides=strides, padding=padding)

    rng = jax.random.PRNGKey(1)
    for label, pool in (('xla', orig), ('pallas', routed)):
        nn.max_pool = pool
        try:
            model = HourglassNet(num_stacks=8, num_blocks=1, num_classes=16,
                                 dtype=jnp.bfloat16)
            tx = make_optimizer(2.5e-3, [35, 45], 0.1, 100)
            state = init_state(model, jax.random.PRNGKey(0),
                               (1, RES, RES, 3), tx)
            step = make_train_step(spec, device_pipeline=True)

            def train_loop(state):
                for _ in range(3):
                    state, m = step(state, raw, rng)
                float(m['loss'])
                t0 = time.perf_counter()
                n = 10
                for _ in range(n):
                    state, m = step(state, raw, rng)
                float(m['loss'])
                return (time.perf_counter() - t0) / n * 1e3

            ms = train_loop(state)
            print(f'pool   {label:8s} train step {ms:8.2f} ms '
                  f'({BATCH / ms * 1e3:.1f} img/s)')
        finally:
            nn.max_pool = orig


def adjudicate_decode():
    import jax
    import jax.numpy as jnp
    from hourglass_pose_estimation_tpu.ops.decode import (
        get_preds_zero_based)
    from hourglass_pose_estimation_tpu.ops.pallas import decode_peaks_pallas

    hm = jax.random.uniform(jax.random.PRNGKey(0), (BATCH, 64, 64, 16),
                            jnp.float32)

    def chain(core, k):
        @jax.jit
        def f(hm):
            acc = jnp.float32(0)
            h = hm
            for _ in range(k):
                coords, maxv = core(h)
                s = coords.sum() + maxv.sum()
                acc = acc + s
                h = hm + (s * 0)
            return acc
        return f

    def xla_core(h):
        preds, maxv = get_preds_zero_based(h)
        return preds, maxv

    def pallas_core(h):
        return decode_peaks_pallas(h)

    for label, core in (('xla', xla_core), ('pallas', pallas_core)):
        t1 = _timed(chain(core, K1), hm)
        t2 = _timed(chain(core, K2), hm)
        m = (t2 - t1) / (K2 - K1)
        print(f'decode {label:8s} core marginal {m:7.3f} ms '
              f'(k{K1} {t1:.2f} -> k{K2} {t2:.2f})')


def main(argv=None):
    which = (argv or sys.argv[1:] or ['all'])[0]
    import jax
    print(f'devices: {jax.devices()}')
    if which in ('all', 'render'):
        adjudicate_render()
    if which in ('all', 'pool'):
        adjudicate_pool()
    if which in ('all', 'decode'):
        adjudicate_decode()


if __name__ == '__main__':
    main()
