#!/usr/bin/env python
"""Decompose the fused train step's time into its phases, honestly.

jax.profiler's trace capture hangs over this dev tunnel (measured; see
BENCH_NOTES.md), so the breakdown is measured directly: each phase is
jitted alone and iterated with every iteration chained through a data
dependency on the previous output, the final value fetched to the host
(CLAUDE.md timing discipline — block_until_ready acks early here).

Phases (same config as bench.py, env-overridable):
  full       on-device augment + fwd + loss + bwd + RMSprop (bench.py)
  augment    device augmentation + Gaussian target render only
  fwd        model forward only (pre-augmented input)
  fwdbwd     forward + loss + grad (no augment, no optimizer)
  opt        RMSprop update only (fixed grads)

Usage: python tools/decompose_bench.py [--iters 10]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np


def timed(label, run_chain, iters):
    run_chain(1)                                   # compile + warm
    t0 = time.perf_counter()
    run_chain(iters)
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f'{label:10s} {dt:8.2f} ms/iter')
    return dt


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('--iters', type=int, default=10)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from bench import build, BATCH, STACKS, RES
    from hourglass_pose_estimation_tpu.data.pipeline import augment_batch
    from hourglass_pose_estimation_tpu.loss import heatmap_mse_loss

    print(f'config: batch={BATCH} stacks={STACKS} res={RES}')
    # build() returns the exact spec the full step compiles with — the
    # phase programs below must decompose THAT program, not a copy
    step, state, raw, rng, spec = build()

    # -- full step --------------------------------------------------
    # the step donates its state: thread it across timed calls
    holder = {'s': state}

    def full(n):
        m = None
        for _ in range(n):
            holder['s'], m = step(holder['s'], raw, rng)
        float(m['loss'])
    t_full = timed('full', full, args.iters)
    state = holder['s']          # original buffers were donated away

    # -- augment only -----------------------------------------------
    @jax.jit
    def aug(rng, salt):
        rng = jax.random.fold_in(rng, salt)
        out = augment_batch(raw, rng, spec, True)
        # scalar summary to chain the next iteration through
        return (out['image'].sum() + out['target'].sum()).astype(jnp.int32)

    def augment(n):
        salt = jnp.int32(0)
        for _ in range(n):
            salt = aug(rng, salt)
        int(salt)
    t_aug = timed('augment', augment, args.iters)

    # -- forward only ------------------------------------------------
    data = jax.jit(lambda r: augment_batch(raw, r, spec, True))(rng)
    img = data['image']

    @jax.jit
    def fwd(x):
        outs = state.apply_fn(
            {'params': state.params, 'batch_stats': state.batch_stats},
            x, train=True, mutable=['batch_stats'])[0]
        return outs[-1].astype(jnp.float32).sum()

    def forward(n):
        x, acc = img, jnp.float32(0)
        for _ in range(n):
            acc = fwd(x + acc * 1e-30)
        float(acc)
    t_fwd = timed('fwd', forward, args.iters)

    # -- forward + backward ------------------------------------------
    tgt, tw = data['target'], data['target_weight']

    @jax.jit
    def fwdbwd(x):
        def loss_fn(params):
            outs, _ = state.apply_fn(
                {'params': params, 'batch_stats': state.batch_stats},
                x, train=True, mutable=['batch_stats'])
            return heatmap_mse_loss(outs, tgt, tw)
        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return loss + sum(jnp.sum(g).astype(jnp.float32)
                          for g in jax.tree.leaves(grads)) * 1e-30

    def fb(n):
        acc = jnp.float32(0)
        for _ in range(n):
            acc = fwdbwd(img + acc * 1e-30)
        float(acc)
    t_fb = timed('fwdbwd', fb, args.iters)

    # -- optimizer only ----------------------------------------------
    grads = jax.jit(jax.grad(lambda p: state.apply_fn(
        {'params': p, 'batch_stats': state.batch_stats},
        img[:1], train=False)[-1].astype(jnp.float32).sum()))(state.params)

    @jax.jit
    def opt(params, opt_state, salt):
        g = jax.tree.map(lambda x: x + salt * 1e-30, grads)
        updates, new_opt = state.tx.update(g, opt_state, params)
        import optax
        new_params = optax.apply_updates(params, updates)
        return new_params, new_opt, jax.tree.leaves(new_params)[0].ravel()[0]

    def optim(n):
        p_, o_, salt = state.params, state.opt_state, jnp.float32(0)
        for _ in range(n):
            p_, o_, salt = opt(p_, o_, salt)
        float(salt)
    t_opt = timed('opt', optim, args.iters)

    print(f'-- bwd-only ~ {t_fb - t_fwd:.2f} ms; '
          f'unattributed (full - aug - fwdbwd - opt) ~ '
          f'{t_full - t_aug - t_fb - t_opt:.2f} ms')
    return 0


if __name__ == '__main__':
    sys.exit(main())
