#!/usr/bin/env python
"""Headline benchmark: 8-stack hourglass MPII-config training throughput.

Measures images/sec for the full fused train step — on-device
augmentation + Gaussian target rendering + forward + backward + RMSprop
— for the flagship config (8 stacks, full (non-mobile) blocks, 16
joints, 256x256 input, bf16 compute), on whatever accelerator jax
exposes (one TPU chip under the driver).

Prints ONE JSON line:
  {"metric": "train_images_per_sec_8stack_256", "value": N,
   "unit": "img/s/chip", "vs_baseline": N}

vs_baseline: the reference publishes no numbers (BASELINE.md), so the
denominator is the BASELINE.json north-star target of 4x an A100
running the same model. A100 throughput for an 8-stack hourglass
(25.6M params, ~41 GF fwd @256^2, ~123 GF train) at a generous 40% MFU
in bf16 is ~350 img/s, so the target is 1400 img/s; vs_baseline =
value / 1400 (>= 1.0 meets the north star). Sensitivity: at 30-50%
A100 MFU the target band is 1050-1750 img/s — vs_baseline carries
roughly +-35% of denominator uncertainty (see BENCH_NOTES.md).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

A100_ESTIMATE_IMG_S = 350.0
TARGET = 4.0 * A100_ESTIMATE_IMG_S

BATCH = int(os.environ.get('BENCH_BATCH', '64'))
STACKS = int(os.environ.get('BENCH_STACKS', '8'))
RES = int(os.environ.get('BENCH_RES', '256'))
REMAT = os.environ.get('BENCH_REMAT', '0') == '1'
BN_SAMPLES = int(os.environ.get('BENCH_BN_SAMPLES', '0'))
# overlap mode: batch N+1's augmentation is computed inside the same XLA
# program as batch N's fwd/bwd (runner/train_state.py
# make_overlapped_train_step) so the warp gathers (HBM/VPU) can hide
# under the conv work (MXU) instead of serializing in front of it.
OVERLAP = os.environ.get('BENCH_OVERLAP', '0') == '1'
WARMUP = 3
ITERS = int(os.environ.get('BENCH_ITERS', '10'))


def build():
    """Construct (step, state, raw, rng, spec) for the headline config.

    Shared with tools/profile_step.py so profiles measure exactly the
    benchmarked program.
    """
    import jax
    import jax.numpy as jnp
    from hourglass_pose_estimation_tpu.models import HourglassNet
    from hourglass_pose_estimation_tpu.data import Synthetic, make_spec
    from hourglass_pose_estimation_tpu.runner.train_state import (
        make_optimizer, init_state, make_train_step)

    ds = Synthetic(True, num_samples=BATCH, inp_res=RES, out_res=RES // 4,
                   sigma=1, scale_factor=0.25, rot_factor=30)
    spec = make_spec(ds)
    model = HourglassNet(num_stacks=STACKS, num_blocks=1, num_classes=16,
                         mobile=False, skip_mode='sum', dtype=jnp.bfloat16,
                         remat=REMAT, bn_stat_samples=BN_SAMPLES)
    tx = make_optimizer(2.5e-3, [35, 45], 0.1, 100)
    state = init_state(model, jax.random.PRNGKey(0), (1, RES, RES, 3), tx)
    step = make_train_step(spec, device_pipeline=True)

    raw = ds.canvas_batch(list(range(BATCH)), canvas=RES)
    raw = {k: jax.device_put(v) for k, v in raw.items()}
    rng = jax.random.PRNGKey(1)
    return step, state, raw, rng, spec


def main():
    step, state, raw, rng, spec = build()

    if OVERLAP:
        # reuse build()'s spec so both modes benchmark the identical
        # augmentation distribution by construction
        from hourglass_pose_estimation_tpu.runner.train_state import (
            make_overlapped_train_step, make_stage_fn)
        ostep = make_overlapped_train_step(spec)
        staged = make_stage_fn(spec)(raw, rng, state.step)

        def step(state_, raw_, rng_, _s=[staged]):
            state_, _s[0], metrics = ostep(state_, _s[0], raw_, rng_)
            return state_, metrics

    # one base key: the step folds in state.step on device (host-side
    # per-step key splitting is a device round-trip on this platform).
    # NOTE: timing is bounded by an actual host VALUE fetch of the final
    # step's loss — on this TPU tunnel, block_until_ready alone acks
    # before execution completes and under-reports wildly.
    for i in range(WARMUP):
        state, metrics = step(state, raw, rng)
    float(metrics['loss'])

    t0 = time.perf_counter()
    for i in range(ITERS):
        state, metrics = step(state, raw, rng)
    final_loss = float(metrics['loss'])   # forces the whole chain
    dt = time.perf_counter() - t0
    assert np.isfinite(final_loss)

    img_s = BATCH * ITERS / dt
    print(json.dumps({
        'metric': f'train_images_per_sec_{STACKS}stack_{RES}',
        'value': round(img_s, 2),
        'unit': 'img/s/chip',
        'vs_baseline': round(img_s / TARGET, 4),
    }))


if __name__ == '__main__':
    main()
