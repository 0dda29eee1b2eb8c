#!/usr/bin/env python
"""Production pipeline-split benchmark: device-side step time when the
augmentation lives on the HOST (the reference's own accounting — its
GPU never pays for augmentation, the DataLoader workers do).

Measures the host-pipeline-mode device program (normalize + Gaussian
render + fwd + bwd + RMSprop on a pre-augmented staged batch, i.e.
`make_train_step(device_pipeline=False)`) with chained value-fetch
timing on a device-resident batch. Together with the measured host
augment cost (~1.6 ms/img/core of cv2 work; see BENCH_NOTES — this
container's page-fault quirk inflates naive host measurements) this
bounds the achievable img/s/chip when a multi-core production host
overlaps augmentation with device compute.

Usage: python tools/split_pipeline_bench.py [--iters 10]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np

# the single source of the benchmark config (BENCH_* env parsing)
from bench import BATCH, STACKS, RES


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('--iters', type=int, default=10)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from hourglass_pose_estimation_tpu.models import HourglassNet
    from hourglass_pose_estimation_tpu.data import Synthetic, make_spec
    from hourglass_pose_estimation_tpu.runner.train_state import (
        make_optimizer, init_state, make_train_step)

    B, R, S = BATCH, RES, STACKS
    ds = Synthetic(True, num_samples=B, inp_res=R, out_res=R // 4, sigma=1,
                   scale_factor=0.25, rot_factor=30)
    spec = make_spec(ds)
    model = HourglassNet(num_stacks=S, num_blocks=1, num_classes=16,
                         mobile=False, skip_mode='sum', dtype=jnp.bfloat16)
    tx = make_optimizer(2.5e-3, [35, 45], 0.1, 100)
    state = init_state(model, jax.random.PRNGKey(0), (1, R, R, 3), tx)
    step = make_train_step(spec, device_pipeline=False)

    # a host-augmented batch, staged once (uint8 crops from host_batch;
    # the device program normalizes + renders targets + trains)
    host = ds.host_batch(list(range(B)), np.random.RandomState(0),
                         train=True)
    from hourglass_pose_estimation_tpu.data.pipeline import prepare_host_batch
    dev = prepare_host_batch({k: jax.device_put(v) for k, v in host.items()},
                             spec)

    # NOTE: prepare_host_batch (normalize + render) is part of the
    # device program in real training; here the staged batch is already
    # prepared, so add its cost separately below.
    rng = jax.random.PRNGKey(1)
    for _ in range(3):
        state, m = step(state, dev, rng)
    float(m['loss'])
    t0 = time.perf_counter()
    for _ in range(args.iters):
        state, m = step(state, dev, rng)
    float(m['loss'])
    dt_step = (time.perf_counter() - t0) / args.iters

    # prepare_host_batch cost (normalize + Gaussian render), chained
    raw = {k: jax.device_put(v) for k, v in host.items()}

    @jax.jit
    def prep(salt):
        out = prepare_host_batch(raw, spec)
        return (out['image'].sum() + out['target'].sum()).astype(
            jnp.float32) + salt * 1e-30
    s = prep(jnp.float32(0)); float(s)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        s = prep(s)
    float(s)
    dt_prep = (time.perf_counter() - t0) / args.iters

    total = dt_step + dt_prep
    print(f'device-side step (host-pipeline mode): '
          f'{dt_step * 1000:.1f} ms train + {dt_prep * 1000:.1f} ms '
          f'normalize/render = {total * 1000:.1f} ms '
          f'-> {B / total:.1f} img/s/chip '
          f'(host must supply {B / total:.0f} aug/s '
          f'~= {B / total * 1.6 / 1000:.1f} cv2 cores)')
    return 0


if __name__ == '__main__':
    sys.exit(main())
