#!/usr/bin/env python
"""Multi-chip scaling evidence (VERDICT round-2 item 5): put numbers
under the data-parallel projection instead of math-only claims.

1. All-reduce volume: compile the REAL dp-sharded train step (8-stack
   flagship params; 64^2 input — the gradient all-reduce volume depends
   only on the parameter count) over a virtual 8-device CPU mesh and
   sum the bytes of every all-reduce in the optimized HLO. Compare
   against the measured 124 ms backward window on v5e ICI bandwidth.

2. Host-feed requirement: the chip consumes ~290 img/s of 256^2 uint8
   canvases (~57 MB/s + targets). Measure the native loader's
   (native/hostloader.cpp) JPEG->canvas throughput per thread on
   generated MPII-sized JPEGs to bound how many host cores keep one
   chip fed.

Usage: python tools/scaling_evidence.py [--skip-hlo] [--skip-loader]
"""

import argparse
import os
import re
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np

# v5e interconnect: 4 ICI links/chip, ~100 GB/s/dir each usable;
# conservative effective all-reduce bandwidth per chip
ICI_GBPS = 100.0
BWD_MS = 124.0          # measured backward window (BENCH_NOTES round 2)
IMG_S = 290.0           # measured single-chip throughput


def hlo_allreduce_bytes(stacks=8):
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from hourglass_pose_estimation_tpu.parallel import (
        make_mesh, batch_sharding, replicated_sharding)
    from hourglass_pose_estimation_tpu.models import HourglassNet
    from hourglass_pose_estimation_tpu.data import Synthetic, make_spec
    from hourglass_pose_estimation_tpu.runner.train_state import (
        make_optimizer, init_state, make_train_step)

    mesh = make_mesh(len(jax.devices()), 1)
    ds = Synthetic(True, num_samples=8, inp_res=64, out_res=16, sigma=1,
                   scale_factor=0.25, rot_factor=30)
    spec = make_spec(ds)
    model = HourglassNet(num_stacks=stacks, num_blocks=1, num_classes=16,
                         dtype=jnp.bfloat16)
    tx = make_optimizer(2.5e-3, [35, 45], 0.1, 100)
    state = init_state(model, jax.random.PRNGKey(0), (1, 64, 64, 3), tx)
    state = jax.device_put(state, replicated_sharding(mesh))
    raw = ds.canvas_batch(list(range(8)), canvas=64)
    raw = {k: jax.device_put(v, batch_sharding(mesh)) for k, v in raw.items()}
    step = make_train_step(spec, device_pipeline=True)

    lowered = step.lower(state, raw, jax.random.PRNGKey(1))
    hlo = lowered.compile().as_text()

    dtype_bytes = {'f32': 4, 'bf16': 2, 'f16': 2, 'u32': 4, 's32': 4,
                   'f64': 8, 'u8': 1, 's8': 1, 'pred': 1}
    # collective result shapes: "f32[256,512]{...} all-reduce(" and
    # tuple-shaped variants "(f32[64]{0}, ..., /*index=5*/ f32[3,3,128,128],
    # ...) all-reduce". The match must be GREEDY: tuple shapes embed
    # /*index=N*/ comments containing '=', which a lazy match stops at
    # (that bug under-counted the gradient all-reduce 100x).
    out = {}
    for op in ('all-reduce', 'reduce-scatter', 'all-gather'):
        total = 0
        count = 0
        for m in re.finditer(r'= (.*) %s(?:-start)?\(' % op, hlo):
            shapes = re.findall(r'(\w+)\[([\d,]*)\]', m.group(1))
            for dt, dims in shapes:
                n = 1
                for d in dims.split(','):
                    if d:
                        n *= int(d)
                total += n * dtype_bytes.get(dt, 4)
                count += 1
        out[op] = (count, total)
    return out


def loader_throughput(n_imgs=48, size=(720, 1280), canvas=256):
    import cv2
    from hourglass_pose_estimation_tpu.data.native import get_lib
    lib = get_lib()
    if lib is None:
        print('native loader unavailable (no g++/libjpeg)')
        return None
    from hourglass_pose_estimation_tpu.data import native as native_mod

    tmp = tempfile.mkdtemp(prefix='loaderbench_')
    rng = np.random.RandomState(0)
    paths = []
    for i in range(n_imgs):
        # photo-like content (smooth regions + structure), not raw
        # noise — noise JPEGs are ~4x larger than real photographs and
        # would overstate the decode cost
        img = rng.randint(0, 255, (size[0] // 8, size[1] // 8, 3))
        img = cv2.resize(img.astype(np.uint8), (size[1], size[0]),
                         interpolation=cv2.INTER_CUBIC)
        p = os.path.join(tmp, f'{i}.jpg')
        cv2.imwrite(p, img, [cv2.IMWRITE_JPEG_QUALITY, 90])
        paths.append(p)
    jpeg_mb = sum(os.path.getsize(p) for p in paths) / 1e6

    out = {}
    for threads in (1, 4):
        # untimed warm-up: first-touch faults on fresh mmap'd output
        # buffers transiently cost 100-300 us/page on this container
        # (CLAUDE.md hazard 8) and would corrupt the first timed rep
        native_mod.load_canvas_batch(paths, canvas, threads=threads)
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            res = native_mod.load_canvas_batch(paths, canvas,
                                               threads=threads)
        dt = (time.perf_counter() - t0) / reps
        assert res is not None
        out[threads] = n_imgs / dt
    return out, jpeg_mb / n_imgs


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('--skip-hlo', action='store_true')
    p.add_argument('--skip-loader', action='store_true')
    p.add_argument('--stacks', type=int, default=8)
    args = p.parse_args(argv)

    import jax
    jax.config.update('jax_platforms', 'cpu')
    jax.config.update('jax_num_cpu_devices', 8)

    if not args.skip_hlo:
        colls = hlo_allreduce_bytes(args.stacks)
        mb = 0.0
        for op, (n, bytes_) in colls.items():
            print(f'[collectives] {op}: {n} shapes, '
                  f'{bytes_ / 1e6:.2f} MB in the dp-sharded HLO')
            mb += bytes_ / 1e6
        dp = 8
        # ring all-reduce moves 2*(dp-1)/dp of the volume through each link
        wire = 2 * (dp - 1) / dp * mb
        t_ms = wire / ICI_GBPS          # MB / (GB/s) = ms
        print(f'[collectives] total {mb:.1f} MB; ring volume at dp=8: '
              f'{wire:.1f} MB/chip -> ~{t_ms:.2f} ms at '
              f'{ICI_GBPS:.0f} GB/s ICI '
              f'({100 * t_ms / BWD_MS:.1f}% of the {BWD_MS:.0f} ms '
              f'backward window it overlaps with)')

    if not args.skip_loader:
        res = loader_throughput()
        if res:
            rates, mb_img = res
            need_mb = IMG_S * (256 * 256 * 3) / 1e6
            print(f'[host-feed] chip consumes {IMG_S:.0f} img/s '
                  f'= {need_mb:.0f} MB/s of 256^2 canvases')
            for threads, rate in rates.items():
                print(f'[host-feed] native loader ({threads} thread'
                      f'{"s" if threads > 1 else ""}): {rate:.0f} img/s '
                      f'JPEG({mb_img * 1e3:.0f} kB avg)->canvas; '
                      f'{IMG_S / rate:.1f} cores keep one chip fed')
    return 0


if __name__ == '__main__':
    sys.exit(main())
