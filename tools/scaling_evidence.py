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

    # collective result shapes: "f32[256,512]{...} all-reduce(" and
    # tuple-shaped variants "(f32[64]{0}, ..., /*index=5*/ f32[3,3,128,128],
    # ...) all-reduce". The match must be GREEDY: tuple shapes embed
    # /*index=N*/ comments containing '=', which a lazy match stops at
    # (that bug under-counted the gradient all-reduce 100x).
    return _hlo_collective_bytes(
        hlo, ('all-reduce', 'reduce-scatter', 'all-gather'))


def _hlo_collective_bytes(hlo, ops):
    """Sum result-shape bytes of each collective op kind in an HLO text
    (greedy shape match — tuple shapes embed /*index=N*/ comments)."""
    dtype_bytes = {'f32': 4, 'bf16': 2, 'f16': 2, 'u32': 4, 's32': 4,
                   'f64': 8, 'u8': 1, 's8': 1, 'pred': 1}
    out = {}
    for op in ops:
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


def pipeline_evidence(m_list=(1, 2, 4, 8), feats=64, res=64, b=16,
                      stacks=8):
    """Census the ('data','pipe') pipelined train step (VERDICT round-4
    item 5): collective-permute volume and the GPipe bubble, measured
    from the COMPILED program instead of the math-only claim.

    Methodology: the schedule is uniform SPMD — masked ticks compute on
    garbage — so executed compute per step is proportional to
    T = M + P - 1 ticks while only M are useful; on real hardware the
    same fraction manifests as stage idle time. Two measurements:

      * ppermute volume: per-tick payload read from the compiled HLO's
        collective-permute result shapes, times the scan trip count T
        (static in the program) for the forward and the transposed
        backward scan.
      * bubble: XLA's cost analysis counts the scan BODY once (its
        flops scale with the microbatch size, verified 8x between M=1
        and M=8), so executed compute per step = body flops x T; per
        IMAGE that is body x T / shard, compared across M against the
        GPipe wasted-compute ratio (M+P-1)/M. Wall-clock per-step
        timing is deliberately NOT used: on this 1-core host one
        8-stack virtual-mesh step takes minutes, and the compiled-flops
        census is exact where wall clock would be noise-dominated.
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh
    from hourglass_pose_estimation_tpu.models.hourglass import (
        HourglassStem, HourglassStack)
    from hourglass_pose_estimation_tpu.parallel.pipeline import (
        init_pipeline, make_pipeline_train_step, shard_pipeline_state)
    from hourglass_pose_estimation_tpu.runner.train_state import (
        make_optimizer)

    pp, dp = 4, 2
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(dp, pp),
                ('data', 'pipe'))
    stem = HourglassStem(num_feats=feats, dtype=jnp.float32)
    stack = HourglassStack(num_feats=feats, num_blocks=1, num_classes=16,
                           dtype=jnp.float32)
    tx = make_optimizer(2.5e-3, [35, 45], 0.1, 10, flat=False)
    key = jax.random.PRNGKey(0)
    imgs = 0.05 * jax.random.normal(key, (b, res, res, 3), jnp.float32)
    tgt = jax.nn.sigmoid(jax.random.normal(
        jax.random.fold_in(key, 1), (b, res // 4, res // 4, 16)))
    tw = jnp.ones((b, 16), jnp.float32)

    print(f'[pipeline] mesh dp{dp}xpp{pp}, {stacks}-stack {feats}-feat, '
          f'{res}^2, batch {b} (shard {b // dp})')
    rows = []
    for M in m_list:
        state = init_pipeline(stem, stack, jax.random.PRNGKey(2), stacks,
                              tx, inp_res=res)
        state = shard_pipeline_state(state, mesh)
        step = make_pipeline_train_step(stem, stack, mesh,
                                        num_microbatches=M, train=True)
        compiled = step.lower(state, imgs, tgt, tw).compile()
        colls = _hlo_collective_bytes(
            compiled.as_text(), ('collective-permute', 'all-reduce'))
        ncp, bcp = colls['collective-permute']
        nar, bar = colls['all-reduce']
        T = M + pp - 1
        cost = compiled.cost_analysis()
        cost = cost[0] if isinstance(cost, (list, tuple)) else cost
        body_gf = float(cost.get('flops', 0.0)) / 1e9
        executed = body_gf * T
        rows.append((M, T, ncp, bcp, nar, bar, executed))
        print(f'[pipeline] M={M} (T={T} ticks): collective-permute '
              f'x{ncp}/tick, {bcp / 1e6:.2f} MB/tick x T = '
              f'{bcp * T / 1e6:.1f} MB/step executed; all-reduce x{nar} '
              f'{bar / 1e6:.2f} MB/step; scan body {body_gf:.1f} GF x T '
              f'= {executed:.1f} GF/step executed '
              f'({executed / (b // dp):.2f} GF/img)')

    base = rows[-1]
    print('[pipeline] bubble (executed GF/img relative to '
          f'M={base[0]}, vs GPipe (M+P-1)/M wasted-compute ratio):')
    for M, T, _, _, _, _, ex in rows:
        meas = ex / base[6]
        pred = ((M + pp - 1) / M) / ((base[0] + pp - 1) / base[0])
        print(f'[pipeline]   M={M}: measured {meas:.2f}x, '
              f'GPipe {pred:.2f}x')
    # projection at the flagship config: per-tick inter-stage payload is
    # microbatch x 64x64x256 bf16 activations (fwd) + the same for the
    # bwd cotangents; one chip does 221 ms/step at B=64
    shard = 64  # flagship per-pipeline batch
    for M in m_list:
        mb = shard / M
        tick_mb = mb * 64 * 64 * 256 * 2 / 1e6
        wire = 2 * tick_mb * (M + pp - 1) / 1e3  # GB through each link
        t_comm = wire / ICI_GBPS * 1e3           # ms, if not overlapped
        t_comp = 221.0 * (M + pp - 1) / M / pp
        print(f'[pipeline] projected pp={pp} flagship M={M}: compute '
              f'{t_comp:.0f} ms + ppermute {t_comm:.1f} ms unoverlapped '
              f'-> ~{shard / (t_comp + t_comm) * 1e3:.0f} img/s per '
              f'pipeline ({(shard / (t_comp + t_comm) * 1e3) / 290:.1f}x '
              f'single-chip)')
    return rows


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
    p.add_argument('--pipeline', action='store_true',
                   help='census the (data,pipe) pipelined step: '
                        'ppermute bytes + bubble vs microbatch count')
    p.add_argument('--stacks', type=int, default=8)
    args = p.parse_args(argv)

    import jax
    jax.config.update('jax_platforms', 'cpu')
    jax.config.update('jax_num_cpu_devices', 8)

    if args.pipeline:
        pipeline_evidence(stacks=args.stacks)
        return 0

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
