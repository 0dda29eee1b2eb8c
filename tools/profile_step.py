#!/usr/bin/env python
"""Per-HLO-op profile of the fused train step (or inference forward).

Captures a jax.profiler device trace of a few chained steps and
aggregates per-op device time via xprof's `hlo_stats` converter —
the programmatic equivalent of TensorBoard's HLO op profile. This is
the measurement tool behind BENCH_NOTES.md's step-time breakdowns.

Usage:
  python tools/profile_step.py            # train step (bench.py config)
  python tools/profile_step.py --infer    # single-frame inference fwd
  env: BENCH_BATCH/BENCH_STACKS/BENCH_RES as for bench.py

Timing caveat (CLAUDE.md): wall clocks over the tunnel lie; the device
trace timestamps come from the TPU itself and are trustworthy. Don't
run while another TPU process is live.

KNOWN LIMITATION on the axon dev tunnel: the profiler trace capture
itself HANGS (blocked >25 min at 0% CPU, measured round 2) — this tool
works on directly-attached TPUs; over the tunnel use
tools/decompose_bench.py (phase-level timing) instead.
"""

import argparse
import glob
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np


def capture(fn_iter, trace_dir):
    """Run fn_iter() under the profiler; return the xplane.pb path."""
    import jax
    with jax.profiler.trace(trace_dir):
        fn_iter()
    paths = glob.glob(os.path.join(
        trace_dir, 'plugins', 'profile', '*', '*.xplane.pb'))
    if not paths:
        raise RuntimeError(f'no xplane.pb under {trace_dir}')
    return max(paths, key=os.path.getmtime)


def hlo_stats(xplane_path):
    """Aggregate device time by HLO category and by op name."""
    from xprof.convert import raw_to_tool_data
    data, _ = raw_to_tool_data.xspace_to_tool_data(
        [xplane_path], 'hlo_stats', {})
    if isinstance(data, bytes):
        data = data.decode('utf-8', 'replace')
    return data


def summarize(data, top):
    """Parse the hlo_stats payload; print category + top-op tables."""
    # payload is a gviz DataTable JSON; be liberal in what we accept
    obj = json.loads(data)
    if isinstance(obj, dict) and 'rows' in obj:
        cols = [c.get('label') or c.get('id') for c in obj['cols']]
        rows = [[c.get('v') for c in r['c']] for r in obj['rows']]
    else:
        print(data[:2000])
        return

    def col(name_part):
        for i, c in enumerate(cols):
            if c and name_part.lower() in c.lower():
                return i
        return None

    def first_col(*names, default=None):
        for n in names:
            j = col(n)
            if j is not None:
                return j
        return default

    i_cat = col('category')
    i_time = first_col('Total time (us)', 'Avg. time (us)', 'total_time',
                       'Total Time', 'total time', 'occurrences')
    i_name = first_col('HLO op name', 'name', default=0)
    i_expr = col('expression')

    tot = {}
    for r in rows:
        cat = r[i_cat] if i_cat is not None else '?'
        t = float(r[i_time] or 0)
        tot[cat] = tot.get(cat, 0.0) + t
    total = sum(tot.values()) or 1.0
    print(f'== device time by category (total {total/1e3:.2f} ms) ==')
    for k, v in sorted(tot.items(), key=lambda kv: -kv[1]):
        print(f'  {v/1e3:9.3f} ms  {100*v/total:5.1f}%  {k}')

    print(f'== top {top} ops ==')
    rows.sort(key=lambda r: -float(r[i_time] or 0))
    for r in rows[:top]:
        t = float(r[i_time] or 0)
        name = str(r[i_name])[:58]
        expr = ('  | ' + str(r[i_expr])[:90]) if i_expr is not None else ''
        cat = r[i_cat] if i_cat is not None else ''
        print(f'  {t/1e3:9.3f} ms  [{cat}] {name}{expr}')


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('--infer', action='store_true')
    p.add_argument('--iters', type=int, default=3)
    p.add_argument('--top', type=int, default=25)
    p.add_argument('--keep', default='', help='keep trace dir at this path')
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from hourglass_pose_estimation_tpu.models import HourglassNet

    # the single source of the benchmark config (BENCH_* env parsing)
    from bench import BATCH as B, STACKS as S, RES as R

    if args.infer:
        from hourglass_pose_estimation_tpu.export import make_inference_fn
        model = HourglassNet(num_stacks=S, num_blocks=1, num_classes=16,
                             dtype=jnp.bfloat16, out_dtype=jnp.float32)
        x0 = jnp.zeros((1, 64, 64, 3), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), x0, train=False)
        fn = jax.jit(make_inference_fn(model, variables, decode='quarter',
                                       fold_bn=True,
                                       weights_dtype=jnp.bfloat16))
        x = jnp.zeros((1, R, R, 3), jnp.float32)
        np.asarray(fn(x)[0])                        # compile + warm

        def run():
            out = x
            for _ in range(args.iters):
                kps, _ = fn(out[..., :3] if out.ndim == 4 else x)
                out = x + kps.sum() * 0.0           # chain dependency
            np.asarray(out).sum()
    else:
        from bench import build  # bench.py exposes the step builder
        step, state, raw, rng, _spec = build()
        state, metrics = step(state, raw, rng)       # compile + warm
        float(metrics['loss'])

        def run():
            nonlocal state
            m = metrics
            for _ in range(args.iters):
                state, m = step(state, raw, rng)
            float(m['loss'])                         # bound by value fetch

    trace_dir = args.keep or tempfile.mkdtemp(prefix='hgprof_')
    xp = capture(run, trace_dir)
    print(f'trace: {xp}')
    summarize(hlo_stats(xp), args.top)
    return 0


if __name__ == '__main__':
    sys.exit(main())
