#!/usr/bin/env python
"""Single-image inference latency benchmark (BASELINE.md <5 ms target).

Measures the 8-stack (and 2-stack mobile) 256x256 single-frame forward
on the attached accelerator, with the deploy-surface optimizations
selectable: folded batch-norm constants, bf16 conv kernels, and the
keypoint decode fused into the same XLA program (the exported artifact
surface — frames in, keypoints out).

Timing discipline (CLAUDE.md): every sample is bounded by a host VALUE
fetch; the tunnel's round-trip floor is measured with a trivial 1-op
program the same chained way. Floor and model reps are INTERLEAVED so
host contention biases both alike (a floor measured in a different
load regime than the model produced negative "device-side" numbers in
round 2), and a floor exceeding the model median is reported as
unreliable instead of a negative subtraction.
Do not run while another TPU process is live.

--end-to-end adds the deploy path measured from HOST uint8 frames:
each call ships a fresh camera-resolution uint8 frame (H2D; default
720p, --frame-res to change) into the fused preprocess (/255 ->
bilinear resize to the network input -> normalize) + forward + decode
program — the preprocess-inclusive serving number. The frame must be
larger than --res or the fused resize degenerates to identity.

Usage: python tools/latency_bench.py [--stacks 8] [--iters 30]
       [--no-fold] [--no-bf16] [--decode quarter|dark|none]
       [--end-to-end]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np


def make_rep(fn, arg, host_input=False):
    """Return rep(chain) -> ms/call: one chained, value-fetch-bounded
    measurement of `chain` serialized calls.

    The tunnel round trip is ~26-45 ms and JITTERS by >15 ms run to
    run, so single-call-minus-RTT timing is garbage. Each rep runs
    `chain` calls serialized through a data dependency (the next input
    is perturbed by a scalar from the previous output) and pays ONE
    value fetch; the RTT amortizes to RTT/chain and its jitter with it.

    host_input=True: `arg` stays a host numpy array and is re-shipped
    every call (fresh H2D per frame — the end-to-end serving shape);
    the chain then threads only the salt.
    """
    import jax
    import jax.numpy as jnp

    if host_input:
        def chained(x, salt):
            out = fn(x)
            first = out[0] if isinstance(out, tuple) else out
            return out, salt + first.ravel()[0].astype(jnp.float32) * 1e-30
    else:
        def chained(x, salt):
            out = fn(x + salt * 1e-30)
            first = out[0] if isinstance(out, tuple) else out
            return out, first.ravel()[0].astype(jnp.float32)

    run = jax.jit(chained)
    _, salt = run(arg, jnp.float32(0))
    float(salt)                                  # compile + warm

    def rep(chain):
        t0 = time.perf_counter()
        salt = jnp.float32(0)
        for _ in range(chain):
            _, salt = run(arg, salt)
        float(salt)                              # one fetch bounds all
        return (time.perf_counter() - t0) / chain * 1000.0
    return rep


def measure_interleaved(reps_by_name, chain, iters):
    """Alternate one rep of each measurement per round so slow-varying
    host contention biases all of them equally."""
    out = {name: [] for name in reps_by_name}
    for _ in range(iters):
        for name, rep in reps_by_name.items():
            out[name].append(rep(chain))
    return {name: np.asarray(ts) for name, ts in out.items()}


def report(name, ts, floor_ts):
    med = float(np.median(ts))
    floor = float(np.median(floor_ts))
    dev = (f'device-side ~{med - floor:.2f} ms' if med > floor else
           'device-side unresolved (floor >= model: host-contended run)')
    print(f'{name}: median {med:.2f} ms/call | per-call floor '
          f'{floor:.2f} ms | {dev} '
          f'(min {ts.min():.2f}, p90 {np.percentile(ts, 90):.2f})')


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('--stacks', type=int, default=8)
    p.add_argument('--mobile', action='store_true')
    p.add_argument('--res', type=int, default=256)
    p.add_argument('--batch', type=int, default=1,
                   help='>1: batched serving throughput (img/s) instead '
                        'of single-frame latency')
    p.add_argument('--iters', type=int, default=10)
    p.add_argument('--chain', type=int, default=25)
    p.add_argument('--decode', default='quarter',
                   choices=['quarter', 'dark', 'none'])
    p.add_argument('--no-fold', action='store_true')
    p.add_argument('--no-bf16', action='store_true')
    p.add_argument('--fuse', action='store_true',
                   help='MODEL.fuse_block: Pallas fused bottleneck on '
                        'the eligible (identity-residual, >=16^2) blocks')
    p.add_argument('--end-to-end', action='store_true')
    p.add_argument('--frame-res', type=int, nargs=2, default=(720, 1280),
                   metavar=('H', 'W'),
                   help='camera frame size shipped per e2e call')
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from hourglass_pose_estimation_tpu.models import HourglassNet
    from hourglass_pose_estimation_tpu.export import make_inference_fn

    model = HourglassNet(num_stacks=args.stacks, num_blocks=1,
                         num_classes=16, mobile=args.mobile,
                         skip_mode='sum', dtype=jnp.bfloat16,
                         out_dtype=jnp.float32, fuse_block=args.fuse)
    x = jnp.zeros((args.batch, args.res, args.res, 3), jnp.float32)
    # params/stats are resolution-independent: init at 64^2 to avoid
    # compiling a second full-res forward program just for init
    x0 = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x0, train=False)

    fn = jax.jit(make_inference_fn(
        model, variables,
        decode=None if args.decode == 'none' else args.decode,
        fold_bn=not args.no_fold,
        weights_dtype=None if args.no_bf16 else jnp.bfloat16))

    probe = jnp.zeros((16, 2), jnp.float32)
    reps = {
        'floor': make_rep(lambda t: t + 1, probe),
        'model': make_rep(fn, x),
    }

    if args.end_to_end:
        # the exact deploy artifact program: preprocess fused via
        # make_inference_fn (same code path EVAL.export_preprocess
        # exports) with the canonical dataset statistics — not a
        # hand-copied preprocess that could drift from the artifact
        from hourglass_pose_estimation_tpu.data.meanstd import get_meanstd
        e2e = jax.jit(make_inference_fn(
            model, variables,
            decode=None if args.decode == 'none' else args.decode,
            fold_bn=not args.no_fold,
            weights_dtype=None if args.no_bf16 else jnp.bfloat16,
            preprocess=get_meanstd('mpii'), input_res=args.res))

        fh, fw = args.frame_res
        # camera-resolution frame: the resize must actually run (at
        # (res, res) it would early-return identity) and the H2D bytes
        # must match a real deploy's per-frame volume
        frame = np.random.RandomState(0).randint(
            0, 255, (args.batch, fh, fw, 3)).astype(np.uint8)
        reps[f'e2e(H2D {fh}x{fw}+preproc)'] = make_rep(
            e2e, frame, host_input=True)

    ts = measure_interleaved(reps, args.chain, args.iters)
    name = (f'{args.stacks}-stack{" mobile" if args.mobile else ""} '
            f'{args.res}^2 decode={args.decode} fold={not args.no_fold} '
            f'bf16w={not args.no_bf16}')
    print(f'[interleaved floor/model reps, chain={args.chain}, '
          f'iters={args.iters}]')
    for key in reps:
        if key == 'floor':
            continue
        report(f'{name} [{key}]', ts[key], ts['floor'])
        if args.batch > 1:
            med = float(np.median(ts[key]))
            print(f'  batched serving throughput @B={args.batch}: '
                  f'{args.batch / med * 1000.0:.0f} img/s')
    return 0


if __name__ == '__main__':
    sys.exit(main())
