#!/usr/bin/env python
"""Deployment demos for exported models (sync + async double-buffered).

TPU-framework analogue of the reference's OpenVINO visualizer tools
(`/root/reference/tools/openvino_visualizer/{sync,async}_inference.py`):
consume an exported StableHLO artifact (scripts/export.py), run timed
single-image inference with optional per-op profiling, or a
double-buffered pipelined loop over a directory of frames that overlaps
host preprocessing with device execution (the analogue of the
reference's two ping-ponged OpenVINO infer requests).

Usage:
    python tools/serving_demo.py sync  <model.stablehlo> <image> [--iters 50] [--profile <dir>]
    python tools/serving_demo.py async <model.stablehlo> <frame_dir> <out_dir>
"""

import argparse
import glob
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np


def _load(model_path):
    from hourglass_pose_estimation_tpu.export import load_stablehlo
    return load_stablehlo(model_path)


def _prep(image_path, res, mean, std, raw=False):
    import cv2
    frame = cv2.imread(image_path)
    if frame is None:
        raise FileNotFoundError(image_path)
    if raw:
        # preprocess-fused artifact (EVAL.export_preprocess): ship raw
        # uint8 at the artifact's input resolution; /255 + normalize
        # (and any residual resize) run inside the exported program
        return frame, cv2.resize(frame, (res, res))[None]
    x = frame.astype(np.float32) / 255.0
    x = (x - np.asarray(mean, np.float32)) / np.asarray(std, np.float32)
    x = cv2.resize(x, (res, res))
    return frame, x[None]


def _decode_draw(frame, out, skeleton=False, res=256):
    import cv2
    h, w = frame.shape[:2]
    if isinstance(out, (tuple, list)):
        # keypoints-surface artifact (EVAL.export_keypoints): (kps in
        # network-input pixels, maxvals) — scale to the frame and draw
        # the joints whose peak clears the same 0.02 confidence gate the
        # heatmaps branch applies (an argmax of a near-zero map is noise)
        kps = np.asarray(out[0])[0] * np.array([w / res, h / res])
        conf = np.asarray(out[1])[0].reshape(-1)
        for (x, y), c in zip(kps, conf):
            if c > 0.02:
                cv2.circle(frame, (int(x), int(y)), 5, (0, 0, 255), -1)
        return frame
    heatmaps = out
    if skeleton:
        # NMS multi-peak decode (on device) + skeleton-line rendering —
        # the reference's post_process_heatmap + visualize path
        # (openvino_visualizer/utils.py:35-96).
        from hourglass_pose_estimation_tpu.ops.decode import decode_nms_peaks
        from hourglass_pose_estimation_tpu.utils.visualize import draw_skeleton
        kps = np.asarray(decode_nms_peaks(heatmaps))[0]
        hm_h, hm_w = heatmaps.shape[1:3]
        return draw_skeleton(frame, kps, scale_x=w / (hm_w * 4.0),
                             scale_y=h / (hm_h * 4.0))
    from hourglass_pose_estimation_tpu.ops.decode import decode_simple_argmax
    kps, maxv = decode_simple_argmax(heatmaps, (res, res), (w, h))
    kps = np.asarray(kps)[0]
    for x, y in kps:
        if x or y:
            cv2.circle(frame, (int(x), int(y)), 5, (0, 0, 255), -1)
    return frame


def run_sync(args):
    import jax
    from hourglass_pose_estimation_tpu.data.meanstd import get_meanstd
    fn = _load(args.model)
    mean, std = get_meanstd(args.dataset)
    frame, x = _prep(args.image, args.res, mean, std, raw=args.raw)

    tuple_safe = lambda o: (tuple(np.asarray(t) for t in o)
                            if isinstance(o, (tuple, list)) else np.asarray(o))
    out = tuple_safe(fn(x))  # warm-up / compile (host fetch = honest)
    if args.profile:
        # the axon-tunneled TPU reports platform 'tpu', so detect the
        # remote transport by the backend's platform_version instead
        import jax.extend.backend
        ver = getattr(jax.extend.backend.get_backend(),
                      'platform_version', '')
        if 'axon' in ver:
            print('skipping --profile: jax.profiler.trace hangs on the '
                  'axon remote transport (CLAUDE.md hazard 7)')
        else:
            with jax.profiler.trace(args.profile):
                tuple_safe(fn(x))
            print(f'profile written to {args.profile}')
    ts = []
    for _ in range(args.iters):
        t0 = time.perf_counter()
        out = tuple_safe(fn(x))   # value fetch bounds the measurement
        ts.append(time.perf_counter() - t0)
    ts = np.asarray(ts) * 1000
    print(f'avg {ts.mean():.3f} ms | median {np.median(ts):.3f} ms | '
          f'min {ts.min():.3f} ms over {args.iters} iters')
    out_img = _decode_draw(frame, out, skeleton=args.skeleton,
                           res=args.res)
    if args.out:
        import cv2
        cv2.imwrite(args.out, out_img)
        print(f'wrote {args.out}')
    return 0


def run_async(args):
    """Double-buffered loop: while the device runs frame i, the host
    preprocesses frame i+1 (jax dispatch is async — no callbacks
    needed; not calling block_until_ready until the next frame is
    submitted gives the overlap)."""
    import jax
    from hourglass_pose_estimation_tpu.data.meanstd import get_meanstd
    import cv2

    fn = _load(args.model)
    mean, std = get_meanstd(args.dataset)
    frames = sorted(glob.glob(os.path.join(args.frame_dir, '*')))
    if not frames:
        raise FileNotFoundError(f'no frames in {args.frame_dir}')
    os.makedirs(args.out_dir, exist_ok=True)

    # compile outside the timed region (model + decode kernels)
    warm_frame, warm_x = _prep(frames[0], args.res, mean, std,
                               raw=args.raw)
    _decode_draw(warm_frame.copy(), fn(warm_x), skeleton=args.skeleton,
                 res=args.res)

    t_start = time.perf_counter()
    prev = None                                    # (path, frame, pending out)
    n = 0
    for path in frames:
        try:
            frame, x = _prep(path, args.res, mean, std, raw=args.raw)
        except FileNotFoundError:
            continue        # stray non-image file in the frames dir
        pending = fn(x)                            # dispatched, not awaited
        if prev is not None:
            p_path, p_frame, p_out = prev
            img = _decode_draw(p_frame, p_out, res=args.res,
                               skeleton=args.skeleton)  # syncs p_out
            cv2.imwrite(os.path.join(args.out_dir,
                                     os.path.basename(p_path)), img)
            n += 1
        prev = (path, frame, pending)
    p_path, p_frame, p_out = prev
    img = _decode_draw(p_frame, p_out, skeleton=args.skeleton,
                       res=args.res)
    cv2.imwrite(os.path.join(args.out_dir, os.path.basename(p_path)), img)
    n += 1
    dt = time.perf_counter() - t_start
    print(f'{n} frames in {dt:.2f}s = {n / dt:.1f} FPS (pipelined)')
    return 0


def run_sustained(args):
    """Device-sustained serving throughput: chain `iters` inferences
    through a data dependency and pay ONE host fetch. Per-frame host
    round trips (the sync mode) measure the transport, not the model —
    on this dev tunnel the RTT is 26-45 ms with >15 ms jitter
    (BENCH_NOTES.md); production serving keeps frames device-side."""
    from hourglass_pose_estimation_tpu.data.meanstd import get_meanstd

    fn = _load(args.model)
    mean, std = get_meanstd(args.dataset)
    _, x = _prep(args.image, args.res, mean, std, raw=args.raw)
    import jax.numpy as jnp
    x = jnp.asarray(x)

    # Every frame is chained through a data dependency (CLAUDE.md
    # hazard 1: on this tunnel even fetching the LAST output does not
    # bound earlier un-chained programs — measured: un-chained
    # "sustained" readings collapse to ~3 us/frame, i.e. elided). The
    # chain runs through a tiny separately-jitted combiner because
    # wrapping the deserialized exported call itself in another jit
    # hits an executable-cache miss (~150 ms/call, measured).
    import jax
    first = lambda o: o[0] if isinstance(o, tuple) else o
    combine = jax.jit(
        lambda base, f: base + (f.ravel()[0] * 0).astype(base.dtype))
    out = fn(x)
    np.asarray(first(out))                        # compile + warm
    np.asarray(combine(x, first(out))[0, 0, 0])
    def run(n):
        t0 = time.perf_counter()
        xi, o = x, out
        for _ in range(n):
            o = fn(xi)
            xi = combine(x, first(o))             # data-dependency chain
        np.asarray(first(o))                      # one fetch bounds all
        return time.perf_counter() - t0

    # honesty cross-check for the dispatch-order assumption (CLAUDE.md
    # timing rule): run N/2 and N frames; the DIFFERENCE removes the
    # constant fetch round trip, so the differential per-frame time is
    # the sustained device+dispatch cost. If the runtime elided
    # identical dispatches the differential would collapse toward 0.
    n_half = max(args.iters // 2, 1)
    t_half = run(n_half)
    t_full = run(args.iters)
    diff_ms = (t_full - t_half) / max(args.iters - n_half, 1) * 1000
    print(f'{args.iters} frames in {t_full:.2f}s = '
          f'{args.iters / t_full:.1f} FPS raw', end='')
    if diff_ms < 0.05:
        # the tunnel fetch RTT jitters by +-20 ms; per-frame costs below
        # ~RTT_jitter/frames are unresolvable with this method
        print(' | differential per-frame below the tunnel noise floor '
              '(model faster than measurable here; see '
              'tools/latency_bench.py for in-jit chained timing)')
    else:
        print(f' | differential {diff_ms:.2f} ms/frame '
              f'({1000 / diff_ms:.0f} FPS sustained, fetch RTT removed)')
    return 0


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest='mode', required=True)
    ps = sub.add_parser('sync')
    ps.add_argument('model')
    ps.add_argument('image')
    ps.add_argument('--iters', type=int, default=50)
    ps.add_argument('--res', type=int, default=256)
    ps.add_argument('--dataset', default='mscoco')
    ps.add_argument('--profile', default='')
    ps.add_argument('--out', default='')
    ps.add_argument('--skeleton', action='store_true',
                    help='NMS decode + skeleton-line rendering')
    ps.add_argument('--raw', action='store_true',
                    help='artifact exported with EVAL.export_preprocess '
                         '(uint8 frames in)')
    pa = sub.add_parser('async')
    pa.add_argument('model')
    pa.add_argument('frame_dir')
    pa.add_argument('out_dir')
    pa.add_argument('--res', type=int, default=256)
    pa.add_argument('--dataset', default='mscoco')
    pa.add_argument('--skeleton', action='store_true')
    pa.add_argument('--raw', action='store_true')
    pu = sub.add_parser('sustained')
    pu.add_argument('model')
    pu.add_argument('image')
    pu.add_argument('--iters', type=int, default=100)
    pu.add_argument('--res', type=int, default=256)
    pu.add_argument('--dataset', default='mscoco')
    pu.add_argument('--raw', action='store_true')
    args = p.parse_args(argv)
    if args.mode == 'sync':
        return run_sync(args)
    if args.mode == 'sustained':
        return run_sustained(args)
    return run_async(args)


if __name__ == '__main__':
    sys.exit(main())
