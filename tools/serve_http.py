#!/usr/bin/env python
"""HTTP keypoint server over an exported StableHLO artifact.

Production-shaped front-end for the deploy surface (the reference's
OpenVINO demos, `/root/reference/tools/openvino_visualizer/
async_inference.py`, drive one offline stream; this serves concurrent
clients): a dynamic micro-batcher coalesces requests into one device
call against the artifact's static batch (BENCH_NOTES "Batched serving
throughput" — batch 64 is ~20x cheaper per image than batch 1 on one
chip), zero-padding partial batches.

Export a batched keypoint artifact, then serve it:

    python scripts/export.py configs/hourglass/mpii_hg_s8_b1_all.yaml \\
        COMMON.resume=<ckpt> EVAL.export_keypoints=true \\
        EVAL.export_preprocess=true EVAL.export_batch=64 \\
        EVAL.export_bf16_weights=true
    python tools/serve_http.py <artifact.stablehlo> --port 8000

    curl -X POST --data-binary @frame.jpg http://127.0.0.1:8000/keypoints
    curl http://127.0.0.1:8000/stats
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument('artifact', help='exported .stablehlo path')
    ap.add_argument('--host', default='127.0.0.1')
    ap.add_argument('--port', type=int, default=8000)
    ap.add_argument('--max-wait-ms', type=float, default=5.0,
                    help='linger after the first queued frame before '
                         'dispatching a partial batch')
    ap.add_argument('--max-queue', type=int, default=0,
                    help='queued-frame cap before submits get HTTP 503 '
                         '(0 = 8 batches)')
    args = ap.parse_args(argv)

    from hourglass_pose_estimation_tpu.serving import (
        MicroBatcher, load_serving_artifact, make_server)

    fn, batch, frame_shape, dtype = load_serving_artifact(args.artifact)
    import numpy as np
    fn(np.zeros((batch,) + frame_shape, dtype))    # compile before serving
    batcher = MicroBatcher(fn, batch, frame_shape, dtype=dtype,
                           max_wait_ms=args.max_wait_ms,
                           max_queue=args.max_queue)
    srv = make_server(batcher, args.host, args.port)
    print(f'serving {args.artifact} (batch {batch}, frame {frame_shape} '
          f'{dtype}) on http://{srv.server_address[0]}:'
          f'{srv.server_address[1]}', flush=True)

    # Graceful SIGTERM/SIGINT: drain in-flight batches and release the
    # device client cleanly (a hard kill of a process holding the TPU
    # can wedge the chip for minutes — CLAUDE.md; and background shells
    # ignore SIGINT, so SIGTERM is the operational stop signal).
    import signal
    import threading
    stop = threading.Event()
    for sig in (signal.SIGTERM, signal.SIGINT):
        signal.signal(sig, lambda *_: stop.set())
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        while not stop.wait(0.5):
            pass
    finally:
        srv.shutdown()
        batcher.close()
        print('drained; bye', flush=True)
    return 0


if __name__ == '__main__':
    sys.exit(main())
