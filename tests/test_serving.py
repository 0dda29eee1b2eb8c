"""Serving front-end: dynamic micro-batching + HTTP server over an
exported artifact (tools/serve_http.py; the concurrent-client analogue
of the reference's single-stream OpenVINO demos,
/root/reference/tools/openvino_visualizer/async_inference.py)."""

import io
import json
import threading
import time
import urllib.request
from concurrent.futures import ThreadPoolExecutor

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hourglass_pose_estimation_tpu.serving import (
    MicroBatcher, QueueFull, load_serving_artifact, make_server)


def test_microbatcher_coalesces_and_slices():
    calls = []

    def infer(batch):
        calls.append(batch.copy())
        time.sleep(0.02)                      # let the queue fill
        return batch.astype(np.float32).sum(axis=(1, 2, 3))

    mb = MicroBatcher(infer, batch_size=4, frame_shape=(8, 8, 3),
                      max_wait_ms=50.0)
    rng = np.random.RandomState(0)
    frames = [rng.randint(0, 255, (8, 8, 3), np.uint8) for _ in range(10)]
    try:
        futs = [mb.submit(f) for f in frames]
        got = [f.result(timeout=30) for f in futs]
    finally:
        mb.close()
    for frame, out in zip(frames, got):
        assert float(out) == float(frame.astype(np.float32).sum())
    # 10 requests with batch 4 and a linger window must coalesce
    assert mb.n_batches < mb.n_requests == 10
    assert mb.n_frames == 10
    assert all(c.shape[0] == 4 for c in calls)   # always padded to B


def test_microbatcher_rejects_bad_shape_and_propagates_errors():
    def boom(batch):
        raise RuntimeError('device on fire')

    mb = MicroBatcher(boom, batch_size=2, frame_shape=(4, 4, 3))
    try:
        with pytest.raises(ValueError):
            mb.submit(np.zeros((5, 4, 3), np.uint8))
        fut = mb.submit(np.zeros((4, 4, 3), np.uint8))
        with pytest.raises(RuntimeError, match='device on fire'):
            fut.result(timeout=30)
    finally:
        mb.close()


def test_microbatcher_backpressure_and_shedding():
    release = threading.Event()

    def slow(batch):
        release.wait(30)
        return batch.astype(np.float32).sum(axis=(1, 2, 3))

    mb = MicroBatcher(slow, batch_size=2, frame_shape=(4, 4, 3),
                      max_wait_ms=1.0, max_queue=3)
    frame = np.zeros((4, 4, 3), np.uint8)
    try:
        first = mb.submit(frame)          # worker takes this, blocks in slow()
        # give the worker time to dequeue it so the queue itself is empty
        deadline = time.monotonic() + 5
        while mb._q and time.monotonic() < deadline:
            time.sleep(0.01)
        queued = [mb.submit(frame) for _ in range(3)]   # fills the cap
        with pytest.raises(QueueFull):
            mb.submit(frame)
        assert mb.n_rejected == 1
        # a caller that gives up while queued is shed, never computed
        assert queued[0].cancel()
        release.set()
        for fut in queued[1:]:
            assert float(fut.result(timeout=30)) == 0.0
        assert float(first.result(timeout=30)) == 0.0
    finally:
        mb.close()
    assert mb.n_shed == 1
    assert mb.n_frames == 3               # 1 first + 2 surviving queued


def test_microbatcher_survives_concurrent_cancel_storm():
    """Race-class regression (round 3): cancels arriving in the window
    between dequeue and result fan-out must neither poison batchmates
    with InvalidStateError nor kill the worker thread. Futures are
    claimed RUNNING at dequeue, so every submit here either resolves
    with its correct value or was cancelled while still queued."""
    def infer(batch):
        time.sleep(0.002)
        return batch.astype(np.float32).sum(axis=(1, 2, 3))

    mb = MicroBatcher(infer, batch_size=4, frame_shape=(2, 2, 1),
                      max_wait_ms=1.0, max_queue=10_000)
    rng = np.random.RandomState(0)
    results = []

    def client(seed):
        r = np.random.RandomState(seed)
        for i in range(25):
            frame = r.randint(0, 255, (2, 2, 1), np.uint8)
            fut = mb.submit(frame)
            if r.rand() < 0.4:
                fut.cancel()            # any moment: queued or claimed
            try:
                got = fut.result(timeout=30)
                results.append(float(got) == float(frame.sum()))
            except Exception:           # CancelledError only
                pass

    threads = [threading.Thread(target=client, args=(s,)) for s in range(8)]
    try:
        for t in threads:
            t.start()
        for t in threads:
            t.join(60)
        assert all(results) and results          # correct, some resolved
        assert mb._worker.is_alive()             # the race never kills it
        # worker still serves new requests after the storm
        assert float(mb.submit(np.ones((2, 2, 1), np.uint8))
                     .result(timeout=30)) == 4.0
    finally:
        mb.close()


def _post_npy(base, frame, timeout=30):
    buf = io.BytesIO()
    np.save(buf, frame)
    req = urllib.request.Request(
        base + '/keypoints', data=buf.getvalue(),
        headers={'Content-Type': 'application/x-npy'})
    return urllib.request.urlopen(req, timeout=timeout)


def test_http_server_maps_inference_failure_to_500():
    def boom(batch):
        raise RuntimeError('device on fire')

    mb = MicroBatcher(boom, batch_size=2, frame_shape=(4, 4, 3),
                      max_wait_ms=1.0)
    srv = make_server(mb, port=0)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f'http://{srv.server_address[0]}:{srv.server_address[1]}'
    try:
        with pytest.raises(urllib.error.HTTPError) as exc:
            _post_npy(base, np.zeros((4, 4, 3), np.uint8))
        assert exc.value.code == 500
        assert 'device on fire' in json.loads(exc.value.read())['error']
    finally:
        srv.shutdown()
        mb.close()


def test_http_server_maps_shape_mismatch_to_400():
    # decode only fixes H/W; a wrong channel count reaches submit(),
    # whose ValueError must surface as HTTP 400, not a dropped socket
    mb = MicroBatcher(lambda b: b.sum(axis=(1, 2, 3)), batch_size=2,
                      frame_shape=(4, 4, 3), max_wait_ms=1.0)
    srv = make_server(mb, port=0)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f'http://{srv.server_address[0]}:{srv.server_address[1]}'
    try:
        with pytest.raises(urllib.error.HTTPError) as exc:
            _post_npy(base, np.zeros((4, 4, 4), np.uint8))
        assert exc.value.code == 400
        assert 'frame shape' in json.loads(exc.value.read())['error']
    finally:
        srv.shutdown()
        mb.close()


def test_http_server_queue_timeout_503_and_sheds():
    release = threading.Event()

    def slow(batch):
        release.wait(30)
        return batch.astype(np.float32).sum(axis=(1, 2, 3))

    mb = MicroBatcher(slow, batch_size=1, frame_shape=(4, 4, 3),
                      max_wait_ms=1.0)
    srv = make_server(mb, port=0, result_timeout=0.5)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f'http://{srv.server_address[0]}:{srv.server_address[1]}'
    try:
        # worker is stuck in slow(); a second request times out queued,
        # gets 503, and its cancelled future is shed instead of computed
        _post_npy(base, np.zeros((4, 4, 3), np.uint8))  # hangs the worker
    except urllib.error.HTTPError as e:
        assert e.code == 503                    # first may time out too
    try:
        with pytest.raises(urllib.error.HTTPError) as exc:
            _post_npy(base, np.zeros((4, 4, 3), np.uint8))
        assert exc.value.code == 503
        assert 'timeout' in json.loads(exc.value.read())['error']
        release.set()
    finally:
        srv.shutdown()
        mb.close()


@pytest.fixture(scope='module')
def keypoint_artifact(tmp_path_factory):
    """Batched (B=4) uint8-in frames->keypoints artifact of a tiny net."""
    from hourglass_pose_estimation_tpu.models import HourglassNet
    from hourglass_pose_estimation_tpu.export import export_stablehlo

    model = HourglassNet(num_stacks=1, num_blocks=1, num_classes=4,
                         dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)), train=False)
    path = str(tmp_path_factory.mktemp('serve') / 'model.stablehlo')
    export_stablehlo(model, variables, (4, 64, 64, 3), path,
                     decode='quarter', fold_bn=True,
                     preprocess=((0.4, 0.44, 0.47), (0.23, 0.23, 0.24)),
                     input_res=64, weights_dtype=jnp.bfloat16)
    return path


def test_load_serving_artifact_reads_signature(keypoint_artifact):
    fn, batch, frame_shape, dtype = load_serving_artifact(keypoint_artifact)
    assert batch == 4 and frame_shape == (64, 64, 3)
    assert dtype == np.uint8
    kps, maxv = fn(np.zeros((4, 64, 64, 3), np.uint8))
    assert kps.shape == (4, 4, 2)


def test_http_server_concurrent_clients(keypoint_artifact):
    fn, batch, frame_shape, dtype = load_serving_artifact(keypoint_artifact)
    fn(np.zeros((batch,) + frame_shape, dtype))        # compile up front
    mb = MicroBatcher(fn, batch, frame_shape, dtype=dtype, max_wait_ms=100.0)
    srv = make_server(mb, port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f'http://{srv.server_address[0]}:{srv.server_address[1]}'

    def post_npy(seed):
        frame = np.random.RandomState(seed).randint(
            0, 255, frame_shape).astype(np.uint8)
        with _post_npy(base, frame, timeout=60) as r:
            return json.loads(r.read())

    try:
        with urllib.request.urlopen(base + '/healthz', timeout=30) as r:
            assert json.loads(r.read()) == {'ok': True}
        with ThreadPoolExecutor(6) as ex:
            outs = list(ex.map(post_npy, range(6)))
        for out in outs:
            kps = np.asarray(out['keypoints'])
            assert kps.shape == (4, 2)
            assert len(out['scores']) == 4
            assert float(np.max(kps)) <= 64.5     # input-frame pixels
        # same frame twice -> same keypoints (served deterministically)
        assert post_npy(0)['keypoints'] == outs[0]['keypoints']
        with urllib.request.urlopen(base + '/stats', timeout=30) as r:
            stats = json.loads(r.read())
        assert stats['requests'] >= 7
        assert stats['batches'] <= stats['requests']
        assert stats['batch_size'] == 4
        assert stats['queue_depth'] == 0        # drained
        assert stats['batch_latency_ms_p50'] > 0
        assert stats['batch_latency_ms_p95'] >= stats['batch_latency_ms_p50']
    finally:
        srv.shutdown()
        mb.close()


def test_http_server_jpeg_body_and_errors(keypoint_artifact):
    cv2 = pytest.importorskip('cv2')
    fn, batch, frame_shape, dtype = load_serving_artifact(keypoint_artifact)
    mb = MicroBatcher(fn, batch, frame_shape, dtype=dtype, max_wait_ms=5.0)
    srv = make_server(mb, port=0)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f'http://{srv.server_address[0]}:{srv.server_address[1]}'
    try:
        # an oversized JPEG frame: decoded, host-resized to 64x64, served
        frame = np.random.RandomState(3).randint(
            0, 255, (96, 128, 3)).astype(np.uint8)
        ok, enc = cv2.imencode('.jpg', frame)
        assert ok
        req = urllib.request.Request(base + '/keypoints',
                                     data=enc.tobytes(),
                                     headers={'Content-Type': 'image/jpeg'})
        with urllib.request.urlopen(req, timeout=60) as r:
            out = json.loads(r.read())
        assert np.asarray(out['keypoints']).shape == (4, 2)

        # garbage body -> 400 with a JSON error, server stays up
        bad = urllib.request.Request(base + '/keypoints', data=b'not-an-image',
                                     headers={'Content-Type': 'image/jpeg'})
        try:
            urllib.request.urlopen(bad, timeout=30)
            assert False, 'expected HTTP 400'
        except urllib.error.HTTPError as e:
            assert e.code == 400
            assert 'error' in json.loads(e.read())
        with urllib.request.urlopen(base + '/healthz', timeout=30) as r:
            assert json.loads(r.read())['ok']

        # closed batcher -> 503 (retryable server condition, not 400)
        mb.close()
        buf = io.BytesIO()
        np.save(buf, np.zeros(frame_shape, np.uint8))
        unavail = urllib.request.Request(
            base + '/keypoints', data=buf.getvalue(),
            headers={'Content-Type': 'application/x-npy'})
        try:
            urllib.request.urlopen(unavail, timeout=30)
            assert False, 'expected HTTP 503'
        except urllib.error.HTTPError as e:
            assert e.code == 503
    finally:
        srv.shutdown()
        mb.close()
