"""Real 2-process jax.distributed SPMD test (VERDICT round-2 item 6).

Spawns two worker processes (tests/multihost_worker.py) that form a
jax.distributed CPU cluster (2 processes x 2 devices), each loading its
`Loader(shard=...)` slice, assembling the global batch with
`global_batch_from_local`, and running one train step over the global
mesh. Asserts both processes agree and the result matches the
single-process oracle on the same global batch.

Gated behind HPE_SLOW_TESTS=1: two extra jax processes compiling on
this 1-core host take minutes and contend with the rest of the suite.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get('HPE_SLOW_TESTS'),
    reason='2-process jax.distributed run: minutes on the 1-core host; '
           'set HPE_SLOW_TESTS=1')


def _free_port():
    with socket.socket() as s:
        s.bind(('localhost', 0))
        return s.getsockname()[1]


def test_two_process_spmd_matches_single_process(tmp_path):
    port = _free_port()
    here = os.path.dirname(os.path.abspath(__file__))
    outs = [str(tmp_path / f'worker{i}.json') for i in range(2)]
    env = {k: v for k, v in os.environ.items()
           if k not in ('XLA_FLAGS', 'JAX_PLATFORMS')}
    env['PYTHONPATH'] = os.path.dirname(here)
    # worker stdout goes to files, not PIPEs: with sequential
    # communicate(), a second worker filling a 64 kB pipe would block
    # its writes and deadlock the jax.distributed barrier for both
    logfiles = [open(tmp_path / f'worker{i}.log', 'wb') for i in range(2)]
    procs = [subprocess.Popen(
        [sys.executable, os.path.join(here, 'multihost_worker.py'),
         str(i), str(port), outs[i]],
        env=env, stdout=logfiles[i], stderr=subprocess.STDOUT)
        for i in range(2)]
    try:
        for p in procs:
            p.wait(timeout=900)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.wait()
        for f in logfiles:
            f.close()
    logs = [(tmp_path / f'worker{i}.log').read_text(errors='replace')
            for i in range(2)]
    assert all(p.returncode == 0 for p in procs), '\n'.join(logs)

    r0, r1 = (json.load(open(o)) for o in outs)
    # both processes computed the same (replicated) loss and params
    assert r0['loss'] == pytest.approx(r1['loss'], rel=1e-6)
    assert r0['param_abs_sum'] == pytest.approx(r1['param_abs_sum'],
                                                rel=1e-6)
    # shards are complementary halves of the same global batch
    assert r0['local_idx'] != r1['local_idx']

    # single-process oracle on the assembled global batch
    import jax
    import jax.numpy as jnp
    from hourglass_pose_estimation_tpu.data import Synthetic, make_spec
    from hourglass_pose_estimation_tpu.runner.train_state import (
        make_optimizer, init_state, make_train_step)
    from hourglass_pose_estimation_tpu.models import HourglassNet

    ds = Synthetic(True, num_samples=8, inp_res=64, out_res=16, sigma=1,
                   scale_factor=0.25, rot_factor=30)
    spec = make_spec(ds)
    model = HourglassNet(num_stacks=1, num_blocks=1, num_classes=16,
                         dtype=jnp.float32)
    tx = make_optimizer(2.5e-3, [], 0.1, 4)
    state = init_state(model, jax.random.PRNGKey(0), (1, 64, 64, 3), tx)
    global_idx = r0['local_idx'] + r1['local_idx']
    raw = ds.canvas_batch(global_idx, canvas=64)
    step = make_train_step(spec, device_pipeline=True)
    state, m = step(state, raw, jax.random.PRNGKey(1))
    ref_loss = float(m['loss'])
    ref_psum = float(sum(float(jnp.sum(jnp.abs(x.astype(jnp.float32))))
                         for x in jax.tree.leaves(state.params)))

    assert r0['loss'] == pytest.approx(ref_loss, rel=1e-4)
    assert r0['param_abs_sum'] == pytest.approx(ref_psum, rel=1e-4)

    # eval step with the globalized validity mask (Trainer._evaluate
    # assembly): both processes agree, and the mask covered the full
    # global batch
    from hourglass_pose_estimation_tpu.runner.train_state import (
        make_eval_step)
    assert r0['eval_loss'] == pytest.approx(r1['eval_loss'], rel=1e-6)
    assert r0['eval_n'] == 4.0
    # the oracle `state` is also post-step; eval here runs with the
    # flax (0, 1) placeholder running stats, which AMPLIFY the 1e-4
    # param residual of the distributed step into a few percent of
    # loss (unnormalized feedback sums), so the oracle comparison is
    # order-of-magnitude only — the strict invariants are the exact
    # cross-worker agreement and the mask shape above
    em = make_eval_step(spec, device_pipeline=True)(
        state, raw, jnp.ones((4,), jnp.float32))
    assert float(em['n']) == 4.0
    assert r0['eval_loss'] == pytest.approx(float(em['loss']), rel=0.25)
