"""Worker process for tests/test_multihost_spmd.py.

One of two `jax.distributed` CPU processes: initializes against the
coordinator, loads ITS shard of the global batch via
`Loader(shard=...)`, assembles global arrays with
`global_batch_from_local`, runs ONE jitted train step over the global
('data',) mesh, and writes {loss, param-sum, local indices} as JSON.

Usage: python multihost_worker.py <process_id> <coordinator_port> <out.json>
"""

import json
import sys


def main():
    pid, port, out_path = int(sys.argv[1]), sys.argv[2], sys.argv[3]
    import jax
    jax.config.update('jax_platforms', 'cpu')
    jax.config.update('jax_num_cpu_devices', 2)
    jax.distributed.initialize(coordinator_address=f'localhost:{port}',
                               num_processes=2, process_id=pid)
    assert jax.process_count() == 2
    assert jax.device_count() == 4

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from hourglass_pose_estimation_tpu.data import Synthetic, make_spec, Loader
    from hourglass_pose_estimation_tpu.parallel.multihost import (
        global_batch_from_local)
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

    mesh = Mesh(np.asarray(jax.devices()), ('data',))
    rep = NamedSharding(mesh, P())
    # replicate the state globally (every process holds the full value)
    state = jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(rep, np.asarray(x)),
        state)

    loader = Loader(ds, 4, shuffle=True, seed=0, drop_last=True,
                    shard=(jax.process_index(), jax.process_count()))
    idx, _valid = loader.epoch_indices()[0]
    local = ds.canvas_batch(list(idx), canvas=64)
    batch = global_batch_from_local(mesh, local)

    step = make_train_step(spec, device_pipeline=True)
    state, m = step(state, batch, jax.random.PRNGKey(1))
    loss = float(m['loss'])
    psum = float(sum(float(jnp.sum(jnp.abs(x.astype(jnp.float32))))
                     for x in jax.tree.leaves(state.params)))

    # eval step over the SAME local->global assembly, incl. the
    # validity mask (the Trainer's _evaluate path: the mask must be
    # globalized alongside the batch — a process-local mask against a
    # global batch is the round-5-fixed shape mismatch)
    from hourglass_pose_estimation_tpu.runner.train_state import (
        make_eval_step)
    valid = global_batch_from_local(
        mesh, {'v': np.asarray(_valid, np.float32)})['v']
    em = make_eval_step(spec, device_pipeline=True)(state, batch, valid)
    eval_loss, eval_n = float(em['loss']), float(em['n'])

    with open(out_path, 'w') as fp:
        json.dump({'loss': loss, 'param_abs_sum': psum,
                   'eval_loss': eval_loss, 'eval_n': eval_n,
                   'local_idx': np.asarray(idx).tolist()}, fp)
    jax.distributed.shutdown()


if __name__ == '__main__':
    main()
