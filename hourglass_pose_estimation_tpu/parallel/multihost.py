"""Multi-host (multi-process) SPMD enablement.

The reference is strictly single-process (`torch.nn.DataParallel`,
/root/reference/src/runner/trainer.py:37). The TPU-native scale-out
story is one JAX process per host, all executing the SAME program over
a global mesh:

  1. `maybe_initialize_distributed()` — `jax.distributed.initialize`
     when a coordinator is configured (standard JAX env variables /
     TPU pod metadata), no-op for single-process runs;
  2. every process loads ITS contiguous slice of each global batch
     (`data.common.Loader(shard=(process_index, process_count))`) —
     same seed => identical global sample order on every host;
  3. `global_batch_from_local()` assembles the per-host arrays into
     global jax.Arrays over the mesh's 'data' axis
     (`jax.make_array_from_process_local_data`), and the existing
     jitted train/eval steps run unchanged — XLA's collectives cross
     hosts over ICI/DCN exactly as they cross chips.

Orbax checkpointing is already multi-host safe (every process
participates in save/restore). Works single-process too (the Trainer
routes through this path only when process_count > 1, so the
single-host fast path is untouched).
"""

from __future__ import annotations

import os
from typing import Dict

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def maybe_initialize_distributed(verbose: bool = True):
    """Initialize jax.distributed when a coordinator is configured.

    Triggers, in order:
      * JAX_COORDINATOR_ADDRESS / COORDINATOR_ADDRESS set — passed
        EXPLICITLY to `jax.distributed.initialize` (JAX does not read
        these itself), together with JAX_NUM_PROCESSES/JAX_PROCESS_ID
        when both are present (generic clusters; TPU pods can resolve
        counts from platform metadata given just the address);
      * HPE_DISTRIBUTED=1 — no-arg `initialize()` using JAX's cluster
        auto-detection (TPU pod metadata, SLURM, MPI). Opt-in because
        auto-detection raises on plain single-host machines.

    Returns (process_index, process_count). Safe to call exactly once,
    before any backend use; a no-op single-process setup returns (0, 1).
    """
    addr = (os.environ.get('JAX_COORDINATOR_ADDRESS')
            or os.environ.get('COORDINATOR_ADDRESS'))
    nproc = os.environ.get('JAX_NUM_PROCESSES')
    pid = os.environ.get('JAX_PROCESS_ID')
    if addr:
        kwargs = {'coordinator_address': addr}
        if nproc is not None and pid is not None:
            kwargs.update(num_processes=int(nproc), process_id=int(pid))
        jax.distributed.initialize(**kwargs)
    elif os.environ.get('HPE_DISTRIBUTED'):
        jax.distributed.initialize()
    else:
        return jax.process_index(), jax.process_count()
    if verbose:
        print(f'=> jax.distributed: process '
              f'{jax.process_index()}/{jax.process_count()}, '
              f'{jax.local_device_count()} local '
              f'/ {jax.device_count()} global devices')
    return jax.process_index(), jax.process_count()


def global_batch_from_local(mesh: Mesh, local_batch: Dict[str, np.ndarray],
                            batch_axis: str = 'data') -> Dict[str, jax.Array]:
    """Per-host batch slices -> global jax.Arrays sharded over the mesh.

    `local_batch` holds each array's process-local rows (this process's
    contiguous slice of the global batch, in process order — the
    Loader's `shard` option produces exactly that). Single-process,
    this is equivalent to a sharded device_put.
    """
    sh = NamedSharding(mesh, P(batch_axis))
    return {k: jax.make_array_from_process_local_data(sh, np.asarray(v))
            for k, v in local_batch.items()}
