"""Device mesh + sharding rules.

The reference's only parallelism is single-process `torch.nn.
DataParallel` (`/root/reference/src/runner/trainer.py:37`): replicate
the model, scatter the batch, gather outputs every step. The TPU-native
equivalent is an SPMD mesh:

  * axis 'data'  — batch sharding; gradients are all-reduced by XLA over
    ICI (the collective emerges from the sharding, it is not hand-coded),
  * axis 'model' — optional tensor parallelism: wide conv kernels are
    sharded over output channels (and the following layer over input
    channels, chosen by XLA's SPMD partitioner from the param shardings).

With `jax.jit` + `NamedSharding` the train step has *global* semantics:
batch norm statistics are computed over the full global batch (an
improvement over DataParallel's silent per-replica stats — documented
deviation).
"""

from __future__ import annotations


import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data_parallel: int = 0, model_parallel: int = 1,
              devices=None) -> Mesh:
    """Build a ('data', 'model') mesh.

    data_parallel=0 means "all remaining devices".
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data_parallel <= 0:
        assert n % model_parallel == 0, (n, model_parallel)
        data_parallel = n // model_parallel
    use = data_parallel * model_parallel
    assert use <= n, f'mesh {data_parallel}x{model_parallel} > {n} devices'
    arr = np.asarray(devices[:use]).reshape(data_parallel, model_parallel)
    return Mesh(arr, ('data', 'model'))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) dim over 'data', everything else replicated."""
    return NamedSharding(mesh, P('data'))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_sharding_rules(shape, mesh: Mesh, min_shard_dim: int = 128):
    """PartitionSpec for one parameter — purely SHAPE-based.

    Tensor-parallel rule: conv kernels [kh, kw, cin, cout] with
    cout >= min_shard_dim and cout divisible by the 'model' axis are
    sharded on the output-channel dim; 1-D vectors meeting the same
    divisibility (biases / BN affine of those convs) shard alongside.
    Everything else is replicated (the SPMD partitioner propagates
    input-channel shardings and inserts the reduce where layers meet).
    """
    tp = mesh.shape['model']
    if tp == 1:
        return P()
    if len(shape) == 4 and shape[-1] >= min_shard_dim and shape[-1] % tp == 0:
        return P(None, None, None, 'model')
    if len(shape) == 1 and shape[0] >= min_shard_dim and shape[0] % tp == 0:
        # biases / BN scale+bias of sharded convs
        return P('model')
    return P()


def shard_params(params, mesh: Mesh):
    """Apply `param_sharding_rules` over a param pytree -> sharding tree."""
    return jax.tree.map(
        lambda leaf: NamedSharding(
            mesh, param_sharding_rules(leaf.shape, mesh)), params)
