"""Train state, optimizer and the jitted/sharded train & eval steps.

Replaces the reference's host-driven loop body
(`/root/reference/src/runner/trainer.py:75-108`): one XLA program per
step containing the *entire* pipeline — on-device augmentation + target
rendering (device pipeline mode), forward, loss, PCK metric, backward,
RMSprop update — with the state donated (no reallocation) and the batch
sharded over the 'data' mesh axis. Gradient all-reduce over ICI is
inserted by the SPMD partitioner from the shardings.

Optimizer parity: torch.optim.RMSprop(lr, momentum=0, weight_decay=0)
(trainer.py:39-41) has alpha=0.99, eps=1e-8 applied *outside* the
sqrt: u = g / (sqrt(E[g^2]) + eps). optax's default puts eps inside;
we configure eps_in_sqrt=False for exact parity.

LR schedule parity: step decay multiplying by `gamma` at each epoch in
`schedule` (trainer.py:15-21), expressed as a step-indexed
piecewise-constant optax schedule.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from hourglass_pose_estimation_tpu.loss import heatmap_mse_loss
from hourglass_pose_estimation_tpu.utils.evaluation import accuracy
from hourglass_pose_estimation_tpu.data.pipeline import augment_batch


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Any = struct.field(pytree_node=False)

    @classmethod
    def create(cls, *, apply_fn, params, batch_stats, tx):
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   batch_stats=batch_stats, opt_state=tx.init(params),
                   tx=tx, apply_fn=apply_fn)


def make_optimizer(learning_rate: float, schedule_epochs: Sequence[int],
                   gamma: float, steps_per_epoch: int,
                   flat: bool = True) -> optax.GradientTransformation:
    """RMSprop + epoch-boundary step decay (reference parity).

    flat=True wraps the transform in optax.flatten: the update runs on
    ONE concatenated vector instead of ~350 separate leaves. The
    per-leaf formulation dispatches a tiny fused op per parameter
    tensor and cost 24.8 ms/step of the 8-stack train step on v5e
    (pure dispatch overhead — the arithmetic is worth <1 ms of HBM
    traffic); flattening collapses it into a handful of large ops.
    Numerics are identical (elementwise update, concatenation order is
    irrelevant).
    """
    boundaries = {int(e) * int(steps_per_epoch): gamma for e in schedule_epochs}
    sched = optax.piecewise_constant_schedule(learning_rate, boundaries)
    tx = optax.chain(
        optax.scale_by_rms(decay=0.99, eps=1e-8, eps_in_sqrt=False),
        optax.scale_by_learning_rate(sched),
    )
    return optax.flatten(tx) if flat else tx


def init_state(model, rng, input_shape, tx) -> TrainState:
    x = jnp.zeros(input_shape, jnp.float32)
    variables = model.init(rng, x, train=False)
    return TrainState.create(apply_fn=model.apply, params=variables['params'],
                             batch_stats=variables.get('batch_stats', {}),
                             tx=tx)


def _select_subset(target, tw, subset):
    if subset is None:
        return target, tw
    idx = jnp.asarray(subset)
    return target[..., idx], tw[:, idx]


def make_train_step(spec, *, subset=None, pck_thr=0.5, device_pipeline=True,
                    freeze_bn=False):
    """Build the jitted train step.

    The returned function signature:
      device pipeline: (state, raw_batch, rng) -> (state, metrics)
        raw_batch from `PoseDataset.canvas_batch`
      host pipeline:   (state, batch, rng) -> (state, metrics)
        batch with 'image' (normalized), 'target', 'target_weight'.

    freeze_bn=True: the forward normalizes with the RUNNING BatchNorm
    averages (train=False apply — BN is this model's only train/eval
    difference) and the statistics stop updating. Used by the Trainer
    past TRAIN.freeze_bn_after_epoch; drops the BN statistic reductions
    and train-mode BN math from the step.
    """
    subset_t = tuple(subset) if subset is not None else None

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch: Dict[str, jax.Array], rng):
        # Derive the per-step key on device: the host passes ONE base key
        # for the whole epoch (a host-side jax.random.split per step is a
        # device round-trip — it alone cost ~3x throughput on this setup).
        rng = jax.random.fold_in(rng, state.step)
        if device_pipeline:
            data = augment_batch(batch, rng, spec, True)
            image, target, tw = data['image'], data['target'], data['target_weight']
        else:
            image, target, tw = batch['image'], batch['target'], batch['target_weight']
        target, tw = _select_subset(target, tw, subset_t)
        return _fwd_bwd_update(state, image, target, tw, pck_thr,
                               freeze_bn=freeze_bn)

    return train_step


def _fwd_bwd_update(state, image, target, tw, pck_thr, freeze_bn=False):
    """Shared fwd -> bwd -> RMSprop-update -> metrics block of the
    sequential AND overlapped train steps (one definition, so a change
    to either step cannot silently break their documented bit-identical
    trajectories)."""
    def loss_fn(params):
        if freeze_bn:
            outs = state.apply_fn(
                {'params': params, 'batch_stats': state.batch_stats},
                image, train=False)
            return heatmap_mse_loss(outs, target, tw), (
                outs, state.batch_stats)
        outs, mutated = state.apply_fn(
            {'params': params, 'batch_stats': state.batch_stats},
            image, train=True, mutable=['batch_stats'])
        loss = heatmap_mse_loss(outs, target, tw)
        return loss, (outs, mutated['batch_stats'])

    (loss, (outs, new_stats)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(state.params)
    updates, new_opt = state.tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    acc, _, _ = accuracy(outs[-1], target, thr=pck_thr)
    new_state = state.replace(step=state.step + 1, params=new_params,
                              batch_stats=new_stats, opt_state=new_opt)
    return new_state, {'loss': loss, 'acc': acc}


# keys of a staged (pre-augmented) batch as consumed by the model
STAGED_KEYS = ('image', 'target', 'target_weight')


def make_stage_fn(spec, *, train=True):
    """Jitted augment-only program: primes the overlapped step pipeline.

    stage(raw_batch, rng, step) -> staged dict (image/target/target_weight)
    using the SAME per-step key derivation (fold_in(rng, step)) as the
    fused train step, so overlapped and sequential modes consume
    identical augmentation streams.
    """

    @jax.jit
    def stage(batch, rng, step):
        rng = jax.random.fold_in(rng, step)
        data = augment_batch(batch, rng, spec, train)
        return {k: data[k] for k in STAGED_KEYS}

    return stage


def make_overlapped_train_step(spec, *, subset=None, pck_thr=0.5):
    """Train step that hides the input pipeline under the model compute.

    The standard fused step (make_train_step) runs augment -> fwd -> bwd
    -> update as one dependency chain, so the ~43 ms of warp gathers and
    Gaussian rendering serialize in front of the ~180 ms of conv work
    each step. Here ONE XLA program per step computes
      (a) fwd/bwd/RMSprop on the batch staged by the PREVIOUS call, and
      (b) augmentation + target render of the NEXT raw batch,
    which share no data dependency: the augment is HBM/VPU work
    (packed-row gathers + lerps) while fwd/bwd is MXU work, so the
    scheduler can interleave them instead of paying for both in series.
    This targets the reference's hot loop
    (/root/reference/src/runner/trainer.py:82-106), where the DataLoader
    workers played the same overlapping role on the host.

    Signature: (state, staged, raw_next, rng) -> (state', staged_next,
    metrics). `staged` is donated (the buffers of batch N are dead once
    consumed; batch N+1 reuses them). RNG parity with make_train_step:
    the batch consumed at state.step == s was staged with
    fold_in(rng, s), so given the same raw-batch sequence both modes
    produce bit-identical parameter trajectories.

    Drain the pipeline's final staged batch with
    make_train_step(spec, device_pipeline=False).
    """
    subset_t = tuple(subset) if subset is not None else None

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_step(state: TrainState, staged, raw_next, rng):
        # stage batch N+1 with the key the sequential step would use
        rng_next = jax.random.fold_in(rng, state.step + 1)
        nxt = augment_batch(raw_next, rng_next, spec, True)
        staged_next = {k: nxt[k] for k in STAGED_KEYS}

        image = staged['image']
        target, tw = _select_subset(staged['target'],
                                    staged['target_weight'], subset_t)
        new_state, metrics = _fwd_bwd_update(state, image, target, tw,
                                             pck_thr)
        return new_state, staged_next, metrics

    return train_step


def make_eval_step(spec, *, subset=None, pck_thr=0.5, device_pipeline=True):
    """Jitted eval step: forward + loss + PCK, no state mutation.

    `valid` masks padded tail samples out of the batch statistics
    (weights zeroed and sample count adjusted).
    """
    subset_t = tuple(subset) if subset is not None else None

    @jax.jit
    def eval_step(state: TrainState, batch, valid):
        if device_pipeline:
            data = augment_batch(batch, jax.random.PRNGKey(0), spec, False)
            image, target, tw = data['image'], data['target'], data['target_weight']
        else:
            image, target, tw = batch['image'], batch['target'], batch['target_weight']
        target, tw = _select_subset(target, tw, subset_t)
        tw = tw * valid[:, None]
        # zero out padded samples' targets so PCK's gt>1 check skips them
        target = target * valid[:, None, None, None]

        outs = state.apply_fn(
            {'params': state.params, 'batch_stats': state.batch_stats},
            image, train=False)
        # the loss means over the full padded batch; padded rows
        # contribute exactly 0 (tw and target zeroed above), so rescale
        # by B/n to make it a mean over VALID samples — the aggregators
        # weight per-batch means by n, and without this the tail batch
        # would enter deflated by n/B.
        n = jnp.maximum(jnp.sum(valid), 1.0)
        loss = heatmap_mse_loss(outs, target, tw) * (image.shape[0] / n)
        acc, per_joint, cnt = accuracy(outs[-1], target, thr=pck_thr)
        return {'loss': loss, 'acc': acc, 'per_joint': per_joint,
                'n': jnp.sum(valid)}

    return eval_step
