"""Pipeline parallelism over hourglass stacks (shard_map + ppermute).

The stacked hourglass is a natural pipeline: stem -> stack_0 -> ... ->
stack_{S-1}, each stack emitting an intermediate-supervision heatmap
and passing 256-ch features forward. This module shards the STACK axis
over a 'pipe' mesh axis (k = S/P stacks per stage) and streams
microbatches through the ring with `jax.lax.ppermute` — a GPipe-style
schedule expressed as a single `lax.scan` inside `shard_map`, so the
backward pass (reverse schedule) is derived by AD: the transpose of a
ppermute is the reverse ppermute, and XLA overlaps the collectives with
stage compute on ICI.

No reference counterpart (its only parallelism is DataParallel,
/root/reference/src/runner/trainer.py:37); this is north-star scaling
work: data x pipeline on a ('data', 'pipe') mesh.

Semantics notes (documented deviations, same spirit as ghost-BN):
  * train=True computes batch-norm statistics per microbatch (standard
    for pipelined BN training). train=False uses running averages and
    is numerically identical to the sequential model — the parity
    oracle in tests/test_pipeline_parallel.py.
  * loss matches loss/mse.py exactly: sum over stacks of
    0.5*mean((w*(pred-gt))^2, over joints' mean) — microbatch means
    average back to the full-batch mean because microbatches are
    equal-sized.

Schedule: T = M + P - 1 ticks. At tick t, stage p works on microbatch
(t - p) when 0 <= t - p < M, else it computes on garbage and the result
is masked — uniform SPMD control flow, no data-dependent branching.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from hourglass_pose_estimation_tpu.loss import heatmap_mse_loss
from hourglass_pose_estimation_tpu.utils.evaluation import accuracy


class PipelineState(struct.PyTreeNode):
    """Train state for the pipelined model.

    stem_* are replicated; stacked_* carry a leading [S] stack axis
    sharded over 'pipe'. Two optax states (identical rule) keep the
    shard_map in/out specs structural instead of shape-guessing.
    """
    step: jnp.ndarray
    stem_params: Any
    stem_stats: Any
    stacked_params: Any
    stacked_stats: Any
    opt_stem: Any
    opt_stack: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)


def init_pipeline(stem, stack, rng, num_stacks: int, tx,
                  inp_res: int = 64) -> PipelineState:
    """Initialize stem + [S]-stacked stack variables (res-independent)."""
    r_stem, r_stack = jax.random.split(rng)
    x = jnp.zeros((1, inp_res, inp_res, 3), jnp.float32)
    stem_vars = stem.init(r_stem, x, train=False)
    feat = stem.apply(stem_vars, x, train=False)
    keys = jax.random.split(r_stack, num_stacks)
    stacked = jax.vmap(lambda k: stack.init(k, feat, train=False))(keys)
    return PipelineState(
        step=jnp.zeros((), jnp.int32),
        stem_params=stem_vars['params'],
        stem_stats=stem_vars.get('batch_stats', {}),
        stacked_params=stacked['params'],
        stacked_stats=stacked.get('batch_stats', {}),
        opt_stem=tx.init(stem_vars['params']),
        opt_stack=tx.init(stacked['params']),
        tx=tx)


def split_hourglass_variables(variables, num_stacks: int):
    """HourglassNet variables -> (stem_vars, stacked_vars).

    Lossless re-grouping of a trained flat checkpoint into the pipeline
    layout: conv1/bn1/layer1-3 go to the stem; hg{i}/res{i}/fc{i}/
    fc_bn{i}/score{i}/fc_back{i}/score_back{i} stack along a new leading
    axis. The last stack has no feedback convs in HourglassNet — they
    are zero-filled here (their outputs are discarded by the schedule).
    """
    stem_names = ('conv1', 'bn1', 'layer1', 'layer2', 'layer3')
    out = {}
    for col, tree in variables.items():       # 'params', 'batch_stats'
        stem = {k: v for k, v in tree.items() if k in stem_names}
        per_stack = []
        for i in range(num_stacks):
            entry = {}
            for name in ('hg', 'res', 'fc', 'fc_bn', 'score',
                         'fc_back', 'score_back'):
                key = f'{name}{i}'
                if key in tree:
                    entry[name] = tree[key]
                elif name in ('fc_back', 'score_back') and col == 'params':
                    entry[name] = jax.tree.map(jnp.zeros_like,
                                               tree[f'{name}0'])
            per_stack.append(entry)
        out[col] = (stem,
                    jax.tree.map(lambda *xs: jnp.stack(xs), *per_stack))
    (stem_p, stk_p) = out.get('params', ({}, {}))
    (stem_s, stk_s) = out.get('batch_stats', ({}, {}))
    return ({'params': stem_p, 'batch_stats': stem_s},
            {'params': stk_p, 'batch_stats': stk_s})


def pipeline_specs(state: PipelineState, mesh: Mesh):
    """PartitionSpec tree matching PipelineState: stacked over 'pipe'."""
    stacked = lambda tree: jax.tree.map(lambda _: P('pipe'), tree)
    repl = lambda tree: jax.tree.map(lambda _: P(), tree)

    def opt_stack_spec(leaf):
        # every array in opt_stack either mirrors a stacked param
        # (leading S axis) or is a schedule scalar
        return P('pipe') if getattr(leaf, 'ndim', 0) > 0 else P()

    return PipelineState(
        step=P(),
        stem_params=repl(state.stem_params),
        stem_stats=repl(state.stem_stats),
        stacked_params=stacked(state.stacked_params),
        stacked_stats=stacked(state.stacked_stats),
        opt_stem=repl(state.opt_stem),
        opt_stack=jax.tree.map(opt_stack_spec, state.opt_stack),
        tx=state.tx)


def shard_pipeline_state(state: PipelineState, mesh: Mesh) -> PipelineState:
    specs = pipeline_specs(state, mesh)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        state, specs)


def _build_pipeline_step(stem, stack, mesh: Mesh, *, num_microbatches,
                         train, update, pck_thr=0.5):
    """Internal: the (unjitted) pipelined step
    (state, images, target, tw) -> (state, metrics)."""
    n_pipe = mesh.shape['pipe']
    M = num_microbatches
    perm = [(i, (i + 1) % n_pipe) for i in range(n_pipe)]

    def _local(state, images, target, tw):
        p = jax.lax.axis_index('pipe')
        imgs = images.reshape(M, -1, *images.shape[1:])
        tgts = target.reshape(M, -1, *target.shape[1:])
        tws = tw.reshape(M, -1, tw.shape[-1])
        mb = imgs.shape[1]
        feat_shape = None  # resolved below

        def loss_fn(stem_params, stacked_params):
            T = M + n_pipe - 1

            def tick(carry, t):
                x_buf, loss_acc, acc_acc, stem_st, stk_st = carry
                my_mb = t - p
                t_in = jnp.clip(t, 0, M - 1)
                raw = jax.lax.dynamic_index_in_dim(imgs, t_in, 0,
                                                   keepdims=False)
                stem_out, stem_new = _apply_stem(
                    stem_params, stem_st, raw)
                x_in = jnp.where(p == 0, stem_out, x_buf)

                def one(x, pv):
                    pp, ss = pv
                    score, x2, ss_new = _apply_stack(pp, ss, x)
                    return x2, (score, ss_new)
                x_out, (scores, stk_new) = jax.lax.scan(
                    one, x_in, (stacked_params, stk_st))

                m_in = jnp.clip(my_mb, 0, M - 1)
                tgt = jax.lax.dynamic_index_in_dim(tgts, m_in, 0,
                                                   keepdims=False)
                twm = jax.lax.dynamic_index_in_dim(tws, m_in, 0,
                                                   keepdims=False)
                valid = (my_mb >= 0) & (my_mb < M)
                l = heatmap_mse_loss(scores, tgt, twm)
                loss_acc = loss_acc + jnp.where(valid, l, 0.0)
                # PCK on the LAST stack (lives on the last stage)
                a = accuracy(scores[-1].astype(jnp.float32), tgt,
                             thr=pck_thr)[0]
                acc_acc = acc_acc + jnp.where(
                    valid & (p == n_pipe - 1), a, 0.0)

                if train:
                    sel = lambda n, o: jnp.where(valid, n, o)
                    stk_st = jax.tree.map(sel, stk_new, stk_st)
                    sel0 = lambda n, o: jnp.where((p == 0) & (t < M), n, o)
                    stem_st = jax.tree.map(sel0, stem_new, stem_st)

                x_next = jax.lax.ppermute(x_out, 'pipe', perm)
                return (x_next, loss_acc, acc_acc, stem_st, stk_st), None

            x0 = jnp.zeros(feat_shape, feat_dtype)
            # accumulate in >= f32 (f64 when a numerical-parity caller
            # runs the whole pipeline in float64)
            ldt = jnp.promote_types(jnp.float32, feat_dtype)
            carry0 = (x0, jnp.zeros((), ldt), jnp.zeros((), ldt),
                      state.stem_stats, state.stacked_stats)
            (xf, loss, acc, stem_st, stk_st), _ = jax.lax.scan(
                tick, carry0, jnp.arange(T))
            # LOCAL loss only — no collectives inside the differentiated
            # function. Seeding cotangent 1 on every device's local loss
            # computes grads of the sum over stages (what we want along
            # 'pipe': cross-stage cotangents ride the transposed
            # ppermutes); the 'data' mean is applied to the grads below.
            # Per-microbatch means average to this shard's batch mean.
            return loss / M, (acc / M, stem_st, stk_st)

        def _apply_stem(params, stats, x):
            v = {'params': params, 'batch_stats': stats}
            if train:
                out, mut = stem.apply(v, x, train=True,
                                      mutable=['batch_stats'])
                return out, mut['batch_stats']
            return stem.apply(v, x, train=False), stats

        def _apply_stack(params, stats, x):
            v = {'params': params, 'batch_stats': stats}
            if train:
                (score, x2), mut = stack.apply(v, x, train=True,
                                               mutable=['batch_stats'])
                return score, x2, mut['batch_stats']
            score, x2 = stack.apply(v, x, train=False)
            return score, x2, stats

        # resolve the inter-stack feature shape/dtype from the stem
        feat = jax.eval_shape(
            lambda pp: stem.apply({'params': pp,
                                   'batch_stats': state.stem_stats},
                                  imgs[0], train=False),
            state.stem_params)
        feat_shape, feat_dtype = feat.shape, feat.dtype

        (loss, (acc, stem_st, stk_st)), (g_stem, g_stack) = \
            jax.value_and_grad(
                loss_fn, argnums=(0, 1), has_aux=True)(
                    state.stem_params, state.stacked_params)

        # metrics: stage sum (acc is nonzero on the last stage only),
        # data mean
        loss = jax.lax.psum(loss, 'pipe')
        loss = jax.lax.pmean(loss, 'data')
        acc = jax.lax.psum(acc, 'pipe')
        acc = jax.lax.pmean(acc, 'data')
        # stem grads: only stage 0's contribution is nonzero -> psum
        # over 'pipe' re-replicates; both grads pmean over 'data'.
        g_stem = jax.lax.psum(g_stem, 'pipe')
        g_stem = jax.lax.pmean(g_stem, 'data')
        g_stack = jax.lax.pmean(g_stack, 'data')
        if train:
            # stem stats live on stage 0; broadcast them around the ring
            zero_if_not0 = lambda x: jnp.where(p == 0, x, jnp.zeros_like(x))
            stem_st = jax.lax.psum(jax.tree.map(zero_if_not0, stem_st),
                                   'pipe')
            stem_st = jax.lax.pmean(stem_st, 'data')
            stk_st = jax.lax.pmean(stk_st, 'data')
        metrics = {'loss': loss, 'acc': acc}
        if not update:
            metrics['g_stem'] = g_stem
            metrics['g_stack'] = g_stack
            return state, metrics

        up_stem, new_opt_stem = state.tx.update(g_stem, state.opt_stem,
                                                state.stem_params)
        up_stack, new_opt_stack = state.tx.update(g_stack, state.opt_stack,
                                                  state.stacked_params)
        new_state = state.replace(
            step=state.step + 1,
            stem_params=optax.apply_updates(state.stem_params, up_stem),
            stacked_params=optax.apply_updates(state.stacked_params,
                                               up_stack),
            stem_stats=stem_st if train else state.stem_stats,
            stacked_stats=stk_st if train else state.stacked_stats,
            opt_stem=new_opt_stem, opt_stack=new_opt_stack)
        return new_state, metrics

    def _wrapped(state, images, target, tw):
        st_specs = pipeline_specs(state, mesh)
        batch = P('data')
        out_metrics = {'loss': P(), 'acc': P()}
        if not update:
            out_metrics['g_stem'] = jax.tree.map(
                lambda _: P(), state.stem_params)
            out_metrics['g_stack'] = jax.tree.map(
                lambda _: P('pipe'), state.stacked_params)
        fn = shard_map(
            _local, mesh=mesh,
            in_specs=(st_specs, batch, batch, batch),
            out_specs=(st_specs, out_metrics),
            check_rep=False)
        return fn(state, images, target, tw)

    return _wrapped


def make_pipeline_train_step(stem, stack, mesh: Mesh, *,
                             num_microbatches: int, train: bool = True,
                             update: bool = True, pck_thr: float = 0.5):
    """Jitted pipelined step: (state, images, target, tw) ->
    (state, metrics).

    images [B, H, W, 3], target [B, h, w, J], tw [B, J]; B sharded over
    'data', replicated over 'pipe'. update=False skips the optimizer
    (returns grads in metrics for parity tests).
    """
    wrapped = _build_pipeline_step(
        stem, stack, mesh, num_microbatches=num_microbatches,
        train=train, update=update, pck_thr=pck_thr)
    return jax.jit(wrapped, donate_argnums=(0,))


def make_pipeline_train_step_raw(spec, stem, stack, mesh: Mesh, *,
                                 num_microbatches: int, subset=None,
                                 pck_thr: float = 0.5):
    """Trainer-facing step over RAW canvas batches:
    (state, raw_batch, rng) -> (state, metrics).

    Signature-compatible with runner.train_state.make_train_step's
    device-pipeline mode: on-device augmentation + Gaussian target
    render run data-parallel (partitioned by XLA from the shardings),
    then the pipelined fwd/bwd/update executes under shard_map.
    """
    from hourglass_pose_estimation_tpu.data.pipeline import augment_batch

    wrapped = _build_pipeline_step(
        stem, stack, mesh, num_microbatches=num_microbatches,
        train=True, update=True, pck_thr=pck_thr)
    subset_t = tuple(subset) if subset is not None else None

    def step(state, raw, rng):
        rng = jax.random.fold_in(rng, state.step)
        data = augment_batch(raw, rng, spec, True)
        target, tw = data['target'], data['target_weight']
        if subset_t is not None:
            idx = jnp.asarray(subset_t)
            target, tw = target[..., idx], tw[:, idx]
        return wrapped(state, data['image'], target, tw)

    return jax.jit(step, donate_argnums=(0,))


def merge_hourglass_variables(stem_vars, stacked_vars, num_stacks: int):
    """Inverse of split_hourglass_variables: pipeline layout ->
    HourglassNet-layout variables (the stacked trees unstack into
    hg{i}/res{i}/..., the last stack's feedback convs are dropped).
    The merged dict is what every standard tool consumes (eval step,
    export, estimator, checkpoints)."""
    out = {}
    for col in ('params', 'batch_stats'):
        tree = dict(stem_vars.get(col, {}))
        for name, sub in stacked_vars.get(col, {}).items():
            for i in range(num_stacks):
                if (col == 'params' and i == num_stacks - 1
                        and name in ('fc_back', 'score_back')):
                    continue
                tree[f'{name}{i}'] = jax.tree.map(lambda a: a[i], sub)
        out[col] = tree
    return out
