"""Trainer: config-driven training loop with checkpointing and TB logs.

Functional re-design of `/root/reference/src/runner/trainer.py:24-183`:
same externally visible behavior — RMSprop + step-LR schedule, per-epoch
train + eval with running loss/PCK, TensorBoard scalars
(Loss|Accuracy x train|val), snapshot every `COMMON.snapshot` epochs and
`best` on improved val PCK, resume from checkpoint — but the loop body
is one donated, sharded XLA program (see runner/train_state.py) and the
input pipeline runs on device.

Documented deviations from the reference:
  * epoch count: the reference's `range(start, epochs+1)` runs
    epochs+1 epochs (trainer.py:152, an off-by-one); we run `epochs`.
  * batch-norm statistics are global-batch under data parallelism
    (DataParallel silently used per-GPU stats).
  * checkpoints are Orbax (msgpack pytrees), not torch pickles.
"""

from __future__ import annotations

import os
import time
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from hourglass_pose_estimation_tpu.config import Config
from hourglass_pose_estimation_tpu.data import (
    get_dataset, Loader, make_spec, resolve_num_classes)
from hourglass_pose_estimation_tpu.models import get_model
from hourglass_pose_estimation_tpu.parallel import (
    make_mesh, batch_sharding, replicated_sharding)
from hourglass_pose_estimation_tpu.runner.train_state import (
    TrainState, make_optimizer, init_state, make_train_step, make_eval_step)
from hourglass_pose_estimation_tpu.runner import checkpoint as ckpt_lib



class Trainer:
    """Builds model/optimizer/datasets from a Config and runs training."""

    def __init__(self, cfg: Config, num_classes: Optional[int] = None,
                 verbose: bool = True, eval_only: bool = False):
        """eval_only=True skips loading the TRAIN split (its annotations
        need not exist on an eval-only machine) — the val dataset stands
        in for the pipeline spec and the never-iterated train loader.
        `train()` refuses to run in this mode."""
        self.cfg = cfg
        self.verbose = verbose
        self.eval_only = eval_only
        mc, dc, tc = cfg.model, cfg.dataset, cfg.train

        self.num_classes = num_classes or resolve_num_classes(cfg)
        dtype = jnp.bfloat16 if tc.precision == 'bf16' else jnp.float32
        # explicit shard_map path with sync_bn: the model's train-mode BN
        # syncs its batch statistics over the 'data' axis IN the forward
        # (models/norm.py axis_name) — matching the implicit jit path's
        # global-batch statistics exactly. Eval/init never emit the
        # collective, so the same model serves the eval step.
        bn_axis = ('data' if tc.explicit_collectives and tc.sync_bn
                   else None)
        self.model = get_model(mc.arch, num_stacks=mc.num_stacks,
                               num_blocks=mc.num_blocks,
                               num_classes=self.num_classes,
                               mobile=mc.mobile, skip_mode=mc.skip_mode,
                               out_res=dc.out_res,
                               up_channel_num=mc.up_channel_num,
                               dtype=dtype, remat=tc.remat,
                               bn_stat_samples=tc.bn_stat_samples,
                               bn_axis_name=bn_axis,
                               fuse_block=mc.fuse_block)

        ds_kwargs = dict(image_path=dc.image_path,
                         annotation_path=dc.annotation_path,
                         inp_res=dc.inp_res, out_res=dc.out_res,
                         sigma=dc.sigma, scale_factor=dc.scale_factor,
                         rot_factor=dc.rot_factor, num_samples=dc.num_samples)
        self.val_ds = get_dataset(dc.name, False, **ds_kwargs)
        self.train_ds = (self.val_ds if eval_only
                         else get_dataset(dc.name, True, **ds_kwargs))
        self.spec = make_spec(self.train_ds)

        # multi-host SPMD: every process loads its contiguous slice of
        # each global batch (identical sample order via the shared seed)
        # and the batch is assembled into global arrays in _put_batch.
        self._procs = (jax.process_index(), jax.process_count())
        self.train_loader = Loader(self.train_ds, tc.train_batch,
                                   shuffle=True, seed=cfg.common.seed,
                                   drop_last=True, shard=self._procs)
        self.val_loader = Loader(self.val_ds, tc.val_batch, shuffle=False,
                                 seed=cfg.common.seed, drop_last=False,
                                 shard=self._procs)

        steps_per_epoch = tc.steps_per_epoch or len(self.train_loader)
        self.steps_per_epoch = min(steps_per_epoch, len(self.train_loader))
        # optax.flatten collapses the per-leaf optimizer dispatch into a
        # few large ops (24.8 -> ~1 ms/step), but a flat opt state cannot
        # be stage-sharded (pipeline) or TP-sharded -- use it only on the
        # standard data-parallel path.
        flat_opt = tc.model_parallel == 1 and tc.pipeline_parallel == 1
        self.tx = make_optimizer(tc.learning_rate, tc.schedule, tc.gamma,
                                 self.steps_per_epoch, flat=flat_opt)

        self.pp = tc.pipeline_parallel
        if self.pp > 1:
            # pipeline parallelism over stacks: ('data','pipe') mesh
            if not dc.device_pipeline:
                raise ValueError('pipeline_parallel requires '
                                 'DATASET.device_pipeline=True')
            if tc.explicit_collectives or tc.model_parallel > 1:
                raise ValueError('pipeline_parallel is incompatible with '
                                 'explicit_collectives/model_parallel')
            if mc.num_stacks % self.pp:
                raise ValueError(f'num_stacks {mc.num_stacks} not '
                                 f'divisible by pipeline_parallel {self.pp}')
            if tc.remat:
                raise ValueError('TRAIN.remat is not supported under '
                                 'pipeline_parallel (stages are already '
                                 'the recompute granularity)')
            from jax.sharding import Mesh
            devs = jax.devices()
            dp = tc.data_parallel or len(devs) // self.pp
            if dp * self.pp > len(devs):
                raise ValueError(
                    f'mesh dp{dp} x pp{self.pp} needs {dp * self.pp} '
                    f'devices, have {len(devs)}')
            if tc.train_batch % (dp * tc.microbatches):
                raise ValueError(
                    f'TRAIN.train_batch {tc.train_batch} must divide by '
                    f'data_parallel*microbatches = {dp * tc.microbatches}')
            self.mesh = Mesh(
                np.asarray(devs[:dp * self.pp]).reshape(dp, self.pp),
                ('data', 'pipe'))
            from hourglass_pose_estimation_tpu.models.hourglass import (
                HourglassStem, HourglassStack)
            self._stem = HourglassStem(mobile=mc.mobile,
                                       dtype=self.model.dtype,
                                       bn_stat_samples=tc.bn_stat_samples)
            self._stack = HourglassStack(
                num_blocks=mc.num_blocks, num_classes=self.num_classes,
                mobile=mc.mobile, skip_mode=mc.skip_mode,
                dtype=self.model.dtype,
                bn_stat_samples=tc.bn_stat_samples)
        else:
            self.mesh = make_mesh(tc.data_parallel, tc.model_parallel)
        self.state = self._init_state()
        if self.verbose:
            from hourglass_pose_estimation_tpu.utils.summary import (
                count_params, summarize)
            n_par = (count_params(self.state.params) if self.pp == 1 else
                     count_params(self.state.stem_params)
                     + count_params(self.state.stacked_params))
            self._log(f"==> model '{mc.arch}', stacks={mc.num_stacks}, "
                      f"params={n_par:,}, "
                      f"mesh={dict(self.mesh.shape)}")
            if cfg.common.summary:
                self._log(summarize(self.model,
                                    (1, dc.inp_res, dc.inp_res, 3)))
        self.start_epoch = 0
        self.best_acc = 0.0

        self.canvas = dc.canvas or max(dc.inp_res, 64)
        self.crop_aware = dc.canvas_mode == 'crop'
        self.device_pipeline = dc.device_pipeline
        if self.pp > 1:
            from hourglass_pose_estimation_tpu.parallel.pipeline import (
                make_pipeline_train_step_raw)
            self.train_step = make_pipeline_train_step_raw(
                self.spec, self._stem, self._stack, self.mesh,
                num_microbatches=tc.microbatches, subset=mc.subset,
                pck_thr=cfg.common.pck)
        elif tc.explicit_collectives:
            # explicit shard_map+psum formulation (TRAIN.explicit_
            # collectives); TRAIN.sync_bn=False gives DataParallel's
            # per-replica BN statistics (reference's actual behavior)
            if not dc.device_pipeline:
                raise ValueError('explicit_collectives requires '
                                 'DATASET.device_pipeline=True')
            from hourglass_pose_estimation_tpu.parallel.shard_map_step import (
                make_shard_map_train_step)
            self.train_step = make_shard_map_train_step(
                self.spec, self.mesh, subset=mc.subset,
                pck_thr=cfg.common.pck, sync_bn=tc.sync_bn)
        else:
            self.train_step = make_train_step(
                self.spec, subset=mc.subset, pck_thr=cfg.common.pck,
                device_pipeline=dc.device_pipeline)
        # late-training frozen BN (TRAIN.freeze_bn_after_epoch): a second
        # jitted step whose forward uses running-average statistics.
        # Standard-path only; built lazily (compiles only if reached).
        self.freeze_bn_after = (
            tc.freeze_bn_after_epoch
            if self.pp == 1 and not tc.explicit_collectives else 0)
        if tc.freeze_bn_after_epoch and self.freeze_bn_after == 0:
            raise ValueError('TRAIN.freeze_bn_after_epoch is only '
                             'supported on the standard (non-pipeline, '
                             'implicit-collectives) path')
        self._frozen_step = None
        self.eval_step = make_eval_step(
            self.spec, subset=mc.subset, pck_thr=cfg.common.pck,
            device_pipeline=dc.device_pipeline)

        self.ckpt_dir = os.path.join(cfg.common.checkpoint_dir, 'ckpts')
        self.writer = None
        if cfg.common.resume:
            if os.path.exists(cfg.common.resume):
                self._resume(cfg.common.resume)
            else:
                # reference parity (crash=resume): COMMON.resume may
                # point at a not-yet-created checkpoint so the SAME
                # config auto-resumes after a crash — first run starts
                # fresh, but say so instead of silently ignoring a typo
                self._log(f'=> no checkpoint found at '
                          f'{cfg.common.resume!r} — starting fresh')

    # ------------------------------------------------------------------
    def _place_state(self, state):
        """Apply the mesh placement: params tensor-parallel-sharded when
        model_parallel > 1, stack-axis-sharded under pipeline
        parallelism, everything else replicated. Used by BOTH fresh init
        and resume so a restored TP/PP run keeps its shardings (a resume
        must not silently fall back to replicated)."""
        if self.pp > 1:
            from hourglass_pose_estimation_tpu.parallel.pipeline import (
                shard_pipeline_state)
            return shard_pipeline_state(state, self.mesh)
        rep = replicated_sharding(self.mesh)
        if self.mesh.shape['model'] > 1:
            from hourglass_pose_estimation_tpu.parallel import shard_params
            place = lambda tree: jax.tree.map(
                jax.device_put, tree, shard_params(tree, self.mesh))
            return state.replace(
                params=place(state.params),
                # RMSprop accumulators are param-shaped: same TP sharding
                opt_state=place(state.opt_state),
                batch_stats=place(state.batch_stats),
                step=jax.device_put(state.step, rep))
        return jax.device_put(state, rep)

    def _init_state(self):
        rng = jax.random.PRNGKey(self.cfg.common.seed)
        shape = (1, self.cfg.dataset.inp_res, self.cfg.dataset.inp_res, 3)
        base = init_state(self.model, rng, shape, self.tx)
        if self.pp > 1:
            # identical init to the standard path (same seed -> same
            # weights), regrouped into the pipeline layout
            from hourglass_pose_estimation_tpu.parallel.pipeline import (
                PipelineState, split_hourglass_variables)
            stem_v, stk_v = split_hourglass_variables(
                {'params': base.params, 'batch_stats': base.batch_stats},
                self.cfg.model.num_stacks)
            state = PipelineState(
                step=base.step,
                stem_params=stem_v['params'],
                stem_stats=stem_v['batch_stats'],
                stacked_params=stk_v['params'],
                stacked_stats=stk_v['batch_stats'],
                opt_stem=self.tx.init(stem_v['params']),
                opt_stack=self.tx.init(stk_v['params']),
                tx=self.tx)
            return self._place_state(state)
        return self._place_state(base)

    def _merged_eval_state(self) -> TrainState:
        """Pipeline state -> a standard TrainState view for eval/export
        (HourglassNet-layout variables; optimizer state not used)."""
        from hourglass_pose_estimation_tpu.parallel.pipeline import (
            merge_hourglass_variables)
        merged = merge_hourglass_variables(
            {'params': self.state.stem_params,
             'batch_stats': self.state.stem_stats},
            {'params': self.state.stacked_params,
             'batch_stats': self.state.stacked_stats},
            self.cfg.model.num_stacks)
        return TrainState(step=self.state.step, params=merged['params'],
                          batch_stats=merged['batch_stats'],
                          opt_state=(), tx=self.tx,
                          apply_fn=self.model.apply)

    def _ckpt_view(self):
        """What gets checkpointed. Pipeline runs save MERGED params and
        stats (standard layout — export/estimator/eval read it
        unchanged) plus the raw two-tree optimizer state."""
        if self.pp == 1:
            return self.state
        return self._merged_eval_state().replace(
            opt_state={'stem': self.state.opt_stem,
                       'stack': self.state.opt_stack})

    def _resume(self, path: str):
        payload = ckpt_lib.restore(path, self._ckpt_view())
        if self.pp > 1:
            from hourglass_pose_estimation_tpu.parallel.pipeline import (
                split_hourglass_variables)
            st = payload['state']
            stem_v, stk_v = split_hourglass_variables(
                {'params': st.params, 'batch_stats': st.batch_stats},
                self.cfg.model.num_stacks)
            self.state = self._place_state(self.state.replace(
                step=st.step,
                stem_params=stem_v['params'],
                stem_stats=stem_v['batch_stats'],
                stacked_params=stk_v['params'],
                stacked_stats=stk_v['batch_stats'],
                opt_stem=st.opt_state['stem'],
                opt_stack=st.opt_state['stack']))
        else:
            self.state = self._place_state(payload['state'])
        self.start_epoch = int(payload['epoch'])
        self.best_acc = float(payload['best_acc'])
        if self.verbose:
            print(f"=> resumed from '{path}' at epoch {self.start_epoch}")
        self._fast_forward_schedule()

    def _fast_forward_schedule(self):
        """Reconcile the LR-schedule position with the resumed epoch.

        Two resume paths arrive with a fresh optimizer whose schedule
        count restarted at 0: an import from a reference `.pth.tar`
        (tools/import_torch_checkpoint.py — epoch > 0 with step == 0)
        and a layout-mismatch restore (runner/checkpoint.py falls back
        to a fresh opt_state but keeps step). Left alone, the optax
        piecewise-constant LR schedule would resume at the UNDECAYED
        base rate — e.g. 100x too hot when fine-tuning a checkpoint
        saved past its decay epochs. Restore the invariant
        `schedule count == step` (deriving step from
        epoch * steps_per_epoch when the checkpoint carries none).
        Genuine Trainer snapshots already satisfy it — no-op.
        """
        import optax.tree_utils as otu

        step = int(self.state.step)
        if step == 0 and self.start_epoch > 0:
            step = self.start_epoch * self.steps_per_epoch
        if step == 0:
            return
        cnt = jnp.asarray(step, jnp.int32)

        def ff(opt_state):
            try:
                if int(otu.tree_get(opt_state, 'count')) == step:
                    return opt_state
                return otu.tree_set(opt_state, count=cnt)
            except (KeyError, ValueError, TypeError):
                return opt_state       # no schedule count in this layout

        if self.pp == 1:
            opt = ff(self.state.opt_state)
            if opt is self.state.opt_state and int(self.state.step) == step:
                return
            self.state = self._place_state(self.state.replace(
                step=cnt, opt_state=opt))
        else:
            stem = ff(self.state.opt_stem)
            stack = ff(self.state.opt_stack)
            if (stem is self.state.opt_stem and stack is self.state.opt_stack
                    and int(self.state.step) == step):
                return
            self.state = self._place_state(self.state.replace(
                step=cnt, opt_stem=stem, opt_stack=stack))
        self._log('=> checkpoint carried no optimizer history: '
                  f'fast-forwarded the LR schedule to step {step} '
                  f'(epoch {self.start_epoch})')

    def _log(self, msg):
        if self.verbose:
            print(msg, flush=True)

    def _put_batch(self, batch):
        if self._procs[1] > 1:
            from hourglass_pose_estimation_tpu.parallel.multihost import (
                global_batch_from_local)
            return global_batch_from_local(self.mesh, batch)
        sh = batch_sharding(self.mesh)
        return {k: jax.device_put(v, sh) for k, v in batch.items()}

    def _stage(self, raw):
        """Transfer a raw host batch; host-pipeline batches get their
        device-side tail (normalize + target render) here."""
        dev = self._put_batch(raw)
        if not self.device_pipeline:
            from hourglass_pose_estimation_tpu.data.pipeline import (
                prepare_host_batch)
            dev = prepare_host_batch(dev, self.spec)
        return dev

    def _put_valid(self, valid):
        """The eval validity mask must follow the same local->global
        assembly as the batch it masks: under multi-host the Loader
        emits this process's rows only, and a process-local [B/n] mask
        against a global [B] batch is a shape mismatch inside
        eval_step."""
        v = np.asarray(valid, np.float32)
        if self._procs[1] > 1:
            from hourglass_pose_estimation_tpu.parallel.multihost import (
                global_batch_from_local)
            return global_batch_from_local(self.mesh, {'valid': v})['valid']
        return jnp.asarray(v)

    def _make_produce(self, ds, train: bool, epoch: int = 0):
        """Host-side batch producer, shared by _train_epoch and
        _evaluate so the canvas/crop/host-rng selection cannot
        diverge between the two."""
        if self.device_pipeline:
            return lambda b: ds.canvas_batch(
                b[0], canvas=self.canvas, crop_aware=self.crop_aware)
        # host (cv2-parity) pipeline: exact reference augmentation
        # semantics on the host; normalization + target rendering
        # still happen on device (prepare_host_batch). Eval draws
        # nothing from the rng.
        seed = ((self.cfg.common.seed * 1000003 + epoch) % (2 ** 31)
                if train else 0)
        host_rng = np.random.RandomState(seed)
        return lambda b: ds.host_batch(b[0], host_rng, train=train)

    # ------------------------------------------------------------------
    def _train_epoch(self, epoch: int, rng):
        from hourglass_pose_estimation_tpu.data.prefetch import Prefetcher
        step_fn = self.train_step
        if self.freeze_bn_after and epoch >= self.freeze_bn_after:
            if self._frozen_step is None:
                self._frozen_step = make_train_step(
                    self.spec, subset=self.cfg.model.subset,
                    pck_thr=self.cfg.common.pck,
                    device_pipeline=self.device_pipeline, freeze_bn=True)
                self._log(f'=> BatchNorm frozen (running averages) from '
                          f'epoch {epoch + 1} on')
            step_fn = self._frozen_step
        batches = self.train_loader.epoch_indices()[:self.steps_per_epoch]
        t0 = time.time()
        n_img = 0
        # Stage the next batch's host assembly on a worker thread while
        # the device runs the current step. Metrics stay ON DEVICE until
        # the epoch ends: a host value fetch is a full device round trip,
        # so per-step metric reads would serialize the pipeline.
        prefetch = Prefetcher(
            batches, self._make_produce(self.train_ds, True, epoch))
        step_metrics = []
        total = len(batches)
        # Double-buffered H2D: device_put is async, so dispatching the
        # NEXT batch's transfer before stepping on the CURRENT one lets
        # the (slow) host->device link stream behind the compute. One
        # key per epoch; the step folds in state.step on device.
        staged = None                    # (device batch, batch size)
        i = 0
        try:
            for raw, (idx, _valid) in prefetch:
                incoming = (self._stage(raw), len(idx))
                if staged is not None:
                    dev, bs = staged
                    self.state, metrics = step_fn(self.state, dev, rng)
                    step_metrics.append(
                        jnp.stack([metrics['loss'], metrics['acc']]))
                    n_img += bs
                    i += 1
                    if self.verbose and total >= 50 and i % 50 == 0:
                        el = time.time() - t0
                        eta = el / i * (total - i)
                        self._log(f'    [{i}/{total}] elapsed {el:.0f}s '
                                  f'eta {eta:.0f}s (dispatch)')
                staged = incoming
        finally:
            # abandoning iteration (step exception) must stop the
            # producer thread, or it blocks forever holding device
            # buffers; no-op on normal completion
            prefetch.close()
        if staged is not None:
            dev, bs = staged
            self.state, metrics = step_fn(self.state, dev, rng)
            step_metrics.append(jnp.stack([metrics['loss'], metrics['acc']]))
            n_img += bs
        if not step_metrics:
            return 0.0, 0.0
        vals = np.asarray(jnp.stack(step_metrics))        # ONE fetch
        dt = time.time() - t0
        loss, acc = float(vals[:, 0].mean()), float(vals[:, 1].mean())
        # n_img counted this process's rows; the step consumed the
        # GLOBAL batch (equal shards per process), so scale the
        # throughput log accordingly under multi-host
        n_img *= self._procs[1]
        self._log(f'  train: loss {loss:.5f} | pck {acc:.4f} | '
                  f'{n_img / dt:.1f} img/s')
        return loss, acc

    def _evaluate(self):
        from hourglass_pose_estimation_tpu.data.prefetch import Prefetcher
        prefetch = Prefetcher(self.val_loader.epoch_indices(),
                              self._make_produce(self.val_ds, False))
        rows = []
        eval_state = (self._merged_eval_state() if self.pp > 1
                      else self.state)
        # same double-buffered H2D as _train_epoch: dispatch the next
        # batch's (async) transfer before stepping on the current one
        staged = None
        try:
            for raw, (idx, valid) in prefetch:
                incoming = (self._stage(raw), self._put_valid(valid))
                if staged is not None:
                    m = self.eval_step(eval_state, *staged)
                    rows.append(jnp.stack([m['loss'], m['acc'], m['n']]))
                staged = incoming
        finally:
            prefetch.close()
        if staged is not None:
            m = self.eval_step(eval_state, *staged)
            rows.append(jnp.stack([m['loss'], m['acc'], m['n']]))
        if not rows:
            return 0.0, 0.0
        vals = np.asarray(jnp.stack(rows))                # ONE fetch
        n = vals[:, 2]
        tot = max(n.sum(), 1.0)
        return (float((vals[:, 0] * n).sum() / tot),
                float((vals[:, 1] * n).sum() / tot))

    # ------------------------------------------------------------------
    def train(self):
        if self.eval_only:
            raise RuntimeError('Trainer was built with eval_only=True '
                               '(no train split loaded)')
        cfg = self.cfg
        os.makedirs(self.ckpt_dir, exist_ok=True)
        if self.writer is None:
            try:
                from tensorboardX import SummaryWriter
                self.writer = SummaryWriter(
                    logdir=os.path.join(cfg.common.checkpoint_dir, 'logs', 'train'))
            except Exception:
                self.writer = None

        rng = jax.random.PRNGKey(cfg.common.seed + 1)
        for epoch in range(self.start_epoch, cfg.train.epochs):
            self._log(f'Epoch {epoch + 1}/{cfg.train.epochs}')
            rng, sub = jax.random.split(rng)
            loss, acc = self._train_epoch(epoch, sub)
            val_loss, val_acc = self._evaluate()
            self._log(f'  val:   loss {val_loss:.5f} | pck {val_acc:.4f}')

            if self.writer:
                self.writer.add_scalar('Loss/train', loss, epoch)
                self.writer.add_scalar('Accuracy/train', acc, epoch)
                self.writer.add_scalar('Loss/val', val_loss, epoch)
                self.writer.add_scalar('Accuracy/val', val_acc, epoch)

            is_best = val_acc > self.best_acc
            if is_best:
                self.best_acc = val_acc
            if (epoch + 1) % cfg.common.snapshot == 0:
                ckpt_lib.save(os.path.join(self.ckpt_dir, f'checkpoint_{epoch + 1}'),
                              self._ckpt_view(), epoch + 1, self.best_acc)
            if is_best:
                ckpt_lib.save(os.path.join(self.ckpt_dir, 'best'),
                              self._ckpt_view(), epoch + 1, self.best_acc)
        if self.writer:
            self.writer.close()
        return self.best_acc
