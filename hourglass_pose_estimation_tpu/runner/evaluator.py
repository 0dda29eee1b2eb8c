"""Standalone evaluator (the `evaluate_only: True` path).

Parity surface: `/root/reference/src/runner/evaluator.py:10-57` —
builds the val loader, runs loss + heatmap-PCK with joint-subset
selection, returns averaged (loss, acc). Extensions the reference
lacks: flip-test averaging (BASELINE.json config 2; the reference
parses DATASET.flip but never uses it) and keypoint decoding to
source-image coordinates for dataset-official metrics (MPII PCKh).
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from hourglass_pose_estimation_tpu.config import Config
from hourglass_pose_estimation_tpu.data import (
    get_dataset, Loader, make_spec, n_joints_for)
from hourglass_pose_estimation_tpu.data.pipeline import augment_batch
from hourglass_pose_estimation_tpu.ops.decode import (
    decode_quarter_offset, decode_dark)


def flip_heatmaps(hms: jax.Array, flip_perm) -> jax.Array:
    """Average-ready flipped heatmaps: un-mirror W axis, swap L/R joints.

    hms: [B, H, W, J] produced from a horizontally flipped input.
    """
    perm = jnp.asarray(flip_perm, jnp.int32)
    out = hms[:, :, ::-1, :][..., perm]
    # classic flip-test alignment: shift one pixel right so peaks line up
    out = jnp.concatenate([out[:, :, :1, :], out[:, :, :-1, :]], axis=2)
    return out


class Evaluator:
    def __init__(self, cfg: Config, verbose: bool = True):
        self.cfg = cfg
        self.verbose = verbose
        dc = cfg.dataset
        self.ds = get_dataset(dc.name, False, image_path=dc.image_path,
                              annotation_path=dc.annotation_path,
                              inp_res=dc.inp_res, out_res=dc.out_res,
                              sigma=dc.sigma, scale_factor=dc.scale_factor,
                              rot_factor=dc.rot_factor,
                              num_samples=dc.num_samples)
        self.spec = make_spec(self.ds)
        self.loader = Loader(self.ds, cfg.train.val_batch, shuffle=False,
                             seed=cfg.common.seed, drop_last=False)
        self.canvas = dc.canvas or max(dc.inp_res, 64)
        self.crop_aware = dc.canvas_mode == 'crop'

        from hourglass_pose_estimation_tpu.runner.train_state import make_eval_step
        self.eval_step = make_eval_step(self.spec, subset=cfg.model.subset,
                                        pck_thr=cfg.common.pck,
                                        device_pipeline=dc.device_pipeline)

        import functools
        base = decode_dark if cfg.eval.decode == 'dark' else decode_quarter_offset
        # dataset-official metrics use the corrected 0-based decode
        # (the reference's 1-based space is kept only for its own
        # heatmap-PCK metric, where it cancels)
        self._decode = functools.partial(base, zero_based=True)

    def _produce(self, idx):
        """Host batch for one step, honoring DATASET.device_pipeline
        exactly like the Trainer: raw canvases for the device pipeline,
        cv2-parity host crops otherwise (eval draws nothing from rng)."""
        if self.cfg.dataset.device_pipeline:
            return self.ds.canvas_batch(idx, canvas=self.canvas,
                                        crop_aware=self.crop_aware)
        return self.ds.host_batch(idx, np.random.RandomState(0),
                                  train=False)

    def _stage(self, idx):
        raw = self._produce(idx)
        if not self.cfg.dataset.device_pipeline:
            from hourglass_pose_estimation_tpu.data.pipeline import (
                prepare_host_batch)
            raw = prepare_host_batch(
                {k: jnp.asarray(v) for k, v in raw.items()
                 if k in ('image', 'joints', 'vis')}, self.spec)
        return raw

    def evaluate(self, state) -> Tuple[float, float]:
        """Averaged (val_loss, heatmap PCK) — the reference's metric.

        Per-batch metrics stay on device; one host fetch at the end
        (each fetch is a tunnel round trip on this platform).
        """
        rows = []
        for idx, valid in self.loader.epoch_indices():
            m = self.eval_step(state, self._stage(idx), jnp.asarray(valid))
            rows.append(jnp.stack([m['loss'], m['acc'], m['n']]))
        vals = np.asarray(jnp.stack(rows))
        n = vals[:, 2]
        tot = max(n.sum(), 1.0)
        loss = float((vals[:, 0] * n).sum() / tot)
        acc = float((vals[:, 1] * n).sum() / tot)
        if self.verbose:
            print(f'val: loss {loss:.5f} | pck {acc:.4f}')
        return loss, acc

    # ------------------------------------------------------------------
    def predict_keypoints(self, state, flip_test: Optional[bool] = None,
                          return_scores: bool = False):
        """Decode keypoints for the whole val set into source-image
        coordinates (for dataset-official metrics such as MPII PCKh).

        Returns [N, J, 2] float32 predictions; with
        `return_scores=True`, also [N, J] per-keypoint heatmap peak
        values (the confidences for the COCO results file).
        """
        flip_test = self.cfg.eval.flip_test if flip_test is None else flip_test
        perm = self.spec.flip_perm
        if self.cfg.model.subset:
            # the model emits len(subset) channels: the flip permutation
            # must be re-indexed into subset space (only possible when
            # the subset is closed under the L/R pairing)
            sub = list(self.cfg.model.subset)
            try:
                perm = tuple(sub.index(perm[j]) for j in sub)
            except ValueError:
                if flip_test:
                    raise ValueError(
                        'EVAL.flip_test requires MODEL.subset to be '
                        'closed under the flip pairs; got '
                        f'{sub} with flip_perm {perm}')
                perm = tuple(range(len(sub)))

        device_pipeline = self.cfg.dataset.device_pipeline

        @jax.jit
        def forward(state, batch):
            if device_pipeline:
                data = augment_batch(batch, jax.random.PRNGKey(0),
                                     self.spec, False)
                image = data['image']
                center, scale = data['center'], data['scale']
            else:
                # host (cv2-parity) crops: normalize the 0-255 BGR crop
                # with the dataset statistics; geometry rides along
                image = (batch['image'] / 255.0
                         - jnp.asarray(self.spec.mean)) / jnp.asarray(
                             self.spec.std)
                center, scale = batch['center'], batch['scale']
            hms = state.apply_fn({'params': state.params,
                                  'batch_stats': state.batch_stats},
                                 image, train=False)[-1]
            if flip_test:
                flipped = image[:, :, ::-1, :]
                hf = state.apply_fn({'params': state.params,
                                     'batch_stats': state.batch_stats},
                                    flipped, train=False)[-1]
                hms = 0.5 * (hms + flip_heatmaps(hf, perm))
            preds, maxv = self._decode(hms, center, scale)
            return preds, maxv

        N = len(self.ds)
        J = self.ds.n_joints
        # MODEL.subset: the model emits len(subset) channels; scatter
        # them into the dataset's full joint set (untrained joints stay
        # 0 and score as misses — the honest reading of a subset run)
        cols = (np.asarray(self.cfg.model.subset, np.int64)
                if self.cfg.model.subset else np.arange(J))
        all_preds = np.zeros((N, J, 2), np.float32)
        all_scores = np.zeros((N, J), np.float32)
        for idx, valid in self.loader.epoch_indices():
            raw = self._produce(idx)
            if not device_pipeline:
                raw = {k: jnp.asarray(v) for k, v in raw.items()
                       if k in ('image', 'center', 'scale')}
            preds, maxv = forward(state, raw)
            preds, maxv = np.asarray(preds), np.asarray(maxv)
            sel = np.asarray(valid) > 0
            rows = np.asarray(idx)[sel]
            all_preds[np.ix_(rows, cols)] = preds[sel]
            all_scores[np.ix_(rows, cols)] = maxv[sel].reshape(
                len(rows), len(cols))
        if return_scores:
            return all_preds, all_scores
        return all_preds

    # ------------------------------------------------------------------
    def evaluate_official(self, state, output_dir: Optional[str] = None):
        """Dataset-official metrics + submission artifacts — the paths
        the reference wires nowhere (SURVEY.md §3.2):

          * MPII (EVAL.gt_mat set): PCKh@0.5 table, saving `pred.mat`
            (and short-circuiting a test split) exactly like the
            reference's dead-code evaluator (mpii.py:95-100);
          * COCO family: writes a pycocotools-format results JSON, runs
            the official COCOeval when pycocotools is importable, and
            always reports the self-contained OKS recall (AR keys —
            honestly named; not score-ranked AP).

        Returns a dict of named values.
        """
        if output_dir is None:
            output_dir = self.cfg.common.checkpoint_dir
        preds, scores = self.predict_keypoints(state, return_scores=True)
        name = self.cfg.dataset.name
        if name == 'mpii':
            if self.cfg.eval.gt_mat:
                from hourglass_pose_estimation_tpu.data.mpii import (
                    evaluate_pckh)
                table, mean = evaluate_pckh(
                    preds, self.cfg.eval.gt_mat, output_dir=output_dir or '',
                    image_set=getattr(self.ds, 'image_set', 'valid'))
                return dict(table)
            # no gt .mat available: still emit the official pred.mat
            # artifact, then fall through to the OKS-recall metrics
            if output_dir:
                from hourglass_pose_estimation_tpu.data.mpii import (
                    save_pred_mat)
                save_pred_mat(preds, output_dir)
        # OKS path: score against the loader's own gt instances
        from hourglass_pose_estimation_tpu.data.oks import (
            oks_recall, instance_areas_from_scales, write_coco_results,
            coco_eval_ap, COCO_SIGMAS, CROWDPOSE_SIGMAS)
        r = self.ds.records
        if name == 'crowdpose':
            sigmas = CROWDPOSE_SIGMAS
        elif self.ds.n_joints == 17:
            sigmas = COCO_SIGMAS
        else:
            # uniform kappa for datasets without published constants
            sigmas = np.full((self.ds.n_joints,), 0.079)
        # datasets store scale = expand * box/200 (mpii/coco bake in
        # 1.25; synthetic stores the raw covering box) — divide out
        # whatever THIS dataset baked in
        areas = instance_areas_from_scales(
            r.scales,
            scale_expand=getattr(self.ds, 'scale_stored_expand', 1.25))
        table = oks_recall(preds, r.joints, r.vis, areas, sigmas)
        image_ids = getattr(self.ds, 'image_ids', None)
        if image_ids is not None and output_dir:
            path = write_coco_results(
                preds, scores.mean(axis=1), image_ids,
                os.path.join(output_dir, f'keypoints_{name}_results.json'),
                kpt_scores=scores)
            table['results_file'] = path
            official = coco_eval_ap(self.ds._ann_file(), path,
                                    sigmas=sigmas)
            if official is not None:       # pycocotools present
                table.update({f'coco_{k}': v for k, v in official.items()})
        return table
