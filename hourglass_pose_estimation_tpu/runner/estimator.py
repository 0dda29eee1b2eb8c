"""Estimator: single-image / batched inference service.

Parity surface: `/root/reference/src/runner/estimator.py:11-93` —
build model from config, load checkpoint, preprocess a BGR frame
(/255, per-dataset mean/std, resize — the reference normalizes BEFORE
resizing; reproduced), forward, take the last stack, decode. The
decode here runs on device (`ops/decode.py`) instead of the
reference's host loops, and `run_batch` amortizes compilation across
frames (the reference is strictly single-image).
"""

from __future__ import annotations

import time


import numpy as np
import jax
import jax.numpy as jnp

from hourglass_pose_estimation_tpu.config import Config
from hourglass_pose_estimation_tpu.models import get_model
from hourglass_pose_estimation_tpu.data.meanstd import get_meanstd, ESTIMATOR_MEANSTD
from hourglass_pose_estimation_tpu.ops.decode import (
    decode_quarter_offset, decode_simple_argmax)
from hourglass_pose_estimation_tpu.runner import checkpoint as ckpt_lib


class Estimator:
    @staticmethod
    def _joints_for(dataset: str) -> int:
        """Joint count from the inference config's dataset name.

        Accepts registry names and the reference's loose substrings
        (`COMMON.dataset` drives mean/std choice by substring at
        estimator.py:41-48): 'mscoco'/'coco' -> 17, 'mpii' -> 16, ...
        """
        from hourglass_pose_estimation_tpu.data import REGISTRY, n_joints_for
        if dataset in REGISTRY:
            return n_joints_for(dataset)
        # substring matching only for non-empty names ('' would match
        # every registry key and silently pick an import-order winner)
        if dataset:
            for key in REGISTRY:
                if key in dataset or dataset in key:
                    return n_joints_for(key)
        raise ValueError(
            f'cannot derive num_classes from dataset {dataset!r}; '
            f'set MODEL.num_classes explicitly')

    def __init__(self, cfg: Config, params=None, batch_stats=None,
                 strict_reference_stats: bool = False):
        mc, cc = cfg.model, cfg.common
        self.cfg = cfg
        # num_classes: explicit config wins (`configs/inference.yaml`
        # `num_classes`, reference scripts/estimate.py surface); else
        # len(MODEL.subset) (a subset-trained checkpoint emits that many
        # channels); else derive from the dataset name — NOT a silent
        # 16, which would be wrong for COCO-17 inference configs. Same
        # chain as data.resolve_num_classes (whose dataset term reads
        # the DATASET section that inference configs don't carry).
        num_classes = (mc.num_classes
                       or (len(mc.subset) if mc.subset else 0)
                       or self._joints_for(cc.dataset))
        self.model = get_model(mc.arch, num_stacks=mc.num_stacks,
                               num_blocks=mc.num_blocks,
                               num_classes=num_classes, mobile=mc.mobile,
                               skip_mode=mc.skip_mode, out_res=cc.out_res,
                               up_channel_num=mc.up_channel_num,
                               fuse_block=mc.fuse_block)
        self.input_size = (cc.in_res, cc.in_res)
        self.threshold = 0.02
        stats = ESTIMATOR_MEANSTD if strict_reference_stats else None
        if stats is not None:
            for key, v in stats.items():
                if key in cc.dataset:
                    self.mean, self.std = v
                    break
            else:
                self.mean, self.std = get_meanstd(cc.dataset)
        else:
            self.mean, self.std = get_meanstd(cc.dataset)

        if params is None:
            if not cc.resume:
                raise FileNotFoundError('Checkpoint not found')
            params, batch_stats = ckpt_lib.restore_params(cc.resume)
        self.variables = {'params': params, 'batch_stats': batch_stats or {}}

        @jax.jit
        def _forward(variables, frames):
            return self.model.apply(variables, frames, train=False)[-1]

        self._forward = _forward

        # Deploy-grade path: preprocessing fused into the forward
        # program. The host ships raw uint8 frames (3x less transfer
        # than f32) and the /255 + bilinear resize + mean/std normalize
        # run on device. The reference normalizes BEFORE resizing
        # (estimator.py:39-54); bilinear resampling commutes with the
        # per-channel affine normalization exactly in real arithmetic
        # (its weights sum to 1), so resizing first is the same map up
        # to f32 rounding — parity-tested against `preprocess`.
        from hourglass_pose_estimation_tpu.ops.resize import (
            resize_bilinear_halfpix)
        mean = jnp.asarray(self.mean, jnp.float32)
        std = jnp.asarray(self.std, jnp.float32)
        size = self.input_size

        @jax.jit
        def _forward_raw(variables, frames_u8):
            x = frames_u8.astype(jnp.float32) / 255.0
            x = resize_bilinear_halfpix(x, size)
            x = (x - mean) / std
            return self.model.apply(variables, x, train=False)[-1]

        self._forward_raw = _forward_raw

    # -- preprocessing --------------------------------------------------
    def preprocess(self, frames: np.ndarray) -> jnp.ndarray:
        """[B, H, W, 3] (or [H, W, 3]) BGR uint8 -> normalized, resized.

        Order parity with the reference (estimator.py:39-54): normalize
        in source resolution, then resize to the network input.
        """
        import cv2
        if frames.ndim == 3:
            frames = frames[None]
        mean = np.asarray(self.mean, np.float32)
        std = np.asarray(self.std, np.float32)
        x = (frames.astype(np.float32) / 255.0 - mean) / std  # vectorized
        out = np.zeros((frames.shape[0], *self.input_size, 3), np.float32)
        for i in range(len(x)):                 # cv2.resize is per-image
            out[i] = cv2.resize(x[i], self.input_size)
        return jnp.asarray(out)

    def _heatmaps(self, frames: np.ndarray, device_preprocess: bool):
        """frames [B|_, H, W, 3] uint8 -> last-stack heatmaps (device).

        device_preprocess=True ships raw uint8 and runs resize+normalize
        inside the forward program (deploy path); False reproduces the
        reference's host cv2 preprocess exactly.
        """
        if frames.ndim == 3:
            frames = frames[None]
        if device_preprocess:
            return self._forward_raw(self.variables, jnp.asarray(frames))
        return self._forward(self.variables, self.preprocess(frames))

    # -- decoding -------------------------------------------------------
    def post_process_v1(self, heatmaps, output_size):
        """Thresholded argmax + x4 stride upscale (estimator.py:56-74)."""
        kps, maxv = decode_simple_argmax(heatmaps, self.input_size,
                                         output_size, self.threshold)
        return np.asarray(kps), np.asarray(maxv)

    def post_process_v2(self, heatmaps, output_size,
                        strict_reference: bool = False):
        """Quarter-offset decode of frame-covering heatmaps.

        The reference's version (estimator.py:76-82) synthesizes
        scale = out*4/200/hm_size, which maps a heatmap peak at (48,20)
        of a 64^2 map over a 256^2 frame to (123,121) instead of
        (192,80) — verified against the reference directly; its demo
        clusters all keypoints near the frame center. The corrected
        transform treats the whole frame as the person box
        (scale = frame/200) and decodes in the heatmap frame.
        `strict_reference=True` reproduces the reference bug-for-bug.
        """
        B, H, W, J = heatmaps.shape
        center = np.array([round(output_size[0] * 0.5),
                           round(output_size[1] * 0.5)], np.float32)
        if strict_reference:
            scale = np.array([output_size[0] * 4.0 / 200.0 / H,
                              output_size[1] * 4.0 / 200.0 / W], np.float32)
            centers = np.tile(center, (B, 1))
            scales = np.tile(scale, (B, 1))
            kps, maxv = decode_quarter_offset(
                heatmaps, centers, scales,
                affine_size=(int(output_size[0]), int(output_size[1])))
        else:
            # decode in the (square, resized) network-input frame, then
            # stretch to the original frame per axis (frames need not be
            # square; the similarity decode can't express that directly)
            iw, ih = self.input_size
            centers = np.tile(np.array([iw / 2, ih / 2], np.float32), (B, 1))
            scales = np.tile(np.array([iw / 200.0, ih / 200.0], np.float32),
                             (B, 1))
            kps, maxv = decode_quarter_offset(heatmaps, centers, scales,
                                              zero_based=True)
            kps = np.asarray(kps) * np.array([output_size[0] / iw,
                                              output_size[1] / ih], np.float32)
        return np.asarray(kps).astype(np.int32), np.asarray(maxv)

    # -- inference ------------------------------------------------------
    def run(self, frame: np.ndarray, time_it: bool = True,
            device_preprocess: bool = False):
        """One frame -> [J, 2] int keypoints in frame coordinates.

        Defaults to the reference's host cv2 preprocess (normalize then
        resize, estimator.py:39-54) so the parity surface is untouched;
        pass device_preprocess=True for the fused deploy path.

        Timing note: the measured interval covers the model program and
        runs until the heatmaps are materialized on the host
        (np.asarray) — on this TPU transport, block_until_ready acks
        before execution finishes, so a plain "time the forward" print
        would under-report. Host preprocess is excluded from the timed
        window (as in the reference).
        """
        fh, fw = frame.shape[-3], frame.shape[-2]
        if frame.ndim == 3:
            frame = frame[None]
        if device_preprocess:
            staged = jnp.asarray(frame)
            start = time.time()
            hms = np.asarray(self._forward_raw(self.variables, staged))
        else:
            staged = self.preprocess(frame)
            start = time.time()
            hms = np.asarray(self._forward(self.variables, staged))
        if time_it:
            print(f'Inference time: {time.time() - start:.3f}s')
        kps, _ = self.post_process_v2(hms, (fw, fh))
        return kps[0]

    def run_skeleton(self, frame: np.ndarray,
                     device_preprocess: bool = False):
        """One frame -> ([J, 3] heatmap-space (x, y, conf) NMS peaks,
        heatmap (H, W)) for skeleton rendering — the reference's
        `post_process_heatmap` path
        (openvino_visualizer/utils.py:35-48), batched on device."""
        from hourglass_pose_estimation_tpu.ops.decode import decode_nms_peaks
        hms = self._heatmaps(frame, device_preprocess)
        kps = np.asarray(decode_nms_peaks(hms))[0]
        return kps, tuple(hms.shape[1:3])

    def run_batch(self, frames: np.ndarray,
                  device_preprocess: bool = False):
        """[B, H, W, 3] -> [B, J, 2] keypoints (batched path the
        reference lacks)."""
        hms = self._heatmaps(frames, device_preprocess)
        kps, _ = self.post_process_v2(np.asarray(hms),
                                      (frames.shape[2], frames.shape[1]))
        return kps
