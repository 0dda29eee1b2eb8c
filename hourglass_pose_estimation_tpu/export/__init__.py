"""Model export: StableHLO (jax.export) and TF SavedModel (jax2tf).

The TPU-native analogue of the reference's ONNX -> OpenVINO path
(`/root/reference/scripts/export.py:9-26`): serialize the jitted
inference function (last-stack heatmaps for a [1, R, R, 3] input) to a
portable artifact. StableHLO bytes are the primary format (replayable
on any XLA runtime); a TF SavedModel is emitted when tensorflow is
importable (for TF-Serving-style deployment).
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def fold_batchnorm(variables, eps: float = 1e-5):
    """Fold BN running statistics into the BN affine parameters.

    Inference-graph optimization (the OpenVINO model-optimizer analogue
    for the reference's deploy path): every batch-norm node's
    (mean, var) is absorbed into its (scale, bias) —
    scale' = scale/sqrt(var+eps), bias' = bias - mean*scale' — and the
    stored statistics are reset to the identity (mean 0, var 1-eps, so
    rsqrt(var+eps) == 1). `apply(train=False)` on the folded variables
    is numerically identical but each BN is one constant multiply-add
    with no rsqrt, and the folded affine constants serialize into the
    exported artifact.
    """
    from collections.abc import Mapping

    def copy_tree(t):   # fresh mutable containers, shared leaves
        if isinstance(t, Mapping):
            return {k: copy_tree(v) for k, v in t.items()}
        return t

    params = copy_tree(variables['params'])
    stats = copy_tree(variables.get('batch_stats', {}))

    def walk(p_node, s_node):
        if isinstance(s_node, dict) and 'mean' in s_node and 'var' in s_node:
            k = p_node['scale'] / jnp.sqrt(s_node['var'] + eps)
            p_node['bias'] = p_node['bias'] - s_node['mean'] * k
            p_node['scale'] = k
            s_node['mean'] = jnp.zeros_like(s_node['mean'])
            s_node['var'] = jnp.ones_like(s_node['var']) * (1.0 - eps)
            return
        if isinstance(s_node, dict):
            for key, child in s_node.items():
                if key in p_node:
                    walk(p_node[key], child)

    walk(params, stats)
    return {'params': params, 'batch_stats': stats}


def make_inference_fn(model, variables, decode: Optional[str] = None,
                      fold_bn: bool = False, weights_dtype=None,
                      preprocess: Optional[Tuple] = None,
                      input_res: Optional[int] = None):
    """Inference surface for a normalized NHWC batch.

    decode=None returns last-stack heatmaps (reference parity,
    estimator.py:88). decode='quarter'|'dark' fuses the keypoint decode
    into the same XLA program and returns (keypoints [B, J, 2] in
    network-INPUT-frame pixels, maxvals [B, J, 1]) — the deploy surface
    never leaves the device with heatmaps. fold_bn folds batch-norm
    statistics into affine constants; weights_dtype (e.g. jnp.bfloat16)
    casts conv kernels for half the weight HBM traffic.

    preprocess=(mean, std) + input_res: the returned fn takes RAW uint8
    BGR frames [B, H, W, 3] and fuses /255 -> bilinear resize to
    input_res^2 -> mean/std normalize into the same program — the whole
    deploy path (the reference splits this across host cv2 calls,
    estimator.py:39-54) is then ONE artifact consuming camera bytes.
    """
    if fold_bn:
        variables = fold_batchnorm(variables)
    if weights_dtype is not None:
        def cast(path, x):
            name = jax.tree_util.keystr(path)
            # conv kernels only; BN affine + biases stay f32
            if x.ndim == 4 and 'kernel' in name:
                return x.astype(weights_dtype)
            return x
        variables = {
            'params': jax.tree_util.tree_map_with_path(
                cast, variables['params']),
            'batch_stats': variables.get('batch_stats', {})}

    if preprocess is not None:
        if input_res is None:
            raise ValueError('preprocess requires input_res')
        from hourglass_pose_estimation_tpu.ops.resize import (
            resize_bilinear_halfpix)
        mean = jnp.asarray(preprocess[0], jnp.float32)
        std = jnp.asarray(preprocess[1], jnp.float32)

        def prepare(frames_u8):
            x = frames_u8.astype(jnp.float32) / 255.0
            x = resize_bilinear_halfpix(x, (input_res, input_res))
            return (x - mean) / std
    else:
        prepare = lambda images: images

    if decode is None:
        def fn(images):
            return model.apply(variables, prepare(images), train=False)[-1]
        return fn

    from hourglass_pose_estimation_tpu.ops.decode import (
        decode_quarter_offset, decode_dark)
    base = decode_dark if decode == 'dark' else decode_quarter_offset

    def fn(images):
        x = prepare(images)
        hms = model.apply(variables, x, train=False)[-1]
        B = hms.shape[0]
        R = x.shape[1]
        centers = jnp.tile(jnp.array([R / 2.0, R / 2.0], jnp.float32), (B, 1))
        scales = jnp.tile(jnp.array([R / 200.0, R / 200.0], jnp.float32),
                          (B, 1))
        kps, maxv = base(hms, centers, scales, zero_based=True)
        return kps, maxv
    return fn


def export_stablehlo(model, variables, input_shape: Tuple[int, ...],
                     path: str, decode: Optional[str] = None,
                     fold_bn: bool = False,
                     preprocess: Optional[Tuple] = None,
                     input_res: Optional[int] = None,
                     weights_dtype=None) -> str:
    """Serialize to StableHLO bytes at `path` (.bin). Returns the path.

    With `decode` set, the artifact maps frames -> keypoints (decode
    fused on device); `fold_bn` bakes folded batch-norm constants in.
    With `preprocess=(mean, std)` + `input_res`, `input_shape` is the
    RAW uint8 frame shape and the /255 -> resize -> normalize
    preprocessing is baked into the artifact. `weights_dtype`
    (e.g. jnp.bfloat16) bakes cast conv kernels in.
    """
    fn = make_inference_fn(model, variables, decode=decode, fold_bn=fold_bn,
                           preprocess=preprocess, input_res=input_res,
                           weights_dtype=weights_dtype)
    in_dtype = jnp.uint8 if preprocess is not None else jnp.float32
    exported = jax.export.export(jax.jit(fn))(
        jax.ShapeDtypeStruct(input_shape, in_dtype))
    blob = exported.serialize()
    os.makedirs(os.path.dirname(path) or '.', exist_ok=True)
    with open(path, 'wb') as fp:
        fp.write(blob)
    return path


def load_stablehlo(path: str):
    """Deserialize an exported function; returns a jitted callable
    (without the jit wrapper, `Exported.call` re-traces every
    invocation — ~10 s per frame instead of ~1 ms)."""
    with open(path, 'rb') as fp:
        blob = fp.read()
    exported = jax.export.deserialize(bytearray(blob))
    return jax.jit(exported.call)


def export_savedmodel(model, variables, input_shape: Tuple[int, ...],
                      path: str, decode: Optional[str] = None,
                      fold_bn: bool = False,
                      preprocess: Optional[Tuple] = None,
                      input_res: Optional[int] = None,
                      weights_dtype=None) -> Optional[str]:
    """TF SavedModel via jax2tf, or None if tensorflow is unavailable.

    Takes the SAME graph options as `export_stablehlo` so the two
    artifacts written by one `scripts/export.py` run share one I/O
    contract (previously the SavedModel silently ignored
    decode/fold_bn/preprocess/weights_dtype and emitted a
    heatmaps-from-f32 graph regardless of the config)."""
    try:
        import tensorflow as tf
        from jax.experimental import jax2tf
    except Exception:
        return None
    fn = make_inference_fn(model, variables, decode=decode,
                           fold_bn=fold_bn, weights_dtype=weights_dtype,
                           preprocess=preprocess, input_res=input_res)
    in_dtype = tf.uint8 if preprocess is not None else tf.float32
    tf_fn = tf.function(
        jax2tf.convert(fn, with_gradient=False),
        input_signature=[tf.TensorSpec(input_shape, in_dtype)],
        autograph=False)
    module = tf.Module()
    module.f = tf_fn
    tf.saved_model.save(module, path)
    return path
