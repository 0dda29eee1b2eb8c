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


def make_inference_fn(model, variables):
    """Last-stack heatmaps for a normalized NHWC batch (export surface)."""
    def fn(images):
        return model.apply(variables, images, train=False)[-1]
    return fn


def export_stablehlo(model, variables, input_shape: Tuple[int, ...],
                     path: str) -> str:
    """Serialize to StableHLO bytes at `path` (.bin). Returns the path."""
    fn = make_inference_fn(model, variables)
    exported = jax.export.export(jax.jit(fn))(
        jax.ShapeDtypeStruct(input_shape, jnp.float32))
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
                      path: str) -> Optional[str]:
    """TF SavedModel via jax2tf, or None if tensorflow is unavailable."""
    try:
        import tensorflow as tf
        from jax.experimental import jax2tf
    except Exception:
        return None
    fn = make_inference_fn(model, variables)
    tf_fn = tf.function(
        jax2tf.convert(fn, with_gradient=False),
        input_signature=[tf.TensorSpec(input_shape, tf.float32)],
        autograph=False)
    module = tf.Module()
    module.f = tf_fn
    tf.saved_model.save(module, path)
    return path
