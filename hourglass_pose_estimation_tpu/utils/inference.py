"""API-parity wrappers over the batched device decoders.

The reference exposes `get_final_preds_v1` / `get_final_preds_v2` /
`gaussian_blur` / `taylor` as host-side per-sample helpers
(`/root/reference/src/utils/inference.py:9-87`). These names map onto
the vectorized device implementations in `ops/decode.py`; use those
directly for batched work — this module exists so reference-shaped
call sites port 1:1. Layout is therefore EXPLICIT and defaults to the
reference's NCHW ([B, J, H, W]); pass layout='NHWC' for device-native
arrays. (An earlier shape heuristic silently transposed valid NHWC
input whenever H < J — e.g. COCO-17 heatmaps at out_res 16.)
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from hourglass_pose_estimation_tpu.ops.decode import (
    decode_quarter_offset, decode_dark, gaussian_blur as _gaussian_blur)


def _to_nhwc(hms, layout: str):
    if layout not in ('NCHW', 'NHWC'):
        raise ValueError(f"layout must be 'NCHW' or 'NHWC', got {layout!r}")
    hms = np.asarray(hms)
    if layout == 'NCHW':
        return jnp.asarray(hms.transpose(0, 2, 3, 1))
    return jnp.asarray(hms)


def _broadcast_cs(center, scale, B):
    centers = np.broadcast_to(np.asarray(center, np.float32), (B, 2))
    scales = np.asarray(scale, np.float32)
    if scales.ndim == 0:
        scales = np.broadcast_to(scales, (B,))
    elif scales.ndim == 1 and scales.shape[0] == 2:
        scales = np.broadcast_to(scales, (B, 2))
    return centers, scales


def get_final_preds_v1(hms, center, scale, output_size=None,
                       layout: str = 'NCHW'):
    """Argmax + quarter-offset decode -> source-image coords.

    Parity: inference.py:48-67 (single-sample there; batched here).
    `output_size` is accepted for signature parity; the heatmap size
    is what the affine actually uses, as in the reference.
    """
    nhwc = _to_nhwc(hms, layout)
    centers, scales = _broadcast_cs(center, scale, nhwc.shape[0])
    preds, _ = decode_quarter_offset(nhwc, centers, scales)
    return np.asarray(preds)


def get_final_preds_v2(hms, center, scale, output_size=None,
                       layout: str = 'NCHW'):
    """DARK decode -> source-image coords (parity: inference.py:70-87)."""
    nhwc = _to_nhwc(hms, layout)
    centers, scales = _broadcast_cs(center, scale, nhwc.shape[0])
    preds, _ = decode_dark(nhwc, centers, scales)
    return np.asarray(preds)


def gaussian_blur(hms, kernel: int = 11, layout: str = 'NCHW'):
    """Batched blur with the reference's zero-pad + max-rescale
    semantics (inference.py:31-45)."""
    out = np.asarray(_gaussian_blur(_to_nhwc(hms, layout), kernel))
    return out.transpose(0, 3, 1, 2) if layout == 'NCHW' else out
