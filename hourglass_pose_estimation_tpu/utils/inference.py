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
        # a shape-(2,) vector is read as ONE (sx, sy) pair broadcast
        # over the batch (the reference's per-call scalar-pair shape).
        # With B == 2 this is ambiguous against "two per-sample scalar
        # scales" — refuse the guess; per-sample scales must be [B, 1]
        # or [B, 2]
        if B == 2 and float(scales[0]) != float(scales[1]):
            raise ValueError(
                'ambiguous scale of shape (2,) with batch 2: pass '
                '[B, 2] per-sample scales or a scalar')
        scales = np.broadcast_to(scales, (B, 2))
    return centers, scales


def get_final_preds_v1(hms, center, scale, output_size=None,
                       layout: str = 'NCHW'):
    """Argmax + quarter-offset decode -> source-image coords.

    Parity: inference.py:48-67 (single-sample there; batched here).
    `output_size` (w, h), when given, is the size the inverse affine
    maps from — exactly the reference's transform_preds output_size
    (its estimator passes FRAME dims with a matching frame-scale,
    estimator.py:76-82); default is the heatmap size.
    """
    nhwc = _to_nhwc(hms, layout)
    centers, scales = _broadcast_cs(center, scale, nhwc.shape[0])
    size = tuple(int(v) for v in output_size) if output_size is not None \
        else None
    preds, _ = decode_quarter_offset(nhwc, centers, scales,
                                     affine_size=size)
    return np.asarray(preds)


def get_final_preds_v2(hms, center, scale, output_size=None,
                       layout: str = 'NCHW'):
    """DARK decode -> source-image coords (parity: inference.py:70-87).

    `output_size` as in `get_final_preds_v1`. Documented FIX vs the
    reference: its refinement loop `for p in range(coords.shape[1])`
    iterates over the COORDINATE axis (length 2), so only joints 0-1
    ever receive the Taylor step; here every joint is refined (the
    loop bound is plainly a bug — the quirks kept for parity elsewhere
    are ones that affect the reference's own reported metrics).
    """
    nhwc = _to_nhwc(hms, layout)
    centers, scales = _broadcast_cs(center, scale, nhwc.shape[0])
    size = tuple(int(v) for v in output_size) if output_size is not None \
        else None
    preds, _ = decode_dark(nhwc, centers, scales, affine_size=size)
    return np.asarray(preds)


def gaussian_blur(hms, kernel: int = 11, layout: str = 'NCHW'):
    """Batched blur with the reference's zero-pad + max-rescale
    semantics (inference.py:31-45)."""
    out = np.asarray(_gaussian_blur(_to_nhwc(hms, layout), kernel))
    return out.transpose(0, 3, 1, 2) if layout == 'NCHW' else out
