#!/usr/bin/env python
"""Export a trained model to StableHLO (and TF SavedModel if TF exists).

Usage (parity surface: /root/reference/scripts/export.py:29-33):
    python scripts/export.py <config.yaml> [SECTION.key=value ...]

Reads MODEL.* to rebuild the network, COMMON.resume for the checkpoint,
writes <checkpoint_dir>/export/model.stablehlo[.savedmodel].
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

from hourglass_pose_estimation_tpu.config import load_config  # noqa: E402


def main(argv):
    if len(argv) < 2:
        print(__doc__)
        return 2
    cfg = load_config(argv[1], overrides=argv[2:])

    import jax.numpy as jnp
    from hourglass_pose_estimation_tpu.models import get_model
    from hourglass_pose_estimation_tpu.runner import checkpoint as ckpt_lib
    from hourglass_pose_estimation_tpu.export import (
        export_stablehlo, export_savedmodel)
    from hourglass_pose_estimation_tpu.data import resolve_num_classes

    num_classes = resolve_num_classes(cfg)
    model = get_model(cfg.model.arch, num_stacks=cfg.model.num_stacks,
                      num_blocks=cfg.model.num_blocks,
                      num_classes=num_classes, mobile=cfg.model.mobile,
                      skip_mode=cfg.model.skip_mode,
                      out_res=cfg.dataset.out_res,
                      up_channel_num=cfg.model.up_channel_num,
                      fuse_block=cfg.model.fuse_block)

    if not (cfg.common.resume and os.path.exists(cfg.common.resume)):
        raise FileNotFoundError("Checkpoint doesn't exist: "
                                f'{cfg.common.resume!r}')
    params, batch_stats = ckpt_lib.restore_params(cfg.common.resume)
    variables = {'params': params, 'batch_stats': batch_stats}

    out_dir = os.path.join(cfg.common.checkpoint_dir, 'export')
    shape = (cfg.eval.export_batch,
             cfg.dataset.inp_res, cfg.dataset.inp_res, 3)
    decode = cfg.eval.decode if cfg.eval.export_keypoints else None
    preprocess = None
    if cfg.eval.export_preprocess:
        # the artifact consumes RAW uint8 frames: /255 -> resize ->
        # normalize run on device (EVAL.export_preprocess)
        from hourglass_pose_estimation_tpu.data.meanstd import get_meanstd
        preprocess = get_meanstd(cfg.dataset.name)
    wdtype = jnp.bfloat16 if cfg.eval.export_bf16_weights else None
    p1 = export_stablehlo(model, variables, shape,
                          os.path.join(out_dir, 'model.stablehlo'),
                          decode=decode, fold_bn=cfg.eval.export_fold_bn,
                          preprocess=preprocess,
                          input_res=cfg.dataset.inp_res,
                          weights_dtype=wdtype)
    print(f'wrote {p1}'
          + (f' (fused {decode} decode)' if decode else '')
          + (' (uint8 in, fused preprocess)' if preprocess else '')
          + (f' (batch {cfg.eval.export_batch})'
             if cfg.eval.export_batch != 1 else '')
          + (' (bf16 weights)' if wdtype is not None else ''))
    p2 = export_savedmodel(model, variables, shape,
                           os.path.join(out_dir, 'savedmodel'),
                           decode=decode, fold_bn=cfg.eval.export_fold_bn,
                           preprocess=preprocess,
                           input_res=cfg.dataset.inp_res,
                           weights_dtype=wdtype)
    print(f'wrote {p2}' if p2 else 'tensorflow unavailable; SavedModel skipped')
    return 0


if __name__ == '__main__':
    raise SystemExit(main(sys.argv))
