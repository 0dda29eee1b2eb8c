#!/usr/bin/env python
"""Import a reference (PyTorch) checkpoint into this framework.

Converts a `.pth.tar` produced by the reference Trainer
(`/root/reference/src/runner/trainer.py:166-181`) — or a bare
state_dict — into an Orbax checkpoint this framework's runners load
directly via `COMMON.resume` (training resume, `evaluate_only`, the
Estimator, and export all accept it). Epoch and best_acc carry over;
optimizer accumulators restart (see
hourglass_pose_estimation_tpu/interop.py).

Usage:
  python tools/import_torch_checkpoint.py <config.yaml> \
      <checkpoint.pth.tar> <out_dir> [SECTION.key=value ...]

The config must describe the SAME architecture the checkpoint was
trained with (arch/num_stacks/num_blocks/mobile/skip_mode/joints;
for MSPN also MODEL.up_channel_num — the decoder width the reference
factory overloads `num_blocks` for, mspn.py:310) — a mismatch fails
loudly with a tree diff, never a silent partial load.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('config')
    p.add_argument('torch_checkpoint')
    p.add_argument('out_dir')
    p.add_argument('overrides', nargs='*', default=[])
    args = p.parse_args(argv)

    import jax
    from hourglass_pose_estimation_tpu.config import load_config
    from hourglass_pose_estimation_tpu.data import resolve_num_classes
    from hourglass_pose_estimation_tpu.interop import (
        load_torch_checkpoint, check_tree_matches)
    from hourglass_pose_estimation_tpu.models import get_model
    from hourglass_pose_estimation_tpu.runner import checkpoint
    from hourglass_pose_estimation_tpu.runner.train_state import (
        make_optimizer, init_state)

    cfg = load_config(args.config, overrides=args.overrides)
    mc, tc = cfg.model, cfg.train
    num_classes = resolve_num_classes(cfg)

    variables, meta = load_torch_checkpoint(args.torch_checkpoint)

    model = get_model(mc.arch, num_stacks=mc.num_stacks,
                      num_blocks=mc.num_blocks, num_classes=num_classes,
                      mobile=mc.mobile, skip_mode=mc.skip_mode,
                      out_res=cfg.dataset.out_res,
                      up_channel_num=mc.up_channel_num)
    # template for structure validation + optimizer-state layout
    tx = make_optimizer(tc.learning_rate, tc.schedule, tc.gamma,
                        steps_per_epoch=1)
    state = init_state(model, jax.random.PRNGKey(0),
                       (1, cfg.dataset.inp_res, cfg.dataset.inp_res, 3), tx)
    check_tree_matches({'params': state.params,
                        'batch_stats': state.batch_stats}, variables)

    state = state.replace(params=variables['params'],
                          batch_stats=variables['batch_stats'])
    out = os.path.abspath(args.out_dir)
    checkpoint.save(out, state, epoch=meta['epoch'],
                    best_acc=meta['best_acc'])
    n = sum(int(x.size) for x in jax.tree.leaves(variables['params']))
    print(f'imported {args.torch_checkpoint} -> {out}\n'
          f'  arch={mc.arch} stacks={mc.num_stacks} mobile={mc.mobile} '
          f'skip={mc.skip_mode} joints={num_classes} params={n:,}\n'
          f'  epoch={meta["epoch"]} best_acc={meta["best_acc"]:.4f} '
          '(optimizer accumulators reset)')
    return 0


if __name__ == '__main__':
    sys.exit(main())
