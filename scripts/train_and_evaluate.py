#!/usr/bin/env python
"""Train or evaluate from a YAML config (reference-compatible CLI).

Usage (parity: /root/reference/scripts/train_and_evaluate.py:49-64):
    python scripts/train_and_evaluate.py <config.yaml> [SECTION.key=value ...]

`COMMON.evaluate_only: True` runs the standalone Evaluator against
`COMMON.resume`; otherwise trains (with eval every epoch). The
checkpoint dir gets the reference's derived run name
({dataset}_{arch}_s{stacks}_{mobile}_{subset}).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

from hourglass_pose_estimation_tpu.config import load_config  # noqa: E402


def main(argv):
    from hourglass_pose_estimation_tpu.parallel.multihost import (
        maybe_initialize_distributed)
    maybe_initialize_distributed()
    if len(argv) < 2:
        print(__doc__)
        return 2
    cfg = load_config(argv[1], overrides=argv[2:])

    import dataclasses
    cfg = dataclasses.replace(
        cfg, common=dataclasses.replace(
            cfg.common,
            checkpoint_dir=os.path.join(cfg.common.checkpoint_dir,
                                        cfg.run_name())))

    from hourglass_pose_estimation_tpu.runner import Trainer, Evaluator
    from hourglass_pose_estimation_tpu.runner import checkpoint as ckpt_lib

    if cfg.common.evaluate_only:
        # fail fast on a missing checkpoint BEFORE building datasets
        # (parsing a large annotation set twice just to raise is slow)
        if not (cfg.common.resume and os.path.exists(cfg.common.resume)):
            raise FileNotFoundError(cfg.common.resume
                                    or '<COMMON.resume unset>')
        evaluator = Evaluator(cfg)
        # builds model + state shell; eval_only skips the train split
        # (train annotations need not exist on an eval-only machine)
        trainer = Trainer(cfg, verbose=False, eval_only=True)
        payload = ckpt_lib.restore(cfg.common.resume, trainer.state)
        state = payload['state']
        print(f"Loaded model {cfg.common.resume}")
        loss, acc = evaluator.evaluate(state)
        print(f'loss {loss:.5f} | pck {acc:.4f}')
        if cfg.eval.official:
            table = evaluator.evaluate_official(state)
            for k, v in table.items():
                print(f'  {k}: {v:.3f}')
    else:
        trainer = Trainer(cfg)
        best = trainer.train()
        print(f'best val pck: {best:.4f}')
    return 0


if __name__ == '__main__':
    raise SystemExit(main(sys.argv))
