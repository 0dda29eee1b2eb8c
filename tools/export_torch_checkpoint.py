#!/usr/bin/env python
"""Export a framework checkpoint back to a reference-format `.pth.tar`.

The inverse of tools/import_torch_checkpoint.py: an Orbax checkpoint
written by this framework's Trainer (or the importer) becomes a torch
checkpoint with the reference's exact naming and payload shape
({epoch, state_dict, optimizer, best_acc} — `/root/reference/src/
runner/trainer.py:166-181`), loadable with `strict=True` by the
reference's scripts (estimate.py, export.py → ONNX → OpenVINO). Arch
(hg/mspn) is auto-detected from the parameter tree.

Usage:
  python tools/export_torch_checkpoint.py <orbax_ckpt_dir> <out.pth.tar>
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('checkpoint_dir')
    p.add_argument('out_path')
    args = p.parse_args(argv)

    import torch
    import jax
    import orbax.checkpoint as ocp
    from hourglass_pose_estimation_tpu.interop import export_torch_state_dict

    ckptr = ocp.PyTreeCheckpointer()
    path = os.path.abspath(args.checkpoint_dir)
    try:
        # partial restore: skip the opt_state (params-sized, unused here)
        meta = ckptr.metadata(path)
        item = {k: jax.tree.map(lambda m: np.zeros(m.shape, m.dtype),
                                meta[k])
                for k in ('params', 'batch_stats', 'epoch', 'best_acc')
                if k in meta}
        payload = ckptr.restore(path, args=ocp.args.PyTreeRestore(
            item=item, partial_restore=True))
    except Exception:       # metadata layout surprises: full restore
        payload = ckptr.restore(path)
    variables = {'params': payload['params'],
                 'batch_stats': payload.get('batch_stats', {})}
    # np.array copy (NOT ascontiguousarray, which promotes the 0-d
    # num_batches_tracked to 1-d) keeps every entry's exact shape and
    # hands torch a writable buffer (jax arrays export read-only views)
    sd = {k: torch.from_numpy(np.array(v, order='C'))
          for k, v in export_torch_state_dict(variables).items()}
    epoch = int(payload.get('epoch', 0) or 0)
    best = float(payload.get('best_acc', 0.0) or 0.0)
    torch.save({'epoch': epoch, 'state_dict': sd, 'optimizer': {},
                'best_acc': best}, args.out_path)
    print(f'exported {args.checkpoint_dir} -> {args.out_path}\n'
          f'  {len(sd)} state_dict entries, epoch={epoch} '
          f'best_acc={best:.4f}')
    return 0


if __name__ == '__main__':
    sys.exit(main())
