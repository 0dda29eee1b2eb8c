"""Orbax checkpointing of {train state, epoch, best metric}.

TPU-native replacement for the reference's torch.save dicts
(`/root/reference/src/runner/trainer.py:166-181`): the same logical
payload {epoch, model state, optimizer state, best_acc}, stored as an
Orbax pytree checkpoint (multi-host safe, no pickle, no DataParallel
'module.' key-prefix games — cf. estimator.py:28-30 in the reference).
"""

from __future__ import annotations

import os
from typing import Any, Dict


import numpy as np
import orbax.checkpoint as ocp


def _ckpt(path: str) -> str:
    return os.path.abspath(path)


def save(path: str, state, epoch: int, best_acc: float) -> None:
    """Save state + metadata at `path` (a directory)."""
    payload = {
        'params': state.params,
        'batch_stats': state.batch_stats,
        'opt_state': state.opt_state,
        'step': state.step,
        'epoch': np.int64(epoch),
        'best_acc': np.float64(best_acc),
    }
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(_ckpt(path), payload, force=True)


def restore(path: str, template_state) -> Dict[str, Any]:
    """Restore into the structure of `template_state`.

    Returns {'state': TrainState, 'epoch': int, 'best_acc': float}.
    """
    ckptr = ocp.PyTreeCheckpointer()
    template = {
        'params': template_state.params,
        'batch_stats': template_state.batch_stats,
        'opt_state': template_state.opt_state,
        'step': template_state.step,
        'epoch': np.int64(0),
        'best_acc': np.float64(0.0),
    }
    try:
        restored = ckptr.restore(_ckpt(path), item=template)
        opt_state = restored['opt_state']
    except ValueError as e:
        # Orbax raises ValueError on item/metadata tree-structure
        # mismatch — i.e. an optimizer-layout difference (a pipeline-
        # parallel snapshot resumed by a standard run, or flat vs
        # per-leaf optimizer). Params/stats/step are layout-independent:
        # restore those with a partial template and restart the
        # optimizer accumulators. No error-message sniffing (wording
        # changes across orbax versions): just attempt the partial
        # restore, and if the checkpoint is genuinely broken that
        # attempt fails too — then surface the ORIGINAL error.
        partial = dict(template)
        del partial['opt_state']
        try:
            restored = ckptr.restore(
                _ckpt(path),
                args=ocp.args.PyTreeRestore(item=partial,
                                            partial_restore=True))
        except Exception:
            raise e
        opt_state = None
        print('=> checkpoint optimizer layout differs from this run '
              f'({type(e).__name__}); restored params/stats only '
              '(fresh optimizer state)')
    state = template_state.replace(
        params=restored['params'], batch_stats=restored['batch_stats'],
        opt_state=(opt_state if opt_state is not None
                   else template_state.opt_state),
        step=restored['step'])
    return {'state': state, 'epoch': int(restored['epoch']),
            'best_acc': float(restored['best_acc'])}


def restore_params(path: str):
    """Load only params + batch_stats (inference-side loading,
    Estimator parity: estimator.py:26-31)."""
    ckptr = ocp.PyTreeCheckpointer()
    restored = ckptr.restore(_ckpt(path))
    return restored['params'], restored.get('batch_stats', {})
