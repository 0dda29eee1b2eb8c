"""Import trained reference (PyTorch) checkpoints into this framework.

Migration surface: a user of the reference project brings `.pth.tar`
files produced by its Trainer (`/root/reference/src/runner/
trainer.py:166-181`, payload {epoch, state_dict, optimizer, best_acc},
state_dict keys optionally 'module.'-prefixed by DataParallel) or bare
`state_dict`s. This module rewrites that torch parameter naming onto
this package's flax tree ({'params', 'batch_stats'}) with the layout
transforms TPU/NHWC requires:

  * conv weights   OIHW -> HWIO (identical for depthwise and grouped
    convs — both frameworks split channels contiguously per group),
  * BatchNorm      weight/bias -> scale/bias (params);
                   running_mean/running_var -> mean/var (batch_stats);
                   num_batches_tracked is dropped,
  * torch Sequential indices -> this package's explicit child names
    (`layer1.0.*` -> `layer1/*`, `hg.3.hg.2.1.0.*` -> `hg3/low1_l3/
    block0/*`, `fc.0.{0,1}` -> `fc0` + `fc_bn0`, trailing-underscore
    feedback convs `fc_`/`score_` -> `fc_back`/`score_back`).

Name spec derived from `/root/reference/src/models/hourglass.py:17-43`
and `modules.py:6-78`; numeric equivalence of the converted tree is
tested against the reference model itself (tests/test_torch_import.py
imports it read-only as the oracle). Optimizer accumulators are NOT
converted (torch RMSprop square_avg has no meaning to a fresh optax
chain) — an imported checkpoint resumes with reset RMSprop state. The
Trainer detects the missing optimizer history on resume (epoch > 0
with step == 0) and fast-forwards the LR-schedule position so
fine-tuning does NOT restart at the undecayed base rate
(runner/trainer.py::_fast_forward_schedule).

Both reference archs are importable: 'hg' and 'mspn' (the latter spec:
`/root/reference/src/models/mspn.py:8-297`; although the reference's
MSPN cannot be trained through ITS Trainer — SURVEY §2 — state_dicts
from upstream MSPN forks share the naming). Arch is auto-detected from
the key namespace (`top.`/`mspn_modules.` vs `hg.`/`layer1.`).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import numpy as np

# reference Hourglass._make_hour_glass child index j -> role
# (`/root/reference/src/models/modules.py:80-89`: [0]=up1 skip branch,
# [1]=low1 post-pool, [2]=low3 decoder, [3]=bottleneck extra at level 1)
_HG_CHILD = {0: 'up1', 1: 'low1', 2: 'low3', 3: 'low2'}


class TorchImportError(ValueError):
    """A state_dict key does not match the reference 'hg' naming."""


def _to_numpy(val) -> np.ndarray:
    if hasattr(val, 'detach'):            # torch tensor, no torch import
        val = val.detach().cpu().numpy()
    return np.asarray(val)


def _conv(path: Tuple[str, ...], leaf: str):
    if leaf == 'weight':
        # torch [O, I/groups, kh, kw] -> flax [kh, kw, I/groups, O]
        return ('params', path, 'kernel',
                lambda w: np.transpose(w, (2, 3, 1, 0)))
    if leaf == 'bias':
        return ('params', path, 'bias', None)
    raise TorchImportError(f'unexpected conv leaf {leaf!r} at {path}')


def _bn(path: Tuple[str, ...], leaf: str):
    if leaf == 'weight':
        return ('params', path, 'scale', None)
    if leaf == 'bias':
        return ('params', path, 'bias', None)
    if leaf == 'running_mean':
        return ('batch_stats', path, 'mean', None)
    if leaf == 'running_var':
        return ('batch_stats', path, 'var', None)
    if leaf == 'num_batches_tracked':
        return None
    raise TorchImportError(f'unexpected BN leaf {leaf!r} at {path}')


def _bottleneck(path: Tuple[str, ...], rest):
    """Children of a reference HGBottleneck (modules.py:9-24)."""
    if rest[0] == 'downsample':
        # nn.Sequential of exactly one 1x1 conv (hourglass.py:48-51)
        if rest[1] != '0':
            raise TorchImportError(f'unexpected downsample child {rest}')
        return _conv(path + ('downsample',), rest[2])
    if rest[0] in ('bn1', 'bn2', 'bn3'):
        return _bn(path + (rest[0],), rest[1])
    if rest[0] in ('conv1', 'conv2', 'conv3'):
        return _conv(path + (rest[0],), rest[1])
    raise TorchImportError(f'unexpected bottleneck child {rest} at {path}')


def _map_key(key: str):
    """torch state_dict key -> (collection, path, leaf, transform) or
    None (droppable bookkeeping like num_batches_tracked)."""
    parts = key.split('.')
    head = parts[0]
    try:
        if head == 'conv1':
            return _conv(('conv1',), parts[1])
        if head == 'bn1':
            return _bn(('bn1',), parts[1])
        if head in ('layer1', 'layer2', 'layer3'):
            # stem layers are Sequential(1 block) (hourglass.py:21-23)
            if parts[1] != '0':
                raise TorchImportError(
                    f'stem {head} has unexpected block index {parts[1]}')
            return _bottleneck((head,), parts[2:])
        if head == 'hg':
            i = int(parts[1])
            if parts[2] == 'concat_conv':    # skip_mode='concat' merge
                return _conv((f'hg{i}', 'concat_conv'), parts[3])
            if parts[2] != 'hg':
                raise TorchImportError(f'unexpected hourglass child {parts[2]}')
            d, j, b = int(parts[3]), int(parts[4]), int(parts[5])
            sub = f'{_HG_CHILD[j]}_l{d + 1}'
            return _bottleneck((f'hg{i}', sub, f'block{b}'), parts[6:])
        if head == 'res':
            i, b = int(parts[1]), int(parts[2])
            return _bottleneck((f'res{i}', f'block{b}'), parts[3:])
        if head == 'fc':
            i = int(parts[1])
            if parts[2] == '0':              # Sequential(conv, bn, relu)
                return _conv((f'fc{i}',), parts[3])
            if parts[2] == '1':
                return _bn((f'fc_bn{i}',), parts[3])
            raise TorchImportError(f'unexpected fc child {parts[2]}')
        if head == 'score':
            return _conv((f'score{int(parts[1])}',), parts[2])
        if head == 'fc_':
            return _conv((f'fc_back{int(parts[1])}',), parts[2])
        if head == 'score_':
            return _conv((f'score_back{int(parts[1])}',), parts[2])
    except TorchImportError:
        raise
    except (IndexError, KeyError, ValueError) as e:
        raise TorchImportError(f'cannot map key {key!r}: {e}') from e
    raise TorchImportError(f'unrecognized state_dict key {key!r} '
                           "for the reference 'hg' naming")


# reference MSPN ConvBNReLu child -> this package's ConvBN child names
_MSPN_CBR = {'conv_bn_relu1': 'cbr1', 'conv_bn_relu2': 'cbr2',
             'conv_bn_relu3': 'cbr3', 'downsample': 'downsample'}
_MSPN_UNIT_CHILDREN = ('u_skip', 'up_conv', 'skip1', 'skip2',
                       'cross_conv', 'res_conv1', 'res_conv2')


def _conv_bn(path: Tuple[str, ...], rest):
    """Children of a reference ConvBNReLu (mspn.py:8-27); this package's
    ConvBN keeps the same child names ('conv', 'bn')."""
    if rest[0] == 'conv':
        return _conv(path + ('conv',), rest[1])
    if rest[0] == 'bn':
        return _bn(path + ('bn',), rest[1])
    raise TorchImportError(f'unexpected ConvBNReLu child {rest} at {path}')


def _map_mspn_key(key: str):
    """Reference MSPN state_dict key -> flax path (models/mspn.py here).

    Naming spec: `/root/reference/src/models/mspn.py` — InputLayer
    `top.conv` (:59-69), stages `mspn_modules.{i}` (:285), trunk
    `downsample.layer{L}.{b}.{conv_bn_relu1..3,downsample}` (:79-110),
    decoder `upsample.up{1..4}.{u_skip,up_conv,skip1,skip2,cross_conv,
    res_conv1,res_conv2}` (:134-216).
    """
    parts = key.split('.')
    try:
        if parts[0] == 'top':
            if parts[1] != 'conv':
                raise TorchImportError(f'unexpected InputLayer child {parts[1]}')
            return _conv_bn(('top',), parts[2:])
        if parts[0] == 'criterion':     # embedded MSELoss: no params
            return None
        if parts[0] == 'mspn_modules':
            i = int(parts[1])
            if parts[2] == 'downsample':
                layer, b = parts[3], int(parts[4])
                if layer not in ('layer1', 'layer2', 'layer3', 'layer4'):
                    raise TorchImportError(f'unexpected trunk layer {layer}')
                child = _MSPN_CBR[parts[5]]
                return _conv_bn(
                    (f'stage{i}', 'downsample', f'{layer}_block{b}', child),
                    parts[6:])
            if parts[2] == 'upsample':
                unit, child = parts[3], parts[4]
                if unit not in ('up1', 'up2', 'up3', 'up4'):
                    raise TorchImportError(f'unexpected decoder unit {unit}')
                if child not in _MSPN_UNIT_CHILDREN:
                    raise TorchImportError(f'unexpected unit child {child}')
                return _conv_bn((f'stage{i}', unit, child), parts[5:])
            raise TorchImportError(f'unexpected stage child {parts[2]}')
    except TorchImportError:
        raise
    except (IndexError, KeyError, ValueError) as e:
        raise TorchImportError(f'cannot map key {key!r}: {e}') from e
    raise TorchImportError(f'unrecognized state_dict key {key!r} '
                           "for the reference 'mspn' naming")


def detect_arch(state_dict: Dict[str, Any]) -> str:
    for key in state_dict:
        head = (key[len('module.'):] if key.startswith('module.')
                else key).split('.')[0]
        if head in ('top', 'mspn_modules', 'criterion'):
            return 'mspn'
        if head in ('conv1', 'bn1', 'layer1', 'layer2', 'layer3', 'hg',
                    'res', 'fc', 'score', 'fc_', 'score_'):
            return 'hg'
    raise TorchImportError(
        'cannot detect arch: no recognizable reference key namespace in '
        f'{list(state_dict)[:5]}...')


def convert_torch_state_dict(state_dict: Dict[str, Any],
                             arch: str = 'auto') -> Dict[str, Any]:
    """Reference torch state_dict -> {'params', 'batch_stats'}.

    Accepts torch tensors or numpy arrays; tolerates DataParallel's
    'module.' key prefix; arch ('hg' | 'mspn') is auto-detected by
    default. Every key must map (unknown keys raise TorchImportError —
    silent drops would corrupt an import).
    """
    if arch == 'auto':
        arch = detect_arch(state_dict)
    if arch not in ('hg', 'mspn'):
        raise TorchImportError(f'unknown arch {arch!r}')
    mapper = _map_mspn_key if arch == 'mspn' else _map_key
    out = {'params': {}, 'batch_stats': {}}
    for key, val in state_dict.items():
        name = key[len('module.'):] if key.startswith('module.') else key
        mapped = mapper(name)
        if mapped is None:
            continue
        coll, path, leaf, tf = mapped
        arr = _to_numpy(val).astype(np.float32)
        if tf is not None:
            arr = tf(arr)
        node = out[coll]
        for p in path:
            node = node.setdefault(p, {})
        node[leaf] = arr
    return out


def check_tree_matches(variables: Dict[str, Any],
                       converted: Dict[str, Any]) -> None:
    """Raise with a full diff if `converted` does not exactly match the
    structure+shapes of `variables` (a model.init result)."""
    import jax

    def flat(tree):
        leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
        return {jax.tree_util.keystr(p): tuple(np.shape(v))
                for p, v in leaves}

    problems = []
    for coll in ('params', 'batch_stats'):
        want = flat(variables.get(coll, {}))
        got = flat(converted.get(coll, {}))
        for k in sorted(set(want) - set(got)):
            problems.append(f'missing {coll}{k} {want[k]}')
        for k in sorted(set(got) - set(want)):
            problems.append(f'unexpected {coll}{k} {got[k]}')
        for k in sorted(set(want) & set(got)):
            if want[k] != got[k]:
                problems.append(
                    f'shape mismatch {coll}{k}: model {want[k]} vs '
                    f'checkpoint {got[k]}')
    if problems:
        raise TorchImportError(
            'converted checkpoint does not match the model '
            f'({len(problems)} problems):\n  ' + '\n  '.join(problems[:40]))


_INV_HG_CHILD = {v: k for k, v in _HG_CHILD.items()}   # up1 -> 0, ...
_INV_MSPN_CBR = {v: k for k, v in _MSPN_CBR.items()}


def _torch_prefix_hg(path: Tuple[str, ...]) -> str:
    """flax param path (module names only) -> torch key prefix, hg."""
    import re

    def bneck_child(rest):
        # ('bn1',)/('conv2',)/('downsample',) within a bottleneck
        return 'downsample.0' if rest[0] == 'downsample' else rest[0]

    head = path[0]
    if head in ('conv1', 'bn1') and len(path) == 1:
        return head
    if head in ('layer1', 'layer2', 'layer3'):
        return f'{head}.0.{bneck_child(path[1:])}'
    m = re.fullmatch(r'(hg|res|fc_bn|fc_back|score_back|fc|score)(\d+)', head)
    if not m:
        raise TorchImportError(f'cannot invert hg path {path}')
    kind, i = m.group(1), int(m.group(2))
    if kind == 'hg':
        if path[1] == 'concat_conv':
            return f'hg.{i}.concat_conv'
        lm = re.fullmatch(r'(up1|low1|low2|low3)_l(\d+)', path[1])
        bm = re.fullmatch(r'block(\d+)', path[2])
        if not (lm and bm):
            raise TorchImportError(f'cannot invert hg path {path}')
        j, n, b = _INV_HG_CHILD[lm.group(1)], int(lm.group(2)), int(bm.group(1))
        return f'hg.{i}.hg.{n - 1}.{j}.{b}.{bneck_child(path[3:])}'
    if kind == 'res':
        b = int(path[1][len('block'):])
        return f'res.{i}.{b}.{bneck_child(path[2:])}'
    return {'fc': f'fc.{i}.0', 'fc_bn': f'fc.{i}.1', 'score': f'score.{i}',
            'fc_back': f'fc_.{i}', 'score_back': f'score_.{i}'}[kind]


def _torch_prefix_mspn(path: Tuple[str, ...]) -> str:
    """flax param path (module names only) -> torch key prefix, mspn.
    The trailing 'conv'/'bn' ConvBN child is part of the prefix."""
    import re

    if path[0] == 'top':
        return f'top.conv.{path[1]}'
    m = re.fullmatch(r'stage(\d+)', path[0])
    if not m:
        raise TorchImportError(f'cannot invert mspn path {path}')
    i = int(m.group(1))
    if path[1] == 'downsample':
        lm = re.fullmatch(r'(layer\d)_block(\d+)', path[2])
        if not lm:
            raise TorchImportError(f'cannot invert mspn path {path}')
        child = _INV_MSPN_CBR[path[3]]
        return (f'mspn_modules.{i}.downsample.{lm.group(1)}.'
                f'{int(lm.group(2))}.{child}.{path[4]}')
    if path[1] in ('up1', 'up2', 'up3', 'up4'):
        return (f'mspn_modules.{i}.upsample.{path[1]}.{path[2]}.{path[3]}')
    raise TorchImportError(f'cannot invert mspn path {path}')


def export_torch_state_dict(variables: Dict[str, Any],
                            arch: str = 'auto') -> Dict[str, np.ndarray]:
    """{'params', 'batch_stats'} -> reference-named torch state_dict
    (numpy values; wrap with torch.from_numpy to load_state_dict).

    The exact inverse of `convert_torch_state_dict`: conv kernels
    transpose HWIO -> OIHW, BN scale/bias -> weight/bias, running
    statistics restored, and a zero `num_batches_tracked` synthesized
    per BN so the result loads with `strict=True` into the reference
    model — the round-trip back to its ONNX/OpenVINO deploy path.
    """
    import jax

    params = variables['params']
    stats = variables.get('batch_stats', {})
    if arch == 'auto':
        arch = 'mspn' if 'top' in params else 'hg'
    if arch not in ('hg', 'mspn'):
        raise TorchImportError(f'unknown arch {arch!r}')
    prefix_of = _torch_prefix_mspn if arch == 'mspn' else _torch_prefix_hg

    out: Dict[str, np.ndarray] = {}
    bn_prefixes = set()
    leaf_map = {
        ('params', 'kernel'): 'weight',
        ('params', 'bias'): 'bias',
        ('params', 'scale'): 'weight',
        ('batch_stats', 'mean'): 'running_mean',
        ('batch_stats', 'var'): 'running_var',
    }
    for coll, tree in (('params', params), ('batch_stats', stats)):
        for kpath, arr in jax.tree_util.tree_flatten_with_path(tree)[0]:
            names = tuple(getattr(k, 'key', str(k)) for k in kpath)
            path, leaf = names[:-1], names[-1]
            prefix = prefix_of(path)
            arr = np.asarray(arr, dtype=np.float32)
            if leaf == 'kernel':
                arr = np.transpose(arr, (3, 2, 0, 1))   # HWIO -> OIHW
            try:
                out[f'{prefix}.{leaf_map[(coll, leaf)]}'] = arr
            except KeyError:
                raise TorchImportError(
                    f'unexpected {coll} leaf {leaf!r} at {path}') from None
            if coll == 'batch_stats' or leaf == 'scale':
                bn_prefixes.add(prefix)
    for p in sorted(bn_prefixes):
        out[f'{p}.num_batches_tracked'] = np.asarray(0, np.int64)
    return out


def load_torch_checkpoint(path: str) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Load a reference `.pth.tar` -> (variables, meta).

    variables = {'params', 'batch_stats'}; meta = {'epoch', 'best_acc'}
    (0 / 0.0 when the file is a bare state_dict). Torch is required
    only to unpickle.
    """
    import torch

    try:
        payload = torch.load(path, map_location='cpu', weights_only=False)
    except TypeError:   # torch < 1.13: no weights_only kwarg
        payload = torch.load(path, map_location='cpu')

    meta = {'epoch': 0, 'best_acc': 0.0}
    if isinstance(payload, dict) and 'state_dict' in payload:
        meta['epoch'] = int(payload.get('epoch', 0) or 0)
        best = payload.get('best_acc', 0.0)
        meta['best_acc'] = float(best) if best is not None else 0.0
        state_dict = payload['state_dict']
    else:
        state_dict = payload
    return convert_torch_state_dict(state_dict), meta
