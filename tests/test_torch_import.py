"""Torch-checkpoint import: the converted flax tree must make
HourglassNet compute the SAME function as the reference torch model.

The oracle is the reference implementation itself, imported read-only
from /root/reference (skipped when that checkout is absent) — the
strongest model-parity evidence available: random reference weights
round-trip through `interop.convert_torch_state_dict` and the two
frameworks' forwards must agree on random inputs.
"""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hourglass_pose_estimation_tpu.interop import (
    TorchImportError, check_tree_matches, convert_torch_state_dict,
    detect_arch, export_torch_state_dict, load_torch_checkpoint)
from hourglass_pose_estimation_tpu.models import HourglassNet, MSPN

torch = pytest.importorskip('torch')

REFERENCE = '/root/reference'


def _reference_hg(num_stacks, mobile, skip_mode, num_classes=16):
    if not os.path.isdir(os.path.join(REFERENCE, 'src')):
        pytest.skip('reference checkout not available')
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    from src.models.hourglass import hg as torch_hg
    return torch_hg(num_stacks=num_stacks, num_blocks=1,
                    num_classes=num_classes, mobile=mobile,
                    skip_mode=skip_mode)


def _randomize_(model, seed=0):
    """In-place: random weights AND random BN running stats, so the
    conversion of every leaf (incl. batch_stats) carries signal."""
    gen = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for name, t in model.state_dict().items():
            if not t.dtype.is_floating_point:
                continue
            if name.endswith('running_var'):
                t.copy_(torch.rand(t.shape, generator=gen) + 0.5)
            else:
                t.copy_(torch.randn(t.shape, generator=gen) * 0.1)


@pytest.mark.parametrize('stacks,mobile,skip_mode', [
    (2, False, 'sum'),
    (1, True, 'sum'),
    (1, False, 'concat'),
])
def test_converted_forward_matches_reference(stacks, mobile, skip_mode):
    tmodel = _reference_hg(stacks, mobile, skip_mode)
    _randomize_(tmodel, seed=stacks + mobile * 10)
    tmodel.eval()

    x = torch.randn(2, 3, 64, 64, generator=torch.Generator().manual_seed(7))
    with torch.no_grad():
        ref = np.stack([o.numpy() for o in tmodel(x)])      # [S,B,J,h,w]
    ref = ref.transpose(0, 1, 3, 4, 2)                      # -> [S,B,h,w,J]

    variables = convert_torch_state_dict(tmodel.state_dict())
    model = HourglassNet(num_stacks=stacks, num_blocks=1, num_classes=16,
                         mobile=mobile, skip_mode=skip_mode,
                         dtype=jnp.float32)
    check_tree_matches(
        model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                   train=False), variables)

    got = np.asarray(model.apply(
        variables, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
        train=False))
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-4)


def test_architecture_mismatch_raises():
    tmodel = _reference_hg(1, False, 'sum')
    variables = convert_torch_state_dict(tmodel.state_dict())
    two_stack = HourglassNet(num_stacks=2, num_blocks=1, num_classes=16,
                             dtype=jnp.float32)
    init = two_stack.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                          train=False)
    with pytest.raises(TorchImportError, match='missing'):
        check_tree_matches(init, variables)


def test_unknown_key_raises():
    with pytest.raises(TorchImportError, match='cannot detect arch'):
        convert_torch_state_dict({'stage0.conv.weight': np.zeros((1, 1, 1, 1))})
    with pytest.raises(TorchImportError, match='unrecognized'):
        convert_torch_state_dict({'conv1.weight': np.zeros((64, 3, 7, 7)),
                                  'blah.weight': np.zeros((1,))})


def test_converted_mspn_forward_matches_reference():
    """2 stages exercise every cross-stage path (has_skip adds,
    gen_skip/gen_cross_conv decoders) — the first full-network numeric
    parity check for MSPN."""
    if not os.path.isdir(os.path.join(REFERENCE, 'src')):
        pytest.skip('reference checkout not available')
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    from src.models.mspn import mspn as torch_mspn
    # reference factory quirk: num_blocks IS up_channel_num (mspn.py:310)
    tmodel = torch_mspn(num_stacks=2, num_classes=16, out_res=16,
                        mobile=False, num_blocks=64)
    assert detect_arch(tmodel.state_dict()) == 'mspn'
    _randomize_(tmodel, seed=2)
    tmodel.eval()

    x = torch.randn(1, 3, 64, 64, generator=torch.Generator().manual_seed(9))
    with torch.no_grad():
        outs = tmodel(x)                      # list (stage) of list (res)
    ref = np.stack([o.numpy() for stage in outs for o in stage])
    ref = ref.transpose(0, 1, 3, 4, 2)        # [S*4,B,h,w,J]

    variables = convert_torch_state_dict(tmodel.state_dict())
    model = MSPN(num_stacks=2, num_classes=16, out_res=16,
                 up_channel_num=64, dtype=jnp.float32)
    check_tree_matches(
        model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                   train=False), variables)
    got = np.asarray(model.apply(
        variables, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
        train=False))
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize('arch,kwargs', [
    ('hg', dict(num_stacks=2, mobile=False, skip_mode='sum')),
    ('hg', dict(num_stacks=1, mobile=True, skip_mode='concat')),
    ('mspn', dict(num_stacks=2)),
])
def test_export_round_trips_bit_exact(arch, kwargs):
    """convert -> export is the identity on the torch state_dict (keys,
    shapes, values), and the result loads strict=True."""
    if arch == 'mspn':
        if not os.path.isdir(os.path.join(REFERENCE, 'src')):
            pytest.skip('reference checkout not available')
        if REFERENCE not in sys.path:
            sys.path.insert(0, REFERENCE)
        from src.models.mspn import mspn as torch_mspn
        tmodel = torch_mspn(num_classes=16, out_res=16, mobile=False,
                            num_blocks=64, **kwargs)
    else:
        tmodel = _reference_hg(**kwargs)
    _randomize_(tmodel, seed=4)

    sd = tmodel.state_dict()
    back = export_torch_state_dict(convert_torch_state_dict(sd))
    assert set(back) == set(sd.keys())
    for k in sd:
        np.testing.assert_array_equal(back[k], sd[k].numpy(), err_msg=k)
    # and torch accepts it wholesale (asarray keeps 0-d entries 0-d)
    tmodel.load_state_dict(
        {k: torch.from_numpy(np.asarray(v, order='C'))
         for k, v in back.items()}, strict=True)


def test_export_cli_produces_reference_loadable_pth(tmp_path):
    """Orbax checkpoint (fresh flax init) -> .pth.tar -> reference model
    load_state_dict(strict=True) -> forward parity with the flax model."""
    model = HourglassNet(num_stacks=1, num_blocks=1, num_classes=16,
                         dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 3)),
                           train=False)
    import orbax.checkpoint as ocp
    ckpt = tmp_path / 'orbax'
    ocp.PyTreeCheckpointer().save(
        str(ckpt), {'params': variables['params'],
                    'batch_stats': variables['batch_stats'],
                    'epoch': np.int64(4), 'best_acc': np.float64(0.75)})

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', 'tools'))
    import export_torch_checkpoint
    out = tmp_path / 'exported.pth.tar'
    assert export_torch_checkpoint.main([str(ckpt), str(out)]) == 0

    payload = torch.load(str(out), map_location='cpu', weights_only=False)
    assert payload['epoch'] == 4 and payload['best_acc'] == 0.75
    # 0-d entries must stay 0-d (torch's own num_batches_tracked shape)
    assert payload['state_dict']['bn1.num_batches_tracked'].shape == ()
    tmodel = _reference_hg(1, False, 'sum')
    tmodel.load_state_dict(payload['state_dict'], strict=True)
    tmodel.eval()

    x = torch.randn(1, 3, 64, 64, generator=torch.Generator().manual_seed(2))
    with torch.no_grad():
        ref = np.stack([o.numpy() for o in tmodel(x)]).transpose(0, 1, 3, 4, 2)
    got = np.asarray(model.apply(
        variables, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
        train=False))
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-4)


def test_resume_imported_checkpoint_fast_forwards_lr_schedule(tmp_path):
    """An imported checkpoint has epoch > 0 but no optimizer history
    (step 0, fresh opt_state). Resuming must fast-forward the optax
    schedule count, or fine-tuning would run at the undecayed base LR
    (e.g. 100x too hot past the decay epochs)."""
    import optax.tree_utils as otu
    from hourglass_pose_estimation_tpu.config import load_config
    from hourglass_pose_estimation_tpu.runner import checkpoint
    from hourglass_pose_estimation_tpu.runner.trainer import Trainer
    from hourglass_pose_estimation_tpu.runner.train_state import (
        make_optimizer, init_state)

    model = HourglassNet(num_stacks=1, num_blocks=1, num_classes=16,
                         dtype=jnp.float32)
    tx = make_optimizer(2.5e-3, [2, 4], 0.1, steps_per_epoch=1)
    state = init_state(model, jax.random.PRNGKey(0), (1, 64, 64, 3), tx)
    ck = tmp_path / 'imported'
    checkpoint.save(str(ck), state, epoch=3, best_acc=0.0)

    cfg = load_config(raw={
        'DATASET': {'name': 'synthetic', 'inp_res': 64, 'out_res': 16,
                    'num_samples': 16},
        'MODEL': {'arch': 'hg', 'num_stacks': 1, 'num_blocks': 1},
        'TRAIN': {'train_batch': 8, 'val_batch': 8, 'epochs': 5,
                  'schedule': [2, 4]},
        'COMMON': {'resume': str(ck),
                   'checkpoint_dir': str(tmp_path / 'out')},
    })
    tr = Trainer(cfg, verbose=False)
    expected = 3 * tr.steps_per_epoch
    assert expected > 0
    assert int(tr.state.step) == expected
    assert int(otu.tree_get(tr.state.opt_state, 'count')) == expected


def test_load_torch_checkpoint_wrapper_and_prefix(tmp_path):
    """Reference Trainer payload shape: {'epoch', 'state_dict'
    (DataParallel 'module.'-prefixed), 'optimizer', 'best_acc'}."""
    tmodel = _reference_hg(1, False, 'sum')
    _randomize_(tmodel, seed=3)
    sd = {'module.' + k: v for k, v in tmodel.state_dict().items()}
    path = tmp_path / 'checkpoint_7.pth.tar'
    torch.save({'epoch': 7, 'state_dict': sd, 'optimizer': {},
                'best_acc': 0.5625}, path)

    variables, meta = load_torch_checkpoint(str(path))
    assert meta == {'epoch': 7, 'best_acc': 0.5625}
    direct = convert_torch_state_dict(tmodel.state_dict())
    a = jax.tree.leaves(variables)
    b = jax.tree.leaves(direct)
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


def test_import_cli_produces_loadable_checkpoint(tmp_path):
    tmodel = _reference_hg(1, False, 'sum')
    _randomize_(tmodel, seed=5)
    src = tmp_path / 'best.pth.tar'
    torch.save({'epoch': 11, 'state_dict': tmodel.state_dict(),
                'optimizer': {}, 'best_acc': 0.25}, src)
    cfg = tmp_path / 'cfg.yaml'
    cfg.write_text(
        'DATASET:\n  name: synthetic\n  inp_res: 64\n  out_res: 16\n'
        'MODEL:\n  arch: hg\n  num_stacks: 1\n  num_blocks: 1\n'
        '  mobile: False\n  skip_mode: sum\n')
    out = tmp_path / 'imported'

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', 'tools'))
    import import_torch_checkpoint
    assert import_torch_checkpoint.main(
        [str(cfg), str(src), str(out)]) == 0

    from hourglass_pose_estimation_tpu.runner import checkpoint
    params, stats = checkpoint.restore_params(str(out))
    direct = convert_torch_state_dict(tmodel.state_dict())
    for x, y in zip(jax.tree.leaves(params),
                    jax.tree.leaves(direct['params'])):
        np.testing.assert_array_equal(x, y)
    for x, y in zip(jax.tree.leaves(stats),
                    jax.tree.leaves(direct['batch_stats'])):
        np.testing.assert_array_equal(x, y)


def test_import_cli_mspn_nondefault_width(tmp_path):
    """Regression: a reference MSPN checkpoint with decoder width != 256
    (its factory maps num_blocks -> up_channel_num, mspn.py:310) imports
    via MODEL.up_channel_num; previously no config key could express it."""
    if not os.path.isdir(os.path.join(REFERENCE, 'src')):
        pytest.skip('reference checkout not available')
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    from src.models.mspn import mspn as torch_mspn
    tmodel = torch_mspn(num_stacks=1, num_classes=16, out_res=16,
                        mobile=False, num_blocks=64)
    _randomize_(tmodel, seed=6)
    src = tmp_path / 'mspn.pth.tar'
    torch.save(tmodel.state_dict(), src)
    cfg = tmp_path / 'cfg.yaml'
    cfg.write_text(
        'DATASET:\n  name: synthetic\n  inp_res: 64\n  out_res: 16\n'
        'MODEL:\n  arch: mspn\n  num_stacks: 1\n  num_classes: 16\n'
        '  up_channel_num: 64\n')
    out = tmp_path / 'imported'

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', 'tools'))
    import import_torch_checkpoint
    assert import_torch_checkpoint.main([str(cfg), str(src), str(out)]) == 0

    from hourglass_pose_estimation_tpu.runner import checkpoint
    params, _ = checkpoint.restore_params(str(out))
    direct = convert_torch_state_dict(tmodel.state_dict())
    for x, y in zip(jax.tree.leaves(params),
                    jax.tree.leaves(direct['params'])):
        np.testing.assert_array_equal(x, y)


def test_train_step_matches_reference_end_to_end():
    """The deepest accuracy-parity evidence obtainable without real
    data: with identical weights and an identical batch, the reference
    torch training step and this framework's step must agree on (a) the
    loss, (b) every per-parameter gradient, and (c) the parameter delta
    of one RMSprop update. Ties together the forward-parity, loss-oracle
    and optimizer-oracle tests into one end-to-end claim: d(loss)/
    d(params) — the training dynamics — match across frameworks.
    Oracle: /root/reference `src/runner/trainer.py:82-99`
    (forward -> MSELoss -> backward -> RMSprop.step), run in-process.

    Both sides run in float64: in f32 the comparison is ill-posed —
    d(loss)/d(bn1.bias) is a ~2% residue of cancelling terms (a
    per-channel shift of an early BN's output is almost annihilated by
    the next BN), so both frameworks' f32 values carry ~10% cancellation
    noise. In f64 the agreement is exact arithmetic (loss ~1e-14 rel,
    measured), so the tolerances below are tight.
    """
    tmodel = _reference_hg(1, False, 'sum')
    _randomize_(tmodel, seed=17)
    tmodel.train()
    tmodel = tmodel.double()
    from src.loss.mse import MSELoss as TorchMSE

    gen = torch.Generator().manual_seed(23)
    x = torch.randn(4, 3, 64, 64, generator=gen).double()
    tgt = torch.rand(4, 16, 16, 16, generator=gen).double()     # [B,J,h,w]
    tw = (torch.rand(4, 16, 1, generator=gen) > 0.25).double()  # [B,J,1]

    lr = 2.5e-3
    opt = torch.optim.RMSprop(tmodel.parameters(), lr=lr, momentum=0,
                              weight_decay=0)
    opt.zero_grad()
    tloss = TorchMSE(use_target_weight=True)(tmodel(x), tgt, tw)
    tloss.backward()

    named = dict(tmodel.named_parameters())
    pre = {k: v.detach().clone() for k, v in tmodel.state_dict().items()}
    grads_sd = {}
    for name, t in pre.items():
        p = named.get(name)
        if p is not None and p.grad is not None:
            grads_sd[name] = p.grad.detach().clone()
        else:
            grads_sd[name] = t  # BN running stats / counters: ignored below
    opt.step()
    post = {k: v.detach().clone() for k, v in tmodel.state_dict().items()}

    def convert64(sd):
        return jax.tree.map(lambda a: np.asarray(a, np.float64),
                            convert_torch_state_dict(sd))

    variables = convert64(pre)
    ref_grads = convert64(grads_sd)['params']
    ref_delta = convert64(
        {k: post[k] - pre[k] if pre[k].dtype.is_floating_point else pre[k]
         for k in pre})['params']

    from hourglass_pose_estimation_tpu.loss import heatmap_mse_loss
    from hourglass_pose_estimation_tpu.runner.train_state import make_optimizer

    def assert_tree_close(got, ref, what, rel_tol, floor):
        gl, _ = jax.tree_util.tree_flatten_with_path(got)
        rl = jax.tree.leaves(ref)
        assert len(gl) == len(rl)
        # floor the denominator at `floor` x the largest leaf norm: conv
        # biases feeding a BN have true gradient ~0 (BN subtracts any
        # shift), so their own norm (~1e-15) is pure noise — per-leaf
        # relative error is meaningless there, global-relative is not.
        gmax = max(np.linalg.norm(np.asarray(r)) for r in rl)
        for (path, g), r in zip(gl, rl):
            g, r = np.asarray(g), np.asarray(r)
            scale = np.linalg.norm(r)
            err = np.linalg.norm(g - r) / (scale + floor * gmax)
            assert err < rel_tol, (
                f'{what} mismatch at {jax.tree_util.keystr(path)}: '
                f'rel-L2 {err:.2e} (|ref|={scale:.3e})')

    with jax.enable_x64(True):
        model = HourglassNet(num_stacks=1, num_blocks=1, num_classes=16,
                             dtype=jnp.float64, out_dtype=jnp.float64)
        xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
        tj = jnp.asarray(tgt.numpy().transpose(0, 2, 3, 1))
        twj = jnp.asarray(tw.numpy()[..., 0])
        params = jax.tree.map(jnp.asarray, variables['params'])
        bstats = jax.tree.map(jnp.asarray, variables['batch_stats'])

        def loss_fn(p):
            scores, _ = model.apply(
                {'params': p, 'batch_stats': bstats},
                xj, train=True, mutable=['batch_stats'])
            return heatmap_mse_loss(scores, tj, twj)

        jloss, jgrads = jax.jit(jax.value_and_grad(loss_fn))(params)
        np.testing.assert_allclose(float(jloss), float(tloss.item()),
                                   rtol=1e-11)
        assert_tree_close(jgrads, ref_grads, 'gradient', 1e-6, floor=1e-6)

        tx = make_optimizer(lr, schedule_epochs=[], gamma=0.1,
                            steps_per_epoch=1, flat=False)
        updates, _ = tx.update(jgrads, tx.init(params), params)
        # near-zero grads hit the eps-dominated regime (delta ~ lr*g/eps,
        # sensitivity lr/eps ~ 2.5e5), amplifying the ~1e-15 gradient
        # noise to ~1e-11 absolute in the delta — hence the higher floor
        # (1e-4 x the ~0.03 max-leaf delta ~ 1e-5 denominator)
        assert_tree_close(updates, ref_delta, 'one-step param delta',
                          1e-5, floor=1e-4)
