"""Config system tests: reference YAML compatibility, overrides,
validation, run naming."""

import warnings

import pytest

from hourglass_pose_estimation_tpu.config import load_config, Config


def test_defaults():
    cfg = load_config()
    assert cfg.dataset.name == 'synthetic'
    assert cfg.model.arch == 'hg'
    assert cfg.train.learning_rate == 2.5e-3


def test_reference_yaml_schema(tmp_path):
    """A config in the reference's exact schema loads unchanged."""
    y = tmp_path / 'ref.yaml'
    y.write_text("""
DATASET:
  name: 'mscoco'
  image_path: '/data/images'
  annotation_path: '/data/annotations/'
  inp_res: 256
  out_res: 64
  flip: True
  sigma: 1
  scale_factor: 0.25
  rot_factor: 30
  label_type: 'Gaussian'
MODEL:
  arch: 'hg'
  num_stacks: 2
  mobile: True
  skip_mode: 'sum'
  subset: null
COMMON:
  checkpoint_dir: '/ckpt'
  snapshot: 10
  resume: ''
  evaluate_only: True
  pck: 0.5
  gpu: '3,4,5'
TRAIN:
  num_workers: 8
  epochs: 50
  start_epoch: 0
  train_batch: 96
  val_batch: 64
  learning_rate: 0.0025
  schedule: [35, 45]
  gamma: 0.1
""")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter('always')
        cfg = load_config(str(y))
    # dead reference keys warn but don't fail (gpu)
    assert any('gpu' in str(x.message) for x in w)
    assert cfg.dataset.name == 'mscoco'
    assert cfg.model.mobile is True
    assert cfg.train.schedule == [35, 45]
    assert cfg.common.evaluate_only is True


def test_overrides():
    cfg = load_config(overrides=['TRAIN.train_batch=128',
                                 'MODEL.subset=[0,1,2]',
                                 'DATASET.name=mpii'])
    assert cfg.train.train_batch == 128
    assert cfg.model.subset == [0, 1, 2]
    assert cfg.dataset.name == 'mpii'


def test_override_on_empty_yaml_section(tmp_path):
    """A YAML file with an empty section ('TRAIN:' parses to None) must
    still accept SECTION.key=value overrides for that section."""
    y = tmp_path / 'empty_section.yaml'
    y.write_text('TRAIN:\nMODEL:\n  num_stacks: 2\n')
    cfg = load_config(str(y), overrides=['TRAIN.train_batch=32'])
    assert cfg.train.train_batch == 32
    assert cfg.model.num_stacks == 2


def test_validation_errors():
    with pytest.raises(ValueError):
        load_config(raw={'MODEL': {'skip_mode': 'nope'}})
    with pytest.raises(ValueError):
        load_config(raw={'DATASET': {'label_type': 'Cauchy'}})
    with pytest.raises(ValueError):
        load_config(raw={'TRAIN': {'precision': 'fp8'}})
    with pytest.raises(ValueError):
        load_config(overrides=['nonsense'])


def test_run_name_parity():
    cfg = load_config(raw={'DATASET': {'name': 'mscoco'},
                           'MODEL': {'num_stacks': 2, 'mobile': True}})
    assert cfg.run_name() == 'mscoco_hg_s2_mobile_all'
    cfg = load_config(raw={'MODEL': {'subset': [1, 2]}})
    assert cfg.run_name() == 'synthetic_hg_s2_non-mobile_[1, 2]'


def test_select_data_filter():
    from hourglass_pose_estimation_tpu.data import Synthetic
    ds = Synthetic(True, num_samples=16, inp_res=64, out_res=16, sigma=1,
                   scale_factor=0.25, rot_factor=30)
    keep = ds.select_data()
    assert 0 < len(keep) <= 16
    before = len(ds)
    ds.apply_selection(keep)
    assert len(ds) == len(keep) <= before


def test_compute_meanstd():
    from hourglass_pose_estimation_tpu.data import Synthetic
    ds = Synthetic(True, num_samples=8, inp_res=64, out_res=16, sigma=1,
                   scale_factor=0.25, rot_factor=30)
    mean, std = ds.compute_meanstd()
    assert len(mean) == 3 and len(std) == 3
    assert all(0.0 < m < 1.0 for m in mean)
    assert all(0.0 < s < 0.6 for s in std)
