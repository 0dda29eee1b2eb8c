"""Dataset loader tests against fabricated annotation files (no real
MPII/COCO trees exist in this environment)."""

import json
import os

import numpy as np
import cv2
import pytest

from hourglass_pose_estimation_tpu.data import get_dataset, Loader
from hourglass_pose_estimation_tpu.data.coco_json import (
    load_coco_keypoints, xywh_to_center_scale)


def _write_img(path, w, h):
    img = np.random.RandomState(0).randint(0, 255, (h, w, 3), np.uint8)
    cv2.imwrite(path, img)


@pytest.fixture
def mpii_tree(tmp_path):
    img_dir = tmp_path / 'images'
    ann_dir = tmp_path / 'annot'
    img_dir.mkdir()
    ann_dir.mkdir()
    anno = []
    for i, name in enumerate(['a.jpg', 'b.jpg']):
        _write_img(str(img_dir / name), 320, 240)
        anno.append({
            'image': name,
            'center': [160.0, 120.0],
            'scale': 1.0,
            'joints': [[float(10 + j * 3), float(20 + j * 2)] for j in range(16)],
            'joints_vis': [1] * 14 + [0, 0],
        })
    for split in ('train', 'valid'):
        with open(ann_dir / f'{split}.json', 'w') as fp:
            json.dump(anno, fp)
    return str(img_dir), str(ann_dir)


def test_mpii_loader(mpii_tree):
    img_dir, ann_dir = mpii_tree
    ds = get_dataset('mpii', True, image_path=img_dir, annotation_path=ann_dir,
                     inp_res=64, out_res=16, sigma=1, scale_factor=0.25,
                     rot_factor=30)
    assert len(ds) == 2
    r = ds.records
    # center/scale adjust: c1 += 15*s, s *= 1.25, then -1 (0-based)
    np.testing.assert_allclose(r.centers[0], [159.0, 120.0 + 15.0 - 1.0])
    np.testing.assert_allclose(r.scales[0], [1.25, 1.25])
    # joints moved to 0-based
    np.testing.assert_allclose(r.joints[0][0], [9.0, 19.0])
    assert r.vis[0].sum() == 14

    batch = ds.canvas_batch([0, 1], canvas=64)
    assert batch['canvas'].shape == (2, 64, 64, 3)
    assert batch['width'][0] == 320.0

    sample = ds.host_sample(0, np.random.RandomState(0))
    assert sample['image'].shape == (64, 64, 3)


@pytest.fixture
def coco_tree(tmp_path):
    img_dir = tmp_path / 'images' / 'train2017'
    ann_dir = tmp_path / 'annotations'
    img_dir.mkdir(parents=True)
    ann_dir.mkdir()
    for iid in (7, 8):
        _write_img(str(img_dir / ('%012d.jpg' % iid)), 400, 300)
    kps_ok = []
    for j in range(17):
        kps_ok += [50.0 + j, 60.0 + j, 2 if j < 10 else 0]
    coco = {
        'images': [{'id': 7, 'width': 400, 'height': 300,
                    'file_name': '%012d.jpg' % 7},
                   {'id': 8, 'width': 400, 'height': 300,
                    'file_name': '%012d.jpg' % 8}],
        'annotations': [
            {'id': 1, 'image_id': 7, 'iscrowd': 0, 'area': 5000,
             'bbox': [40, 50, 100, 120], 'keypoints': kps_ok},
            # all-zero keypoints -> skipped
            {'id': 2, 'image_id': 7, 'iscrowd': 0, 'area': 5000,
             'bbox': [0, 0, 50, 50], 'keypoints': [0] * 51},
            # crowd -> skipped
            {'id': 3, 'image_id': 8, 'iscrowd': 1, 'area': 5000,
             'bbox': [0, 0, 50, 50], 'keypoints': kps_ok},
            # zero area -> skipped
            {'id': 4, 'image_id': 8, 'iscrowd': 0, 'area': 0,
             'bbox': [10, 10, 0, 0], 'keypoints': kps_ok},
        ],
    }
    with open(ann_dir / 'person_keypoints_train2017.json', 'w') as fp:
        json.dump(coco, fp)
    with open(ann_dir / 'person_keypoints_val2017.json', 'w') as fp:
        json.dump(coco, fp)
    return str(tmp_path / 'images'), str(ann_dir)


def test_coco_loader(coco_tree):
    img_dir, ann_dir = coco_tree
    ds = get_dataset('mscoco', True, image_path=img_dir,
                     annotation_path=ann_dir, inp_res=64, out_res=16,
                     sigma=1, scale_factor=0.25, rot_factor=30)
    assert len(ds) == 1  # 3 of 4 annotations filtered
    r = ds.records
    # visibility clamped to {0,1}
    assert r.vis[0].max() == 1.0 and r.vis[0].sum() == 10
    # center = bbox center; scale follows xywh2cs
    c, s = xywh_to_center_scale(40, 50, 100 - 1, 120 - 1)
    np.testing.assert_allclose(r.centers[0], c, atol=0.6)
    batch = ds.canvas_batch([0], canvas=64)
    assert batch['canvas'].shape == (1, 64, 64, 3)


def test_trainer_eval_only_without_train_split(coco_tree):
    """Trainer(eval_only=True) must not load the TRAIN annotations —
    an eval-only machine has only the checkpoint and the val split."""
    img_dir, ann_dir = coco_tree
    os.remove(os.path.join(ann_dir, 'person_keypoints_train2017.json'))
    from hourglass_pose_estimation_tpu.config import load_config
    from hourglass_pose_estimation_tpu.runner import Trainer
    cfg = load_config(raw={
        'DATASET': {'name': 'mscoco', 'image_path': img_dir,
                    'annotation_path': ann_dir, 'inp_res': 64,
                    'out_res': 16, 'sigma': 1, 'scale_factor': 0.25,
                    'rot_factor': 30},
        'MODEL': {'arch': 'hg', 'num_stacks': 1},
        'TRAIN': {'train_batch': 1, 'val_batch': 1, 'precision': 'f32'},
    })
    trainer = Trainer(cfg, verbose=False, eval_only=True)
    assert trainer.state is not None            # state shell for restore
    with pytest.raises(RuntimeError, match='eval_only'):
        trainer.train()
    # without the flag, the missing train split must still surface
    with pytest.raises(Exception):
        Trainer(cfg, verbose=False)


def test_xywh_to_center_scale_aspect():
    # wide box: height grows to match aspect 1.0
    c, s = xywh_to_center_scale(0, 0, 200, 100)
    np.testing.assert_allclose(c, [100, 50])
    np.testing.assert_allclose(s, [200 / 200 * 1.25, 200 / 200 * 1.25])


def test_loader_padding():
    from hourglass_pose_estimation_tpu.data import Synthetic
    ds = Synthetic(False, num_samples=10, inp_res=64, out_res=16, sigma=1,
                   scale_factor=0.25, rot_factor=30)
    loader = Loader(ds, 4, shuffle=False, drop_last=False)
    batches = loader.epoch_indices()
    assert len(batches) == 3
    idx, valid = batches[-1]
    assert len(idx) == 4
    np.testing.assert_allclose(valid, [1, 1, 0, 0])

    train_loader = Loader(ds, 4, shuffle=True, drop_last=True)
    assert len(train_loader) == 2


def test_crowdpose_and_hands_registered():
    from hourglass_pose_estimation_tpu.data import REGISTRY
    assert REGISTRY['crowdpose'].n_joints == 14
    assert REGISTRY['hands'].n_joints == 22
    assert len(REGISTRY['hands']('hands_probe', True).__class__.flip_pairs
               if False else REGISTRY['hands'].flip_pairs) == 11


def test_prefetcher_close_unblocks_producer():
    """Abandoning iteration early + close() must stop the producer
    thread (it otherwise blocks forever on the bounded queue holding
    staged batches — the round-5-fixed leak)."""
    import time
    from hourglass_pose_estimation_tpu.data.prefetch import Prefetcher

    produced = []
    pf = Prefetcher(range(50), lambda i: produced.append(i) or i, depth=2)
    it = iter(pf)
    next(it)                      # consume one, then abandon
    pf.close()
    assert not pf._thread.is_alive()
    n_after_close = len(produced)
    time.sleep(0.3)
    assert len(produced) == n_after_close   # production stopped
    assert n_after_close < 50

    # normal completion: close() afterwards is a harmless no-op
    pf2 = Prefetcher(range(5), lambda i: i)
    got = [item for _, item in pf2]
    assert got == list(range(5))
    pf2.close()


def test_prefetcher_sentinel_delivered_when_queue_full():
    """Producer finishing while the bounded queue is FULL must still
    deliver the end-of-items sentinel (a dropped sentinel deadlocks the
    consumer on q.get — regression for the round-5 close() rework)."""
    import time
    from hourglass_pose_estimation_tpu.data.prefetch import Prefetcher

    pf = Prefetcher(range(4), lambda i: i, depth=2)
    time.sleep(0.5)               # let the producer fill up and finish
    got = [item for _, item in pf]
    assert got == [0, 1, 2, 3]
    pf.close()
