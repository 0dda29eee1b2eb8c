"""Tests for the offline tools (hands extraction, Kinect conversion,
bbox labeling) on fabricated inputs."""

import json
import os
import sys

import numpy as np
import cv2
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', 'tools'))

import extract_hands
import kinect2_to_coco
import generate_bbox


def test_extract_hands(tmp_path):
    lh = []
    rh = []
    for i in range(21):
        lh += [10.0 + i, 20.0 + i, 2]
        rh += [110.0 + i, 120.0 + i, 2]
    src = {
        'images': [{'id': 1, 'width': 640, 'height': 480,
                    'file_name': 'x.jpg'},
                   {'id': 2, 'width': 640, 'height': 480,
                    'file_name': 'y.jpg'}],
        'annotations': [
            {'id': 10, 'image_id': 1, 'bbox': [0, 0, 100, 100], 'area': 100,
             'lefthand_valid': True, 'righthand_valid': True,
             'lefthand_kpts': lh, 'righthand_kpts': rh},
            {'id': 11, 'image_id': 2, 'bbox': [0, 0, 100, 100], 'area': 100,
             'lefthand_valid': False, 'righthand_valid': True,
             'lefthand_kpts': lh, 'righthand_kpts': rh},
        ],
    }
    src_path = tmp_path / 'wb.json'
    out_path = tmp_path / 'hands.json'
    with open(src_path, 'w') as fp:
        json.dump(src, fp)
    out = extract_hands.extract(str(src_path), str(out_path))
    # reference semantics (extract_full_coco.py:21-22): EITHER-valid
    # keeps the annotation — the invalid hand's joints come out v=0
    assert len(out['annotations']) == 2
    ann = out['annotations'][0]
    assert len(ann['keypoints']) == 22 * 3
    # first kept left kpt is wrist (index 0)
    assert ann['keypoints'][0:2] == [10.0, 20.0]
    # the reference selection is irregular ([0,2,4,5,...], extract_
    # full_coco.py:71): the 4th kept joint must be hand index 5 (x=15),
    # not index 6 as a uniform every-other stride would give
    assert ann['keypoints'][3 * 3:3 * 3 + 2] == [15.0, 25.0]
    # the invalid-left annotation: 11 zeroed left joints, right kept
    ann2 = out['annotations'][1]
    assert ann2['keypoints'][:11 * 3] == [0] * (11 * 3)
    assert ann2['keypoints'][11 * 3:11 * 3 + 2] == [110.0, 120.0]
    # loads back through the hands dataset joint count
    from hourglass_pose_estimation_tpu.data.coco_json import load_coco_keypoints
    d = load_coco_keypoints(str(out_path), 22)
    assert d['joints'].shape == (2, 22, 2)


def test_kinect_convert(tmp_path):
    joints = [[0.0, 0.0, 0]] * 25
    for kin in kinect2_to_coco.KINECT_TO_COCO:
        joints[kin] = [100.0 + kin, 200.0 + kin, 2]
    rec = [{'frame': f'f{i:03d}.jpg',
            'bodies': [{'joints': joints}]} for i in range(20)]
    in_dir = tmp_path / 'rec'
    in_dir.mkdir()
    with open(in_dir / 'video0.json', 'w') as fp:
        json.dump(rec, fp)
    kinect2_to_coco.convert(str(in_dir), str(tmp_path / 'out'), test_frac=0.2)
    with open(tmp_path / 'out_train.json') as fp:
        train = json.load(fp)
    with open(tmp_path / 'out_test.json') as fp:
        test = json.load(fp)
    assert len(train['images']) + len(test['images']) == 20
    assert len(test['images']) == 4          # exactly round(20 * 0.2)
    # --test-frac 0 must put EVERYTHING in train (no forced test image)
    kinect2_to_coco.convert(str(in_dir), str(tmp_path / 'all'),
                            test_frac=0.0)
    with open(tmp_path / 'all_train.json') as fp:
        assert len(json.load(fp)['images']) == 20
    with open(tmp_path / 'all_test.json') as fp:
        assert len(json.load(fp)['images']) == 0
    ann = train['annotations'][0]
    assert len(ann['keypoints']) == 51
    assert ann['bbox'][2] > 0 and ann['bbox'][3] > 0
    # nose comes from Kinect Head (index 3)
    assert ann['keypoints'][0] == 103.0


def test_generate_bbox_label_and_check(tmp_path):
    img_dir = tmp_path / 'imgs'
    xml_dir = tmp_path / 'xmls'
    img_dir.mkdir()
    for name in ('a.jpg', 'b.jpg'):
        cv2.imwrite(str(img_dir / name),
                    np.zeros((120, 160, 3), np.uint8))
    generate_bbox.label(str(img_dir), str(xml_dir))
    xmls = sorted(os.listdir(xml_dir))
    assert xmls == ['a.xml', 'b.xml']
    # orphan check
    os.remove(img_dir / 'b.jpg')
    orphans = generate_bbox.check(str(img_dir), str(xml_dir), delete=True)
    assert len(orphans) == 1
    assert sorted(os.listdir(xml_dir)) == ['a.xml']


def test_generate_bbox_frozen_graph_detector(tmp_path):
    """The `frozen:<pb>` backend must load a TF1 frozen GraphDef with
    the reference detector's tensor surface (detector.py:6-57) and
    label through the same VOC pipeline. A tiny synthetic graph with
    the standard tensor names stands in for a real detection model."""
    tf = pytest.importorskip('tensorflow')

    g = tf.compat.v1.Graph()
    with g.as_default():
        tf.compat.v1.placeholder(tf.uint8, [1, None, None, 3],
                                 name='image_tensor')
        # two detections: a person (class 1) above threshold and a face
        # (class 2) the person filter must drop
        tf.identity(tf.constant([[[0.25, 0.25, 0.75, 0.75],
                                  [0.0, 0.0, 0.1, 0.1]]], tf.float32),
                    name='detection_boxes')
        tf.identity(tf.constant([[0.9, 0.9]], tf.float32),
                    name='detection_scores')
        tf.identity(tf.constant([[1.0, 2.0]], tf.float32),
                    name='detection_classes')
        tf.identity(tf.constant([2.0], tf.float32), name='num_detections')
    pb = tmp_path / 'frozen.pb'
    pb.write_bytes(g.as_graph_def().SerializeToString())

    img_dir = tmp_path / 'imgs'
    xml_dir = tmp_path / 'xmls'
    img_dir.mkdir()
    cv2.imwrite(str(img_dir / 'a.jpg'), np.zeros((100, 200, 3), np.uint8))
    generate_bbox.label(str(img_dir), str(xml_dir),
                        detector_spec=f'frozen:{pb}')
    import xml.etree.ElementTree as ET
    root = ET.parse(xml_dir / 'a.xml').getroot()
    objs = root.findall('object')
    assert len(objs) == 1                      # face (class 2) filtered
    bb = objs[0].find('bndbox')
    # normalized [ymin=.25, xmin=.25, ymax=.75, xmax=.75] on 200x100
    assert [int(bb.find(t).text) for t in
            ('xmin', 'ymin', 'xmax', 'ymax')] == [50, 25, 150, 75]


def test_inference_wrappers(rng):
    """utils.inference reference-shaped wrappers accept NCHW layout."""
    from hourglass_pose_estimation_tpu.utils.inference import (
        get_final_preds_v1, gaussian_blur)
    hm = rng.uniform(0, 1, size=(2, 16, 64, 64)).astype(np.float32)  # NCHW
    preds = get_final_preds_v1(hm, center=[128, 128], scale=1.28)
    assert preds.shape == (2, 16, 2)
    blurred = gaussian_blur(hm.copy())
    assert blurred.shape == hm.shape
    np.testing.assert_allclose(blurred.max(axis=(2, 3)), hm.max(axis=(2, 3)),
                               rtol=1e-4)


def test_collect_samples_tool(tmp_path):
    """download_sample.py parity (copy annotated images to a dest dir),
    with the hardcoded destination fixed to --dest."""
    import importlib.util as ilu
    import json
    spec = ilu.spec_from_file_location(
        'collect_samples',
        os.path.join(os.path.dirname(__file__), '..', 'tools',
                     'collect_samples.py'))
    mod = ilu.module_from_spec(spec)
    spec.loader.exec_module(mod)

    img_dir = tmp_path / 'imgs' / 'val2017'
    img_dir.mkdir(parents=True)
    for i in range(3):
        (img_dir / f'{i:012d}.jpg').write_bytes(b'\xff\xd8fake')
    anno = [{'img_paths': f'{i:012d}.jpg', 'isValidation': True}
            for i in range(3)] + [{'img_paths': 'missing.jpg',
                                   'isValidation': True}]
    ann_file = tmp_path / 'a.json'
    ann_file.write_text(json.dumps(anno))
    dest = tmp_path / 'out'

    args = type('Args', (), {'json': str(ann_file),
                             'image': str(tmp_path / 'imgs'),
                             'dest': str(dest), 'type': 'coco',
                             'limit': 1000})()
    assert mod.main(args) == 0
    assert sorted(os.listdir(dest)) == [f'{i:012d}.jpg' for i in range(3)]
