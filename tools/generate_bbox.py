#!/usr/bin/env python
"""Batch person-bbox labeling for images (PascalVOC-style XML output).

TPU-framework analogue of `/root/reference/tools/bbox/{detector,
generate_bbox,check_xml}.py`, which drove a TF1 frozen-graph person
detector. The detector here is pluggable:

  * `--detector full` (default): one full-image box per image — the
    top-down trainer only needs a person crop, and for single-person
    footage the full frame is the correct prior;
  * `--detector tf:<saved_model_dir>`: any TF2 SavedModel object
    detector with the standard detection signature (boxes/classes/
    scores), person class id 1;
  * `--detector frozen:<graph.pb>`: a TF1 frozen inference graph with
    the reference detector's tensor surface (`image_tensor:0` ->
    `detection_{boxes,scores,classes}:0`, `/root/reference/tools/bbox/
    detector.py:6-57`), executed through TF2's wrap_function — no TF1
    session;
  * `check` subcommand: verify XML/image consistency and remove
    orphaned XMLs (parity with check_xml.py).

Usage:
    python tools/generate_bbox.py label <img_dir> <xml_dir> [--detector full]
    python tools/generate_bbox.py check <img_dir> <xml_dir> [--delete]
"""

import argparse
import glob
import os
import sys
import xml.etree.ElementTree as ET

import numpy as np


def _write_voc_xml(xml_path, img_path, w, h, boxes):
    root = ET.Element('annotation')
    ET.SubElement(root, 'filename').text = os.path.basename(img_path)
    ET.SubElement(root, 'path').text = img_path
    size = ET.SubElement(root, 'size')
    ET.SubElement(size, 'width').text = str(w)
    ET.SubElement(size, 'height').text = str(h)
    ET.SubElement(size, 'depth').text = '3'
    for (x0, y0, x1, y1) in boxes:
        obj = ET.SubElement(root, 'object')
        ET.SubElement(obj, 'name').text = 'person'
        bb = ET.SubElement(obj, 'bndbox')
        ET.SubElement(bb, 'xmin').text = str(int(x0))
        ET.SubElement(bb, 'ymin').text = str(int(y0))
        ET.SubElement(bb, 'xmax').text = str(int(x1))
        ET.SubElement(bb, 'ymax').text = str(int(y1))
    ET.ElementTree(root).write(xml_path)


class FullImageDetector:
    def __call__(self, img):
        h, w = img.shape[:2]
        return [(0, 0, w - 1, h - 1)]


class TFSavedModelDetector:
    def __init__(self, path, score_thr=0.5, person_class=1):
        import tensorflow as tf
        self.model = tf.saved_model.load(path)
        self.thr = score_thr
        self.person = person_class

    def __call__(self, img):
        import tensorflow as tf
        h, w = img.shape[:2]
        # cv2 frames are BGR; TF detection-zoo SavedModels are trained
        # on RGB (same flip the frozen-graph path applies below)
        inp = tf.convert_to_tensor(img[..., ::-1][None])
        out = self.model(inp)
        boxes = out['detection_boxes'][0].numpy()
        classes = out['detection_classes'][0].numpy().astype(int)
        scores = out['detection_scores'][0].numpy()
        keep = (classes == self.person) & (scores >= self.thr)
        result = []
        for y0, x0, y1, x1 in boxes[keep]:
            result.append((x0 * w, y0 * h, x1 * w, y1 * h))
        return result


class FrozenGraphDetector:
    """TF1 frozen-graph object detector (the reference's Detector,
    `/root/reference/tools/bbox/detector.py:6-61`), run without the TF1
    session API: the GraphDef is imported into a concrete function via
    `tf.compat.v1.wrap_function` and pruned to the standard detection
    tensor surface. Keeps the reference's conventions: BGR input
    flipped to RGB, normalized [ymin, xmin, ymax, xmax] boxes, person
    class id 1 (class 2 = face, exposed via `classes_of_interest`).
    """

    TENSORS = ('detection_boxes:0', 'detection_scores:0',
               'detection_classes:0')

    def __init__(self, path, score_thr=0.5, classes_of_interest=(1,)):
        import tensorflow as tf
        graph_def = tf.compat.v1.GraphDef()
        with open(path, 'rb') as f:
            graph_def.ParseFromString(f.read())

        def _import():
            tf.compat.v1.import_graph_def(graph_def, name='')
        wrapped = tf.compat.v1.wrap_function(_import, [])
        self._fn = wrapped.prune(
            wrapped.graph.as_graph_element('image_tensor:0'),
            [wrapped.graph.as_graph_element(t) for t in self.TENSORS])
        self.thr = score_thr
        self.classes = tuple(classes_of_interest)

    def __call__(self, img):
        import tensorflow as tf
        h, w = img.shape[:2]
        # reference feeds RGB (detector.py:33 reverses the cv2 BGR)
        inp = tf.convert_to_tensor(img[None, :, :, ::-1])
        boxes, scores, classes = (t.numpy() for t in self._fn(inp))
        keep = (np.isin(classes[0].astype(int), self.classes)
                & (scores[0] > self.thr))
        return [(x0 * w, y0 * h, x1 * w, y1 * h)
                for y0, x0, y1, x1 in boxes[0][keep]]


def make_detector(spec: str):
    if spec == 'full':
        return FullImageDetector()
    if spec.startswith('tf:'):
        return TFSavedModelDetector(spec[3:])
    if spec.startswith('frozen:'):
        return FrozenGraphDetector(spec[len('frozen:'):])
    raise ValueError(f'unknown detector {spec!r}')


def label(img_dir, xml_dir, detector_spec='full'):
    import cv2
    det = make_detector(detector_spec)
    os.makedirs(xml_dir, exist_ok=True)
    n = 0
    for path in sorted(glob.glob(os.path.join(img_dir, '*'))):
        img = cv2.imread(path)
        if img is None:
            continue
        boxes = det(img)
        if not boxes:
            continue
        xml_path = os.path.join(
            xml_dir, os.path.splitext(os.path.basename(path))[0] + '.xml')
        _write_voc_xml(xml_path, path, img.shape[1], img.shape[0], boxes)
        n += 1
    print(f'labeled {n} images -> {xml_dir}')


def check(img_dir, xml_dir, delete=False):
    imgs = {os.path.splitext(os.path.basename(p))[0]
            for p in glob.glob(os.path.join(img_dir, '*'))
            if not p.endswith('.xml')}
    orphans = []
    for xml_path in glob.glob(os.path.join(xml_dir, '*.xml')):
        stem = os.path.splitext(os.path.basename(xml_path))[0]
        if stem not in imgs:
            orphans.append(xml_path)
            if delete:
                os.remove(xml_path)
    print(f'{len(orphans)} orphaned XMLs' + (' (deleted)' if delete else ''))
    return orphans


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest='cmd', required=True)
    pl = sub.add_parser('label')
    pl.add_argument('img_dir')
    pl.add_argument('xml_dir')
    pl.add_argument('--detector', default='full')
    pc = sub.add_parser('check')
    pc.add_argument('img_dir')
    pc.add_argument('xml_dir')
    pc.add_argument('--delete', action='store_true')
    args = p.parse_args(argv)
    if args.cmd == 'label':
        label(args.img_dir, args.xml_dir, args.detector)
    else:
        check(args.img_dir, args.xml_dir, args.delete)
    return 0


if __name__ == '__main__':
    sys.exit(main())
