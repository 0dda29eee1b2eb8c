#!/usr/bin/env python
"""Convert Kinect-v2 skeleton recordings to COCO-format keypoints json.

TPU-framework analogue of `/root/reference/tools/kinect2_annotations/
convert.py:13-255`: maps the Kinect v2 25-joint skeleton onto COCO's 17
keypoints, synthesizes person bboxes from the joint extent, and emits
train/test splits.

Input format: a directory of per-video json files, each a list of
frames; a frame is {"frame": <image file>, "bodies": [{"joints":
[[x, y, state], ...25]}]} (state > 0 means tracked); "image" is
accepted as an alias for "frame".

Usage:
    python tools/kinect2_to_coco.py <in_dir> <out_prefix> [--test-frac 0.1]
"""

import argparse
import glob
import json
import os
import sys

# Kinect v2 joint indices -> COCO 17-kpt indices (None = unavailable;
# COCO eyes/ears have no Kinect counterpart and are left unlabeled).
# Kinect: 0 SpineBase 1 SpineMid 2 Neck 3 Head 4 ShoulderL 5 ElbowL
# 6 WristL 7 HandL 8 ShoulderR 9 ElbowR 10 WristR 11 HandR 12 HipL
# 13 KneeL 14 AnkleL 15 FootL 16 HipR 17 KneeR 18 AnkleR 19 FootR
# 20 SpineShoulder 21 HandTipL 22 ThumbL 23 HandTipR 24 ThumbR
KINECT_TO_COCO = {
    3: 0,    # Head -> nose (approximation the reference also makes)
    4: 5, 5: 7, 6: 9,      # left arm
    8: 6, 9: 8, 10: 10,    # right arm
    12: 11, 13: 13, 14: 15,   # left leg
    16: 12, 17: 14, 18: 16,   # right leg
}


def frame_to_annotation(body, ann_id, image_id, bbox_pad=0.15):
    joints = body['joints']
    kps = [0.0] * 51
    xs, ys = [], []
    for kin_idx, coco_idx in KINECT_TO_COCO.items():
        if kin_idx >= len(joints):
            continue
        x, y, state = joints[kin_idx][:3]
        if state <= 0:
            continue
        kps[coco_idx * 3:coco_idx * 3 + 3] = [float(x), float(y), 2]
        xs.append(x)
        ys.append(y)
    if len(xs) < 4:
        return None
    x0, x1 = min(xs), max(xs)
    y0, y1 = min(ys), max(ys)
    pw, ph = (x1 - x0) * bbox_pad, (y1 - y0) * bbox_pad
    bbox = [x0 - pw, y0 - ph, (x1 - x0) + 2 * pw, (y1 - y0) + 2 * ph]
    return {
        'id': ann_id,
        'image_id': image_id,
        'iscrowd': 0,
        'category_id': 1,
        'bbox': [float(v) for v in bbox],
        'area': float(bbox[2] * bbox[3]),
        'keypoints': kps,
    }


def convert(in_dir: str, out_prefix: str, test_frac: float = 0.1,
            width: int = 1920, height: int = 1080):
    images, annotations = [], []
    image_id = ann_id = 0
    for path in sorted(glob.glob(os.path.join(in_dir, '*.json'))):
        with open(path) as fp:
            frames = json.load(fp)
        for fr in frames:
            fname = fr.get('frame') or fr.get('image')
            if fname is None:
                # fail HERE with the offending file, not at training
                # time with a null file_name deep in the dataset loader
                raise ValueError(
                    f'{path}: frame record has neither a "frame" nor '
                    f'an "image" key (keys: {sorted(fr)})')
            bodies = fr.get('bodies') or []
            added = False
            for body in bodies:
                ann = frame_to_annotation(body, ann_id, image_id)
                if ann:
                    annotations.append(ann)
                    ann_id += 1
                    added = True
            if added:
                images.append({'id': image_id, 'file_name': fname,
                               'width': width, 'height': height})
                image_id += 1

    # deterministic split by image index (reference uses sklearn's
    # train_test_split; an evenly spaced index split avoids the
    # dependency). n_test honors the requested fraction exactly
    # (rounded), including --test-frac 0 -> everything in train.
    n_test = int(round(len(images) * test_frac)) if images else 0
    n_test = min(n_test, len(images))
    if n_test:
        picks = {int(round(i * len(images) / n_test))
                 for i in range(n_test)}
        test_ids = {im['id'] for i, im in enumerate(images) if i in picks}
    else:
        test_ids = set()

    def subset(ids):
        return {
            'images': [im for im in images if (im['id'] in ids)],
            'annotations': [a for a in annotations if (a['image_id'] in ids)],
            'categories': [{'id': 1, 'name': 'person'}],
        }

    train_ids = {im['id'] for im in images} - test_ids
    for name, ids in (('train', train_ids), ('test', test_ids)):
        out = subset(ids)
        out_path = f'{out_prefix}_{name}.json'
        with open(out_path, 'w') as fp:
            json.dump(out, fp)
        print(f"wrote {out_path}: {len(out['images'])} images, "
              f"{len(out['annotations'])} annotations")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('in_dir')
    p.add_argument('out_prefix')
    p.add_argument('--test-frac', type=float, default=0.1)
    p.add_argument('--width', type=int, default=1920)
    p.add_argument('--height', type=int, default=1080)
    args = p.parse_args(argv)
    convert(args.in_dir, args.out_prefix, args.test_frac, args.width,
            args.height)
    return 0


if __name__ == '__main__':
    sys.exit(main())
