#!/usr/bin/env python
"""Extract a 22-keypoint two-hand dataset from COCO-WholeBody json.

TPU-framework analogue of `/root/reference/tools/extract_full_coco.py:
5-63`: filters annotations with valid left+right hand keypoints and
keeps 11 keypoints per hand (wrist + 2 per finger), producing a
COCO-format keypoints json consumable by the `hands` dataset class.

Usage:
    python tools/extract_hands.py <wholebody.json> <out.json> [--min-vis 6]
"""

import argparse
import json
import sys

# 21-kpt hand: the reference's exact 11-joint selection
# (`/root/reference/tools/extract_full_coco.py:71` selected_ids):
# wrist, thumb MCP+tip, then MCP+tip of index/middle/ring/pinky —
# NOT a uniform every-other-joint stride.
HAND_KEEP = [0, 2, 4, 5, 8, 9, 12, 13, 16, 17, 20]


def extract(wholebody_path: str, out_path: str, min_vis: int = 6) -> dict:
    with open(wholebody_path) as fp:
        src = json.load(fp)

    out_annotations = []
    kept_images = set()
    for ann in src.get('annotations', []):
        lh = ann.get('lefthand_kpts') or []
        rh = ann.get('righthand_kpts') or []
        # reference semantics (extract_full_coco.py:21-22): keep when
        # EITHER hand is valid; the invalid/missing hand's joints are
        # emitted as v=0 zeros (unsupervised), not used to reject the
        # whole annotation
        lh_ok = bool(ann.get('lefthand_valid')) and len(lh) >= 63
        rh_ok = bool(ann.get('righthand_valid')) and len(rh) >= 63
        if not (lh_ok or rh_ok):
            continue
        kps = []
        n_vis = 0
        for hand, ok in ((lh, lh_ok), (rh, rh_ok)):
            for i in HAND_KEEP:
                if ok:
                    x, y, v = hand[i * 3:i * 3 + 3]
                    v = 1 if v > 0 else 0
                else:
                    x = y = v = 0
                n_vis += v
                kps += [x, y, v]
        if n_vis < min_vis:
            continue
        out_annotations.append({
            'id': ann['id'],
            'image_id': ann['image_id'],
            'iscrowd': 0,
            'area': ann.get('area', 1),
            'bbox': ann['bbox'],
            'keypoints': kps,
            'category_id': 1,
        })
        kept_images.add(ann['image_id'])

    out = {
        'images': [im for im in src.get('images', [])
                   if im['id'] in kept_images],
        'annotations': out_annotations,
        'categories': [{'id': 1, 'name': 'hands',
                        'keypoints': [f'l{i}' for i in range(11)]
                        + [f'r{i}' for i in range(11)]}],
    }
    with open(out_path, 'w') as fp:
        json.dump(out, fp)
    return out


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('wholebody_json')
    p.add_argument('out_json')
    p.add_argument('--min-vis', type=int, default=6)
    args = p.parse_args(argv)
    out = extract(args.wholebody_json, args.out_json, args.min_vis)
    print(f"wrote {args.out_json}: {len(out['annotations'])} annotations, "
          f"{len(out['images'])} images")
    return 0


if __name__ == '__main__':
    sys.exit(main())
