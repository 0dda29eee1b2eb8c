#!/usr/bin/env python
"""Collect the images referenced by an annotation JSON into a folder.

Parity surface: `/root/reference/tools/openvino_visualizer/
download_sample.py:7-30` — walk the first N annotation entries and copy
each referenced image to a destination tree (the reference hardcodes
its author's destination path; here it is `--dest`). Supports both
formats the reference handles:

  * `--type coco`: entries carry `img_paths` + `isValidation` routing
    between train2017/val2017 subdirs (the reference's custom
    collection format), or a standard COCO annotation file
    (images[].file_name);
  * `--type mpii`: entries carry `img_paths` (or `image`, the MPII
    train/valid.json key).

Usage:
    python tools/collect_samples.py --json <anno.json> --image <img_root>
        --dest <out_dir> [--type coco|mpii] [--limit 1000]
"""

import argparse
import json
import os
import shutil
import sys


def iter_names(collections, json_path=''):
    if isinstance(collections, dict) and 'images' in collections:
        # standard COCO annotation file: the split comes from the
        # annotation FILENAME (instances_train2017.json vs ..._val...),
        # not from the dataset kind — a train file routed to val2017/
        # would miss every image
        is_val = 'val' in os.path.basename(json_path)
        for im in collections['images']:
            yield im.get('file_name', ''), is_val
        return
    for coll in collections:
        name = coll.get('img_paths') or coll.get('image') or ''
        yield name, bool(coll.get('isValidation', False))


def main(args):
    with open(args.json) as f:
        collections = json.load(f)
    if isinstance(collections, list):
        collections = collections[:args.limit]
    os.makedirs(args.dest, exist_ok=True)
    n, missing = 0, 0
    seen = set()
    for name, is_val in iter_names(collections, args.json):
        if not name or name in seen:
            continue
        seen.add(name)
        if len(seen) > args.limit:
            break
        if args.type == 'coco':
            sub = 'val2017' if is_val else 'train2017'
            src = os.path.join(args.image, sub, name)
            if not os.path.isfile(src):       # flat layouts
                src = os.path.join(args.image, name)
        else:
            src = os.path.join(args.image, name)
        if not os.path.isfile(src):
            missing += 1
            continue
        shutil.copyfile(src, os.path.join(args.dest, os.path.basename(name)))
        n += 1
    print(f'copied {n} images to {args.dest} ({missing} missing)')
    return 0


if __name__ == '__main__':
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument('--json', type=str, required=True)
    parser.add_argument('--image', type=str, required=True)
    parser.add_argument('--dest', type=str, required=True)
    parser.add_argument('--type', type=str, default='coco',
                        choices=['coco', 'mpii'])
    parser.add_argument('--limit', type=int, default=1000)
    sys.exit(main(parser.parse_args()))
