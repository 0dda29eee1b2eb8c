#!/usr/bin/env python
"""Single-image pose estimation from a YAML config.

Usage (parity: /root/reference/scripts/estimate.py:17-23):
    python scripts/estimate.py <config.yaml> [SECTION.key=value ...]

Reads COMMON.image_path, runs the Estimator, draws keypoint circles,
writes COMMON.dest_path.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

from hourglass_pose_estimation_tpu.config import load_config  # noqa: E402


def main(argv):
    if len(argv) < 2:
        print(__doc__)
        return 2
    cfg = load_config(argv[1], overrides=argv[2:])

    import cv2
    from hourglass_pose_estimation_tpu.runner import Estimator

    estimator = Estimator(cfg)
    frame = cv2.imread(cfg.common.image_path)
    if frame is None:
        raise FileNotFoundError(cfg.common.image_path)
    if cfg.common.skeleton:
        # NMS peak decode + skeleton lines (COMMON.skeleton=True), the
        # reference's openvino_visualizer rendering path
        from hourglass_pose_estimation_tpu.utils.visualize import draw_skeleton
        kps, (hm_h, hm_w) = estimator.run_skeleton(
            frame, device_preprocess=cfg.common.device_preprocess)
        draw_skeleton(frame, kps,
                      scale_x=frame.shape[1] / (hm_w * 4.0),
                      scale_y=frame.shape[0] / (hm_h * 4.0))
    else:
        kps = estimator.run(
            frame, device_preprocess=cfg.common.device_preprocess)
        for x, y in kps:
            cv2.circle(frame, center=(int(x), int(y)), color=(0, 0, 255),
                       radius=5, thickness=-1)
    cv2.imwrite(cfg.common.dest_path, frame)
    print(f'wrote {cfg.common.dest_path}')
    return 0


if __name__ == '__main__':
    raise SystemExit(main(sys.argv))
