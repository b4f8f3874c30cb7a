#!/usr/bin/env python3
"""Split side-by-side stereo recordings into left/ and right/ directories.

Equivalent of the reference's `tools/cluonRecordingsToLocal/bin/split.py`
(consumed by `pose_estimation_tpu/io/cfsd.py`).

Usage: python tools/split_stereo.py RECORDING_DIR [--ext jpg]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("recording_dir")
    ap.add_argument("--ext", default="jpg")
    args = ap.parse_args(argv)

    import cv2

    root = Path(args.recording_dir)
    (root / "left").mkdir(exist_ok=True)
    (root / "right").mkdir(exist_ok=True)
    n = 0
    for p in sorted(root.glob(f"*.{args.ext}")):
        img = cv2.imread(str(p))
        if img is None:
            continue
        w = img.shape[1] // 2
        cv2.imwrite(str(root / "left" / p.name), img[:, :w])
        cv2.imwrite(str(root / "right" / p.name), img[:, w:])
        n += 1
    print(f"split {n} frames")
    return 0


if __name__ == "__main__":
    sys.exit(main())
