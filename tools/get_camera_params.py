"""Stereo calibration -> OpenCV-YAML camera parameters.

Python replacement for the reference's MATLAB pipeline
(`/root/reference/tools/getCameraParams/{generateCameraParams,matlab2opencv}.m`
+ the vendored `tools/opencv-samples/stereo_calib.cpp` driver): calibrates a
stereo rig from chessboard image pairs with cv2 and writes the exact YAML
key set the config loader consumes (`camLeft/camRight`, `distLeft/distRight`,
`rotationLeftToRight`, `translationLeftToRight` — `config/cfsd.yml:30-66`).

Usage:
  python tools/get_camera_params.py --left "imgs/*_left.jpg" \
      --right "imgs/*_right.jpg" --board 9x6 --square 0.04 -o parameters.yml
"""

from __future__ import annotations

import argparse
import glob
import sys

import numpy as np


def yaml_matrix(name: str, mat: np.ndarray) -> str:
    """One `!!opencv-matrix` block, matlab2opencv-format
    (`matlab2opencv.m:27-40`)."""
    mat = np.asarray(mat, np.float64)
    rows, cols = (mat.shape + (1,))[:2] if mat.ndim >= 1 else (1, 1)
    if mat.ndim == 1:
        rows, cols = mat.shape[0], 1
    data = ", ".join(f"{v:.9f}" for v in mat.reshape(-1))
    return (
        f"{name}: !!opencv-matrix\n    rows: {rows}\n    cols: {cols}\n"
        f"    dt: d\n    data: [ {data} ]\n"
    )


def find_corners(paths: list[str], board: tuple[int, int]):
    import cv2

    pts, used, size = [], [], None
    for p in paths:
        img = cv2.imread(p, cv2.IMREAD_GRAYSCALE)
        if img is None:
            continue
        size = (img.shape[1], img.shape[0])
        ok, corners = cv2.findChessboardCorners(
            img, board,
            flags=cv2.CALIB_CB_ADAPTIVE_THRESH | cv2.CALIB_CB_NORMALIZE_IMAGE,
        )
        if not ok:
            used.append(False)
            pts.append(None)
            continue
        corners = cv2.cornerSubPix(
            img, corners, (11, 11), (-1, -1),
            (cv2.TERM_CRITERIA_EPS + cv2.TERM_CRITERIA_COUNT, 30, 1e-3),
        )
        used.append(True)
        pts.append(corners)
    return pts, used, size


def calibrate(left_glob: str, right_glob: str, board: tuple[int, int],
              square: float, out_path: str, verbose: bool = True) -> dict:
    import cv2

    lefts = sorted(glob.glob(left_glob))
    rights = sorted(glob.glob(right_glob))
    if len(lefts) != len(rights) or not lefts:
        raise SystemExit(
            f"pair mismatch: {len(lefts)} left vs {len(rights)} right images"
        )
    lp, lu, size = find_corners(lefts, board)
    rp, ru, _ = find_corners(rights, board)
    keep = [i for i in range(len(lefts)) if lu[i] and ru[i]]
    if len(keep) < 3:
        raise SystemExit(f"only {len(keep)} usable pairs; need >= 3")
    if verbose:
        print(f"{len(keep)}/{len(lefts)} pairs with detected corners")

    objp = np.zeros((board[0] * board[1], 3), np.float32)
    objp[:, :2] = np.mgrid[0 : board[0], 0 : board[1]].T.reshape(-1, 2) * square
    obj = [objp] * len(keep)
    imgl = [lp[i] for i in keep]
    imgr = [rp[i] for i in keep]

    _, k1, d1, _, _ = cv2.calibrateCamera(obj, imgl, size, None, None)
    _, k2, d2, _, _ = cv2.calibrateCamera(obj, imgr, size, None, None)
    rms, k1, d1, k2, d2, r, t, _, _ = cv2.stereoCalibrate(
        obj, imgl, imgr, k1, d1, k2, d2, size,
        flags=cv2.CALIB_FIX_INTRINSIC,
        criteria=(cv2.TERM_CRITERIA_EPS + cv2.TERM_CRITERIA_COUNT, 100, 1e-6),
    )
    if verbose:
        print(f"stereo RMS reprojection error: {rms:.4f} px")

    with open(out_path, "w") as f:
        f.write("%YAML:1.0\n")
        f.write(yaml_matrix("camLeft", k1))
        f.write(yaml_matrix("distLeft", d1.reshape(-1)))
        f.write(yaml_matrix("camRight", k2))
        f.write(yaml_matrix("distRight", d2.reshape(-1)))
        f.write(yaml_matrix("rotationLeftToRight", r))
        f.write(yaml_matrix("translationLeftToRight", t.reshape(-1)))
    if verbose:
        print(f"wrote {out_path}")
    return {"rms": rms, "K1": k1, "D1": d1, "K2": k2, "D2": d2, "R": r, "T": t,
            "pairs": len(keep)}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--left", required=True, help="glob for left images")
    ap.add_argument("--right", required=True, help="glob for right images")
    ap.add_argument("--board", default="9x6", help="inner corners, e.g. 9x6")
    ap.add_argument("--square", type=float, default=0.04, help="square size [m]")
    ap.add_argument("-o", "--out", default="parameters.yml")
    args = ap.parse_args(argv)
    bw, bh = (int(v) for v in args.board.lower().split("x"))
    calibrate(args.left, args.right, (bw, bh), args.square, args.out)


if __name__ == "__main__":
    sys.exit(main())
