"""Stereo-calibration tool on the reference's shipped chessboard imageset
(`tools/opencv-samples/cfsd-imageset`, 9x6 inner corners, 25 mm squares per
`tools/opencv-samples/calib.sh`) — replaces the MATLAB getCameraParams flow.
"""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from get_camera_params import calibrate, yaml_matrix

IMGSET = "/root/reference/tools/opencv-samples/cfsd-imageset"


class TestCalibration:
    def test_calibrates_reference_imageset_and_loads_back(self, tmp_path):
        out = str(tmp_path / "parameters.yml")
        res = calibrate(
            f"{IMGSET}/*_left.jpg", f"{IMGSET}/*_right.jpg",
            board=(9, 6), square=0.025, out_path=out, verbose=False,
        )
        assert res["pairs"] >= 3
        # physically sane: sub-2px RMS, ~10cm-class baseline, fx of a
        # VGA-ish lens
        assert res["rms"] < 2.0
        baseline = np.linalg.norm(res["T"])
        assert 0.01 < baseline < 1.0
        assert 100 < res["K1"][0, 0] < 5000

        # the YAML must round-trip through OUR config parser (strict keys)
        from pose_estimation_tpu.utils.config import _parse_opencv_yaml as parse_opencv_yaml

        d = parse_opencv_yaml(out)
        np.testing.assert_allclose(d["camLeft"], res["K1"], rtol=1e-6)
        np.testing.assert_allclose(
            np.ravel(d["translationLeftToRight"]), np.ravel(res["T"]), rtol=1e-6
        )

    def test_yaml_matrix_format(self):
        block = yaml_matrix("camLeft", np.eye(3))
        assert "!!opencv-matrix" in block and "rows: 3" in block
        assert "dt: d" in block
