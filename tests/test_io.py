"""Dataset IO tests: EuRoC/KITTI replay drivers + the native C++ loader."""

import subprocess
from pathlib import Path

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")


def make_euroc(root: Path, n_frames=5, n_imu=100):
    rng = np.random.default_rng(0)
    for d in ["cam0/data", "cam1/data", "imu0"]:
        (root / d).mkdir(parents=True)
    with open(root / "cam0" / "data.csv", "w") as f0, open(
        root / "cam1" / "data.csv", "w"
    ) as f1:
        f0.write("#ts,filename\n")
        f1.write("#ts,filename\n")
        for k in range(n_frames):
            ts = 1_000_000_000 + k * 100_000_000
            img = rng.integers(0, 255, (48, 64), np.uint8)
            cv2.imwrite(str(root / "cam0" / "data" / f"{ts}.png"), img)
            cv2.imwrite(str(root / "cam1" / "data" / f"{ts}.png"), img)
            f0.write(f"{ts},{ts}.png\n")
            f1.write(f"{ts},{ts}.png\n")
    with open(root / "imu0" / "data.csv", "w") as f:
        f.write("#ts,wx,wy,wz,ax,ay,az\n")
        for k in range(n_imu):
            ts = 995_000_000 + k * 5_000_000
            f.write(f"{ts},0.01,0.02,0.03,9.8,0.1,0.2\n")
    gt_dir = root / "state_groundtruth_estimate0"
    gt_dir.mkdir()
    with open(gt_dir / "data.csv", "w") as f:
        f.write("#ts,px,py,pz\n")
        for k in range(n_frames):
            ts = 1_000_000_000 + k * 100_000_000
            f.write(f"{ts},{0.1 * k},0,0\n")
    return root


class RecorderSlam:
    """Stub with the SLAM ingestion API, recording what arrives."""

    def __init__(self):
        self.imu = []
        self.frames = []

    def collect_imu_data(self, sensor, ts, x, y, z):
        self.imu.append((sensor, ts, x, y, z))

    def process(self, l, r, ts):
        self.frames.append((ts, l.shape, r.shape))
        return True


class TestEurocDataset:
    def test_events_ordering_and_speedup(self, tmp_path):
        from pose_estimation_tpu.io.euroc import EurocDataset

        make_euroc(tmp_path)
        ds = EurocDataset(str(tmp_path))
        evs = list(ds.events(speed_up=2))
        imgs = [e for e in evs if e[0] == "img"]
        assert len(imgs) == 3  # frames 0, 2, 4
        # every imu event precedes the image it belongs to
        last_ts = 0
        for e in evs:
            assert e[1] >= last_ts - 5_000_000
            last_ts = e[1]

    def test_run_euroc_feeds_slam(self, tmp_path):
        from pose_estimation_tpu.io.euroc import EurocDataset, run_euroc

        make_euroc(tmp_path)
        slam = RecorderSlam()
        n = run_euroc(slam, EurocDataset(str(tmp_path)), speed_up=1)
        assert n == 5
        assert len(slam.frames) == 5
        assert slam.frames[0][1] == (48, 64)
        # both sensor types per imu row
        assert len(slam.imu) == 2 * sum(
            1 for s, ts, *_ in slam.imu if str(s).endswith("GYROSCOPE")
        )

    def test_ground_truth(self, tmp_path):
        from pose_estimation_tpu.io.euroc import EurocDataset

        make_euroc(tmp_path)
        gt = EurocDataset(str(tmp_path)).ground_truth()
        assert gt.shape == (5, 4)


class TestNativeLoader:
    def test_matches_python_loader(self, tmp_path):
        from pose_estimation_tpu.io import native_loader

        if not native_loader.available():
            pytest.skip("native/libingest.so not built")
        make_euroc(tmp_path)
        loader = native_loader.NativeEurocLoader(str(tmp_path), speed_up=1)
        frames = list(loader)
        assert len(frames) == 5
        ts0, l0, r0, imu0 = frames[0]
        assert l0.shape == (48, 64)
        assert imu0.shape[1] == 7
        # IMU spans partition the stream: total samples <= n_imu
        total = sum(len(f[3]) for f in frames)
        assert 0 < total <= 100
        # pixel data identical to cv2's read
        ref = cv2.imread(
            str(tmp_path / "cam0" / "data" / f"{ts0}.png"), cv2.IMREAD_GRAYSCALE
        )
        np.testing.assert_array_equal(l0, ref)


class TestKitti:
    def test_replay(self, tmp_path):
        from pose_estimation_tpu.io.kitti import KittiDataset, run_kitti

        rng = np.random.default_rng(1)
        (tmp_path / "oxts" / "processed").mkdir(parents=True)
        (tmp_path / "image_00" / "data").mkdir(parents=True)
        (tmp_path / "image_01" / "data").mkdir(parents=True)
        n_img, rate = 3, 10
        n_imu = n_img * (rate + 1)
        with open(tmp_path / "oxts" / "processed" / "timestamps.txt", "w") as f:
            f.write("\n".join(str(1000 + i) for i in range(n_imu)))
        for i in range(n_imu):
            (tmp_path / "oxts" / "processed" / f"{i:010d}.txt").write_text(
                "9.8 0.1 0.2 0.01 0.02 0.03"
            )
        with open(tmp_path / "image_00" / "processed_timestamps.txt", "w") as f:
            f.write("\n".join(str(1000 + i * rate) for i in range(n_img)))
        for i in range(n_img):
            img = rng.integers(0, 255, (32, 48), np.uint8)
            cv2.imwrite(str(tmp_path / "image_00" / "data" / f"{i:010d}.png"), img)
            cv2.imwrite(str(tmp_path / "image_01" / "data" / f"{i:010d}.png"), img)

        slam = RecorderSlam()
        n = run_kitti(slam, KittiDataset(str(tmp_path)), 10**9, 10**9, rate)
        assert n == 3
        assert len(slam.frames) == 3
        assert len(slam.imu) == 2 * n_imu


class TestSplitTool:
    def test_split_stereo(self, tmp_path):
        rng = np.random.default_rng(2)
        img = rng.integers(0, 255, (30, 80, 3), np.uint8)
        cv2.imwrite(str(tmp_path / "0.jpg"), img)
        import sys

        sys.path.insert(0, "tools")
        import split_stereo

        split_stereo.main([str(tmp_path)])
        l = cv2.imread(str(tmp_path / "left" / "0.jpg"))
        r = cv2.imread(str(tmp_path / "right" / "0.jpg"))
        assert l.shape == (30, 40, 3) and r.shape == (30, 40, 3)
