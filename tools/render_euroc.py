"""Render the synthetic stereo-inertial world to EuRoC mav0 format.

Produces a dataset directory BOTH stacks can replay on identical bytes —
the reference binary (`/root/reference/src/euroc-state-estimation.cpp:8-103`
reads `mav0/imu0/data.csv`, `mav0/cam0/data.csv` and `cam0|cam1/data/*.png`)
and ours (`pose_estimation_tpu/run_euroc.py`) — plus ONE reference-format
YAML config (`euroc_sim.yml`) consumed by both (our loader parses the
reference's OpenCV-YAML dialect, `utils/config.py:33`).

This is what makes the BASELINE.md "reference end-to-end FPS + ATE vs ours"
comparison real: same pixels, same IMU rows, same calibration, same
thresholds through two independent stacks.

    python tools/render_euroc.py --out /tmp/euroc_sim --duration 6 --seed 0

Notes
- IMU is padded past the last frame: the reference replay consumes
  `speedUp*rate + 1` IMU rows per frame (`euroc-state-estimation.cpp:53-66`)
  — one MORE than elapse per frame — so without padding it starves ~1 frame
  in 21 before the image stream ends.
- Noise protocol matches benchmarks/chip_accuracy.py (gyr sigma =
  --imu-noise, acc sigma = 10x) so accuracy numbers are comparable.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tests"))


def _mat(name: str, a: np.ndarray) -> str:
    a = np.asarray(a, np.float64)
    rows, cols = (a.shape[0], 1) if a.ndim == 1 else a.shape
    data = ", ".join(repr(float(x)) for x in a.reshape(-1))
    return (f"{name}: !!opencv-matrix\n    rows: {rows}\n    cols: {cols}\n"
            f"    dt: d\n    data: [ {data} ]\n")


def write_config(path: Path, cfg, mav0: Path) -> None:
    """Reference-format YAML carrying the sim calibration + thresholds.

    Every key the reference reads in EUROC mode is present (its
    `Config::get` silently returns 0 for missing keys — `config.hpp:8-25`)."""
    s = ["%YAML:1.0", f"dataset: {mav0}/", f"speedUp: {cfg.speed_up}", ""]
    s += [f"imageWidth: {cfg.image_width}", f"imageHeight: {cfg.image_height}",
          f"cameraFrequency: {cfg.camera_frequency}",
          f"stdX: {cfg.std_x}", f"stdY: {cfg.std_y}", ""]
    s += [_mat("camLeft", cfg.k_left), _mat("distLeft", cfg.dist_left),
          _mat("camRight", cfg.k_right), _mat("distRight", cfg.dist_right),
          _mat("rotationLeftToRight", cfg.r_lr),
          _mat("translationLeftToRight", cfg.t_lr),
          _mat("rotationImuToCamera", cfg.r_cb),
          _mat("translationImuToCamera", cfg.t_cb)]
    s += [f"samplingRate: {cfg.sampling_rate}",
          f"gyroscope_noise_density: {cfg.gyr_noise}",
          f"gyroscope_random_walk: {cfg.gyr_walk}",
          f"accelerometer_noise_density: {cfg.acc_noise}",
          f"accelerometer_random_walk: {cfg.acc_walk}", ""]
    s += ["cvORB: 0", f"numberOfFeatures: {cfg.num_features}",
          f"scaleFactor: {cfg.scale_factor}",
          f"levelPyramid: {cfg.level_pyramid}",
          "edgeThreshold: 31", "scoreType: 1", "patchSize: 31",
          "fastThreshold: 20", "gridRow: 1", "gridCol: 1",
          f"iniThFAST: {cfg.ini_th_fast}", f"minThFAST: {cfg.min_th_fast}",
          f"matchRatio: {cfg.match_ratio}",
          f"minMatchDist: {cfg.min_match_dist}",
          f"maxVerticalPixelDist: {cfg.max_vertical_pixel_dist}",
          f"maxFeatureAge: {cfg.max_feature_age}",
          f"maxDepth: {cfg.max_depth}", ""]
    s += [f"keyframeRotation: {cfg.keyframe_rotation}",
          f"keyframeTranslation: {cfg.keyframe_translation}",
          f"maxImuTime: {cfg.max_imu_time}",
          f"maxGyrBias: {cfg.max_gyr_bias}",
          f"maxAccBias: {cfg.max_acc_bias}",
          f"sfmRotation: {cfg.sfm_rotation}",
          f"sfmTranslation: {cfg.sfm_translation}",
          f"solvePnP: {cfg.solve_pnp}", ""]
    s += [f"max_num_iterations: {cfg.max_num_iterations}",
          "max_solver_time_in_seconds: 10", "num_threads: 4",
          "check_gradients: 0", f"gravity: {cfg.gravity_magnitude}",
          f"priorFactor: {cfg.prior_factor}", ""]
    # viewer block: read (silently zero otherwise) even when compiled out
    s += ["viewScale: 1", "pointSize: 4", "landmarkSize: 2",
          "cameraSize: 0.08", "cameraLineWidth: 3", "lineWidth: 2",
          "viewpointX: 10", "viewpointY: 10", "viewpointZ: -30",
          "viewpointF: 2000", "background: 0", "axisDirection: 2"]
    path.write_text("\n".join(s) + "\n")


def render(out: Path, duration: float, seed: int, imu_noise: float,
           n_landmarks: int, family: str, frame_hz: int,
           kf_rotation: float, kf_translation: float) -> Path:
    import cv2

    from sim import StereoInertialSim, sim_config, set_family

    cfg = sim_config(
        keyframe_rotation=kf_rotation, keyframe_translation=kf_translation,
        camera_frequency=frame_hz,
    )
    sim = StereoInertialSim(cfg, n_landmarks=n_landmarks, seed=seed,
                            y_max=max(11.0, 0.8 * duration + 5.0))
    set_family(sim, family)
    nrng = np.random.default_rng(seed + 10)

    mav0 = out / "mav0"
    for d in ("imu0", "cam0/data", "cam1/data", "state_groundtruth_estimate0"):
        (mav0 / d).mkdir(parents=True, exist_ok=True)

    dt_imu = 1.0 / cfg.sampling_rate
    frame_every = cfg.sampling_rate // frame_hz
    # pad IMU so the reference's rate+1 read-ahead never starves a frame
    n_imu = int(duration / dt_imu) + 2 * frame_every + 8
    n_img = int(duration / dt_imu) // frame_every + 1

    imu_rows = ["#timestamp [ns],w_RS_S_x [rad s^-1],w_RS_S_y [rad s^-1],"
                "w_RS_S_z [rad s^-1],a_RS_S_x [m s^-2],a_RS_S_y [m s^-2],"
                "a_RS_S_z [m s^-2]"]
    img_rows = ["#timestamp [ns],filename"]
    gt_rows = ["#timestamp,px,py,pz,qw,qx,qy,qz,vx,vy,vz"]
    from scipy.spatial.transform import Rotation as SR

    for k in range(n_imu):
        t = k * dt_imu
        ts = int(round(t * 1e9))
        w_b, f_b = sim.imu_at(t)
        if imu_noise:
            w_b = w_b + nrng.normal(0, imu_noise, 3)
            f_b = f_b + nrng.normal(0, imu_noise * 10, 3)
        vals = ",".join(repr(float(x)) for x in (*w_b, *f_b))
        imu_rows.append(f"{ts},{vals}")
    n_frames = 0
    for j in range(n_img):
        t = j * frame_every * dt_imu
        ts = int(round(t * 1e9))
        name = f"{ts}.png"
        img_l, img_r = sim.render(t)
        cv2.imwrite(str(mav0 / "cam0/data" / name),
                    np.clip(img_l, 0, 255).astype(np.uint8))
        cv2.imwrite(str(mav0 / "cam1/data" / name),
                    np.clip(img_r, 0, 255).astype(np.uint8))
        img_rows.append(f"{ts},{name}")
        q = SR.from_matrix(sim.traj.rot(t)).as_quat()  # x,y,z,w
        p = sim.traj.pos(t)
        v = sim.vel_at(t)
        gvals = ",".join(repr(float(x)) for x in
                         (*p, q[3], q[0], q[1], q[2], *v))
        gt_rows.append(f"{ts},{gvals}")
        n_frames += 1

    (mav0 / "imu0/data.csv").write_text("\n".join(imu_rows) + "\n")
    (mav0 / "cam0/data.csv").write_text("\n".join(img_rows) + "\n")
    (mav0 / "cam1/data.csv").write_text("\n".join(img_rows) + "\n")
    (mav0 / "state_groundtruth_estimate0/data.csv").write_text(
        "\n".join(gt_rows) + "\n")
    write_config(out / "euroc_sim.yml", cfg, mav0)
    print(f"rendered {n_frames} frames + {n_imu} IMU rows (family {family}) "
          f"-> {out}")
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--duration", type=float, default=6.0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--imu-noise", type=float, default=2.4e-3)
    ap.add_argument("--n-landmarks", type=int, default=150)
    ap.add_argument("--family", default="A", choices=("A", "B"))
    ap.add_argument("--frame-hz", type=int, default=10)
    ap.add_argument("--kf-rotation", type=float, default=0.1)
    ap.add_argument("--kf-translation", type=float, default=0.15)
    a = ap.parse_args(argv)
    render(Path(a.out), a.duration, a.seed, a.imu_noise, a.n_landmarks,
           a.family, a.frame_hz, a.kf_rotation, a.kf_translation)


if __name__ == "__main__":
    main()
