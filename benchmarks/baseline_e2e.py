"""Measured reference-vs-ours END-TO-END baseline on identical input
(VERDICT r4 #1 — "make the baseline real").

Both stacks replay the SAME sim-rendered EuRoC-format sequence
(tools/render_euroc.py) with the SAME config file:
  - reference: the FULL C++ binary (incl. vendored Ceres motion-only BA),
    built -O2 viewer-less by tools/build_reference.sh
  - ours: pose_estimation_tpu.run_euroc on the real TPU chip (full host
    FSM: IMU pairing, FSM states, recovery — not the fused-step bench)

Records end-to-end FPS (best of N runs for the reference; steady-state
per-frame for ours, excluding compile) and ATE RMSE vs the shared ground
truth. Writes BASELINE_E2E.json.

    python benchmarks/baseline_e2e.py [--work /tmp/refwork] [--runs 3]
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / "tests"))


def ref_run(binary: Path, cfg: Path, workdir: Path, runs: int):
    best = None
    for _ in range(runs):
        t0 = time.time()
        proc = subprocess.run(
            [str(binary), str(cfg)], cwd=str(workdir),
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
            timeout=590,
        )
        wall = time.time() - t0
        assert proc.returncode == 0, proc.returncode
        best = wall if best is None else min(best, wall)
    return best


def ate_of(traj, gt_path: Path):
    import csv

    import numpy as np

    from pose_estimation_tpu.io.ate import ate_rmse

    gt = np.array([
        [float(x) for x in r[:4]]
        for r in csv.reader(open(gt_path)) if not r[0].startswith("#")
    ])
    path = float(np.linalg.norm(np.diff(gt[:, 1:], axis=0), axis=1).sum())
    return float(ate_rmse(traj, gt)), path


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--work", default="/tmp/refwork")
    ap.add_argument("--seq", default=None, help="sequence dir (default"
                    " <work>/seq_a6; rendered if missing)")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--out", default=str(ROOT / "BASELINE_E2E.json"))
    a = ap.parse_args(argv)
    work = Path(a.work)
    seq = Path(a.seq) if a.seq else work / "seq_a6"

    import numpy as np

    if not (seq / "euroc_sim.yml").exists():
        from tools.render_euroc import render

        render(seq, 6.0, 0, 2.4e-3, 150, "A", 10, 0.1, 0.15)
    cfgf = seq / "euroc_sim.yml"
    gt_path = seq / "mav0" / "state_groundtruth_estimate0" / "data.csv"

    result = {"sequence": str(seq), "config": str(cfgf)}

    # ---- reference ----------------------------------------------------
    binary = work / "ref" / "bin" / "euroc-state-estimation"
    if binary.exists():
        rdir = work / "run_ref_e2e"
        rdir.mkdir(exist_ok=True)
        wall = ref_run(binary, cfgf, rdir, a.runs)
        states = np.genfromtxt(rdir / "states.csv", delimiter=",",
                               skip_header=1)
        traj = np.stack(
            [states[:, 0], states[:, 5], states[:, 6], states[:, 7]], axis=1)
        ate, path = ate_of(traj, gt_path)
        n_imu = sum(1 for line in open(seq / "mav0/imu0/data.csv")) - 1
        # the reference consumes rate+1 rows/frame (euroc-state-est.:53-66)
        n_frames = n_imu // 21
        result["reference"] = {
            "wall_s_best": round(wall, 3),
            "frames": n_frames,
            "fps": round(n_frames / wall, 2),
            "ate_m": round(ate, 4),
            "ate_pct_of_path": round(ate / path * 100, 2),
            "final_ba": [round(float(x), 3) for x in states[-1, 14:17]],
            "build": "-O2, viewer-less, vendored Ceres 1.14 "
                     "(tools/build_reference.sh)",
        }
    else:
        result["reference"] = "binary not built (tools/build_reference.sh)"

    # ---- ours on the chip --------------------------------------------
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      str(work / ".jax_tpu_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import cv2

    from pose_estimation_tpu import load_config
    from pose_estimation_tpu.io.euroc import EurocDataset
    from pose_estimation_tpu.slam import SensorType, VisualInertialSLAM

    cfg = load_config(str(cfgf), dataset="euroc")
    ds = EurocDataset(cfg.dataset_path)
    slam = VisualInertialSLAM(cfg, verbose=False)
    frame_walls = []
    t_total0 = time.time()
    for ev in ds.events(cfg.speed_up, None):
        if ev[0] == "imu":
            slam.collect_imu_data(SensorType.GYROSCOPE, ev[1], *ev[2])
            slam.collect_imu_data(SensorType.ACCELEROMETER, ev[1], *ev[3])
        else:
            img_l = cv2.imread(ev[2], cv2.IMREAD_GRAYSCALE)
            img_r = cv2.imread(ev[3], cv2.IMREAD_GRAYSCALE)
            t0 = time.time()
            slam.process(img_l, img_r, ev[1])
            frame_walls.append(time.time() - t0)
    total_wall = time.time() - t_total0
    traj = slam.trajectory
    ate, path = ate_of(traj, gt_path)
    fw = np.asarray(frame_walls)
    # steady-state = median of OK-path frames (excludes compiles + reinits);
    # the total incl. compile is reported alongside for honesty
    steady = float(np.median(fw))
    result["ours_tpu"] = {
        "frames": len(fw),
        "total_wall_s_incl_compile": round(total_wall, 1),
        "steady_ms_per_frame_median": round(steady * 1e3, 1),
        "steady_fps": round(1.0 / steady, 1),
        "p90_ms_per_frame": round(float(np.quantile(fw, 0.9)) * 1e3, 1),
        "ate_m": round(ate, 4),
        "ate_pct_of_path": round(ate / path * 100, 2),
        "backend": str(jax.devices()[0]),
    }
    if isinstance(result["reference"], dict):
        result["fps_ratio_steady"] = round(
            result["ours_tpu"]["steady_fps"] / result["reference"]["fps"], 2)
    Path(a.out).write_text(json.dumps(result, indent=1) + "\n")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
