"""End-to-end SLAM on the synthetic stereo-inertial world.

Drives the full FSM (SYNCHRONIZING -> SFM -> INITIALIZING -> OK) through the
public API exactly like a dataset replay would. Acceptance is trajectory-
level: windowed VIO without loop closure drifts with stereo-depth noise
(depth here is ~40x the baseline, as on EuRoC), so the gate is ATE as a
fraction of path length, not absolute precision.
"""

import numpy as np
import pytest

from sim import StereoInertialSim, sim_config

from pose_estimation_tpu.io.ate import ate_rmse
from pose_estimation_tpu.slam import State, VisualInertialSLAM

pytestmark = pytest.mark.slow  # long jit compiles; excluded from the fast tier


@pytest.fixture(scope="module")
def run_result():
    """PRODUCTION configuration (round 5): landmarks-fixed motion-only BA
    with the true-robust-cost LM, marginalization prior, gravity
    refinement, and the warm-first recovery policy — exactly what the
    replay CLIs run. (Rounds 2-4 pinned full_ba_keyframes=True here; see
    test_full_ba_e2e_quality for why that is no longer the flagship.)
    Measured on this fixture: ATE 1.30 %, |bg| 0.0026, |ba| 0.67."""
    cfg = sim_config(
        keyframe_rotation=0.1,
        keyframe_translation=0.15,
    )
    sim = StereoInertialSim(cfg, n_landmarks=150)
    slam = VisualInertialSLAM(cfg, verbose=False)
    gt = sim.run(slam, duration=5.0)
    return slam, gt


class TestEndToEnd:
    def test_reaches_ok_state(self, run_result):
        slam, gt = run_result
        assert slam.state == State.OK

    def test_produces_trajectory(self, run_result):
        slam, gt = run_result
        traj = slam.trajectory
        # SYNC consumes 1 frame, SFM 3, INIT 1 -> at least N-6 records
        assert len(traj) >= len(gt) - 6

    def test_ate_bounded(self, run_result):
        slam, gt = run_result
        traj = slam.trajectory
        path_len = np.linalg.norm(np.diff(gt[:, 1:], axis=0), axis=1).sum()
        ate = ate_rmse(traj, gt)
        # flagship config (keyframe full BA + marginalization prior +
        # online gravity refinement): measured 1.44% of path on this
        # geometry (depth ~40x baseline; billboard-splat rendering has
        # structured sub-pixel noise; round-2 state without the marg prior
        # was 2.3%); gate at 3% for seed/headroom
        assert ate < 0.03 * path_len, (ate, path_len)

    def test_biases_bounded(self, run_result):
        slam, gt = run_result
        win = slam.vio.win
        bg = np.asarray(win.ics.bg_i[-1] + win.dbg[-1])
        ba = np.asarray(win.ics.ba_i[-1] + win.dba[-1])
        # true biases are zero; gyro bias is strongly observable and must
        # stay tight; acc bias is weakly observable within a 4-frame window
        # (tilt <-> ba coupling; the (tilt, ba) pair random-walks along the
        # near-degenerate manifold — the reference has the same structure
        # and no countermeasure). Measured with the marginalization prior
        # (|bg| anchored across windows) + sigma-2 gravity refinement:
        # |bg| ~ 0.003, |ba| 0.42-0.83 across seeds (round 2: 0.008 / 1.4;
        # gates were 0.03 / 2.5). Gates at ~1.5x headroom.
        assert np.linalg.norm(bg) < 0.01
        assert np.linalg.norm(ba) < 1.2

    def test_full_ba_e2e_quality(self):
        """Keyframe full BA (Schur landmark refinement) e2e quality gate.

        History: in rounds 2-4 this was an A/B "full BA must BEAT the
        landmarks-fixed pipeline" (measured ~5.2% -> ~2.8% ATE/path). The
        round-5 true-robust-cost LM (see backend/ba.build_normal_problem)
        improved the LANDMARKS-FIXED arm to ~1.9% on the same protocol —
        at which point the A/B lost its signal (6 s: 1.94 vs 2.21, coin
        flip; 8 s: full BA is WORSE, 1.3 vs 6.8 — refined landmarks feed
        back tracking error on long horizons). Production default is OFF
        (`utils/config.py`); the machinery stays available + unit-tested
        (test_full_ba.py), and this test now gates only that the full-BA
        arm still tracks to solid e2e accuracy."""
        cfg = sim_config(
            keyframe_rotation=0.1, keyframe_translation=0.15,
            full_ba_keyframes=True,
        )
        sim = StereoInertialSim(cfg, n_landmarks=60, seed=0)
        slam = VisualInertialSLAM(cfg, reinit_on_bias_corruption=False)
        slam.gravity_refine_window = 0
        gt = sim.run(slam, duration=6.0, imu_noise=2.4e-3)
        assert slam.state == State.OK
        path = np.linalg.norm(np.diff(gt[:, 1:], axis=0), axis=1).sum()
        ate = ate_rmse(slam.trajectory, gt) / path
        assert ate < 0.05, ate

    def test_with_imu_noise(self):
        """EuRoC-class IMU noise must not degrade tracking (whitened
        residuals absorb it; vision noise dominates)."""
        cfg = sim_config(keyframe_rotation=0.1, keyframe_translation=0.15)
        sim = StereoInertialSim(cfg, n_landmarks=150, seed=0)
        slam = VisualInertialSLAM(cfg, reinit_on_bias_corruption=False)
        gt = sim.run(slam, duration=3.0, imu_noise=2.4e-3)
        assert slam.state == State.OK
        path = np.linalg.norm(np.diff(gt[:, 1:], axis=0), axis=1).sum()
        assert ate_rmse(slam.trajectory, gt) < 0.10 * path

    def test_dense_rectify_mode(self):
        """The reference-faithful dense-remap front-end (rectify_mode=
        "dense", `feature-tracker.cpp:75-76`) must track end-to-end too —
        it is the parity mode and the fallback for heavy distortion."""
        cfg = sim_config(
            keyframe_rotation=0.1, keyframe_translation=0.15,
            rectify_mode="dense",
        )
        sim = StereoInertialSim(cfg, n_landmarks=150, seed=0)
        slam = VisualInertialSLAM(cfg, reinit_on_bias_corruption=False)
        gt = sim.run(slam, duration=3.0)
        assert slam.state == State.OK
        path = np.linalg.norm(np.diff(gt[:, 1:], axis=0), axis=1).sum()
        assert ate_rmse(slam.trajectory, gt) < 0.10 * path

    def test_save_results_format(self, run_result, tmp_path):
        slam, gt = run_result
        out = tmp_path / "states.csv"
        slam.save_results(str(out))
        lines = out.read_text().strip().splitlines()
        assert lines[0] == (
            "timestamp,qw,qx,qy,qz,px,py,pz,vx,vy,vz,bgx,bgy,bgz,bax,bay,baz"
        )
        assert len(lines) == len(slam.trajectory) + 1
        assert len(lines[1].split(",")) == 17
