"""KITTI / CFSD dataset-profile end-to-end sims (VERDICT r4 #8).

The dataset profiles differ in world gravity axis, alignment axes, and
IMU noise-unit conventions (reference `map.cpp:40-50`,
`imu-preintegrator.cpp:90-124`). The unit conversions are unit-tested in
test_config.py; this drives each profile through the FULL FSM on a
profile-consistent world: the sim places true gravity on the profile's
axis, and the noise densities are given in the profile's own units so the
discrete solver weights match the euroc run (kitti/cfsd express acc noise
in units of g and divide walks by sqrt(dt))."""

import numpy as np
import pytest

from sim import G, StereoInertialSim, sim_config

from pose_estimation_tpu.io.ate import ate_rmse
from pose_estimation_tpu.slam import State, VisualInertialSLAM

pytestmark = pytest.mark.slow


@pytest.mark.parametrize("dataset", ["kitti", "cfsd"])
def test_profile_e2e(dataset):
    sdt = np.sqrt(1.0 / 200)
    cfg = sim_config(
        dataset=dataset,
        keyframe_rotation=0.1, keyframe_translation=0.15,
        # same DISCRETE noise as the euroc protocol, expressed in this
        # profile's units (acc values are per-g; walk values are re-divided
        # by sqrt(dt) at load for these profiles, euroc's are not)
        acc_noise=2.0e-3 / G,
        gyr_walk=1.9e-5 * sdt,
        acc_walk=3.0e-3 * sdt / G,
    )
    assert np.allclose(
        cfg.discrete_noise(),
        sim_config().discrete_noise(), rtol=1e-12,
    ), "profile unit conversions drifted"
    sim = StereoInertialSim(cfg, n_landmarks=150, seed=0)
    assert abs(float(np.dot(sim.g_w, cfg.profile.gravity_dir)) - G) < 1e-9
    slam = VisualInertialSLAM(cfg, verbose=False)
    gt = sim.run(slam, duration=6.0, imu_noise=2.4e-3, seed=10)
    assert slam.state == State.OK, slam.state
    path = np.linalg.norm(np.diff(gt[:, 1:], axis=0), axis=1).sum()
    ate_pct = ate_rmse(slam.trajectory, gt) / path * 100
    win = slam.vio.win
    bg = float(np.linalg.norm(np.asarray(win.ics.bg_i[-1] + win.dbg[-1])))
    ba = float(np.linalg.norm(np.asarray(win.ics.ba_i[-1] + win.dba[-1])))
    # same gate family as the euroc chip protocol (benchmarks/chip_accuracy
    # round 5): ATE 4.0; |ba| 1.5 — the warm recovery policy DEFERS
    # corrections whose solve would grow |ba|, so elevated-but-bounded
    # tilt-absorbing bias with tight ATE is an accepted state
    assert ate_pct < 4.0, (dataset, ate_pct)
    assert bg < 0.01, (dataset, bg)
    assert ba < 1.5, (dataset, ba)
