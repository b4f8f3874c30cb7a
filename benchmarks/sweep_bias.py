"""Sweep gravity-refinement chain length vs the e2e |ba| canary.

Runs the noisy 6 s simulator per (seed, refine-config) and prints ATE as a
fraction of path plus terminal |bg| / |ba|. CPU, sequential (1 core box).
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tests"))

import jax

# same surface as tests/conftest.py: CPU + x64 (the JAX_PLATFORMS env var
# is overridden by the axon sitecustomize; config.update is authoritative)
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np

from sim import StereoInertialSim, sim_config
from pose_estimation_tpu.io.ate import ate_rmse
from pose_estimation_tpu.slam import State, VisualInertialSLAM

CONFIGS = {
    "base(12,6)": dict(window=12, every=6),
    "long(24,4)": dict(window=24, every=4),
    "off(0,0)": dict(window=0, every=6),
    "marg": dict(window=12, every=6, marg=1.0),
    "marg.9": dict(window=12, every=6, marg=0.9),
    "marg+norefine": dict(window=0, every=6, marg=1.0),
    # weak zero-mean acc-bias prior on top of the marginalization prior
    # (measured a DEAD END: in motion-only BA the tilt is hard-pinned by
    # the fixed landmarks, so the prior fights the IMU residual instead of
    # fixing the gauge — ATE 1.07 -> 2.48 %, |ba| stays ~1.0)
    "bap.3": dict(window=12, every=6, marg=1.0, bap=0.3),
    # gravity-refinement Tikhonov relaxation (sigma_tilt, sigma_dba): the
    # refinement is the lever that CAN rotate world+landmarks together
    "rs2": dict(window=12, every=6, marg=1.0, rs=(2.0, 2.0)),
    "rs2w24": dict(window=24, every=4, marg=1.0, rs=(2.0, 2.0)),
    "rs5w24": dict(window=24, every=4, marg=1.0, rs=(5.0, 5.0)),
    "rxe3": dict(window=12, every=3, marg=1.0, rs=(2.0, 2.0)),
    "rx3": dict(window=12, every=6, marg=1.0, rs=(3.0, 3.0)),
    "rx3e3": dict(window=12, every=3, marg=1.0, rs=(3.0, 3.0)),
    # A/B the in-window history-snapshot refresh (slam.refresh_kf_hist)
    "fresh-rs2": dict(window=12, every=6, marg=1.0, rs=(2.0, 2.0),
                      fresh=True),
    "stale-rs2": dict(window=12, every=6, marg=1.0, rs=(2.0, 2.0),
                      fresh=False),
    "fresh-w24": dict(window=24, every=4, marg=1.0, rs=(2.0, 2.0),
                      fresh=True),
    "stale-w24": dict(window=24, every=4, marg=1.0, rs=(2.0, 2.0),
                      fresh=False),
    # refresh + longer chains at the refine cadence that oscillated when
    # stale (every=3) — fresher snapshots may stabilize it
    "fresh-e3": dict(window=12, every=3, marg=1.0, rs=(2.0, 2.0),
                     fresh=True),
}

only = sys.argv[1].split(",") if len(sys.argv) > 1 else None
for name, rc in CONFIGS.items():
    if only and not any(name.startswith(o) for o in only):
        continue
    for seed in (0, 1, 2):
        cfg = sim_config(
            keyframe_rotation=0.1, keyframe_translation=0.15,
            full_ba_keyframes=True,
            marg_prior="marg" in rc, marg_forget=rc.get("marg", 1.0),
            ba_prior_sigma=rc.get("bap", 0.0),
        )
        sim = StereoInertialSim(cfg, n_landmarks=150, seed=seed)
        slam = VisualInertialSLAM(
            cfg, verbose=False, reinit_on_bias_corruption=False,
            refine_sigmas=rc.get("rs", (0.5, 0.5)),
        )
        slam.gravity_refine_window = rc["window"]
        slam.gravity_refine_every = rc["every"]
        slam.refresh_kf_hist = rc.get("fresh", False)  # production default
        gt = sim.run(slam, duration=6.0, imu_noise=2.4e-3, seed=seed + 10)
        ok = slam.state == State.OK
        path = np.linalg.norm(np.diff(gt[:, 1:], axis=0), axis=1).sum()
        ate = ate_rmse(slam.trajectory, gt) / path * 100
        win = slam.vio.win
        bg = np.linalg.norm(np.asarray(win.ics.bg_i[-1] + win.dbg[-1]))
        ba = np.linalg.norm(np.asarray(win.ics.ba_i[-1] + win.dba[-1]))
        print(
            f"{name} seed={seed}: ok={ok} ate={ate:.2f}% "
            f"|bg|={bg:.4f} |ba|={ba:.3f}",
            flush=True,
        )
