"""Dump one recorded motionOnlyBA problem instance for the Ceres oracle.

Runs the noisy sim end-to-end (CPU x64 surface) to a warmed window, then
writes the exact problem the backend solves each frame — window states,
ImuConstraints, landmark observations, calibration — as a plain-text file
`tools/ceres_oracle.cpp` can feed to the REAL reference cost functions
(`/root/reference/include/cfsd/cost-functions.hpp`) solved by the REAL
vendored Ceres (built by tools/build_reference.sh). The companion driver
`benchmarks/ceres_oracle.py` then diffs Ceres' solution deltas and
iteration counts against our `backend/lm.py:lm_solve_normal` on the same
instance (SURVEY §4: "an LM solver test against Ceres on a recorded
problem"; reference problem construction: `src/optimizer.cpp:16-161`).

Layout notes (see models/window.py): our window has W+1 slots, slot 0 the
prior anchor; ics[k] joins slots k,k+1 (ics[0] is the prior constraint
`optimizer.cpp:40-41`). The reference's Map holds the same chain as
_R[0..W] with _imuConstraint[0..W-1].

    python tools/dump_ba_problem.py --out /tmp/ba_problem.txt [--frames 40]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / "tests"))


def _fmt(*vals) -> str:
    out = []
    for v in vals:
        import numpy as np

        a = np.asarray(v, np.float64).reshape(-1)
        out.extend(repr(float(x)) for x in a)
    return " ".join(out)


def dump(out_path: Path, duration: float, seed: int) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    import numpy as np
    from scipy.spatial.transform import Rotation as SR

    from sim import StereoInertialSim, sim_config

    from pose_estimation_tpu.slam import State, VisualInertialSLAM

    cfg = sim_config(keyframe_rotation=0.1, keyframe_translation=0.15)
    sim = StereoInertialSim(cfg, n_landmarks=150, seed=seed)
    # recovery off: a reinit near the end of the horizon leaves n_act < W;
    # the oracle wants one representative fully-warmed window, not the
    # production recovery policy
    slam = VisualInertialSLAM(cfg, verbose=False,
                              reinit_on_bias_corruption=False)
    sim.run(slam, duration=duration, imu_noise=2.4e-3, seed=seed + 10)
    assert slam.state == State.OK, slam.state

    win = slam.vio.win
    pool = slam.vio.pool
    calib = slam.consts.calib
    gravity = np.asarray(slam.consts.gravity, np.float64)
    W = win.R.shape[0] - 1
    assert int(win.n_act) == W, "window not warmed"

    # --- rebase all constraints to ONE common bias reference -----------
    # The reference's ImuCostFunction bias-consistency rows compare
    # _dbg[j] - _dbg[i] DIRECTLY (`cost-functions.hpp:307-316`) even though
    # each frame's delta references its own constraint's committed bg_i/ba_i;
    # our residuals transport the offsets (backend/ba.py `off_bg`). The two
    # formulations coincide exactly when every constraint shares one bias
    # reference, so the dump transports each constraint's preintegrated
    # deltas to ics[0]'s (bg*, ba*) via the bias Jacobians — the identical
    # first-order update the reference's own repropagate() applies
    # (`map.cpp:72-81`). Frame m's delta references ics[min(m, W-1)]
    # (models/window.py off convention).
    import jax.numpy as jnp

    from pose_estimation_tpu.utils import lie as lie_mod

    ics0 = win.ics
    bg_star = np.asarray(ics0.bg_i[0], np.float64)
    ba_star = np.asarray(ics0.ba_i[0], np.float64)
    dR_rb, dv_rb, dp_rb = [], [], []
    for k in range(W):
        db = np.asarray(ics0.bg_i[k], np.float64) - bg_star
        da = np.asarray(ics0.ba_i[k], np.float64) - ba_star
        dR = np.asarray(ics0.dR[k], np.float64)
        corr = np.asarray(
            lie_mod.so3_exp(jnp.asarray(
                np.asarray(ics0.d_R_bg[k], np.float64) @ (-db))),
            np.float64)
        dR_rb.append(dR @ corr)
        dv_rb.append(np.asarray(ics0.dv[k], np.float64)
                     - np.asarray(ics0.d_v_bg[k], np.float64) @ db
                     - np.asarray(ics0.d_v_ba[k], np.float64) @ da)
        dp_rb.append(np.asarray(ics0.dp[k], np.float64)
                     - np.asarray(ics0.d_p_bg[k], np.float64) @ db
                     - np.asarray(ics0.d_p_ba[k], np.float64) @ da)
    dbg_rb = np.asarray(win.dbg, np.float64).copy()
    dba_rb = np.asarray(win.dba, np.float64).copy()
    for m in range(W + 1):
        kref = min(m, W - 1)
        dbg_rb[m] += np.asarray(ics0.bg_i[kref], np.float64) - bg_star
        dba_rb[m] += np.asarray(ics0.ba_i[kref], np.float64) - ba_star

    lines = []
    lines.append("gravity " + _fmt(gravity))
    lines.append(f"prior_factor {cfg.prior_factor!r}")
    lines.append(
        "calib " + _fmt(calib.fx, calib.fy, calib.cx, calib.cy,
                        calib.inv_std))
    lines.append(f"W {W}")
    for k in range(W + 1):
        q = SR.from_matrix(np.asarray(win.R[k], np.float64)).as_quat()
        lines.append("frame " + _fmt([q[3], q[0], q[1], q[2]], win.v[k],
                                     win.p[k], dbg_rb[k], dba_rb[k]))
    ics = win.ics
    for k in range(W):
        q = SR.from_matrix(dR_rb[k]).as_quat()
        lines.append("ic " + _fmt(
            bg_star, ba_star, ics.dt[k],
            [q[3], q[0], q[1], q[2]], dv_rb[k], dp_rb[k],
            ics.d_R_bg[k], ics.d_v_bg[k], ics.d_v_ba[k],
            ics.d_p_bg[k], ics.d_p_ba[k], ics.inv_cov[k]))

    pos = np.asarray(pool.pos, np.float64)
    px = np.asarray(pool.obs_px, np.float64)
    mask = np.asarray(pool.obs_mask, bool)
    obs_lines = []
    for lm in range(pos.shape[0]):
        for w in range(W):
            if mask[lm, w]:
                obs_lines.append(
                    f"obs {w + 1} {lm} " + _fmt(px[lm, w], pos[lm]))
    lines.append(f"nobs {len(obs_lines)}")
    lines.extend(obs_lines)
    out_path.write_text("\n".join(lines) + "\n")
    print(f"dumped W={W} problem, {len(obs_lines)} observations "
          f"-> {out_path}")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/refwork/ba_problem.txt")
    ap.add_argument("--duration", type=float, default=6.0)
    ap.add_argument("--seed", type=int, default=0)
    a = ap.parse_args(argv)
    out = Path(a.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    dump(out, a.duration, a.seed)


if __name__ == "__main__":
    main()
