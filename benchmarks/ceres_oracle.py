"""Ceres solve oracle: our LM vs the reference's Ceres on one recorded
motionOnlyBA problem instance (VERDICT r4 #2; SURVEY §4).

Pipeline:
  1. tools/dump_ba_problem.py  — record a warmed window from the noisy sim
  2. tools/ceres_oracle.cpp    — the REAL reference cost functions + the
     vendored Ceres 1.14 (built by tools/build_reference.sh) solve it with
     the reference's exact problem construction and options
  3. this driver — parse the dump back into our WindowState/LandmarkObs,
     solve with backend/ba.motion_only_ba (normal-equations LM,
     lm_solve_normal), and diff final cost, per-frame deltas, and
     iteration counts.

Writes CERES_ORACLE.json at the repo root. Key round-4 question this
answers: our bench windows pin at the 20-iteration cap — is that a
convergence bug? Measured answer: NO — Ceres itself runs to the cap on
the same instance (cost_change/cost ~2.5e-4 at the cap, far above its
1e-6 function_tolerance; the Huber-IRLS tail converges slowly by nature).

Usage:
    python tools/dump_ba_problem.py --out /tmp/refwork/ba_problem.txt
    <build oracle binary per tools/ceres_oracle.cpp header>
    python benchmarks/ceres_oracle.py [--problem /tmp/refwork/ba_problem.txt]
        [--oracle-bin /tmp/refwork/ceres_oracle --config .../euroc_sim.yml]
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))


def load_problem(path: Path):
    """Parse the dump back into (win, obs, calib, gravity, prior_factor)."""
    import jax.numpy as jnp
    import numpy as np
    from scipy.spatial.transform import Rotation as SR

    from pose_estimation_tpu.backend.ba import Calib, LandmarkObs
    from pose_estimation_tpu.imu.preintegration import ImuConstraint
    from pose_estimation_tpu.models.window import init_window

    frames, ics_raw, obs_raw = [], [], []
    gravity = prior = calib_vals = None
    for line in path.read_text().splitlines():
        parts = line.split()
        tag, vals = parts[0], [float(x) for x in parts[1:]]
        if tag == "gravity":
            gravity = np.array(vals)
        elif tag == "prior_factor":
            prior = vals[0]
        elif tag == "calib":
            calib_vals = vals
        elif tag == "frame":
            frames.append(vals)
        elif tag == "ic":
            ics_raw.append(vals)
        elif tag == "obs":
            obs_raw.append(vals)

    W = len(frames) - 1
    win = init_window(W, jnp.float64)
    R = np.stack([
        SR.from_quat([f[1], f[2], f[3], f[0]]).as_matrix() for f in frames
    ])
    arr = np.asarray(frames)
    ic_fields = {k: [] for k in ("bg_i", "ba_i", "dt", "dR", "dv", "dp",
                                 "d_R_bg", "d_v_bg", "d_v_ba", "d_p_bg",
                                 "d_p_ba", "inv_cov")}
    for v in ics_raw:
        o = 0
        ic_fields["bg_i"].append(v[o:o + 3]); o += 3
        ic_fields["ba_i"].append(v[o:o + 3]); o += 3
        ic_fields["dt"].append(v[o]); o += 1
        q = v[o:o + 4]; o += 4
        ic_fields["dR"].append(SR.from_quat([q[1], q[2], q[3], q[0]]).as_matrix())
        ic_fields["dv"].append(v[o:o + 3]); o += 3
        ic_fields["dp"].append(v[o:o + 3]); o += 3
        for k in ("d_R_bg", "d_v_bg", "d_v_ba", "d_p_bg", "d_p_ba"):
            ic_fields[k].append(np.asarray(v[o:o + 9]).reshape(3, 3)); o += 9
        ic_fields["inv_cov"].append(np.asarray(v[o:o + 225]).reshape(15, 15))
    dt = np.asarray(ic_fields["dt"])
    ics = ImuConstraint(
        inv_cov=jnp.asarray(ic_fields["inv_cov"]),
        bg_i=jnp.asarray(ic_fields["bg_i"]), ba_i=jnp.asarray(ic_fields["ba_i"]),
        dR=jnp.asarray(ic_fields["dR"]), dv=jnp.asarray(ic_fields["dv"]),
        dp=jnp.asarray(ic_fields["dp"]),
        d_R_bg=jnp.asarray(ic_fields["d_R_bg"]),
        d_v_bg=jnp.asarray(ic_fields["d_v_bg"]),
        d_v_ba=jnp.asarray(ic_fields["d_v_ba"]),
        d_p_bg=jnp.asarray(ic_fields["d_p_bg"]),
        d_p_ba=jnp.asarray(ic_fields["d_p_ba"]),
        dt=jnp.asarray(dt), dt2=jnp.asarray(dt * dt),
    )
    win = win._replace(
        R=jnp.asarray(R), v=jnp.asarray(arr[:, 4:7]), p=jnp.asarray(arr[:, 7:10]),
        dbg=jnp.asarray(arr[:, 10:13]), dba=jnp.asarray(arr[:, 13:16]),
        ics=ics,
    )

    ids = sorted({int(o[1]) for o in obs_raw})
    id_to_row = {i: r for r, i in enumerate(ids)}
    L = len(ids)
    pos = np.zeros((L, 3))
    px = np.zeros((L, W, 2))
    mask = np.zeros((L, W), bool)
    for o in obs_raw:
        slot, lm = int(o[0]), int(o[1])
        r = id_to_row[lm]
        px[r, slot - 1] = o[2:4]
        pos[r] = o[4:7]
        mask[r, slot - 1] = True
    obs = LandmarkObs(jnp.asarray(pos), jnp.asarray(px), jnp.asarray(mask))

    fx, fy, cx, cy, isx, isy = calib_vals
    return win, obs, (fx, fy, cx, cy, isx, isy), gravity, prior


def run_init_oracle(a, win, gravity):
    """Init-solver oracle (optimizer.cpp:183-329): the 4 initial* Ceres
    problems on the recorded chain vs backend/init_solvers on the same
    arrays. Returns the comparison dict."""
    import os

    import jax
    import jax.numpy as jnp
    import numpy as np

    from pose_estimation_tpu.backend import init_solvers
    from pose_estimation_tpu.imu.preintegration import repropagate
    from pose_estimation_tpu.utils import lie

    R = win.R[1:]
    p = win.p[1:]
    ics = jax.tree.map(lambda x: x[1:], win.ics)
    dbg, _ = init_solvers.solve_gyr_bias(R, ics)
    ics2 = jax.vmap(repropagate, in_axes=(0, None, None))(
        ics, dbg, jnp.zeros(3, jnp.float64))
    g_est, v, _ = init_solvers.solve_gravity_velocity(R, p, ics2)
    unit_g = jnp.asarray(gravity) / np.linalg.norm(gravity)
    delta_r, _ = init_solvers.solve_alignment(
        g_est / jnp.linalg.norm(g_est), unit_g, (1, 2))
    d_rm = lie.so3_exp(delta_r)
    R2 = d_rm[None] @ R
    v2 = jnp.einsum("ij,wj->wi", d_rm, v)
    p2 = jnp.einsum("ij,wj->wi", d_rm, p)
    dba, _ = init_solvers.solve_acc_bias(R2, v2, p2, ics2,
                                         jnp.asarray(gravity))

    env = dict(os.environ, ORACLE_INIT="1")
    proc = subprocess.run(
        [a.oracle_bin, a.config, a.problem], capture_output=True, text=True,
        timeout=300, env=env,
    )
    cer = {"v": {}}
    for line in proc.stdout.splitlines():
        if not line.startswith("ORACLE_INIT"):
            continue
        parts = line.split()
        if parts[1] == "v":
            cer["v"][int(parts[2])] = [float(x) for x in parts[3:]]
        else:
            cer[parts[1]] = [float(x) for x in parts[2:]]
    assert "dba" in cer, proc.stdout[-1500:]
    v_cer = np.stack([cer["v"][i] for i in sorted(cer["v"])])
    ours_dr = np.asarray(delta_r)[1:3]          # euroc axes (1, 2)
    return {
        "dbg_diff": float(np.max(np.abs(np.asarray(dbg) - cer["dbg"]))),
        "g_diff": float(np.max(np.abs(np.asarray(g_est) - cer["g"]))),
        "v_diff": float(np.max(np.abs(np.asarray(v) - v_cer))),
        "delta_r_diff": float(np.max(np.abs(ours_dr - cer["delta_r"]))),
        "dba_diff": float(np.max(np.abs(np.asarray(dba) - cer["dba"]))),
        "ceres": {k: v for k, v in cer.items() if k != "v"},
        "ours": {
            "dbg": np.asarray(dbg).tolist(), "g": np.asarray(g_est).tolist(),
            "delta_r": ours_dr.tolist(), "dba": np.asarray(dba).tolist(),
        },
    }


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--problem", default="/tmp/refwork/ba_problem.txt")
    ap.add_argument("--oracle-bin", default="/tmp/refwork/ceres_oracle")
    ap.add_argument("--config", default="/tmp/refwork/seq_a6/euroc_sim.yml")
    ap.add_argument("--out", default=str(ROOT / "CERES_ORACLE.json"))
    a = ap.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import numpy as np

    from pose_estimation_tpu.backend import ba as ba_mod
    from pose_estimation_tpu.backend.ba import Calib
    from pose_estimation_tpu.utils.config import load_config

    win, obs, cv, gravity, prior = load_problem(Path(a.problem))
    cfg = load_config(a.config, dataset="euroc")
    W = win.R.shape[0] - 1

    # same extrinsics path as the pipeline (vio.build_constants)
    from pose_estimation_tpu.camera import CameraModel

    cm = CameraModel.from_config(cfg)
    r_cb_rect = cm.R1 @ cm.R_cb            # body -> rectified camera
    p_cb_rect = cm.R1 @ cm.p_cb            # (vio.build_constants:112-113)
    calib = Calib(
        fx=jnp.float64(cv[0]), fy=jnp.float64(cv[1]),
        cx=jnp.float64(cv[2]), cy=jnp.float64(cv[3]),
        r_cb=jnp.asarray(r_cb_rect, jnp.float64),
        p_cb=jnp.asarray(p_cb_rect, jnp.float64),
        inv_std=jnp.asarray([cv[4], cv[5]], jnp.float64),
    )

    dpose, dvdbga, info = ba_mod.motion_only_ba(
        win, obs, calib, jnp.asarray(gravity), prior,
        max_iterations=cfg.max_num_iterations,
    )
    ours = {
        "initial_cost": float(info["initial_cost"]),
        "final_cost": float(info["final_cost"]),
        "iterations": int(info["iterations"]),
        "delta_pose": np.asarray(dpose).tolist(),
        "delta_v_dbga": np.asarray(dvdbga).tolist(),
    }

    # run the Ceres oracle binary (reference cost functions + real Ceres)
    proc = subprocess.run(
        [a.oracle_bin, a.config, a.problem], capture_output=True, text=True,
        timeout=300,
    )
    ceres = {"delta_pose": [None] * W, "delta_v_dbga": [None] * W}
    for line in proc.stdout.splitlines():
        if not line.startswith("ORACLE"):
            continue
        parts = line.split()
        if parts[1] in ("iterations", "nlandmarks"):
            ceres[parts[1]] = int(parts[2])
        elif parts[1] in ("initial_cost", "final_cost"):
            ceres[parts[1]] = float(parts[2])
        elif parts[1] in ("delta_pose", "delta_v_dbga"):
            ceres[parts[1]][int(parts[2])] = [float(x) for x in parts[3:]]
    assert ceres.get("final_cost") is not None, proc.stdout[-2000:]

    dp_err = float(np.max(np.abs(
        np.asarray(ours["delta_pose"]) - np.asarray(ceres["delta_pose"]))))
    dv_err = float(np.max(np.abs(
        np.asarray(ours["delta_v_dbga"]) - np.asarray(ceres["delta_v_dbga"]))))
    cost_rel = abs(ours["final_cost"] - ceres["final_cost"]) / ceres["final_cost"]

    init_cmp = run_init_oracle(a, win, gravity)
    result = {
        "init_solvers": init_cmp,
        "ours": ours,
        "ceres": {k: v for k, v in ceres.items()
                  if k in ("initial_cost", "final_cost", "iterations",
                           "nlandmarks")},
        "max_abs_delta_pose_diff": dp_err,
        "max_abs_delta_vdbga_diff": dv_err,
        "final_cost_rel_diff": cost_rel,
        "initial_cost_rel_diff": abs(
            ours["initial_cost"] - ceres["initial_cost"])
        / ceres["initial_cost"],
    }
    Path(a.out).write_text(json.dumps(result, indent=1) + "\n")
    print(json.dumps({k: v for k, v in result.items() if k != "ours"
                      or True}, default=str)[:400])
    print(f"ours: cost {ours['initial_cost']:.4f} -> {ours['final_cost']:.4f}"
          f" in {ours['iterations']} iters")
    print(f"ceres: cost {ceres['initial_cost']:.4f} -> "
          f"{ceres['final_cost']:.4f} in {ceres['iterations']} iters")
    print(f"max |dpose diff| {dp_err:.2e}  max |dvdbga diff| {dv_err:.2e}  "
          f"final cost rel diff {cost_rel:.2e}")
    print("init solvers vs Ceres: " + "  ".join(
        f"{k}={init_cmp[k]:.2e}" for k in
        ("dbg_diff", "g_diff", "v_diff", "delta_r_diff", "dba_diff")))
    return 0 if (cost_rel < 5e-3) else 1


if __name__ == "__main__":
    sys.exit(main())
