"""Sliding-window state as a fixed-shape functional pytree.

Replaces the reference's `cfsd::Map` shared-mutable-state hub
(`/root/reference/src/map.cpp`, `include/cfsd/map.hpp:76-87`): unbounded
`std::vector`s + in-place mutation become a fixed-shape `WindowState` updated
functionally, so the whole backend jits and vmaps.

Layout: W+1 frames. Frame 0 is the marginalization anchor (the frame just
outside the window that the prior references, `optimizer.cpp:40-41` uses
constraint n-1); frames 1..W are optimized. `ics` stacks W ImuConstraints;
ics[k] connects frames k and k+1 (ics[0] is the prior constraint).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from pose_estimation_tpu.imu.preintegration import ImuConstraint
from pose_estimation_tpu.utils import lie

from pose_estimation_tpu.utils.config import WINDOW_SIZE


class WindowState(NamedTuple):
    R: jax.Array     # [W+1, 3, 3] body->world rotations
    v: jax.Array     # [W+1, 3]
    p: jax.Array     # [W+1, 3]
    dbg: jax.Array   # [W+1, 3] gyro-bias increments since ics[k].bg_i
    dba: jax.Array   # [W+1, 3]
    ics: ImuConstraint  # stacked along leading dim [W]
    is_keyframe: jax.Array      # scalar bool — last frame was a keyframe
    need_reinit: jax.Array      # scalar bool — bias corruption detected
    sum_imu_time: jax.Array     # scalar — IMU time since last keyframe
    # Number of OPTIMIZED frames (the reference's `actualSize`,
    # `optimizer.cpp:26`): frames at slots (W+1-n_act)..W are optimized, the
    # slot just before them is the prior anchor. Grows 1 -> W after init.
    n_act: jax.Array            # scalar int32 in [1, W]
    # --- marginalization prior (config `marg_prior`; zero when off) ---
    # Information matrix over the W optimized frames' increments in the
    # solver's param layout [6W poses | 9W v/dbg/dba] (newest frame's
    # blocks are zero — it had no information when the prior was formed),
    # plus the linearization states the prior's residual is taken against.
    # lin_bg/lin_ba are TOTAL biases (ics.bg_i + dbg at lin time).
    # (defaults None so prior-free problem constructions — oracle tests —
    # stay valid; `init_window` always provides real arrays)
    prior_h: jax.Array | None = None      # [15W, 15W]
    lin_R: jax.Array | None = None        # [W, 3, 3] frames 1..W
    lin_p: jax.Array | None = None        # [W, 3]
    lin_v: jax.Array | None = None        # [W, 3]
    lin_bg: jax.Array | None = None       # [W, 3]
    lin_ba: jax.Array | None = None       # [W, 3]
    prior_on: jax.Array | None = None     # scalar bool


def _empty_ic(w: int, dtype) -> ImuConstraint:
    eye = jnp.broadcast_to(jnp.eye(3, dtype=dtype), (w, 3, 3))
    eye15 = jnp.broadcast_to(jnp.eye(15, dtype=dtype), (w, 15, 15))
    z3 = jnp.zeros((w, 3), dtype)
    z33 = jnp.zeros((w, 3, 3), dtype)
    zs = jnp.zeros((w,), dtype)
    return ImuConstraint(
        inv_cov=eye15, bg_i=z3, ba_i=z3, dR=eye, dv=z3, dp=z3,
        d_R_bg=z33, d_v_bg=z33, d_v_ba=z33, d_p_bg=z33, d_p_ba=z33,
        dt=zs, dt2=zs,
    )


def init_window(w: int = WINDOW_SIZE, dtype=jnp.float32) -> WindowState:
    return WindowState(
        R=jnp.broadcast_to(jnp.eye(3, dtype=dtype), (w + 1, 3, 3)),
        v=jnp.zeros((w + 1, 3), dtype),
        p=jnp.zeros((w + 1, 3), dtype),
        dbg=jnp.zeros((w + 1, 3), dtype),
        dba=jnp.zeros((w + 1, 3), dtype),
        ics=_empty_ic(w, dtype),
        is_keyframe=jnp.asarray(True),
        need_reinit=jnp.asarray(False),
        sum_imu_time=jnp.zeros((), dtype),
        n_act=jnp.asarray(w, jnp.int32),
        prior_h=jnp.zeros((15 * w, 15 * w), dtype),
        lin_R=jnp.broadcast_to(jnp.eye(3, dtype=dtype), (w, 3, 3)),
        lin_p=jnp.zeros((w, 3), dtype),
        lin_v=jnp.zeros((w, 3), dtype),
        lin_bg=jnp.zeros((w, 3), dtype),
        lin_ba=jnp.zeros((w, 3), dtype),
        prior_on=jnp.asarray(False),
    )


def apply_deltas(
    win: WindowState,
    delta_pose: jax.Array,    # [W, 6]
    delta_vdbga: jax.Array,   # [W, 9]
    max_gyr_bias: float,
    max_acc_bias: float,
) -> WindowState:
    """Solver-delta application, right-multiplicative.

    Mirrors `Map::updateStates` (`src/map.cpp:183-219`):
        dba += d[6:9]; dbg += d[3:6]; v += d[0:3]
        p += R * dpose[3:6]; R = R * exp(dpose[0:3])
    plus the bias-corruption check (:211-213).
    """
    w = delta_pose.shape[0]
    dr, dp = delta_pose[:, 0:3], delta_pose[:, 3:6]
    dv, ddbg, ddba = delta_vdbga[:, 0:3], delta_vdbga[:, 3:6], delta_vdbga[:, 6:9]

    R_act = win.R[1 : w + 1]
    new_R = R_act @ lie.so3_exp(dr)
    new_p = win.p[1 : w + 1] + jnp.einsum("wij,wj->wi", R_act, dp)
    new_v = win.v[1 : w + 1] + dv
    new_dbg = win.dbg[1 : w + 1] + ddbg
    new_dba = win.dba[1 : w + 1] + ddba

    updated_bg = win.ics.bg_i[-1] + new_dbg[-1]
    updated_ba = win.ics.ba_i[-1] + new_dba[-1]
    need_reinit = (jnp.linalg.norm(updated_bg) > max_gyr_bias) | (
        jnp.linalg.norm(updated_ba) > max_acc_bias
    )

    return win._replace(
        R=win.R.at[1 : w + 1].set(new_R),
        p=win.p.at[1 : w + 1].set(new_p),
        v=win.v.at[1 : w + 1].set(new_v),
        dbg=win.dbg.at[1 : w + 1].set(new_dbg),
        dba=win.dba.at[1 : w + 1].set(new_dba),
        need_reinit=need_reinit,
    )


def check_keyframe(
    win: WindowState,
    min_rotation: float,
    min_translation: float,
    max_imu_time: float,
) -> WindowState:
    """Keyframe test on the two newest frames (`Map::checkKeyframe`
    `src/map.cpp:163-181`): ||dr|| > minRot or ||dp|| > minTrans or
    accumulated IMU time > maxImuTime."""
    R_i, p_i = win.R[-2], win.p[-2]
    R_j, p_j = win.R[-1], win.p[-1]
    # T_ji = T_j * T_i^{-1}
    dR = R_j @ R_i.T
    dp = p_j - dR @ p_i
    dr = lie.so3_log(dR)
    is_kf = (
        (jnp.linalg.norm(dr) > min_rotation)
        | (jnp.linalg.norm(dp) > min_translation)
        | (win.sum_imu_time > max_imu_time)
    )
    return win._replace(
        is_keyframe=is_kf,
        sum_imu_time=jnp.where(is_kf, 0.0, win.sum_imu_time).astype(win.sum_imu_time.dtype),
    )


def push_constraint(win: WindowState, ic_new: ImuConstraint, gravity: jax.Array) -> WindowState:
    """Append/replace the newest frame with the IMU-predicted state.

    Mirrors `Map::pushImuConstraint` (`src/map.cpp:135-161`):
    * last frame was a keyframe -> shift the window left and append a new
      frame predicted from the (final) last keyframe state;
    * else -> re-predict the same last frame from the previous keyframe with
      the updated (bias-corrected) constraint that now spans the longer
      interval, and overwrite it.
    """
    from pose_estimation_tpu.imu import preintegration as pre

    def on_keyframe(win):
        # shift everything left by one; slot W becomes the new frame
        R = jnp.roll(win.R, -1, axis=0)
        v = jnp.roll(win.v, -1, axis=0)
        p = jnp.roll(win.p, -1, axis=0)
        dbg = jnp.roll(win.dbg, -1, axis=0)
        dba = jnp.roll(win.dba, -1, axis=0)
        ics = jax.tree.map(lambda a: jnp.roll(a, -1, axis=0), win.ics)
        ics = jax.tree.map(lambda a, n: a.at[-1].set(n), ics, ic_new)
        R_j, v_j, p_j = pre.predict(R[-2], v[-2], p[-2], ic_new, gravity)
        return win._replace(
            R=R.at[-1].set(R_j), v=v.at[-1].set(v_j), p=p.at[-1].set(p_j),
            dbg=dbg.at[-1].set(0.0), dba=dba.at[-1].set(0.0), ics=ics,
        )

    def on_nonkeyframe(win):
        ics = jax.tree.map(lambda a, n: a.at[-1].set(n), win.ics, ic_new)
        R_j, v_j, p_j = pre.predict(
            win.R[-2], win.v[-2], win.p[-2], ic_new, gravity,
            dbg_i=win.dbg[-2], dba_i=win.dba[-2],
        )
        return win._replace(
            R=win.R.at[-1].set(R_j), v=win.v.at[-1].set(v_j),
            p=win.p.at[-1].set(p_j),
            dbg=win.dbg.at[-1].set(0.0), dba=win.dba.at[-1].set(0.0), ics=ics,
        )

    wsize = win.R.shape[0] - 1
    new_n_act = jnp.where(
        win.is_keyframe, jnp.minimum(win.n_act + 1, wsize), win.n_act
    ).astype(jnp.int32)
    win = jax.lax.cond(win.is_keyframe, on_keyframe, on_nonkeyframe, win)
    return win._replace(
        sum_imu_time=win.sum_imu_time + ic_new.dt, n_act=new_n_act
    )
