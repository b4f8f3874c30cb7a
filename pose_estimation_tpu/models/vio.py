"""The flagship model: one fused, jittable VIO frame step.

This is the device-side body of the reference's steady-state (`OK`) path
(`/root/reference/src/visual-inertial-slam.cpp:25-66`): IMU preintegration ->
state prediction -> rectify -> ORB -> stereo + temporal matching -> motion-
only BA -> keyframe decision -> feature-pool update — all one XLA program,
one dispatch per frame, no host round-trips. The host FSM (slam.py) only
chooses WHICH jitted function runs (SYNC/SFM/INIT/OK), mirroring the
reference's state machine.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from pose_estimation_tpu.backend import ba as ba_mod
from pose_estimation_tpu.backend.ba import Calib, LandmarkObs
from pose_estimation_tpu.camera import CameraModel
from pose_estimation_tpu.frontend import tracker
from pose_estimation_tpu.imu import preintegration as pre
from pose_estimation_tpu.models import pool as pool_mod
from pose_estimation_tpu.models import window as win_mod
from pose_estimation_tpu.ops import orb, remap
from pose_estimation_tpu.utils.config import VIOConfig


class VIOConstants(NamedTuple):
    """Device-resident constants of the pipeline."""

    map_l: jax.Array       # [H, W, 2] rectify map, left
    map_r: jax.Array
    p1: jax.Array          # [3, 4] rectified projection, left
    p2: jax.Array
    k_rect: jax.Array      # [3, 3] rectified camera matrix (for PnP)
    calib: Calib
    r_bc: jax.Array        # rectified-camera -> body
    p_bc: jax.Array
    gravity: jax.Array     # [3]
    imu: pre.ImuParams


@dataclasses.dataclass(frozen=True)
class VIOStatic:
    """Trace-time (static) configuration."""

    orb: orb.OrbConfig
    match_ratio: float
    min_match_dist: float
    max_vertical_dist: float
    max_feature_age: int
    max_depth: float
    keyframe_rotation: float
    keyframe_translation: float
    max_imu_time: float
    max_gyr_bias: float
    max_acc_bias: float
    prior_factor: float
    max_iterations: int
    cur_capacity: int
    pool_capacity: int
    window: int
    dtype: object = jnp.float32


def build_constants(cfg: VIOConfig, cm: CameraModel, dtype=jnp.float32):
    """(VIOConstants, VIOStatic) from config + camera model.

    Note the rectified extrinsics: triangulated points and reprojections live
    in the RECTIFIED left-camera frame, so the body<->camera transforms are
    composed with R1 (the reference omits this, folding R1 into the
    extrinsics as a constant error — see tracker.py module docstring).
    """
    r_cb_rect = cm.R1 @ cm.R_cb          # body -> rectified camera
    p_cb_rect = cm.R1 @ cm.p_cb
    r_bc_rect = r_cb_rect.T
    p_bc_rect = -r_bc_rect @ p_cb_rect
    consts = VIOConstants(
        map_l=jnp.asarray(cm.map_left, dtype),
        map_r=jnp.asarray(cm.map_right, dtype),
        p1=jnp.asarray(cm.P1, dtype),
        p2=jnp.asarray(cm.P2, dtype),
        k_rect=jnp.asarray(cm.P1[:, :3], dtype),
        calib=Calib(
            fx=jnp.asarray(cm.fx, dtype), fy=jnp.asarray(cm.fy, dtype),
            cx=jnp.asarray(cm.cx, dtype), cy=jnp.asarray(cm.cy, dtype),
            r_cb=jnp.asarray(r_cb_rect, dtype),
            p_cb=jnp.asarray(p_cb_rect, dtype),
            inv_std=jnp.asarray([1.0 / cm.std_x, 1.0 / cm.std_y], dtype),
        ),
        r_bc=jnp.asarray(r_bc_rect, dtype),
        p_bc=jnp.asarray(p_bc_rect, dtype),
        gravity=jnp.asarray(cfg.gravity, dtype),
        imu=pre.ImuParams.from_config(cfg, dtype),
    )
    static = VIOStatic(
        orb=orb.OrbConfig(
            n_features=cfg.num_features,
            n_levels=cfg.level_pyramid,
            scale=cfg.scale_factor,
            th_hi=float(cfg.ini_th_fast),
            th_lo=float(cfg.min_th_fast),
        ),
        match_ratio=cfg.match_ratio,
        min_match_dist=cfg.min_match_dist,
        max_vertical_dist=cfg.max_vertical_pixel_dist,
        max_feature_age=cfg.max_feature_age,
        max_depth=cfg.max_depth,
        keyframe_rotation=cfg.keyframe_rotation,
        keyframe_translation=cfg.keyframe_translation,
        max_imu_time=cfg.max_imu_time,
        max_gyr_bias=cfg.max_gyr_bias,
        max_acc_bias=cfg.max_acc_bias,
        prior_factor=cfg.prior_factor,
        max_iterations=cfg.max_num_iterations,
        cur_capacity=cfg.max_matches,
        pool_capacity=cfg.pool_capacity,
        window=cfg.window_size,
        dtype=dtype,
    )
    return consts, static


class VIOState(NamedTuple):
    """Everything that persists across frames on device."""

    win: win_mod.WindowState
    pool: pool_mod.FeaturePool
    preint: pre.PreintState
    bg: jax.Array     # preintegrator bias (ImuPreintegrator::_bg_i)
    ba: jax.Array


def init_vio_state(static: VIOStatic) -> VIOState:
    return VIOState(
        win=win_mod.init_window(static.window, static.dtype),
        pool=pool_mod.init_pool(static.pool_capacity, static.window, static.dtype),
        preint=pre.init_state(static.dtype),
        bg=jnp.zeros(3, static.dtype),
        ba=jnp.zeros(3, static.dtype),
    )


def front_end(img_l, img_r, pool, key, consts: VIOConstants, static: VIOStatic):
    """rectify -> ORB -> stereo match -> temporal track. Shared by the OK
    path and the bootstrap frame."""
    # NOTE: batching L/R into one vmapped extract is the natural TPU form of
    # the reference's two ORB threads, but the vmapped conv/gather graph
    # reliably faults the axon-tunneled TPU worker in this environment, so
    # the two extractions stay sequential (XLA still fuses aggressively).
    rect_l = remap.remap_bilinear(img_l, consts.map_l)
    rect_r = remap.remap_bilinear(img_r, consts.map_r)
    feats_l = orb.extract(rect_l, static.orb)
    feats_r = orb.extract(rect_r, static.orb)
    k1, k2 = jax.random.split(key)
    cur = tracker.internal_match(
        feats_l, feats_r, k1, static.cur_capacity,
        static.match_ratio, static.min_match_dist, static.max_vertical_dist,
    )
    tr = tracker.external_track(
        cur, pool, k2, static.match_ratio, static.min_match_dist
    )
    return cur, tr


def pool_update(state: VIOState, cur, tr, consts, static) -> VIOState:
    """featurePoolUpdate (`feature-tracker.cpp:330-412`), keyframe-gated by
    the caller."""
    win, pool = state.win, state.pool
    pool = pool_mod.age_and_evict(pool, tr.slot, tr.matched, static.max_feature_age)
    pts_w, depth_ok = tracker.triangulate_current(
        cur, consts.p1, consts.p2,
        win.R[-1], win.p[-1], consts.r_bc, consts.p_bc, static.max_depth,
    )
    want = cur.valid & ~tr.matched & depth_ok
    pool = pool_mod.insert_features(
        pool, cur.px_l, cur.desc_l, cur.desc_r, pts_w, want
    )
    return state._replace(pool=pool)


def ok_step(
    state: VIOState,
    img_l: jax.Array, img_r: jax.Array,
    gyr: jax.Array, acc: jax.Array, imu_mask: jax.Array,
    key: jax.Array,
    consts: VIOConstants, static: VIOStatic,
):
    """One steady-state frame. Returns (new_state, metrics)."""
    win, pool = state.win, state.pool

    # -- on keyframe (decided last frame) the obs window advances in lockstep
    # with the window-state roll inside push_constraint
    pool = jax.lax.cond(
        win.is_keyframe, pool_mod.shift_window, lambda p: p, pool
    )

    # -- IMU preintegration (continues across non-keyframes)
    preint = pre.integrate_chunk(
        state.preint, gyr, acc, imu_mask, state.bg, state.ba, consts.imu
    )
    ic = pre.finalize(preint, state.bg, state.ba, consts.imu)
    win = win_mod.push_constraint(win, ic, consts.gravity)

    # -- front-end
    cur, tr = front_end(img_l, img_r, pool, key, consts, static)
    pool = pool_mod.record_observations(pool, tr.slot, tr.matched, cur.px_l)

    # -- motion-only BA (skipped when no circular matches, `vis:48`)
    has_matches = tr.n_matches > 0

    def do_ba(win):
        obs = LandmarkObs(pool.pos, pool.obs_px, pool.obs_mask)
        dpose, dvdbga, info = ba_mod.motion_only_ba(
            win, obs, consts.calib, consts.gravity,
            static.prior_factor, static.max_iterations,
        )
        win = win_mod.apply_deltas(
            win, dpose, dvdbga, static.max_gyr_bias, static.max_acc_bias
        )
        win = win_mod.check_keyframe(
            win, static.keyframe_rotation, static.keyframe_translation,
            static.max_imu_time,
        )
        return win, info["final_cost"], info["iterations"]

    def skip_ba(win):
        return win, jnp.zeros((), static.dtype), jnp.zeros((), jnp.int32)

    win, ba_cost, ba_iters = jax.lax.cond(has_matches, do_ba, skip_ba, win)

    state = state._replace(win=win, pool=pool, preint=preint)

    # -- keyframe bookkeeping: bias update + preintegrator reset
    # (`ImuPreintegrator::updateBias`, `imu-preintegrator.cpp:166-170`)
    kf = win.is_keyframe & has_matches
    new_bg = jnp.where(kf, win.ics.bg_i[-1] + win.dbg[-1], state.bg)
    new_ba = jnp.where(kf, win.ics.ba_i[-1] + win.dba[-1], state.ba)
    preint = jax.lax.cond(
        kf, lambda p: pre.init_state(static.dtype), lambda p: p, preint
    )
    state = state._replace(preint=preint, bg=new_bg, ba=new_ba)

    # -- feature pool update on keyframe (or empty pool)
    do_pool = kf | ~jnp.any(state.pool.valid)
    state = jax.lax.cond(
        do_pool,
        lambda s: pool_update(s, cur, tr, consts, static),
        lambda s: s,
        state,
    )

    metrics = {
        "n_stereo": jnp.sum(cur.valid),
        "n_tracked": tr.n_matches,
        "is_keyframe": win.is_keyframe,
        "ba_cost": ba_cost,
        "ba_iters": ba_iters,
        "need_reinit": win.need_reinit,
        "pool_size": jnp.sum(state.pool.valid),
        "imu_dt": ic.dt,
    }
    return state, metrics


def ok_scan(
    state: VIOState,
    imgs_l: jax.Array,   # [T, H, W]
    imgs_r: jax.Array,   # [T, H, W]
    gyrs: jax.Array,     # [T, M, 3]
    accs: jax.Array,     # [T, M, 3]
    imu_masks: jax.Array,  # [T, M]
    keys: jax.Array,     # [T, 2] PRNG keys
    consts: VIOConstants, static: VIOStatic,
):
    """Streaming replay: T steady-state frames of ONE sequence in a single
    `lax.scan` dispatch, keeping sequential semantics. Returns
    (state, stacked per-frame outputs).

    Note (measured): on the tunneled chip this does NOT beat per-frame
    dispatch — the latency floor is per-OP device overhead inside the
    program, which a sequential scan cannot amortize (only batching across
    sequences does; see BASELINE.md). Kept for offline replay convenience
    and for hardware where dispatch, not per-op, overhead dominates."""

    def body(s, inp):
        il, ir, g, a, m, k = inp
        s, metrics = ok_step(s, il, ir, g, a, m, k, consts, static)
        # keep the carry lean: per-frame outputs are the newest pose + stats
        out = {
            "R": s.win.R[-1],
            "p": s.win.p[-1],
            "v": s.win.v[-1],
            "n_tracked": metrics["n_tracked"],
            "is_keyframe": metrics["is_keyframe"],
            "need_reinit": metrics["need_reinit"],
        }
        return s, out

    return jax.lax.scan(
        body, state, (imgs_l, imgs_r, gyrs, accs, imu_masks, keys)
    )


# ---------------------------------------------------------------------------
# Staged variants: the same pipeline as ok_step split into four jitted
# dispatches (imu / front-end / BA / pool). Functionally identical; smaller
# compile units, per-stage timing parity with the reference's stage printouts
# (`visual-inertial-slam.cpp:28-64`), and friendlier to the axon tunnel than
# one mega-graph.
# ---------------------------------------------------------------------------


def stage_imu(
    state: VIOState, gyr, acc, imu_mask, consts: VIOConstants, static: VIOStatic
):
    """Pool window shift (if last frame was a keyframe) + preintegration +
    constraint push/prediction."""
    win, pool = state.win, state.pool
    pool = jax.lax.cond(
        win.is_keyframe, pool_mod.shift_window, lambda p: p, pool
    )
    preint = pre.integrate_chunk(
        state.preint, gyr, acc, imu_mask, state.bg, state.ba, consts.imu
    )
    ic = pre.finalize(preint, state.bg, state.ba, consts.imu)
    win = win_mod.push_constraint(win, ic, consts.gravity)
    return state._replace(win=win, pool=pool, preint=preint), ic.dt


def stage_frontend(
    state: VIOState, img_l, img_r, key, consts: VIOConstants, static: VIOStatic
):
    cur, tr = front_end(img_l, img_r, state.pool, key, consts, static)
    pool = pool_mod.record_observations(state.pool, tr.slot, tr.matched, cur.px_l)
    return state._replace(pool=pool), cur, tr


def stage_ba(
    state: VIOState, tr_n_matches, consts: VIOConstants, static: VIOStatic
):
    win = state.win
    has_matches = tr_n_matches > 0

    def do_ba(win):
        obs = LandmarkObs(state.pool.pos, state.pool.obs_px, state.pool.obs_mask)
        dpose, dvdbga, info = ba_mod.motion_only_ba(
            win, obs, consts.calib, consts.gravity,
            static.prior_factor, static.max_iterations,
        )
        win = win_mod.apply_deltas(
            win, dpose, dvdbga, static.max_gyr_bias, static.max_acc_bias
        )
        win = win_mod.check_keyframe(
            win, static.keyframe_rotation, static.keyframe_translation,
            static.max_imu_time,
        )
        return win, info["final_cost"], info["iterations"]

    def skip_ba(win):
        return win, jnp.zeros((), static.dtype), jnp.zeros((), jnp.int32)

    win, ba_cost, ba_iters = jax.lax.cond(has_matches, do_ba, skip_ba, win)
    state = state._replace(win=win)

    kf = win.is_keyframe & has_matches
    new_bg = jnp.where(kf, win.ics.bg_i[-1] + win.dbg[-1], state.bg)
    new_ba = jnp.where(kf, win.ics.ba_i[-1] + win.dba[-1], state.ba)
    preint = jax.lax.cond(
        kf, lambda p: pre.init_state(static.dtype), lambda p: p, state.preint
    )
    return state._replace(preint=preint, bg=new_bg, ba=new_ba), ba_cost, ba_iters


def stage_pool(
    state: VIOState, cur, tr, tr_n_matches, consts: VIOConstants, static: VIOStatic
):
    kf = state.win.is_keyframe & (tr_n_matches > 0)
    do_pool = kf | ~jnp.any(state.pool.valid)
    return jax.lax.cond(
        do_pool,
        lambda s: pool_update(s, cur, tr, consts, static),
        lambda s: s,
        state,
    )


def sfm_step(
    img_l: jax.Array, img_r: jax.Array,
    ref_desc: jax.Array, ref_xy: jax.Array, ref_valid: jax.Array,
    key: jax.Array,
    consts: VIOConstants, static: VIOStatic,
):
    """Structure-from-motion bootstrap against the reference keyframe.

    Mirrors `FeatureTracker::structFromMotion`
    (`/root/reference/src/feature-tracker.cpp:414-545`): stereo match ->
    RANSAC -> triangulate -> match to the reference keyframe -> PnP-RANSAC.
    Returns (rvec, tvec, n_inliers, cur_left_features) where (rvec, tvec) is
    T_C1C2: current-camera points -> reference-camera frame.
    """
    from pose_estimation_tpu.ops import pnp as pnp_mod
    from pose_estimation_tpu.ops import triangulate as tri_mod

    rect_l = remap.remap_bilinear(img_l, consts.map_l)
    rect_r = remap.remap_bilinear(img_r, consts.map_r)
    feats_l = orb.extract(rect_l, static.orb)
    feats_r = orb.extract(rect_r, static.orb)
    k1, k2 = jax.random.split(key)
    cur = tracker.internal_match(
        feats_l, feats_r, k1, static.cur_capacity,
        static.match_ratio, static.min_match_dist, static.max_vertical_dist,
    )
    pts_cam = tri_mod.triangulate(consts.p1, consts.p2, cur.px_l, cur.px_r)
    depth = pts_cam[:, 2]
    depth_ok = cur.valid & (depth > 0.1) & (depth < static.max_depth)

    from pose_estimation_tpu.ops import matching as match_mod

    m = match_mod.match(
        cur.desc_l, ref_desc, depth_ok, ref_valid,
        static.match_ratio, static.min_match_dist,
    )
    img_pts = ref_xy[m.index]
    res = pnp_mod.pnp_ransac(
        pts_cam, img_pts, m.valid, consts.k_rect, k2,
    )
    return res.rvec, res.tvec, res.n_inliers, feats_l


def bootstrap_frame(
    state: VIOState, img_l, img_r, key,
    consts: VIOConstants, static: VIOStatic,
):
    """Initial stereo matching + pool seed after INITIALIZING
    (`visual-inertial-slam.cpp:101-107`)."""
    cur, tr = front_end(img_l, img_r, state.pool, key, consts, static)
    pool = pool_mod.record_observations(state.pool, tr.slot, tr.matched, cur.px_l)
    state = state._replace(pool=pool)
    state = pool_update(state, cur, tr, consts, static)
    return state, jnp.sum(cur.valid)
