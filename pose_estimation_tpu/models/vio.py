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
from pose_estimation_tpu.utils import lie
from pose_estimation_tpu.utils.config import VIOConfig


class VIOConstants(NamedTuple):
    """Device-resident constants of the pipeline."""

    map_l: jax.Array       # [H, W, 2] rectify map, left
    map_r: jax.Array
    # raw-camera intrinsics + rectifying rotations, for sparse keypoint
    # rectification (rectify_mode="sparse"): k_* = (fx, fy, cx, cy)
    k_raw_l: jax.Array     # [4]
    k_raw_r: jax.Array
    dist_l: jax.Array      # [5]
    dist_r: jax.Array
    r1: jax.Array          # [3, 3]
    r2: jax.Array
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
    # RANSAC minimal solver for the SfM bootstrap, from the reference's
    # `solvePnP` switch (`feature-tracker.cpp:513-531`):
    # 0 -> "dlt" (ITERATIVE), 1/3/4 -> "epnp" (EPNP/DLS/UPNP),
    # 2/5 -> "p3p" (P3P/AP3P: true Grunert minimal solver, ops/p3p.py);
    # "epnp_min" (reduced 5-point EPnP) remains available as a fallback
    pnp_solver: str = "dlt"
    # "sparse": ORB on raw frames + analytic keypoint rectification (no
    # dense remap on the hot path); "dense": remap full frames first
    # (reference-faithful, `feature-tracker.cpp:75-76`)
    rectify_mode: str = "sparse"
    # Schur full BA (pose + landmark refinement) on keyframes
    full_ba_keyframes: bool = False
    full_ba_iterations: int = 8
    # sliding-window marginalization prior (see ba.marginalize_prior)
    marg_prior: bool = False
    marg_forget: float = 1.0
    ba_prior_sigma: float = 0.0
    dtype: object = jnp.float32


def build_constants(cfg: VIOConfig, cm: CameraModel, dtype=jnp.float32):
    """(VIOConstants, VIOStatic) from config + camera model.

    Note the rectified extrinsics: triangulated points and reprojections live
    in the RECTIFIED left-camera frame, so the body<->camera transforms are
    composed with R1 (the reference omits this, folding R1 into the
    extrinsics as a constant error — see tracker.py module docstring).

    SIDE EFFECT: sets the process-global `jax_default_matmul_precision` to
    "highest" (see the comment at the call below for why this is
    correctness-critical on TPU). Every entry point of this framework
    (run_*, bench, slam.SLAM, the batched/parallel builders) funnels through
    here, so programs traced afterwards — including unrelated ones — get
    full-precision f32 matmuls. Callers composing these ops WITHOUT
    build_constants on TPU must set the flag (or a
    `jax.default_matmul_precision("highest")` context) themselves, or the
    platform's one-pass-bf16 default silently destroys the solver path.
    """
    r_cb_rect = cm.R1 @ cm.R_cb          # body -> rectified camera
    p_cb_rect = cm.R1 @ cm.p_cb
    r_bc_rect = r_cb_rect.T
    p_bc_rect = -r_bc_rect @ p_cb_rect
    def k4(k):
        import numpy as np
        k = np.asarray(k)
        return jnp.asarray([k[0, 0], k[1, 1], k[0, 2], k[1, 2]], dtype)

    def d5(d):
        import numpy as np
        d = list(np.ravel(d)) + [0.0] * 5
        return jnp.asarray(d[:5], dtype)

    consts = VIOConstants(
        map_l=jnp.asarray(cm.map_left, dtype),
        map_r=jnp.asarray(cm.map_right, dtype),
        k_raw_l=k4(cfg.k_left),
        k_raw_r=k4(cfg.k_right),
        dist_l=d5(cfg.dist_left),
        dist_r=d5(cfg.dist_right),
        r1=jnp.asarray(cm.R1, dtype),
        r2=jnp.asarray(cm.R2, dtype),
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
    import jax as _jax

    # CORRECTNESS-CRITICAL on TPU: the platform default lowers f32 matmuls
    # to one bf16 MXU pass, which silently destroys the solver/geometry
    # path (measured: simulator ATE 2.3% -> 61-165% of path with the bf16
    # default). Every program built from these constants must trace with
    # full-f32 matmuls; throughput-critical big matmuls that are SAFE at
    # low precision (integer Hamming dots, one-hot selections) declare
    # precision=DEFAULT explicitly at the call site.
    _jax.config.update("jax_default_matmul_precision", "highest")

    on_tpu = _jax.default_backend() in ("tpu", "axon")
    fast_backend = cfg.fast_backend
    if fast_backend == "auto":
        fast_backend = "pallas" if on_tpu else "xla"
    sample_backend = cfg.sample_backend
    if sample_backend == "auto":
        sample_backend = "pallas" if on_tpu else "xla"
    static = VIOStatic(
        orb=orb.OrbConfig(
            n_features=cfg.num_features,
            n_levels=cfg.level_pyramid,
            scale=cfg.scale_factor,
            th_hi=float(cfg.ini_th_fast),
            th_lo=float(cfg.min_th_fast),
            fast_backend=fast_backend,
            sample_backend=sample_backend,
            select_dtype=cfg.select_dtype,
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
        pnp_solver={0: "dlt", 1: "epnp", 2: "p3p", 3: "epnp",
                    4: "epnp", 5: "p3p"}[cfg.solve_pnp],
        rectify_mode=cfg.rectify_mode,
        full_ba_keyframes=cfg.full_ba_keyframes,
        full_ba_iterations=cfg.full_ba_iterations,
        marg_prior=cfg.marg_prior,
        marg_forget=cfg.marg_forget,
        ba_prior_sigma=cfg.ba_prior_sigma,
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


def extract_rectified(
    img_l, img_r, consts: VIOConstants, static: VIOStatic
) -> tuple[orb.OrbFeatures, orb.OrbFeatures]:
    """ORB features of a stereo pair with RECTIFIED keypoint coordinates.

    sparse mode (default): detect + describe on the raw frames, then
    undistort/rectify only the K keypoint coords analytically — the dense
    full-frame remap (the slowest single op on this chip) never runs.
    dense mode: reference-faithful remap-then-extract.

    Accepts any input dtype (replay CLIs pass the decoded uint8 frames
    straight through — 4x less host->device traffic on the tunneled chip
    than a host-side float conversion) and casts on device.
    """
    img_l = img_l.astype(static.dtype)
    img_r = img_r.astype(static.dtype)
    if static.rectify_mode == "dense":
        rect = remap.remap_bilinear(
            jnp.stack([img_l, img_r]), jnp.stack([consts.map_l, consts.map_r])
        )
        return orb.extract_pair(rect[0], rect[1], static.orb)
    feats_l, feats_r = orb.extract_pair(img_l, img_r, static.orb)
    feats_l = feats_l._replace(
        xy=remap.rectify_points(
            feats_l.xy, consts.k_raw_l, consts.dist_l, consts.r1, consts.p1
        )
    )
    feats_r = feats_r._replace(
        xy=remap.rectify_points(
            feats_r.xy, consts.k_raw_r, consts.dist_r, consts.r2, consts.p2
        )
    )
    return feats_l, feats_r


def front_end(img_l, img_r, pool, key, consts: VIOConstants, static: VIOStatic):
    """rectify -> ORB -> stereo match -> temporal track. Shared by the OK
    path and the bootstrap frame."""
    # L/R + all pyramid levels extracted in ONE batched program (the
    # TPU-native form of the reference's two ORB threads); keypoint coords
    # come out rectified in both modes.
    feats_l, feats_r = extract_rectified(img_l, img_r, consts, static)
    k1, k2 = jax.random.split(key)
    cur = tracker.internal_match(
        feats_l, feats_r, k1, static.cur_capacity,
        static.match_ratio, static.min_match_dist, static.max_vertical_dist,
    )
    tr = tracker.external_track(
        cur, pool, k2, static.match_ratio, static.min_match_dist
    )
    return cur, tr


def _run_backend(
    state: VIOState, tr_n_matches, consts: VIOConstants, static: VIOStatic
):
    """Motion-only BA + keyframe decision + optional keyframe full BA +
    bias bookkeeping. Shared by `ok_step` and `stage_ba`.

    Returns (state, ba_cost, ba_iters)."""
    win = state.win
    has_matches = tr_n_matches > 0
    obs = LandmarkObs(state.pool.pos, state.pool.obs_px, state.pool.obs_mask)

    # -- motion-only BA (skipped when no circular matches, `vis:48`)
    wsize = win.R.shape[0] - 1

    def do_ba(win):
        dpose, dvdbga, info = ba_mod.motion_only_ba(
            win, obs, consts.calib, consts.gravity,
            static.prior_factor, static.max_iterations,
            use_marg_prior=static.marg_prior,
            ba_prior_sigma=static.ba_prior_sigma,
        )
        win = win_mod.apply_deltas(
            win, dpose, dvdbga, static.max_gyr_bias, static.max_acc_bias
        )
        win = win_mod.check_keyframe(
            win, static.keyframe_rotation, static.keyframe_translation,
            static.max_imu_time,
        )
        marg_h = (
            info["marg_h"] if static.marg_prior else info["h_final"]
        )
        return win, info["final_cost"], info["iterations"], marg_h

    def skip_ba(win):
        return (win, jnp.zeros((), static.dtype), jnp.zeros((), jnp.int32),
                jnp.zeros((15 * wsize, 15 * wsize), static.dtype))

    win, ba_cost, ba_iters, ba_h = jax.lax.cond(
        has_matches, do_ba, skip_ba, win
    )
    kf = win.is_keyframe & has_matches
    pool = state.pool

    # -- keyframe full BA: joint pose + landmark refinement (Schur), the
    # upgrade the reference carries only commented out (`optimizer.cpp:
    # 122-133`); keyframe decision stays with the motion-only deltas
    if static.full_ba_keyframes:
        from pose_estimation_tpu.backend import full_ba as full_ba_mod

        def do_full(args):
            win, pool = args
            obs2 = LandmarkObs(pool.pos, pool.obs_px, pool.obs_mask)
            # NOTE: full BA deliberately does NOT carry the marginalization
            # prior (use_marg_prior=False): with landmarks free, the
            # prior-vs-vision tension resolves by dragging poses back
            # toward the previous linearization and letting LANDMARKS
            # absorb the residual — measured ATE 3% -> 17% of path on the
            # sparse-landmark fixture. The prior constrains the motion-only
            # solve; full BA remains a local landmark/pose refinement
            # around it (consistent with its chord/frozen-J design).
            dpose, dvdbga, dlm, _ = full_ba_mod.full_ba(
                win, obs2, consts.calib, consts.gravity,
                static.prior_factor, static.full_ba_iterations,
            )
            win = win_mod.apply_deltas(
                win, dpose, dvdbga, static.max_gyr_bias, static.max_acc_bias
            )
            pool = pool._replace(pos=pool.pos + dlm)
            return win, pool

        win, pool = jax.lax.cond(
            kf, do_full, lambda args: args, (win, pool)
        )

    # -- sliding-window marginalization (config marg_prior): on keyframe,
    # fold the outgoing frame's information into the carried prior.
    # Activates once the window is full (during n_act growth the outgoing
    # block holds no information). Lin states use the post-full-BA values.
    if static.marg_prior:
        win = jax.lax.cond(
            kf & (win.n_act >= wsize),
            lambda w: ba_mod.marginalize_prior(w, ba_h, static.marg_forget),
            lambda w: w,
            win,
        )

    state = state._replace(win=win, pool=pool)

    # -- keyframe bookkeeping: bias update + preintegrator reset
    # (`ImuPreintegrator::updateBias`, `imu-preintegrator.cpp:166-170`)
    new_bg = jnp.where(kf, win.ics.bg_i[-1] + win.dbg[-1], state.bg)
    new_ba = jnp.where(kf, win.ics.ba_i[-1] + win.dba[-1], state.ba)
    preint = jax.lax.cond(
        kf, lambda p: pre.init_state(static.dtype), lambda p: p, state.preint
    )
    return state._replace(preint=preint, bg=new_bg, ba=new_ba), ba_cost, ba_iters


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
    p_pred = win.p[-1]

    # -- front-end
    cur, tr = front_end(img_l, img_r, pool, key, consts, static)
    pool = pool_mod.record_observations(pool, tr.slot, tr.matched, cur.px_l)

    state = state._replace(win=win, pool=pool, preint=preint)
    state, ba_cost, ba_iters = _run_backend(state, tr.n_matches, consts, static)
    win = state.win
    kf = win.is_keyframe & (tr.n_matches > 0)

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
        # IMU-predicted (pre-BA) newest position — the live viewer's "raw"
        # trajectory (the reference pushes it from pushImuConstraint,
        # `map.cpp:135-161` -> `viewer.cpp:202`)
        "p_pred": p_pred,
        # per-frame record/health bundle, computed IN-GRAPH: the host FSM
        # consumes {quat, p, v, bg, ba} (saveResults parity,
        # `visual-inertial-slam.cpp:175-204`) and a keyframe snapshot for
        # gravity refinement. Materializing these here keeps slam.process
        # from issuing ~20 tiny slicing/quaternion dispatches per frame —
        # on the tunneled chip those dominated replay latency (~100 ms/f).
        "rec_quat": lie.mat_to_quat(win.R[-1]),
        "rec_p": win.p[-1],
        "rec_v": win.v[-1],
        "rec_bg": win.ics.bg_i[-1] + win.dbg[-1],
        "rec_ba": win.ics.ba_i[-1] + win.dba[-1],
        "rec_R": win.R[-1],
        "rec_ic": jax.tree.map(lambda a: a[-1], win.ics),
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
    return _run_backend(state, tr_n_matches, consts, static)


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

    feats_l, feats_r = extract_rectified(img_l, img_r, consts, static)
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
        solver=static.pnp_solver,
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
