"""VisualInertialSLAM: the host-side FSM orchestrating the jitted pipeline.

Mirror of `cfsd::VisualInertialSLAM` (`/root/reference/src/
visual-inertial-slam.cpp`): the same 5-state machine SYNCHRONIZING -> SFM ->
INITIALIZING -> OK (+ re-initialization on bias corruption, which the
reference detects but leaves disabled, `:53-57` — here it is implemented),
the same ingestion API (`process`, `collect_imu_data`, `save_results`). All
numerics run in jitted device programs; the host only sequences them and
shuttles fixed-size inputs.
"""

from __future__ import annotations

import functools
from enum import Enum

import jax
import jax.numpy as jnp
import numpy as np

from pose_estimation_tpu.backend import init_solvers
from pose_estimation_tpu.camera import CameraModel
from pose_estimation_tpu.imu import preintegration as pre
from pose_estimation_tpu.models import vio as vio_mod
from pose_estimation_tpu.utils import lie
from pose_estimation_tpu.utils.config import VIOConfig


class State(Enum):
    SYNCHRONIZING = 0
    SFM = 1
    INITIALIZING = 2
    OK = 3
    LOST = 4


class SensorType(Enum):
    ACCELEROMETER = 0
    GYROSCOPE = 1


class VisualInertialSLAM:
    def __init__(self, cfg: VIOConfig, verbose: bool = False, seed: int = 0,
                 reinit_on_bias_corruption: bool = True, dtype=jnp.float32,
                 metrics_jsonl: str | None = None, reinit_check_every: int = 8,
                 staged: bool = False,
                 refine_sigmas: tuple[float, float] = (2.0, 2.0)):
        self.cfg = cfg
        self.verbose = verbose
        # staged=True runs the OK path as four jitted dispatches (per-stage
        # timing parity with the reference's printouts, `visual-inertial-
        # slam.cpp:28-64`); default is the fused single-dispatch ok_step —
        # one host->device round trip per frame (the dispatch overhead of
        # the extra three stages is pure latency on the tunneled chip)
        self.staged = staged
        self.reinit_on_bias_corruption = reinit_on_bias_corruption
        self._metrics_sink = open(metrics_jsonl, "w") if metrics_jsonl else None
        # host<->device sync cadence for the bias-corruption check (each
        # check blocks the async dispatch pipeline)
        self.reinit_check_every = reinit_check_every
        self._frame_count = 0
        # tracking-loss detection (the reference declares a LOST state but
        # leaves it empty, `visual-inertial-slam.cpp:148-153`; here it is
        # implemented: persistent low track counts trigger re-bootstrap)
        self.min_tracked = 8
        self.lost_after = 3
        self._low_track_streak = 0
        self._pending_health: list[tuple] = []
        # online gravity refinement: the 4-frame init window cannot separate
        # a small gravity-direction error from accelerometer bias (the
        # reference never refines after init, optimizer.cpp:242-329); here
        # the gravity/alignment/acc-bias solves are re-run periodically over
        # an accumulated KEYFRAME chain, where the two become observable
        self.gravity_refine_window = 12   # keyframes per chain (0 disables)
        # refine as soon as this many keyframes exist (short sequences and
        # slow motion produce < window keyframes; a shorter chain is less
        # observable but the angle/dba acceptance gates below still apply —
        # the chain grows toward `window` as keyframes accumulate)
        self.gravity_refine_min = 6
        self.gravity_refine_every = 6     # keyframes between refinements
        # routine-upkeep trust region: small corrections only (the warm
        # recovery path owns large ones, with its own acceptance gates);
        # 0.35 rad let a chaotic chain sneak an 11.5 deg tilt through
        self.max_refine_angle = 0.12      # rad; distrust bigger corrections
        self.max_refine_dba = 3.0         # m/s^2
        self._kf_hist: list[tuple] = []
        self._kfs_since_refine = 0
        # whether the most recently processed frame was committed as a
        # keyframe (it then still sits at window slot -1; after the next
        # frame arrives the window shifts it to -2) — drives the
        # history-refresh slot mapping below
        self._last_was_kf = False
        # refresh in-window history snapshots from the latest optimized
        # window states (A/B knob for the bias sweeps). Default OFF: the
        # round-3-validated behavior is commit-time snapshots; the first
        # refresh signal was WORSE on its seed (|ba| 1.27 vs the 1.2 gate)
        # and the full fresh-vs-stale sweep did not fit the round-4 CPU
        # budget (~20 min per seed x config on this 1-core host).
        self.refresh_kf_hist = False
        # consecutive corrupted health checks (spanning reinit_check_every
        # frames each) required before bias-corruption recovery fires;
        # 1 = immediate (measured best — see the health-check comment)
        self.reinit_patience = 1
        self._corrupt_streak = 0
        # warm-first recovery (VERDICT r4 #6): on a corrupted check try the
        # continuity-preserving re-solve (_warm_recover) before the cold
        # reinit; escalate after warm_recovery_max consecutive warm passes
        # that fail to clear the detector
        self.warm_recovery = True
        self.warm_recovery_max = 2
        self._warm_streak = 0
        self.max_recover_angle = 0.35     # rad; implausibility gate only
        self.max_recover_dba = 3.0        # m/s^2
        # initializer sanity gates (beyond the reference, which accepts any
        # SfM/init output): minimum PnP inliers per accepted SfM frame and
        # physical-plausibility checks on the solved gravity/velocities
        self.min_sfm_inliers = 20
        self.max_init_velocity = 20.0
        self.cm = CameraModel.from_config(cfg)
        self.consts, self.static = vio_mod.build_constants(cfg, self.cm, dtype)
        dtype = self.static.dtype

        self.state = State.SYNCHRONIZING
        self.vio = vio_mod.init_vio_state(self.static)
        self._key = jax.random.PRNGKey(seed)

        # optional live viewer (the reference's `setViewer`,
        # `visual-inertial-slam.hpp:43`); see live_viewer.LiveViewer
        self._viewer = None
        self.viewer_landmark_every = 10   # landmark-cloud push cadence

        # --- host-side ingestion (the reference's mutex-guarded queues) ---
        self._gyr = None
        self._acc = None
        self._imu_ts: list[int] = []
        self._imu_data: list[np.ndarray] = []  # [gyr(3), acc(3)]
        self._dt_us = 1_000_000 // cfg.sampling_rate
        self._synchronized = False

        # --- SFM bootstrap collections ---
        self._sfm_count = 0
        self._ref_feats = None
        self._sfm_R = []  # body-to-world (SfM world = initial body frame)
        self._sfm_p = []
        self._sfm_ics = []

        # --- results (states.csv) ---
        self._records: list[tuple] = []

        # --- jitted entry points (staged pipeline; see vio.py) ---
        self._stage_imu = jax.jit(
            functools.partial(
                vio_mod.stage_imu, consts=self.consts, static=self.static
            )
        )
        self._stage_frontend = jax.jit(
            functools.partial(
                vio_mod.stage_frontend, consts=self.consts, static=self.static
            )
        )
        self._stage_ba = jax.jit(
            functools.partial(
                vio_mod.stage_ba, consts=self.consts, static=self.static
            )
        )
        self._stage_pool = jax.jit(
            functools.partial(
                vio_mod.stage_pool, consts=self.consts, static=self.static
            )
        )
        self._ok_step = jax.jit(
            functools.partial(
                vio_mod.ok_step, consts=self.consts, static=self.static
            )
        )
        self._bootstrap = jax.jit(
            functools.partial(
                vio_mod.bootstrap_frame, consts=self.consts, static=self.static
            )
        )
        self._sfm_step = jax.jit(
            functools.partial(
                vio_mod.sfm_step, consts=self.consts, static=self.static
            )
        )
        def _seed_ref(img_l):
            fl, _ = vio_mod.extract_rectified(
                img_l, img_l, self.consts, self.static
            )
            return fl

        self._seed_ref = jax.jit(_seed_ref)
        profile = cfg.profile
        self._refine_jit = jax.jit(functools.partial(
            init_solvers.refine_gravity,
            unit_g=jnp.asarray(profile.gravity_dir, dtype),
            axes=profile.alignment_axes,
            gravity=jnp.asarray(cfg.gravity, dtype),
            sigma_tilt=refine_sigmas[0], sigma_dba=refine_sigmas[1],
        ))
        self._full_init_jit = jax.jit(functools.partial(
            init_solvers.full_init,
            unit_g=jnp.asarray(profile.gravity_dir, dtype),
            axes=profile.alignment_axes,
            gravity=jnp.asarray(cfg.gravity, dtype),
        ))
        # warm-recovery variant: same solver, regularizers opened up — the
        # corrupted-bias basin is a ~5-10 deg gravity tilt with |dba| ~ 1,
        # exactly what the routine-upkeep sigmas are tuned to reject
        self._recover_jit = jax.jit(functools.partial(
            init_solvers.refine_gravity,
            unit_g=jnp.asarray(profile.gravity_dir, dtype),
            axes=profile.alignment_axes,
            gravity=jnp.asarray(cfg.gravity, dtype),
            sigma_tilt=5.0, sigma_dba=5.0, rounds=3,
        ))
        self._integrate = jax.jit(
            functools.partial(pre.integrate_chunk, params=self.consts.imu)
        )
        self._finalize = jax.jit(
            functools.partial(pre.finalize, params=self.consts.imu)
        )
        self._dtype = dtype

    # ------------------------------------------------------------------ #
    # ingestion (mirrors `collectImuData`, `visual-inertial-slam.cpp:158`)
    # ------------------------------------------------------------------ #

    def collect_imu_data(self, sensor: SensorType, timestamp: int, x, y, z):
        if sensor == SensorType.ACCELEROMETER:
            self._acc = np.array([x, y, z], np.float64)
        else:
            self._gyr = np.array([x, y, z], np.float64)
        if self._acc is not None and self._gyr is not None:
            self._imu_ts.append(int(timestamp))
            self._imu_data.append(np.concatenate([self._gyr, self._acc]))
            self._acc = None
            self._gyr = None

    def _next_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    def _pop_imu_chunks(self, img_ts: int):
        """Consume queued samples up to the image timestamp (half-sample
        tolerance, `imu-preintegrator.cpp:196`).

        Returns a non-empty list of padded (gyr [m,3], acc [m,3], mask [m])
        chunks covering ALL consumed samples — when more than `imu_chunk`
        samples queued up (dropped frames, SFM rejects), the overflow is
        split into extra leading chunks instead of silently discarded (the
        reference integrates every queued sample, `imu-preintegrator.cpp:
        196-233`)."""
        m = self.cfg.imu_chunk
        take = 0
        half = self._dt_us // 2 * 1000  # timestamps are ns in EuRoC
        while take < len(self._imu_ts) and abs(img_ts - self._imu_ts[take]) > half:
            if self._imu_ts[take] > img_ts:
                break
            take += 1
        rows = self._imu_data[:take]
        self._imu_ts = self._imu_ts[take:]
        self._imu_data = self._imu_data[take:]
        if take > m and self.verbose:
            print(f"[slam] imu queue overflow: {take} samples -> "
                  f"{-(-take // m)} chunks of {m}")
        chunks = []
        for lo in range(0, max(take, 1), m):
            part = rows[lo : lo + m]
            n = len(part)
            gyr = np.zeros((m, 3), np.float32)
            acc = np.zeros((m, 3), np.float32)
            mask = np.zeros(m, bool)
            if n:
                arr = np.stack(part)
                gyr[:n] = arr[:, :3]
                acc[:n] = arr[:, 3:]
                mask[:n] = True
            chunks.append((jnp.asarray(gyr), jnp.asarray(acc), jnp.asarray(mask)))
        return chunks

    def _pop_imu_chunk(self, img_ts: int):
        """Single-chunk variant: integrates any overflow chunks into the
        running preintegration state and returns the FINAL chunk (callers
        pass it to the fused step, which integrates it + finalizes)."""
        chunks = self._pop_imu_chunks(img_ts)
        for gyr, acc, mask in chunks[:-1]:
            self.vio = self.vio._replace(
                preint=self._integrate(
                    self.vio.preint, gyr, acc, mask, self.vio.bg, self.vio.ba
                )
            )
        return chunks[-1]

    def _synchronize(self, img_ts: int) -> bool:
        """Drop IMU samples predating the first image
        (`imu-preintegrator.cpp:174-193`)."""
        half = self._dt_us // 2 * 1000
        if not self._imu_ts or img_ts < self._imu_ts[0]:
            return False
        while self._imu_ts and abs(img_ts - self._imu_ts[0]) > half:
            self._imu_ts.pop(0)
            self._imu_data.pop(0)
            if not self._imu_ts:
                return False
        return True

    # ------------------------------------------------------------------ #
    # per-frame processing (mirrors `process`, `visual-inertial-slam.cpp:20`)
    # ------------------------------------------------------------------ #

    def process(self, gray_l: np.ndarray, gray_r: np.ndarray, img_ts: int) -> bool:
        # no host-side dtype conversion: uint8 frames ship as-is (4x less
        # tunnel traffic); every jitted consumer casts on device
        # (vio.extract_rectified)
        img_l = jnp.asarray(gray_l)
        img_r = jnp.asarray(gray_r)

        if self.state == State.SYNCHRONIZING:
            if self._synchronize(img_ts):
                self._ref_feats = self._seed_ref(img_l)
                self.state = State.SFM
                if self.verbose:
                    print("[slam] synchronized; entering SFM")
            return True

        if self.state == State.SFM:
            if self._sfm_count < self.cfg.window_size - 1:
                gyr, acc, mask = self._pop_imu_chunk(img_ts)
                self.vio = self.vio._replace(
                    preint=self._integrate(
                        self.vio.preint, gyr, acc, mask, self.vio.bg, self.vio.ba
                    )
                )
                rvec, tvec, n_inl, feats_l = self._sfm_step(
                    img_l, img_r,
                    self._ref_feats.desc, self._ref_feats.xy,
                    self._ref_feats.valid, self._next_key(),
                )
                r_np = np.asarray(rvec, np.float64)
                t_np = np.asarray(tvec, np.float64)
                # Degenerate-PnP gate (the reference accepts any solvePnP
                # output, `feature-tracker.cpp:539`; a garbage pose here
                # poisons the whole initialization)
                if int(n_inl) < self.min_sfm_inliers or np.linalg.norm(t_np) > 5.0:
                    if self.verbose:
                        print(f"[slam] SFM frame rejected (inl={int(n_inl)})")
                elif (
                    np.linalg.norm(r_np) > self.cfg.sfm_rotation
                    or np.linalg.norm(t_np) > self.cfg.sfm_translation
                ):
                    self._push_sfm(r_np, t_np)
                    self.vio = self.vio._replace(preint=pre.init_state(self._dtype))
                    self._sfm_count += 1
                    self._ref_feats = feats_l
                    if self.verbose:
                        print(f"[slam] SFM frame {self._sfm_count} accepted "
                              f"(|r|={np.linalg.norm(r_np):.4f}, "
                              f"|p|={np.linalg.norm(t_np):.4f}, inl={int(n_inl)})")
            else:
                self._initialize(img_l, img_r, img_ts)
            return True

        if self.state == State.INITIALIZING:
            self._initialize(img_l, img_r, img_ts)
            return True

        if self.state == State.OK:
            gyr, acc, mask = self._pop_imu_chunk(img_ts)
            if not bool(np.any(np.asarray(mask))):
                if self.verbose:
                    print("[slam] warning: no IMU samples for frame; skipping")
                return False
            if self.staged:
                self.vio, imu_dt = self._stage_imu(self.vio, gyr, acc, mask)
                p_pred = self.vio.win.p[-1]
                self.vio, cur, tr = self._stage_frontend(
                    self.vio, img_l, img_r, self._next_key()
                )
                self.vio, ba_cost, ba_iters = self._stage_ba(
                    self.vio, tr.n_matches
                )
                self.vio = self._stage_pool(self.vio, cur, tr, tr.n_matches)
                metrics = {
                    "n_stereo": jnp.sum(cur.valid),
                    "n_tracked": tr.n_matches,
                    "is_keyframe": self.vio.win.is_keyframe,
                    "ba_cost": ba_cost,
                    "ba_iters": ba_iters,
                    "need_reinit": self.vio.win.need_reinit,
                    "pool_size": jnp.sum(self.vio.pool.valid),
                    "imu_dt": imu_dt,
                    "p_pred": p_pred,
                }
            else:
                self.vio, metrics = self._ok_step(
                    self.vio, img_l, img_r, gyr, acc, mask, self._next_key()
                )
            self._record(img_ts, metrics)
            if self.verbose:
                print(
                    f"[slam] ts={img_ts} stereo={int(metrics['n_stereo'])} "
                    f"tracked={int(metrics['n_tracked'])} "
                    f"kf={bool(metrics['is_keyframe'])} "
                    f"pool={int(metrics['pool_size'])} "
                    f"ba_iters={int(metrics['ba_iters'])}"
                )
            if self._metrics_sink is not None:
                import json

                self._metrics_sink.write(json.dumps(
                    {"ts": img_ts, **{
                        k: (float(v) if np.ndim(v) == 0
                            else np.asarray(v).tolist())
                        for k, v in metrics.items()
                        if not k.startswith("rec_")
                    }}
                ) + "\n")
                self._metrics_sink.flush()
            self._frame_count += 1
            if self._viewer is not None:
                self._push_viewer(metrics)
            # device scalars are retained per frame and materialized in one
            # host sync every reinit_check_every frames; the streak itself
            # advances PER FRAME, so detection latency is bounded by the
            # check cadence, not multiplied by it
            if "rec_R" in metrics:      # fused path: snapshot is in-graph
                snap = (metrics["rec_R"], metrics["rec_p"],
                        metrics["rec_v"], metrics["rec_ic"])
            else:                       # staged timing-parity path
                win = self.vio.win
                snap = (win.R[-1], win.p[-1], win.v[-1],
                        jax.tree.map(lambda a: a[-1], win.ics))
            self._pending_health.append((
                metrics["n_tracked"], metrics["need_reinit"],
                metrics["is_keyframe"],
                # lazy keyframe snapshot for gravity refinement: state +
                # the finalized constraint ending at this keyframe
                snap,
            ))
            if self._frame_count % self.reinit_check_every == 0:
                pending, self._pending_health = self._pending_health, []
                lost = False
                corrupted = False
                for n_tracked, need_reinit, is_kf, snap in pending:
                    if int(n_tracked) < self.min_tracked:
                        self._low_track_streak += 1
                    else:
                        self._low_track_streak = 0
                    lost = lost or self._low_track_streak >= self.lost_after
                    corrupted = corrupted or bool(need_reinit)
                    if bool(is_kf) and self.gravity_refine_window:
                        self._kf_hist.append(snap)
                        self._kfs_since_refine += 1
                    self._last_was_kf = bool(is_kf)
                if len(self._kf_hist) > self.gravity_refine_window:
                    del self._kf_hist[: -self.gravity_refine_window]
                if (self.gravity_refine_window and self._kf_hist
                        and self.refresh_kf_hist):
                    self._refresh_kf_hist()
                if lost:
                    if self.verbose:
                        print("[slam] tracking lost -> re-bootstrapping")
                    self._relocalize(img_l, img_r)
                    return True
                # Immediate recovery on a corrupted check. Alternatives
                # MEASURED on the 3-seed chip protocol (round 4): a
                # patience streak (reinit only after 3 corrupted checks)
                # and a soft-first policy (forced gravity/acc-bias
                # refinement, escalate to reinit) both came out WORSE on
                # both metrics — refinement chains computed from corrupted
                # window states are themselves corrupted, and delayed
                # reinit just accrues drift before paying the same
                # transient. Immediate: |ba| {0.16, 0.21, 0.06} vs
                # no-recovery {0.73, 1.21, 1.41}; ATE worst 6.4 % vs 8.2.
                self._corrupt_streak = (
                    self._corrupt_streak + 1 if corrupted else 0
                )
                if not corrupted:
                    self._warm_streak = 0
                if (self.reinit_on_bias_corruption
                        and self._corrupt_streak >= self.reinit_patience):
                    # the reference detects this and leaves the transition
                    # commented out (`visual-inertial-slam.cpp:53-57`)
                    self._corrupt_streak = 0
                    if (self.warm_recovery
                            and len(self._kf_hist) < self.gravity_refine_min):
                        # Init-transient deferral (round-5 measurement):
                        # the detector routinely fires within the first
                        # seconds while the near-degenerate (tilt, ba)
                        # pair settles; a cold reinit here rebuilds init
                        # from the SAME information and measured 6.4-8.8 %
                        # ATE vs 0.9-1.3 % for inaction (rec_matrix, CPU
                        # x64, euroc seeds 0/2 + kitti seed 0). Defer
                        # until the keyframe chain can support the
                        # continuity-preserving warm solve.
                        if self.verbose:
                            print("[slam] bias corrupted (init transient;"
                                  " recovery deferred)")
                    elif self.warm_recovery:
                        # warm-first: continuity-preserving re-solve. A
                        # REJECTED warm solve (implausible, or it would
                        # grow |ba|) defers — inaction measured 0.9-1.3 %
                        # ATE vs 6.4-8.8 % for the cold reinit on every
                        # stress seed. Cold only after warm_recovery_max
                        # ACCEPTED warm passes still fail to clear the
                        # detector (persistent corruption warm cannot fix).
                        if self._warm_streak >= self.warm_recovery_max:
                            if self.verbose:
                                print("[slam] bias corrupted ->"
                                      " reinitializing")
                            self._warm_streak = 0
                            self._reinitialize()
                            return True
                        if self._warm_recover():
                            self._warm_streak += 1
                        elif self.verbose:
                            print("[slam] warm recovery deferred")
                    else:
                        if self.verbose:
                            print("[slam] bias corrupted -> reinitializing")
                        self._reinitialize()
                        return True
                if (
                    self.gravity_refine_window
                    and len(self._kf_hist) >= self.gravity_refine_min
                    and self._kfs_since_refine >= self.gravity_refine_every
                ):
                    self._refine_gravity()
            return True

        return True  # LOST: relocalization is future work (as in reference)

    # ------------------------------------------------------------------ #

    def set_viewer(self, viewer):
        """Attach a live viewer (live_viewer.LiveViewer or anything with
        its push API) — analog of `VisualInertialSLAM::setViewer`."""
        self._viewer = viewer

    def _push_viewer(self, metrics):
        """Feed the live viewer (host syncs; the viewer is opt-in)."""
        v = self._viewer
        win = self.vio.win
        w = win.p.shape[0] - 1
        if bool(metrics["is_keyframe"]):
            v.push_keyframe()
        p_host = np.asarray(win.p)
        for i in range(w):
            v.push_position(p_host[1 + i], i)
        if "p_pred" in metrics:
            v.push_raw_position(np.asarray(metrics["p_pred"]), w - 1)
        v.push_pose(np.asarray(win.R[-1]), p_host[-1])
        if self._frame_count % self.viewer_landmark_every == 0:
            pool = self.vio.pool
            v.push_landmark(np.asarray(pool.pos), np.asarray(pool.valid))

    def _push_sfm(self, r: np.ndarray, p: np.ndarray):
        """`Map::pushSfm` (`src/map.cpp:53-70`) on host-side SfM chains."""
        if not self._sfm_R:
            self._sfm_R.append(np.eye(3))
            self._sfm_p.append(np.zeros(3))
        t_c1c2_R = np.asarray(lie.so3_exp(jnp.asarray(r)))
        r_bc = np.asarray(self.consts.r_bc, np.float64)
        p_bc = np.asarray(self.consts.p_bc, np.float64)
        r_cb, p_cb = r_bc.T, -r_bc.T @ p_bc
        # T_WB2 = T_WB1 * T_BC * T_C1C2 * T_CB
        R1w, p1w = self._sfm_R[-1], self._sfm_p[-1]
        Ra = R1w @ r_bc
        pa = R1w @ p_bc + p1w
        Rb = Ra @ t_c1c2_R
        pb = Ra @ p + pa
        Rc = Rb @ r_cb
        pc = Rb @ p_cb + pb
        self._sfm_R.append(Rc)
        self._sfm_p.append(pc)
        ic = self._finalize(self.vio.preint, self.vio.bg, self.vio.ba)
        self._sfm_ics.append(ic)

    def _initialize(self, img_l, img_r, img_ts):
        """The 4-stage initializer (`visual-inertial-slam.cpp:68-110`)."""
        w = self.cfg.window_size
        R = jnp.asarray(np.stack(self._sfm_R), self._dtype)
        p = jnp.asarray(np.stack(self._sfm_p), self._dtype)
        v = jnp.zeros((w, 3), self._dtype)
        ics = jax.tree.map(lambda *a: jnp.stack(a), *self._sfm_ics)

        # all 4 init solves + repropagations + world alignment in ONE
        # jitted dispatch (init_solvers.full_init; the eager chain cost
        # 2-5 s per (re)initialization on the tunneled chip)
        R, v, p, dbg, dba, g_est, ics = self._full_init_jit(R, p, ics)
        new_bg = self.vio.bg + dbg
        new_ba = self.vio.ba + dba
        # plausibility gates: a degenerate SfM chain produces unphysical
        # gravity/velocities; retry the bootstrap rather than enter OK with
        # a poisoned state (the reference has no such guard)
        g_norm = float(jnp.linalg.norm(g_est))
        v_max = float(jnp.max(jnp.linalg.norm(v, axis=-1)))
        if not (
            0.5 * self.cfg.gravity_magnitude < g_norm < 2.0 * self.cfg.gravity_magnitude
            and v_max < self.max_init_velocity
            and np.isfinite(g_norm)
        ):
            if self.verbose:
                print(f"[slam] init rejected (|g|={g_norm:.2f}, vmax={v_max:.2f}); retrying SFM")
            self._relocalize(img_l, img_r)
            return
        if self.verbose:
            print(f"[slam] init: bg={np.asarray(new_bg)} ba={np.asarray(new_ba)}")
            print(f"[slam] init: gravity(initial frame)={np.asarray(g_est)}")

        # Map::reset(0): keep the last two SfM frames as the new window seed
        win = self.vio.win
        win = win._replace(
            R=win.R.at[-2].set(R[w - 2]).at[-1].set(R[w - 1]),
            v=win.v.at[-2].set(v[w - 2]).at[-1].set(v[w - 1]),
            p=win.p.at[-2].set(p[w - 2]).at[-1].set(p[w - 1]),
            dbg=jnp.zeros_like(win.dbg),
            dba=jnp.zeros_like(win.dba),
            ics=jax.tree.map(
                lambda a, s: a.at[-1].set(s[w - 2]), win.ics, ics
            ),
            n_act=jnp.asarray(1, jnp.int32),
            is_keyframe=jnp.asarray(True),
            sum_imu_time=jnp.zeros((), self._dtype),
            # a (re)initialization invalidates any carried marginalization
            # prior (new world frame / fresh bias references)
            prior_h=jnp.zeros_like(win.prior_h),
            prior_on=jnp.asarray(False),
        )
        self.vio = self.vio._replace(
            win=win, preint=pre.init_state(self._dtype), bg=new_bg, ba=new_ba
        )
        # initial stereo matching + pool seed
        self.vio, n_stereo = self._bootstrap(
            self.vio, img_l, img_r, self._next_key()
        )
        self._record(img_ts)
        self.state = State.OK
        if self.verbose:
            print(f"[slam] initialized; {int(n_stereo)} stereo features; OK")

    def _relocalize(self, img_l, img_r):
        """Tracking-loss recovery: restart the visual bootstrap (SFM ->
        INITIALIZING) from the current frame, keeping the estimated biases.
        The world frame re-anchors at the current pose (windowed VIO has no
        global map to relocalize against — same limitation as the reference)."""
        self.state = State.SFM
        self._sfm_count = 0
        self._sfm_R = []
        self._sfm_p = []
        self._sfm_ics = []
        self._low_track_streak = 0
        self._pending_health = []
        self._corrupt_streak = 0
        self._kf_hist = []
        self._kfs_since_refine = 0
        self._ref_feats = self._seed_ref(img_l)
        keep_bg, keep_ba = self.vio.bg, self.vio.ba
        self.vio = vio_mod.init_vio_state(self.static)
        self.vio = self.vio._replace(
            bg=keep_bg, ba=keep_ba, preint=pre.init_state(self._dtype)
        )

    def _refresh_kf_hist(self):
        """Re-snapshot the keyframe-history entries still inside the sliding
        window from the CURRENT optimized window states.

        Commit-time snapshots go stale as motion BA keeps refining the
        frames that remain in the window (measured: stale snapshots were
        what made long gravity-refinement chains WORSE — NOTES round 3).
        Refreshing at every health-check means each entry leaves the window
        carrying its final optimized pose/velocity instead of its
        commit-time one. The preintegration constraint (entry [3]) is a
        measurement, not state, and stays as stored."""
        win = self.vio.win
        length = win.R.shape[0]
        # newest history entry sits at slot -1 until the next frame shifts
        # the window (then -2); see _last_was_kf
        off = 1 if self._last_was_kf else 2
        n_act = int(win.n_act)
        for m in range(1, len(self._kf_hist) + 1):
            slot = length - off - (m - 1)
            if slot < max(length - 1 - n_act, 0):
                break  # left the active window — entry is final
            r_, p_, v_, ic_ = self._kf_hist[-m]
            self._kf_hist[-m] = (win.R[slot], win.p[slot], win.v[slot], ic_)

    def _refine_gravity(self):
        """Online gravity refinement over the accumulated keyframe chain.

        Re-runs the gravity/alignment/acc-bias solves (the exact init-stage
        machinery, `optimizer.cpp:208-329`) on `gravity_refine_window`
        optimized keyframe states, then applies the small world-alignment
        rotation to ALL live state (window, landmark pool, history) and folds
        the acc-bias correction into the window deltas (it reaches the
        preintegrator at the next keyframe's bias update)."""
        win = self.vio.win
        # two static chain lengths only (full window, or the short `min`
        # chain early on) — each length is a separate jit specialization
        n_hist = (
            self.gravity_refine_window
            if len(self._kf_hist) >= self.gravity_refine_window
            else self.gravity_refine_min
        )
        hist = self._kf_hist[-n_hist:]
        R = jnp.stack([h[0] for h in hist])
        p = jnp.stack([h[1] for h in hist])
        ics = jax.tree.map(lambda *a: jnp.stack(a), *[h[3] for h in hist[1:]])
        # repropagate each constraint to the current bias estimate
        bg_now = win.ics.bg_i[-1] + win.dbg[-1]
        ba_now = win.ics.ba_i[-1] + win.dba[-1]
        ics = jax.vmap(pre.repropagate)(
            ics, bg_now[None] - ics.bg_i, ba_now[None] - ics.ba_i
        )
        g_est, delta_r, dba = self._refine_jit(R, p, ics)
        g_norm = float(jnp.linalg.norm(g_est))
        angle = float(jnp.linalg.norm(delta_r))
        dba_n = float(jnp.linalg.norm(dba))
        self._kfs_since_refine = 0
        # physical-bound gate: a routine refinement whose resulting TOTAL
        # acc bias exceeds maxAccBias is by definition wrong (the detector
        # bound, reference map.cpp:211-213) — chip f32 runs showed the
        # sigma-regularized solve occasionally accepting an ~11 deg tilt
        # with |dba| 1.9 on a chaotic chain, poisoning the run (round 5,
        # seed 1: ATE 1.2 -> 6.2 %)
        ba_after = float(np.linalg.norm(np.asarray(ba_now + dba)))
        ok = (
            np.isfinite(g_norm) and np.isfinite(angle) and np.isfinite(dba_n)
            and 0.8 * self.cfg.gravity_magnitude < g_norm
            < 1.2 * self.cfg.gravity_magnitude
            and angle < self.max_refine_angle
            and dba_n < self.max_refine_dba
            and ba_after < self.cfg.max_acc_bias
        )
        if not ok:
            if self.verbose:
                print(f"[slam] gravity refine rejected (|g|={g_norm:.2f}, "
                      f"angle={angle:.3f}, |dba|={dba_n:.3f})")
            return
        if self.verbose:
            print(f"[slam] gravity refine: angle={angle*57.3:.2f} deg, "
                  f"dba={np.asarray(dba)}")
        self._apply_alignment(lie.so3_exp(delta_r), dba)

    def _apply_alignment(self, d_rm, dba):
        """Apply a world-alignment rotation + acc-bias correction to ALL
        live state (window, pool, prior, keyframe history) — continuity-
        preserving; shared by the routine gravity refinement and the warm
        bias-corruption recovery."""
        win = self.vio.win
        pool = self.vio.pool
        # keep the marginalization prior consistent with the rotated world:
        # dr/dp/bias local coords are world-rotation-invariant, dv is a
        # WORLD vector (rotate its 3x3 info blocks); the lin states rotate
        # with the state, and lin_ba absorbs the bias correction so the
        # prior does not fight the refinement it just accepted.
        wsize = win.R.shape[0] - 1
        t = np.eye(15 * wsize, dtype=np.asarray(d_rm).dtype)
        dr_np = np.asarray(d_rm)
        for k in range(wsize):
            o = 6 * wsize + 9 * k
            t[o : o + 3, o : o + 3] = dr_np
        t = jnp.asarray(t)
        self.vio = self.vio._replace(
            win=win._replace(
                R=d_rm[None] @ win.R,
                v=win.v @ d_rm.T,
                p=win.p @ d_rm.T,
                dba=win.dba + dba[None],
                prior_h=t @ win.prior_h @ t.T,
                lin_R=d_rm[None] @ win.lin_R,
                lin_p=win.lin_p @ d_rm.T,
                lin_v=win.lin_v @ d_rm.T,
                lin_ba=win.lin_ba + dba[None],
            ),
            pool=pool._replace(pos=pool.pos @ d_rm.T),
        )
        # keep the history consistent with the rotated world
        self._kf_hist = [
            (d_rm @ h[0], d_rm @ h[1], d_rm @ h[2], h[3]) for h in self._kf_hist
        ]

    def _warm_recover(self) -> bool:
        """Warm bias-corruption recovery (keeps the landmark pool, the
        window, and tracking continuity): re-solve the gravity tilt + acc
        bias over the keyframe-history chain using the refinement solver
        with its small-correction regularizers OPENED UP (`_recover_jit`)
        and apply via `_apply_alignment`. Unlike `_reinitialize`, nothing
        is discarded and the world is not re-anchored, so a successful
        recovery costs no tracking transient. Returns False (caller
        escalates to the cold reinit) when the keyframe chain is too short
        or the solve is implausible."""
        if len(self._kf_hist) < self.gravity_refine_min:
            return False
        win = self.vio.win
        n_hist = (
            self.gravity_refine_window
            if len(self._kf_hist) >= self.gravity_refine_window
            else self.gravity_refine_min
        )
        hist = self._kf_hist[-n_hist:]
        R = jnp.stack([h[0] for h in hist])
        p = jnp.stack([h[1] for h in hist])
        ics = jax.tree.map(lambda *a: jnp.stack(a), *[h[3] for h in hist[1:]])
        bg_now = win.ics.bg_i[-1] + win.dbg[-1]
        ba_now = win.ics.ba_i[-1] + win.dba[-1]
        ics = jax.vmap(pre.repropagate)(
            ics, bg_now[None] - ics.bg_i, ba_now[None] - ics.ba_i
        )
        g_est, delta_r, dba = self._recover_jit(R, p, ics)
        g_norm = float(jnp.linalg.norm(g_est))
        angle = float(jnp.linalg.norm(delta_r))
        dba_n = float(jnp.linalg.norm(dba))
        gm = self.cfg.gravity_magnitude
        # the recovery must REDUCE the quantity whose bound tripped: a
        # correction that grows |ba| is the solve chasing state error, not
        # bias (measured: accepting it cost ATE 1.2 -> 3.3 % and |ba|
        # 1.17 -> 1.59 on the euroc stress seed)
        ba_new = float(np.linalg.norm(np.asarray(ba_now + dba)))
        ba_old = float(np.linalg.norm(np.asarray(ba_now)))
        ok = (
            np.isfinite(g_norm) and np.isfinite(angle) and np.isfinite(dba_n)
            and 0.7 * gm < g_norm < 1.4 * gm
            and angle < self.max_recover_angle and dba_n < self.max_recover_dba
            and ba_new < ba_old
        )
        if not ok:
            if self.verbose:
                print(f"[slam] warm recovery rejected (|g|={g_norm:.2f}, "
                      f"angle={angle:.3f}, |dba|={dba_n:.3f})")
            return False
        if self.verbose:
            print(f"[slam] warm recovery: angle={angle * 57.3:.2f} deg, "
                  f"dba={np.asarray(dba)}")
        self._apply_alignment(lie.so3_exp(delta_r), dba)
        self._kfs_since_refine = 0
        return True

    def _reinitialize(self):
        """Bias-corruption recovery: rerun the init solvers on the current
        window (the re-init path the reference leaves disabled)."""
        w = self.cfg.window_size
        self._sfm_R = [np.asarray(self.vio.win.R[i]) for i in range(1, w + 1)]
        self._sfm_p = [np.asarray(self.vio.win.p[i]) for i in range(1, w + 1)]
        self._sfm_ics = [
            jax.tree.map(lambda a: a[i], self.vio.win.ics) for i in range(1, w)
        ]
        self.vio = self.vio._replace(
            bg=jnp.zeros(3, self._dtype), ba=jnp.zeros(3, self._dtype),
            preint=pre.init_state(self._dtype),
        )
        self._kf_hist = []
        self._kfs_since_refine = 0
        self.state = State.INITIALIZING

    # ------------------------------------------------------------------ #

    def _record(self, img_ts: int, metrics: dict | None = None):
        # device arrays are stored WITHOUT forcing a host sync (conversion is
        # deferred to save_results / trajectory) so the dispatch pipeline
        # stays asynchronous. When the fused step already materialized the
        # record bundle in-graph (metrics rec_*), reuse it — per-frame
        # slicing/quaternion dispatch chains here cost ~100 ms/frame on the
        # tunneled chip.
        if metrics is not None and "rec_quat" in metrics:
            self._records.append((
                img_ts, metrics["rec_quat"], metrics["rec_p"],
                metrics["rec_v"], metrics["rec_bg"], metrics["rec_ba"],
            ))
            return
        win = self.vio.win
        self._records.append((
            img_ts,
            lie.mat_to_quat(win.R[-1]),
            win.p[-1],
            win.v[-1],
            win.ics.bg_i[-1] + win.dbg[-1],
            win.ics.ba_i[-1] + win.dba[-1],
        ))

    def save_checkpoint(self, path: str):
        """Persist the device state + FSM position (the reference has no
        checkpointing at all; see pose_estimation_tpu/checkpoint.py)."""
        from pose_estimation_tpu import checkpoint as ckpt

        def ser(tree):
            return [np.asarray(leaf).tolist() for leaf in jax.tree.leaves(tree)]

        ckpt.save_checkpoint(path, self.vio, meta={
            "state": self.state.name,
            "frame_count": self._frame_count,
            "key": [int(v) for v in np.asarray(jax.random.key_data(self._key))],
            # host-side IMU queue (pending samples between frames)
            "imu_ts": list(self._imu_ts),
            "imu_data": [list(map(float, row)) for row in self._imu_data],
            # health/refinement host state (exact-resume parity)
            "low_track_streak": self._low_track_streak,
            "corrupt_streak": self._corrupt_streak,
            "warm_streak": self._warm_streak,
            "kfs_since_refine": self._kfs_since_refine,
            "kf_hist": [ser(h) for h in self._kf_hist],
            "pending_health": [
                [float(n), bool(r), bool(k), ser(s)]
                for n, r, k, s in self._pending_health
            ],
        })

    def load_checkpoint(self, path: str):
        """Resume from a checkpoint written by save_checkpoint."""
        from pose_estimation_tpu import checkpoint as ckpt

        self.vio, meta = ckpt.load_checkpoint(path, self.static)
        self.state = State[meta.get("state", "OK")]
        self._frame_count = int(meta.get("frame_count", 0))
        if "key" in meta:
            self._key = jax.random.wrap_key_data(
                jnp.asarray(meta["key"], jnp.uint32)
            )
        self._imu_ts = [int(t) for t in meta.get("imu_ts", [])]
        self._imu_data = [np.asarray(r, np.float64) for r in meta.get("imu_data", [])]
        self._low_track_streak = int(meta.get("low_track_streak", 0))
        self._corrupt_streak = int(meta.get("corrupt_streak", 0))
        self._warm_streak = int(meta.get("warm_streak", 0))
        self._kfs_since_refine = int(meta.get("kfs_since_refine", 0))

        win = self.vio.win
        template = (
            win.R[-1], win.p[-1], win.v[-1],
            jax.tree.map(lambda a: a[-1], win.ics),
        )
        tdef = jax.tree.structure(template)
        tleaves = jax.tree.leaves(template)

        def deser(leaves_ser):
            return jax.tree.unflatten(tdef, [
                jnp.asarray(v, t.dtype)
                for v, t in zip(leaves_ser, tleaves)
            ])

        self._kf_hist = [deser(h) for h in meta.get("kf_hist", [])]
        self._pending_health = [
            (jnp.asarray(n), jnp.asarray(r), jnp.asarray(k), deser(s))
            for n, r, k, s in meta.get("pending_health", [])
        ]

    def save_results(self, path: str = "states.csv"):
        """CSV dump byte-compatible with the reference
        (`visual-inertial-slam.cpp:175-204`)."""
        with open(path, "w") as f:
            f.write("timestamp,qw,qx,qy,qz,px,py,pz,vx,vy,vz,bgx,bgy,bgz,bax,bay,baz\n")
            for ts, q, p, v, bg, ba in self._records:
                row = (
                    [ts] + list(np.asarray(q)) + list(np.asarray(p))
                    + list(np.asarray(v)) + list(np.asarray(bg))
                    + list(np.asarray(ba))
                )
                f.write(",".join(str(x) for x in row) + "\n")

    @property
    def trajectory(self) -> np.ndarray:
        """[N, 4] array of (ts, px, py, pz)."""
        if not self._records:
            return np.zeros((0, 4))
        return np.array([
            [ts, *np.asarray(p)] for ts, q, p, v, bg, ba in self._records
        ])
