"""Synthetic stereo-inertial world: the end-to-end oracle.

Renders a landmark field into a pinhole stereo rig moving along an analytic
trajectory and synthesizes consistent IMU measurements — the replacement for
real EuRoC data in CI (none is downloadable in this environment). Each
landmark is splatted as a distinctive random 9x9 patch so FAST finds it and
descriptors can tell landmarks apart.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from pose_estimation_tpu.utils.config import VIOConfig

G = 9.81


def sim_config(width=320, height=240, **overrides) -> VIOConfig:
    fx = 260.0
    k = np.array([[fx, 0, width / 2], [0, fx, height / 2], [0, 0, 1.0]])
    zero_d = np.zeros(5)
    base = dict(
        dataset="euroc",
        dataset_path="",
        image_width=width,
        image_height=height,
        camera_frequency=10,
        std_x=1.0,
        std_y=1.0,
        k_left=k,
        dist_left=zero_d,
        k_right=k.copy(),
        dist_right=zero_d,
        r_lr=np.eye(3),
        t_lr=np.array([-0.11, 0.0, 0.0]),
        # body axes: x fwd, z up-ish; camera: z fwd -> R_cb maps body->cam
        r_cb=np.array([[0.0, -1.0, 0.0], [0.0, 0.0, -1.0], [1.0, 0.0, 0.0]]),
        t_cb=np.array([0.0, 0.0, 0.0]),
        sampling_rate=200,
        gyr_noise=1.7e-4,
        acc_noise=2.0e-3,
        gyr_walk=1.9e-5,
        acc_walk=3.0e-3,
        gravity_magnitude=G,
        num_features=600,
        scale_factor=1.2,
        level_pyramid=4,
        ini_th_fast=20,
        min_th_fast=7,
        match_ratio=3.0,
        min_match_dist=40.0,
        max_vertical_pixel_dist=2.0,
        max_feature_age=8,
        max_depth=12.0,
        keyframe_rotation=0.05,
        keyframe_translation=0.05,
        max_imu_time=4.0,
        max_gyr_bias=0.1,
        max_acc_bias=0.6,
        sfm_rotation=0.0,
        sfm_translation=0.0,
        solve_pnp=0,
        max_num_iterations=15,
        prior_factor=1e-5,
        speed_up=1,
        max_keypoints=512,
        max_matches=256,
        pool_capacity=1024,
        imu_chunk=32,
    )
    base.update(overrides)
    return VIOConfig(**base)


@dataclasses.dataclass
class Trajectory:
    """Analytic trajectory in the EuRoC world convention (gravity -x).

    Two families (CHIP_ACCURACY protocol — family A is the historical 6-s
    meander; family B has different harmonic content and BOUNDED yaw, so it
    stays valid on 12-20 s horizons where A's 0.08t yaw drift would turn
    the camera away from the landmark hall)."""

    family: str = "A"

    def pos(self, t):
        if self.family == "B":
            return np.array([
                0.12 * np.sin(0.8 * t + 1.0),
                0.8 * t,
                0.45 * np.cos(0.55 * t) - 0.45,
            ])
        # gentle 3D meander; body x points along gravity axis (-x world is
        # "down"), motion mostly in the y-z plane
        return np.array([
            0.15 * np.sin(0.9 * t),
            0.8 * t,
            0.5 * np.sin(0.7 * t),
        ])

    def rot(self, t):
        """Body-to-world rotation: slow yaw/pitch wobbles around identity."""
        from scipy.spatial.transform import Rotation as R

        if self.family == "B":
            rv = np.array([
                0.10 * np.sin(0.6 * t),
                0.12 * np.sin(0.45 * t + 0.5),
                0.25 * np.sin(0.3 * t),
            ])
        else:
            rv = np.array([
                0.12 * np.sin(0.5 * t), 0.10 * np.sin(0.8 * t), 0.08 * t
            ])
        return R.from_rotvec(rv).as_matrix()


def set_family(sim: "StereoInertialSim", family: str) -> None:
    """Switch a sim's trajectory family in place (landmark field is shared)."""
    sim.traj = Trajectory(family=family)


class StereoInertialSim:
    def __init__(self, cfg: VIOConfig, n_landmarks=400, seed=0,
                 y_max: float = 11.0):
        self.cfg = cfg
        self.rng = np.random.default_rng(seed)
        self.traj = Trajectory()
        # world gravity on the DATASET PROFILE's axis (euroc -x, kitti -z,
        # cfsd +z — reference `map.cpp:40-50`), so the same world exercises
        # each profile's alignment axes and noise-unit conversions e2e
        self.g_w = G * np.asarray(cfg.profile.gravity_dir, np.float64)
        # landmark field in front of the body's +x (the camera optical axis:
        # r_cb maps body x -> cam z) over the whole run. y_max must cover
        # the trajectory's y extent (~0.8 m/s * duration + margin) or the
        # camera runs out of landmarks and tracking is LOST (by design —
        # the default covers the standard 6 s run).
        self.lm = np.stack([
            self.rng.uniform(2.5, 11.0, n_landmarks),
            self.rng.uniform(-3.0, y_max, n_landmarks),
            self.rng.uniform(-4.0, 4.0, n_landmarks),
        ], axis=1)
        # distinctive patch per landmark
        self.patches = self.rng.uniform(60, 255, size=(n_landmarks, 9, 9))
        self.intens = self.rng.uniform(120, 255, n_landmarks)

    # ---- IMU (central finite differences on the analytic trajectory) ----
    def imu_at(self, t, dt=1e-4):
        from scipy.spatial.transform import Rotation as SR

        r0 = self.traj.rot(t)
        r1 = self.traj.rot(t + dt)
        w_hat = SR.from_matrix(r0.T @ r1).as_rotvec() / dt
        a_w = (
            self.traj.pos(t + dt) - 2 * self.traj.pos(t) + self.traj.pos(t - dt)
        ) / dt**2
        f_body = r0.T @ (a_w - self.g_w)
        return w_hat, f_body

    def vel_at(self, t, dt=1e-4):
        return (self.traj.pos(t + dt) - self.traj.pos(t - dt)) / (2 * dt)

    # ---- rendering ----
    def render(self, t):
        cfg = self.cfg
        w, h = cfg.image_width, cfg.image_height
        R_wb = self.traj.rot(t)
        p_wb = self.traj.pos(t)
        r_cb = cfg.r_cb
        imgs = []
        for cam in (0, 1):
            img = np.full((h, w), 20.0, np.float32)
            x_body = (R_wb.T @ (self.lm - p_wb).T).T
            x_cam = (r_cb @ x_body.T).T
            if cam == 1:
                # x_right = R_lr x_left + t_lr
                x_cam = x_cam + self.cfg.t_lr
            z = x_cam[:, 2]
            vis = z > 0.5
            u = cfg.k_left[0, 0] * x_cam[:, 0] / np.maximum(z, 0.1) + cfg.k_left[0, 2]
            v = cfg.k_left[1, 1] * x_cam[:, 1] / np.maximum(z, 0.1) + cfg.k_left[1, 2]
            # subpixel bilinear splat: the patch texture moves smoothly with
            # (u, v), so keypoints/descriptors track it across frames
            for i in np.where(vis)[0]:
                u0, v0 = u[i], v[i]
                ui, vi = int(np.floor(u0)), int(np.floor(v0))
                if 7 <= ui < w - 7 and 7 <= vi < h - 7:
                    fx_, fy_ = u0 - ui, v0 - vi
                    pa = self.patches[i]
                    big = np.zeros((11, 11), np.float32)
                    big[1:10, 1:10] = pa
                    shifted = (
                        big[1:11, 1:11] * (1 - fx_) * (1 - fy_)
                        + big[1:11, 0:10] * fx_ * (1 - fy_)
                        + big[0:10, 1:11] * (1 - fx_) * fy_
                        + big[0:10, 0:10] * fx_ * fy_
                    )
                    img[vi - 4 : vi + 6, ui - 4 : ui + 6] = np.maximum(
                        img[vi - 4 : vi + 6, ui - 4 : ui + 6], shifted
                    )
            imgs.append(img)
        return imgs[0], imgs[1]

    # ---- full replay ----
    def run(self, slam, duration=6.0, frame_hz=10, imu_noise=0.0, seed=1):
        """Feed the SLAM object; returns ground-truth trajectory [N,4]."""
        from pose_estimation_tpu.slam import SensorType

        nrng = np.random.default_rng(seed)
        dt_imu = 1.0 / self.cfg.sampling_rate
        n_imu = int(duration / dt_imu)
        frame_every = self.cfg.sampling_rate // frame_hz
        gt = []
        for k in range(n_imu):
            t = k * dt_imu
            ts = int(t * 1e9)
            w_b, f_b = self.imu_at(t)
            if imu_noise:
                w_b = w_b + nrng.normal(0, imu_noise, 3)
                f_b = f_b + nrng.normal(0, imu_noise * 10, 3)
            slam.collect_imu_data(SensorType.GYROSCOPE, ts, *w_b)
            slam.collect_imu_data(SensorType.ACCELEROMETER, ts, *f_b)
            if k % frame_every == 0:
                img_l, img_r = self.render(t)
                slam.process(img_l, img_r, ts)
                gt.append([ts, *self.traj.pos(t)])
        return np.array(gt)


def sim_world(cfg: VIOConfig, n_frames: int, frame_hz: float | None = None,
              imu_noise: float = 2.4e-3, n_landmarks: int = 400, seed: int = 0,
              t0: float = 0.5):
    """Pre-rendered consistent world: frames + per-frame IMU chunks + true
    start states, for drivers that feed `ok_step` directly (bench.py, the
    multichip dryrun, sharding-equality tests) instead of the host FSM.

    Returns (frames [(l, r) jnp-arrays], gyrs [n][M, 3], accs [n][M, 3],
    imu_mask [M], state0(j) -> (R, p, v) at frame j's predecessor time).
    frame_hz defaults to cfg.camera_frequency; the implied samples-per-frame
    must fit cfg.imu_chunk.
    """
    import jax.numpy as jnp

    sim = StereoInertialSim(cfg, n_landmarks=n_landmarks, seed=seed)
    nrng = np.random.default_rng(seed + 1)
    hz = frame_hz or cfg.camera_frequency
    spf = int(round(cfg.sampling_rate / hz))
    m = cfg.imu_chunk
    assert spf <= m, (spf, m)
    frames, gyrs, accs = [], [], []
    for i in range(n_frames):
        t = t0 + i / hz
        img_l, img_r = sim.render(t)
        frames.append((jnp.asarray(img_l), jnp.asarray(img_r)))
        g = np.zeros((m, 3), np.float32)
        a = np.zeros((m, 3), np.float32)
        for k in range(spf):
            ts = t - (spf - 1 - k) * cfg.dt
            w_b, f_b = sim.imu_at(ts)
            g[k] = w_b + nrng.normal(0, imu_noise, 3)
            a[k] = f_b + nrng.normal(0, imu_noise * 10, 3)
        gyrs.append(jnp.asarray(g))
        accs.append(jnp.asarray(a))
    mask = jnp.arange(m) < spf

    def state0(j):
        t = t0 + (j - 1) / hz
        return sim.traj.rot(t), sim.traj.pos(t), sim.vel_at(t)

    return frames, gyrs, accs, mask, state0


def seeded_state(static, state0, j=0):
    """Fresh VIOState whose window is pinned at frame j's true start pose
    (the bench/dryrun stand-in for the host FSM's SYNC/SFM/INIT phases)."""
    import jax.numpy as jnp

    from pose_estimation_tpu.models import vio as vio_mod

    base = vio_mod.init_vio_state(static)
    r0, p0, v0 = state0(j)
    wlen = base.win.R.shape[0]
    return base._replace(win=base.win._replace(
        R=jnp.asarray(np.broadcast_to(r0, (wlen, 3, 3)), jnp.float32),
        p=jnp.asarray(np.broadcast_to(p0, (wlen, 3)), jnp.float32),
        v=jnp.asarray(np.broadcast_to(v0, (wlen, 3)), jnp.float32),
    ))
