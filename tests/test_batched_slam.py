"""Batched multi-sequence replay: two simulated worlds in lock-step."""

import numpy as np
import pytest

from sim import StereoInertialSim, sim_config

from pose_estimation_tpu.io.ate import ate_rmse
from pose_estimation_tpu.parallel.batched_slam import BatchedReplay
from pose_estimation_tpu.slam import SensorType

pytestmark = pytest.mark.slow  # long jit compiles; excluded from the fast tier


@pytest.mark.slow
def test_two_sequences_lockstep():
    cfg = sim_config(keyframe_rotation=0.1, keyframe_translation=0.15)
    # same world twice: sequences evolve independently (per-sequence RNG)
    # but both must stay on track — this isolates the batching machinery
    # from simulator-world quality (some sim seeds produce low-texture views
    # that collapse tracking even in the scalar pipeline, e.g. seed 3)
    sims = [StereoInertialSim(cfg, n_landmarks=150, seed=0) for _ in range(2)]
    br = BatchedReplay(cfg, n=2)

    boot_t = 1.0  # seconds of per-sequence scalar bootstrap
    dt_imu = 1.0 / cfg.sampling_rate

    def feeder(sim):
        def fn(slam):
            for k in range(int(boot_t / dt_imu)):
                t = k * dt_imu
                ts = int(t * 1e9)
                w_b, f_b = sim.imu_at(t)
                slam.collect_imu_data(SensorType.GYROSCOPE, ts, *w_b)
                slam.collect_imu_data(SensorType.ACCELEROMETER, ts, *f_b)
                if k % 20 == 0:
                    slam.process(*sim.render(t), ts)
        return fn

    br.bootstrap([feeder(s) for s in sims])

    # lock-step batched steady state for 2 more seconds
    gts = [[], []]
    m = cfg.imu_chunk
    for k in range(int(boot_t / dt_imu), int(3.0 / dt_imu)):
        t = k * dt_imu
        if k % 20 != 0:
            continue
        ts = int(t * 1e9)
        imgs_l, imgs_r, gyrs, accs, masks = [], [], [], [], []
        for i, sim in enumerate(sims):
            il, ir = sim.render(t)
            imgs_l.append(il)
            imgs_r.append(ir)
            samples = [sim.imu_at(t - 0.1 + j * dt_imu) for j in range(20)]
            g = np.zeros((m, 3), np.float32)
            a = np.zeros((m, 3), np.float32)
            msk = np.zeros(m, bool)
            g[:20] = [s[0] for s in samples]
            a[:20] = [s[1] for s in samples]
            msk[:20] = True
            gyrs.append(g)
            accs.append(a)
            masks.append(msk)
            gts[i].append([ts, *sims[i].traj.pos(t)])
        br.step(
            np.stack(imgs_l), np.stack(imgs_r),
            np.stack(gyrs), np.stack(accs), np.stack(masks),
            timestamps=[ts, ts],
        )

    for i in range(2):
        gt = np.array(gts[i])
        traj = br.trajectory(i)
        assert len(traj) == len(gt)
        path = np.linalg.norm(np.diff(gt[:, 1:], axis=0), axis=1).sum()
        ate = ate_rmse(traj, gt)
        # lock-step batched replay keeps each sequence on track
        assert ate < 0.25 * path + 0.05, (i, ate, path)
