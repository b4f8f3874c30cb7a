"""Checkpoint/resume through the SLAM object + NaN hygiene of the step."""

import jax
import jax.numpy as jnp
import numpy as np

from sim import StereoInertialSim, sim_config

from pose_estimation_tpu.slam import State, VisualInertialSLAM
import pytest


class TestResume:
    @pytest.mark.slow  # two full replay compiles; fast tier skips
    def test_checkpoint_roundtrip_continues_identically(self, tmp_path):
        cfg = sim_config(keyframe_rotation=0.1, keyframe_translation=0.15)
        sim = StereoInertialSim(cfg, n_landmarks=150, seed=0)
        slam = VisualInertialSLAM(cfg, seed=5, reinit_on_bias_corruption=False)
        sim.run(slam, duration=1.5)
        assert slam.state == State.OK
        path = str(tmp_path / "ck.npz")
        slam.save_checkpoint(path)

        # recovery-policy counters must survive the round trip (exact-
        # resume parity: a resumed run must make the same defer/warm/cold
        # decisions as the uninterrupted one)
        slam._corrupt_streak = 1
        slam._warm_streak = 2
        slam.save_checkpoint(path)

        slam2 = VisualInertialSLAM(cfg, seed=5, reinit_on_bias_corruption=False)
        slam2.load_checkpoint(path)
        assert slam2.state == State.OK
        assert slam2._corrupt_streak == 1 and slam2._warm_streak == 2
        slam._corrupt_streak = 0
        slam._warm_streak = 0
        slam2._corrupt_streak = 0
        slam2._warm_streak = 0
        for a, b in zip(jax.tree.leaves(slam.vio), jax.tree.leaves(slam2.vio)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

        # both continue and stay in lock (same inputs, same RNG stream)
        t = 1.5
        ts = int(t * 1e9)
        il, ir = sim.render(t)
        gyr, acc = sim.imu_at(t)
        from pose_estimation_tpu.slam import SensorType

        for s in (slam, slam2):
            for k in range(20):
                tt = 1.4 + k * cfg.dt
                w_b, f_b = sim.imu_at(tt)
                s.collect_imu_data(SensorType.GYROSCOPE, int(tt * 1e9), *w_b)
                s.collect_imu_data(SensorType.ACCELEROMETER, int(tt * 1e9), *f_b)
            s.process(il, ir, ts)
        np.testing.assert_allclose(
            np.asarray(slam.vio.win.p[-1]), np.asarray(slam2.vio.win.p[-1]),
            atol=1e-5,
        )


class TestNaNHygiene:
    def test_step_produces_no_nans(self):
        """One steady-state step under jax_debug_nans (the CI guard SURVEY
        section 5 calls for)."""
        import functools

        from pose_estimation_tpu.camera import CameraModel
        from pose_estimation_tpu.models import vio as vio_mod
        from pose_estimation_tpu.testing import tiny_config

        cfg = tiny_config()
        cm = CameraModel.from_config(cfg)
        consts, static = vio_mod.build_constants(cfg, cm)
        rng = np.random.default_rng(0)
        h, w = cfg.image_height, cfg.image_width
        m = cfg.imu_chunk
        img = jnp.asarray(rng.uniform(0, 255, (h, w)), jnp.float32)
        gyr = jnp.asarray(rng.normal(size=(m, 3)) * 0.1, jnp.float32)
        acc = jnp.asarray(rng.normal(size=(m, 3)), jnp.float32)
        mask = jnp.arange(m) < 4
        step = jax.jit(
            functools.partial(vio_mod.ok_step, consts=consts, static=static)
        )
        state = vio_mod.init_vio_state(static)
        with jax.debug_nans(True):
            state, metrics = step(
                state, img, img, gyr, acc, mask, jax.random.PRNGKey(0)
            )
            jax.block_until_ready(state)
        assert bool(jnp.all(jnp.isfinite(state.win.p)))
