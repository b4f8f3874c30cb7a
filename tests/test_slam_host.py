"""Host-side FSM logic: IMU queue synchronization + chunking edge cases
(mirrors `imu-preintegrator.cpp:172-243`'s queue handling)."""

import numpy as np
import pytest

from sim import sim_config

from pose_estimation_tpu.slam import SensorType, State, VisualInertialSLAM


@pytest.fixture(scope="module")
def slam():
    return VisualInertialSLAM(sim_config(), verbose=False)


def feed(s, ts_list):
    for ts in ts_list:
        s.collect_imu_data(SensorType.GYROSCOPE, ts, 0.01, 0.02, 0.03)
        s.collect_imu_data(SensorType.ACCELEROMETER, ts, 9.8, 0.0, 0.0)


class TestIngestion:
    def test_pairing(self, slam):
        slam._imu_ts.clear()
        slam._imu_data.clear()
        # gyro without accel doesn't enqueue
        slam.collect_imu_data(SensorType.GYROSCOPE, 1, 0.1, 0.2, 0.3)
        assert len(slam._imu_ts) == 0
        slam.collect_imu_data(SensorType.ACCELEROMETER, 1, 1, 2, 3)
        assert len(slam._imu_ts) == 1
        np.testing.assert_allclose(slam._imu_data[0], [0.1, 0.2, 0.3, 1, 2, 3])

    def test_synchronize_drops_stale(self, slam):
        slam._imu_ts.clear()
        slam._imu_data.clear()
        dt_ns = 5_000_000
        feed(slam, [k * dt_ns for k in range(10)])
        # image at sample 5: older samples dropped, sample 5 kept
        assert slam._synchronize(5 * dt_ns)
        assert slam._imu_ts[0] == 5 * dt_ns

    def test_synchronize_image_before_imu(self, slam):
        slam._imu_ts.clear()
        slam._imu_data.clear()
        feed(slam, [1_000_000_000])
        assert not slam._synchronize(0)  # image predates all IMU -> wait

    def test_pop_chunk_spans_interval(self, slam):
        slam._imu_ts.clear()
        slam._imu_data.clear()
        dt_ns = 5_000_000
        feed(slam, [k * dt_ns for k in range(30)])
        gyr, acc, mask = slam._pop_imu_chunk(20 * dt_ns)
        # samples [0, 20) consumed; sample at exactly img_ts stays queued
        assert int(np.asarray(mask).sum()) == 20
        assert slam._imu_ts[0] == 20 * dt_ns
        # next chunk picks up from there
        gyr, acc, mask = slam._pop_imu_chunk(25 * dt_ns)
        assert int(np.asarray(mask).sum()) == 5

    def test_pop_chunk_empty(self, slam):
        slam._imu_ts.clear()
        slam._imu_data.clear()
        gyr, acc, mask = slam._pop_imu_chunk(123)
        assert not bool(np.asarray(mask).any())

    def test_initial_state(self, slam):
        assert slam.state in (State.SYNCHRONIZING, State.SFM, State.OK)


class TestImuOverflow:
    def test_overflow_splits_into_chunks(self, slam):
        """More than imu_chunk queued samples must ALL be consumed (the
        reference integrates every queued sample, `imu-preintegrator.cpp:
        196-233`) — overflow splits into extra chunks, none dropped."""
        slam._imu_ts.clear()
        slam._imu_data.clear()
        m = slam.cfg.imu_chunk
        dt_ns = 5_000_000
        n = 3 * m + 5
        feed(slam, [k * dt_ns for k in range(n + 1)])
        chunks = slam._pop_imu_chunks(n * dt_ns)
        assert len(chunks) == 4
        total = sum(int(np.asarray(msk).sum()) for _, _, msk in chunks)
        assert total == n
        # remaining queue holds only the boundary sample
        assert len(slam._imu_ts) == 1

    def test_overflow_matches_sequential_preintegration(self, slam):
        """Chunked integration over 3x+ chunk == one sequential oracle pass
        over the same samples."""
        import jax.numpy as jnp

        from pose_estimation_tpu.imu import preintegration as pre

        m = slam.cfg.imu_chunk
        n = 3 * m + 7
        rng = np.random.default_rng(11)
        gyr = rng.normal(0, 0.2, (n, 3)).astype(np.float32)
        acc = (rng.normal(0, 0.5, (n, 3)) + [0, 0, 9.81]).astype(np.float32)
        bg = jnp.asarray([0.01, -0.02, 0.005], jnp.float32)
        ba = jnp.asarray([0.1, 0.05, -0.08], jnp.float32)
        params = slam.consts.imu

        # oracle: one sequential pass over all n samples
        ref = pre.integrate_chunk_sequential(
            pre.init_state(), jnp.asarray(gyr), jnp.asarray(acc),
            jnp.ones(n, bool), bg, ba, params,
        )

        # chunked path exactly as _pop_imu_chunk drives it
        st = pre.init_state()
        for lo in range(0, n, m):
            g = np.zeros((m, 3), np.float32)
            a = np.zeros((m, 3), np.float32)
            msk = np.zeros(m, bool)
            k = min(m, n - lo)
            g[:k], a[:k], msk[:k] = gyr[lo:lo + k], acc[lo:lo + k], True
            st = pre.integrate_chunk(
                st, jnp.asarray(g), jnp.asarray(a), jnp.asarray(msk),
                bg, ba, params,
            )
        np.testing.assert_allclose(np.asarray(st.dR), np.asarray(ref.dR), atol=2e-5)
        np.testing.assert_allclose(np.asarray(st.dv), np.asarray(ref.dv), atol=2e-4)
        np.testing.assert_allclose(np.asarray(st.dp), np.asarray(ref.dp), atol=2e-4)
        np.testing.assert_allclose(
            np.asarray(st.cov9), np.asarray(ref.cov9), rtol=2e-3, atol=1e-10)
        assert abs(float(st.dt) - float(ref.dt)) < 1e-5
