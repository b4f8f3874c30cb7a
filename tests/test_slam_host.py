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
