"""OD4/libcluon wire-format adapter: codec roundtrip + live UDP ingestion.

The encoder here doubles as the synthesizer the reference would need a real
car (or cluon binaries) for: packets are sent over loopback UDP and must
arrive in `collect_imu_data` exactly like the cluon dataTrigger path
(`/root/reference/src/cfsd-state-estimation.cpp:50-95`).
"""

import time

import numpy as np
import pytest

from pose_estimation_tpu.io import od4 as od4_mod


class TestCodec:
    def test_envelope_roundtrip(self):
        payload = od4_mod.encode_reading(0.25, -3.5, 9.81)
        env = od4_mod.Envelope(
            data_type=od4_mod.ANGULAR_VELOCITY_READING,
            serialized_data=payload,
            sample_seconds=1703155200,
            sample_micros=250_000,
            sender_stamp=112,
        )
        wire = od4_mod.encode_envelope(env)
        # OD4 framing: 0x0D 0xA4 + 3-byte little-endian length
        assert wire[0] == 0x0D and wire[1] == 0xA4
        n = wire[2] | (wire[3] << 8) | (wire[4] << 16)
        assert n == len(wire) - 5
        back = od4_mod.decode_envelope(wire)
        assert back.data_type == env.data_type
        assert back.sender_stamp == 112
        assert back.sample_ns == 1703155200 * 10**9 + 250_000 * 1000
        x, y, z = od4_mod.decode_reading(back.serialized_data)
        np.testing.assert_allclose([x, y, z], [0.25, -3.5, 9.81], rtol=1e-6)

    def test_negative_and_zero_fields(self):
        env = od4_mod.Envelope(
            data_type=od4_mod.ACCELERATION_READING,
            serialized_data=od4_mod.encode_reading(-0.0, 0.0, -9.81),
            sample_seconds=0, sample_micros=0, sender_stamp=0,
        )
        back = od4_mod.decode_envelope(od4_mod.encode_envelope(env))
        assert back.data_type == od4_mod.ACCELERATION_READING
        assert back.sample_ns == 0
        assert od4_mod.decode_reading(back.serialized_data)[2] == pytest.approx(-9.81)

    def test_garbage_rejected(self):
        assert od4_mod.decode_envelope(b"") is None
        assert od4_mod.decode_envelope(b"\x00" * 16) is None
        assert od4_mod.decode_envelope(b"\x0d\xa4\xff\xff\xff") is None


class _SlamStub:
    def __init__(self):
        self.rows = []

    def collect_imu_data(self, sensor, ts, x, y, z):
        self.rows.append((sensor, ts, x, y, z))


class TestLiveSession:
    def test_udp_ingestion_into_collect_imu_data(self):
        """Synthesized packets on loopback arrive as gyro/acc rows, with the
        reference's ellipseID sender filtering."""
        from pose_estimation_tpu.slam import SensorType

        session = od4_mod.OD4Session(cid=111, port=22175)
        slam = _SlamStub()
        od4_mod.attach_imu(session, slam, ellipse_id=112)
        try:
            for i in range(5):
                ts = 10_000 + i
                gyr = od4_mod.Envelope(
                    od4_mod.ANGULAR_VELOCITY_READING,
                    od4_mod.encode_reading(0.1 * i, 0.2, 0.3),
                    ts, 0, 112,
                )
                acc = od4_mod.Envelope(
                    od4_mod.ACCELERATION_READING,
                    od4_mod.encode_reading(9.81, 0.1 * i, 0.0),
                    ts, 0, 112,
                )
                # a foreign sender that must be filtered out (ellipseID gate)
                alien = od4_mod.Envelope(
                    od4_mod.ACCELERATION_READING,
                    od4_mod.encode_reading(999.0, 999.0, 999.0),
                    ts, 0, 999,
                )
                for env in (gyr, acc, alien):
                    session.send(env, addr="127.0.0.1", port=22175)
            deadline = time.time() + 5.0
            while len(slam.rows) < 10 and time.time() < deadline:
                time.sleep(0.05)
        finally:
            session.stop()

        assert len(slam.rows) == 10, slam.rows
        gyr_rows = [r for r in slam.rows if r[0] == SensorType.GYROSCOPE]
        acc_rows = [r for r in slam.rows if r[0] == SensorType.ACCELEROMETER]
        assert len(gyr_rows) == 5 and len(acc_rows) == 5
        assert all(abs(r[2]) < 100 for r in slam.rows)  # alien filtered
        np.testing.assert_allclose(acc_rows[0][2], 9.81, rtol=1e-6)
        assert gyr_rows[0][1] == 10_000 * 10**9
