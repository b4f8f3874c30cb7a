"""Config loader tests on the reference's actual YAML files."""

import numpy as np
import pytest

from pose_estimation_tpu import PROFILES, load_config
from pose_estimation_tpu.utils.config import ConfigError


class TestLoadReferenceConfigs:
    def test_euroc(self):
        cfg = load_config("/root/reference/config/euroc.yml", dataset="euroc")
        assert (cfg.image_width, cfg.image_height) == (752, 480)
        assert cfg.sampling_rate == 200
        np.testing.assert_allclose(cfg.gravity, [-9.81734, 0, 0])
        assert cfg.k_left.shape == (3, 3)
        assert cfg.k_left[0, 0] == 458.654
        # EuRoC noise: density / sqrt(dt); walk unchanged
        gyr_n, acc_n, gyr_w, acc_w = cfg.discrete_noise()
        assert gyr_n == pytest.approx(1.6968e-4 / np.sqrt(1 / 200))
        assert gyr_w == pytest.approx(1.9393e-5)

    def test_kitti_misspelled_keyframe_keys(self):
        """The reference reads keyframeRotation but kitti.yml spells it
        keyframe_rotation -> silently 0 there (SURVEY section 5). We accept
        both spellings and must NOT get 0."""
        cfg = load_config("/root/reference/config/kitti.yml", dataset="kitti")
        assert cfg.keyframe_rotation > 0
        assert cfg.keyframe_translation > 0
        np.testing.assert_allclose(cfg.gravity, [0, 0, -9.81734])

    def test_kitti_noise_conversion(self):
        cfg = load_config("/root/reference/config/kitti.yml", dataset="kitti")
        gyr_n, acc_n, gyr_w, acc_w = cfg.discrete_noise()
        sdt = np.sqrt(cfg.dt)
        assert acc_n == pytest.approx(cfg.acc_noise * cfg.gravity_magnitude / sdt)
        assert gyr_w == pytest.approx(cfg.gyr_walk / sdt)

    def test_cfsd_missing_extrinsics_defaults(self):
        """cfsd.yml ships with the imu-camera extrinsics commented out."""
        with pytest.warns(UserWarning):
            cfg = load_config("/root/reference/config/cfsd.yml", dataset="cfsd")
        np.testing.assert_array_equal(cfg.r_cb, np.eye(3))
        np.testing.assert_allclose(cfg.gravity, [0, 0, 9.81734])

    def test_unknown_dataset_rejected(self):
        with pytest.raises(ConfigError):
            load_config("/root/reference/config/euroc.yml", dataset="tum")

    def test_profiles_complete(self):
        assert set(PROFILES) == {"euroc", "kitti", "cfsd"}
