"""pose_estimation_tpu — a TPU-native stereo visual-inertial SLAM framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of the reference
C++ stack (ruguangyou/pose-estimation): stereo rectification, ORB front-end,
IMU preintegration, sliding-window motion-only bundle adjustment, 4-stage
visual-inertial initialization, EuRoC/KITTI/CFSD replay — engineered for the
TPU's MXU/VPU, fixed static shapes, and `vmap`/`pjit` scale-out rather than a
translation of the reference's OpenCV/Ceres/pthread architecture.
"""

__version__ = "0.1.0"

from pose_estimation_tpu.utils.config import (  # noqa: F401
    PROFILES,
    VIOConfig,
    WINDOW_SIZE,
    load_config,
)


def __getattr__(name):
    # lazy top-level exports (importing them eagerly would pull in jax
    # before callers can configure platforms)
    if name == "VisualInertialSLAM":
        from pose_estimation_tpu.slam import VisualInertialSLAM

        return VisualInertialSLAM
    if name == "SensorType":
        from pose_estimation_tpu.slam import SensorType

        return SensorType
    if name == "CameraModel":
        from pose_estimation_tpu.camera import CameraModel

        return CameraModel
    raise AttributeError(name)
