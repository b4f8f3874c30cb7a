"""Small synthetic configurations used by bench/entry smoke paths."""

from __future__ import annotations

import numpy as np

from pose_estimation_tpu.utils.config import VIOConfig


def synthetic_config(
    width: int = 320,
    height: int = 240,
    levels: int = 4,
    features: int = 600,
    **overrides,
) -> VIOConfig:
    """A zero-distortion stereo rig for synthetic-data runs."""
    fx = width * 0.8
    k = np.array([[fx, 0, width / 2], [0, fx, height / 2], [0, 0, 1.0]])
    base = dict(
        dataset="euroc",
        dataset_path="",
        image_width=width,
        image_height=height,
        camera_frequency=10,
        std_x=1.0,
        std_y=1.0,
        k_left=k,
        dist_left=np.zeros(5),
        k_right=k.copy(),
        dist_right=np.zeros(5),
        r_lr=np.eye(3),
        t_lr=np.array([-0.11, 0.0, 0.0]),
        r_cb=np.array([[0.0, -1.0, 0.0], [0.0, 0.0, -1.0], [1.0, 0.0, 0.0]]),
        t_cb=np.zeros(3),
        sampling_rate=200,
        gyr_noise=1.7e-4,
        acc_noise=2.0e-3,
        gyr_walk=1.9e-5,
        acc_walk=3.0e-3,
        gravity_magnitude=9.81,
        num_features=features,
        scale_factor=1.2,
        level_pyramid=levels,
        ini_th_fast=20,
        min_th_fast=7,
        match_ratio=3.0,
        min_match_dist=40.0,
        max_vertical_pixel_dist=2.0,
        max_feature_age=8,
        max_depth=12.0,
        keyframe_rotation=0.1,
        keyframe_translation=0.15,
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


def tiny_config(**overrides) -> VIOConfig:
    """Minimal shapes for multi-chip dry-runs on virtual CPU devices."""
    base = dict(
        max_keypoints=64, max_matches=32, pool_capacity=128, imu_chunk=8,
    )
    base.update(overrides)
    return synthetic_config(width=96, height=64, levels=2, features=64, **base)
