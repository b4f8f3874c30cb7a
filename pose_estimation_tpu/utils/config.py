"""Runtime configuration for the TPU VIO framework.

Replaces BOTH layers of the reference's config system
(`/root/reference/include/cfsd/config.hpp:8-25` runtime YAML singleton and the
compile-time `-DCFSD/-DEUROC/-DKITTI` flags in `CMakeLists.txt:18-34`):

* The per-dataset YAML files (`config/{euroc,kitti,cfsd}.yml`) are parsed
  as-is, including OpenCV `!!opencv-matrix` nodes.
* Dataset-specific behavior that the reference bakes in at compile time
  (gravity axis `src/map.cpp:40-50`, IMU noise unit conversion
  `src/imu-preintegrator.cpp:90-124`, gravity-alignment axes
  `src/optimizer.cpp:267-303`) becomes *data* in `DatasetProfile`.
* Keys are validated strictly: a missing key raises instead of silently
  reading 0 (the reference's KITTI `keyframe_rotation` vs `keyframeRotation`
  bug, `config/kitti.yml:123` vs `src/map.cpp:14`).
"""

from __future__ import annotations

import dataclasses
import re
from pathlib import Path

import numpy as np

WINDOW_SIZE = 4  # sliding window, reference `include/cfsd/map.hpp:11`


# ---------------------------------------------------------------------------
# OpenCV-YAML parsing (cv::FileStorage format) without requiring OpenCV.
# ---------------------------------------------------------------------------

def _parse_opencv_yaml(path: str | Path) -> dict:
    """Parse an OpenCV FileStorage YAML file into a plain dict.

    Handles the `%YAML:1.0` header and `!!opencv-matrix` tags that stock
    PyYAML rejects. Matrices become numpy arrays of shape (rows, cols).
    """
    import yaml

    text = Path(path).read_text()
    # Strip the OpenCV directive and map its matrix tag to an explicit tag.
    text = re.sub(r"^%YAML:1\.0\s*", "", text)
    text = text.replace("!!opencv-matrix", "!opencv-matrix")

    class _Loader(yaml.SafeLoader):
        pass

    def _mat(loader, node):
        d = loader.construct_mapping(node, deep=True)
        return np.asarray(d["data"], dtype=np.float64).reshape(d["rows"], d["cols"])

    _Loader.add_constructor("!opencv-matrix", _mat)
    data = yaml.load(text, Loader=_Loader)
    return data or {}


# ---------------------------------------------------------------------------
# Dataset profiles: everything the reference selects with #ifdef.
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class DatasetProfile:
    name: str
    # Gravity direction in the world frame (unit vector); world gravity is
    # `gravity_dir * g` (`src/map.cpp:40-50`).
    gravity_dir: tuple[float, float, float]
    # IMU noise unit conversions (`src/imu-preintegrator.cpp:90-124`):
    # discrete noise density = cfg / sqrt(dt) always; these flags control the
    # extra factors.
    acc_noise_times_g: bool       # accNoise given in [g] units -> * gravity
    bias_walk_over_sqrt_dt: bool  # bias walk given per-sample -> / sqrt(dt)
    acc_bias_times_g: bool
    # Keys used for the IMU noise entries in this dataset's YAML.
    key_gyr_noise: str
    key_acc_noise: str
    key_gyr_walk: str
    key_acc_walk: str
    # Gravity-alignment DoFs: indices of the two tangent components that are
    # free (the axis aligned with gravity is fixed), `optimizer.cpp:267-303`.
    alignment_axes: tuple[int, int]


PROFILES = {
    "euroc": DatasetProfile(
        name="euroc",
        gravity_dir=(-1.0, 0.0, 0.0),
        acc_noise_times_g=False,
        bias_walk_over_sqrt_dt=False,
        acc_bias_times_g=False,
        key_gyr_noise="gyroscope_noise_density",
        key_acc_noise="accelerometer_noise_density",
        key_gyr_walk="gyroscope_random_walk",
        key_acc_walk="accelerometer_random_walk",
        alignment_axes=(1, 2),
    ),
    "kitti": DatasetProfile(
        name="kitti",
        gravity_dir=(0.0, 0.0, -1.0),
        acc_noise_times_g=True,
        bias_walk_over_sqrt_dt=True,
        acc_bias_times_g=True,
        key_gyr_noise="gyrNoise",
        key_acc_noise="accNoise",
        key_gyr_walk="gyrBias",
        key_acc_walk="accBias",
        alignment_axes=(0, 1),
    ),
    "cfsd": DatasetProfile(
        name="cfsd",
        gravity_dir=(0.0, 0.0, 1.0),
        acc_noise_times_g=True,
        bias_walk_over_sqrt_dt=True,
        acc_bias_times_g=True,
        key_gyr_noise="gyrNoise",
        key_acc_noise="accNoise",
        key_gyr_walk="gyrBias",
        key_acc_walk="accBias",
        alignment_axes=(0, 1),
    ),
}


@dataclasses.dataclass(frozen=True)
class VIOConfig:
    """All tunables of the pipeline, one flat immutable record.

    Field-by-field parity with `config/euroc.yml` & friends; framework-only
    fields (fixed capacities for XLA static shapes) live at the bottom.
    """

    dataset: str
    dataset_path: str

    # --- camera ---
    image_width: int
    image_height: int
    camera_frequency: int
    std_x: float
    std_y: float
    k_left: np.ndarray       # 3x3
    dist_left: np.ndarray    # 5
    k_right: np.ndarray      # 3x3
    dist_right: np.ndarray   # 5
    r_lr: np.ndarray         # rotation left->right, 3x3
    t_lr: np.ndarray         # translation left->right, 3
    r_cb: np.ndarray         # rotation imu(body)->camera, 3x3
    t_cb: np.ndarray         # translation imu->camera, 3

    # --- imu ---
    sampling_rate: int
    gyr_noise: float
    acc_noise: float
    gyr_walk: float
    acc_walk: float
    gravity_magnitude: float

    # --- features ---
    num_features: int
    scale_factor: float
    level_pyramid: int
    ini_th_fast: int
    min_th_fast: int
    match_ratio: float
    min_match_dist: float
    max_vertical_pixel_dist: float
    max_feature_age: int
    max_depth: float

    # --- tracking / keyframing ---
    keyframe_rotation: float
    keyframe_translation: float
    max_imu_time: float
    max_gyr_bias: float
    max_acc_bias: float
    sfm_rotation: float
    sfm_translation: float
    solve_pnp: int

    # --- solver ---
    max_num_iterations: int
    prior_factor: float

    # --- replay ---
    speed_up: int

    # --- framework static capacities (XLA shapes) ---
    max_keypoints: int = 1024       # per-image ORB keypoint capacity
    max_matches: int = 384          # stereo-matched feature capacity per frame
    pool_capacity: int = 1024       # landmark/feature pool capacity
    imu_chunk: int = 32             # max IMU samples per frame interval
    window_size: int = WINDOW_SIZE
    # "sparse": detect on RAW frames, rectify keypoint coords analytically
    # (ORB-SLAM2-style; no dense remap on the hot path). "dense": remap the
    # full frames first, reference-faithful (`feature-tracker.cpp:75-76`).
    rectify_mode: str = "sparse"
    # refine landmark positions jointly with poses (Schur full BA) on each
    # keyframe — the machinery the reference carries only commented out
    # (`optimizer.cpp:122-133`)
    full_ba_keyframes: bool = False
    full_ba_iterations: int = 8
    # sliding-window marginalization prior (VINS/OKVIS-style): on each
    # keyframe, Schur-marginalize the outgoing frame's 15-dim block from
    # the solved motion-BA information matrix and carry the result as a
    # Gaussian prior on the remaining window states. Upgrade over the
    # reference's fixed `priorFactor`-scaled anchor prior
    # (`cost-functions.hpp:81`), which discards all pre-window information.
    # DEFAULT ON (flagship): measured on the noisy 6 s simulator it cuts
    # ATE 1.5-5x (5.57/3.23/2.40 -> 1.07/2.27/1.64 % of path) and |bg|
    # 3-15x across seeds vs the priorFactor surrogate (benchmarks/
    # sweep_bias.py); set False for the reference-faithful prior.
    marg_prior: bool = True
    # forgetting factor applied to the carried prior at each
    # marginalization (1.0 = none). < 1 bounds the overconfidence from
    # landmark double-counting (pool landmarks persist across windows, so
    # their reprojection information re-enters future solves).
    marg_forget: float = 1.0
    # weak zero-mean accelerometer-bias prior sigma [m/s^2] (0 disables).
    # On low-rotation trajectories (tilt, ba) is near-degenerate and the
    # pair random-walks along the unobservable manifold (measured: |ba|
    # grows 0.02 -> 1.3 over 6 s with ATE unaffected); physical IMU biases
    # are bounded (~0.1 m/s^2 class for EuRoC's ADIS16448), so a weak
    # prior pins the gauge without biasing observable estimates.
    ba_prior_sigma: float = 0.0
    # FAST corner backend: "auto" resolves to the fused Pallas score+NMS
    # kernel on TPU (bit-exact vs the XLA path, one HBM read+write per
    # pixel, no min-tree temp blowup at batch scale) and to the XLA
    # formulation elsewhere (CPU tests). "xla"/"pallas" force a choice.
    fast_backend: str = "auto"
    # descriptor sampling backend: "auto" resolves to the fused Pallas
    # per-keypoint patch kernel on TPU (in-VMEM blur + IC moments + rotated
    # pool sampling; replaces the gather-bound angle/blur/BRIEF stages) and
    # to the XLA formulation elsewhere. "xla"/"pallas" force a choice.
    sample_backend: str = "auto"
    # score-chain compute dtype of the fused select kernel ("bf16"/"f32"):
    # see ops.orb.OrbConfig.select_dtype
    select_dtype: str = "f32"

    @property
    def profile(self) -> DatasetProfile:
        return PROFILES[self.dataset]

    @property
    def dt(self) -> float:
        return 1.0 / float(self.sampling_rate)

    @property
    def gravity(self) -> np.ndarray:
        """World gravity vector (reference `src/map.cpp:40-50`)."""
        return np.asarray(self.profile.gravity_dir) * self.gravity_magnitude

    def discrete_noise(self) -> tuple[float, float, float, float]:
        """(gyr_noise_d, acc_noise_d, gyr_walk_d, acc_walk_d).

        Discrete-time conversions per dataset, mirroring
        `src/imu-preintegrator.cpp:90-124`.
        """
        p = self.profile
        sdt = np.sqrt(self.dt)
        g = self.gravity_magnitude
        gyr_n = self.gyr_noise / sdt
        acc_n = self.acc_noise * (g if p.acc_noise_times_g else 1.0) / sdt
        gyr_w = self.gyr_walk / (sdt if p.bias_walk_over_sqrt_dt else 1.0)
        acc_w = (
            self.acc_walk
            * (g if p.acc_bias_times_g else 1.0)
            / (sdt if p.bias_walk_over_sqrt_dt else 1.0)
        )
        return gyr_n, acc_n, gyr_w, acc_w


class ConfigError(KeyError):
    pass


def _warn_identity(key, value):
    import warnings

    warnings.warn(
        f"config key {key!r} missing; defaulting to identity/zero "
        "(imu-camera extrinsics!)", stacklevel=3,
    )
    return value


def _req(d: dict, *keys):
    """Return the first present key's value; raise if all missing (strict —
    this is the guard against the reference's silent-zero KITTI bug)."""
    for k in keys:
        if k in d and d[k] is not None:
            return d[k]
    raise ConfigError(f"missing required config key(s): {keys}")


def load_config(path: str | Path, dataset: str, **overrides) -> VIOConfig:
    """Load a reference-format YAML config file for the given dataset."""
    if dataset not in PROFILES:
        raise ConfigError(f"unknown dataset {dataset!r}; options: {list(PROFILES)}")
    d = _parse_opencv_yaml(path)
    p = PROFILES[dataset]

    def arr(key, shape):
        a = np.asarray(_req(d, key), dtype=np.float64)
        return a.reshape(shape)

    cfg = dict(
        dataset=dataset,
        dataset_path=str(d.get("dataset", "")),
        image_width=int(_req(d, "imageWidth")),
        image_height=int(_req(d, "imageHeight")),
        camera_frequency=int(d.get("cameraFrequency", 20)),
        std_x=float(_req(d, "stdX")),
        std_y=float(_req(d, "stdY")),
        k_left=arr("camLeft", (3, 3)),
        dist_left=arr("distLeft", (-1,)),
        k_right=arr("camRight", (3, 3)),
        dist_right=arr("distRight", (-1,)),
        r_lr=arr("rotationLeftToRight", (3, 3)),
        t_lr=arr("translationLeftToRight", (3,)),
        # the shipped cfsd.yml comments these out (`config/cfsd.yml:84-93`),
        # so the reference's CFSD build could not actually construct its
        # CameraModel; default to identity extrinsics with a warning.
        r_cb=(
            arr("rotationImuToCamera", (3, 3))
            if "rotationImuToCamera" in d
            else _warn_identity("rotationImuToCamera", np.eye(3))
        ),
        t_cb=(
            arr("translationImuToCamera", (3,))
            if "translationImuToCamera" in d
            else _warn_identity("translationImuToCamera", np.zeros(3))
        ),
        sampling_rate=int(_req(d, "samplingRate")),
        gyr_noise=float(_req(d, p.key_gyr_noise)),
        acc_noise=float(_req(d, p.key_acc_noise)),
        gyr_walk=float(_req(d, p.key_gyr_walk)),
        acc_walk=float(_req(d, p.key_acc_walk)),
        gravity_magnitude=float(_req(d, "gravity")),
        num_features=int(_req(d, "numberOfFeatures")),
        scale_factor=float(_req(d, "scaleFactor")),
        level_pyramid=int(_req(d, "levelPyramid")),
        ini_th_fast=int(d.get("iniThFAST", 20)),
        min_th_fast=int(d.get("minThFAST", 7)),
        match_ratio=float(_req(d, "matchRatio")),
        min_match_dist=float(_req(d, "minMatchDist")),
        max_vertical_pixel_dist=float(_req(d, "maxVerticalPixelDist")),
        max_feature_age=int(_req(d, "maxFeatureAge")),
        max_depth=float(_req(d, "maxDepth")),
        # accept both spellings; reference KITTI yml misspells them
        keyframe_rotation=float(_req(d, "keyframeRotation", "keyframe_rotation")),
        keyframe_translation=float(
            _req(d, "keyframeTranslation", "keyframe_translation")
        ),
        max_imu_time=float(_req(d, "maxImuTime")),
        max_gyr_bias=float(_req(d, "maxGyrBias")),
        max_acc_bias=float(_req(d, "maxAccBias")),
        sfm_rotation=float(d.get("sfmRotation", 0.0)),
        sfm_translation=float(d.get("sfmTranslation", 0.0)),
        solve_pnp=int(d.get("solvePnP", 0)),
        max_num_iterations=int(_req(d, "max_num_iterations")),
        prior_factor=float(_req(d, "priorFactor")),
        speed_up=int(d.get("speedUp", 1)),
    )
    cfg.update(overrides)
    return VIOConfig(**cfg)
