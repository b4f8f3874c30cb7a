"""Oriented binary descriptors over an image pyramid ("ORB" front-end).

TPU-native re-design of the description half of the vendored ORB-SLAM2
extractor (`/root/reference/src/ORBextractor.cc`):

* 8-level x1.2 pyramid (`ComputePyramid` :1107-1132) -> `jax.image.resize`
  per level with static shapes;
* intensity-centroid orientation (`IC_Angle` :77-104) -> batched 31x31 patch
  gather contracted with precomputed circular moment masks (one matmul);
* 7x7 sigma=2 Gaussian blur (:1086) -> separable depthwise convolution;
* rotated 256-pair binary test (`computeOrbDescriptor` :108-147) -> batched
  rotate + gather + compare.

The sampling-pair pattern is NOT the learned ORB table (that is data married
to OpenCV); we use a fixed seeded Gaussian BRIEF pattern (sigma = patch/5,
the BRIEF-paper choice ORB builds on). Descriptors are therefore not
bit-compatible with OpenCV — matching happens entirely inside this framework
and the oracle is downstream matching quality / trajectory parity, per
SURVEY.md section 4.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from pose_estimation_tpu.ops import fast as fast_mod
from pose_estimation_tpu.ops import matching

PATCH_R = 15          # orientation patch radius (31x31), ORBextractor.cc HALF_PATCH_SIZE
EDGE = 19             # detection margin, ORB-SLAM2 EDGE_THRESHOLD
N_PAIRS = 256


def _make_pattern(seed: int = 12345, radius: int = 13) -> np.ndarray:
    """[256, 2, 2] int32 (pair, point, (x, y)) Gaussian BRIEF pattern."""
    rng = np.random.default_rng(seed)
    sigma = 31 / 5.0
    pts = rng.normal(0.0, sigma, size=(N_PAIRS, 2, 2))
    return np.clip(np.round(pts), -radius, radius).astype(np.int32)


PATTERN = _make_pattern()


def _moment_masks(dtype=jnp.float32):
    """x / y circular moment masks for IC angle, [31*31] each."""
    ys, xs = np.mgrid[-PATCH_R : PATCH_R + 1, -PATCH_R : PATCH_R + 1]
    circ = (xs * xs + ys * ys) <= PATCH_R * PATCH_R
    mx = (xs * circ).astype(np.float32).reshape(-1)
    my = (ys * circ).astype(np.float32).reshape(-1)
    return jnp.asarray(mx, dtype), jnp.asarray(my, dtype)


def gather_patches(img: jnp.ndarray, xy: jnp.ndarray, r: int) -> jnp.ndarray:
    """Gather (2r+1)^2 patches at integer keypoint centers.

    img [H,W], xy [N,2] float -> [N, (2r+1)^2] with edge clamping.
    """
    h, w = img.shape
    cx = jnp.round(xy[:, 0]).astype(jnp.int32)
    cy = jnp.round(xy[:, 1]).astype(jnp.int32)
    d = jnp.arange(-r, r + 1)
    yy = jnp.clip(cy[:, None] + d[None, :], 0, h - 1)       # [N, P]
    xx = jnp.clip(cx[:, None] + d[None, :], 0, w - 1)       # [N, P]
    idx = (yy[:, :, None] * w + xx[:, None, :]).reshape(xy.shape[0], -1)
    return jnp.take(img.reshape(-1), idx, axis=0)


def ic_angle(img: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """Intensity-centroid orientation per keypoint (radians).

    Gather-based: per-keypoint 31x31 patch gather contracted with the
    circular moment masks. See `ic_angle_conv` for the MXU formulation.
    """
    patches = gather_patches(img, xy, PATCH_R)               # [N, 961]
    mx, my = _moment_masks(patches.dtype)
    m10 = patches @ mx
    m01 = patches @ my
    return jnp.arctan2(m01, m10)


def moment_maps(img: jnp.ndarray) -> jnp.ndarray:
    """Whole-image circular moments (m10, m01) via one 2-channel 31x31
    convolution — MXU work instead of scattered gathers. [H,W] -> [2,H,W]."""
    mx, my = _moment_masks(img.dtype)
    kern = jnp.stack(
        [mx.reshape(31, 31), my.reshape(31, 31)], axis=0
    )[:, None]                                               # [2,1,31,31]
    out = jax.lax.conv_general_dilated(
        img[None, None],                                     # [1,1,H,W]
        kern,
        window_strides=(1, 1),
        padding="SAME",
    )
    return out[0]                                            # [2,H,W]


def ic_angle_from_moments(moments: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """Sample precomputed moment maps at (rounded) keypoint positions."""
    h, w = moments.shape[1:]
    cx = jnp.clip(jnp.round(xy[:, 0]).astype(jnp.int32), 0, w - 1)
    cy = jnp.clip(jnp.round(xy[:, 1]).astype(jnp.int32), 0, h - 1)
    idx = cy * w + cx
    m10 = jnp.take(moments[0].reshape(-1), idx, axis=0)
    m01 = jnp.take(moments[1].reshape(-1), idx, axis=0)
    return jnp.arctan2(m01, m10)


def gaussian_blur7(img: jnp.ndarray, sigma: float = 2.0) -> jnp.ndarray:
    """Separable 7x7 Gaussian with reflect-101 borders (cv::GaussianBlur)."""
    k = np.exp(-np.arange(-3, 4) ** 2 / (2 * sigma * sigma))
    k = (k / k.sum()).astype(np.float32)
    kern = jnp.asarray(k, img.dtype)

    def conv1d(x, axis):
        x = jnp.moveaxis(x, axis, -1)
        pad = jnp.concatenate([x[..., 3:0:-1], x, x[..., -2:-5:-1]], axis=-1)
        out = sum(pad[..., i : i + x.shape[-1]] * kern[i] for i in range(7))
        return jnp.moveaxis(out, -1, axis)

    return conv1d(conv1d(img, 0), 1)


def brief_descriptors(
    img_blur: jnp.ndarray, xy: jnp.ndarray, angle: jnp.ndarray
) -> jnp.ndarray:
    """Rotated binary tests -> {-1,+1} int8 [N, 256].

    Rotation convention matches computeOrbDescriptor (:117-120):
      col' = round(x cos - y sin), row' = round(x sin + y cos).
    """
    h, w = img_blur.shape
    n = xy.shape[0]
    pat = jnp.asarray(PATTERN, jnp.float32)                  # [256, 2, 2]
    ca, sa = jnp.cos(angle), jnp.sin(angle)                  # [N]
    px = pat[None, :, :, 0]                                  # [1, 256, 2]
    py = pat[None, :, :, 1]
    col = jnp.round(px * ca[:, None, None] - py * sa[:, None, None])
    row = jnp.round(px * sa[:, None, None] + py * ca[:, None, None])
    cx = jnp.round(xy[:, 0]).astype(jnp.int32)[:, None, None]
    cy = jnp.round(xy[:, 1]).astype(jnp.int32)[:, None, None]
    xx = jnp.clip(cx + col.astype(jnp.int32), 0, w - 1)      # [N, 256, 2]
    yy = jnp.clip(cy + row.astype(jnp.int32), 0, h - 1)
    vals = jnp.take(img_blur.reshape(-1), (yy * w + xx).reshape(n, -1), axis=0)
    vals = vals.reshape(n, N_PAIRS, 2)
    bits = vals[:, :, 0] < vals[:, :, 1]
    return matching.pack_descriptors(bits)


class OrbConfig(NamedTuple):
    n_features: int = 800
    n_levels: int = 8
    scale: float = 1.2
    th_hi: float = 20.0
    th_lo: float = 7.0
    cell: int = 16
    k_per_cell: int = 4
    # "xla" = roll/min-tree formulation; "pallas" = fused score+NMS kernel
    # (ops/pallas_fast.py), one HBM read + one write per pixel
    fast_backend: str = "xla"


class OrbFeatures(NamedTuple):
    xy: jnp.ndarray       # [K, 2] level-0 pixel coords
    angle: jnp.ndarray    # [K] radians
    score: jnp.ndarray    # [K]
    level: jnp.ndarray    # [K] int32
    desc: jnp.ndarray     # [K, 256] int8 in {-1, +1}
    valid: jnp.ndarray    # [K] bool


def level_budgets(cfg: OrbConfig) -> list[int]:
    """Per-level feature budgets, geometric decay like ORBextractor's ctor
    (`ORBextractor.cc:443-457`)."""
    inv = 1.0 / cfg.scale
    raw = [inv**l for l in range(cfg.n_levels)]
    s = sum(raw)
    budgets = [max(8, int(round(cfg.n_features * r / s))) for r in raw]
    return budgets


def extract(img: jnp.ndarray, cfg: OrbConfig) -> OrbFeatures:
    """Full ORB front-end for one grayscale image [H, W] float32.

    Returns fixed-capacity features (capacity = sum of level budgets).
    """
    h, w = img.shape
    budgets = level_budgets(cfg)

    feats = []
    level_img = img
    for lvl in range(cfg.n_levels):
        if lvl > 0:
            lh = max(int(round(h / cfg.scale**lvl)), 2 * EDGE + 8)
            lw = max(int(round(w / cfg.scale**lvl)), 2 * EDGE + 8)
            level_img = jax.image.resize(img, (lh, lw), method="linear")
        if cfg.fast_backend == "pallas":
            from pose_estimation_tpu.ops.pallas_fast import fast_score_nms_pallas

            score_raw, score_masked = fast_score_nms_pallas(level_img)
            kps = fast_mod.select_keypoints(
                score_masked, cfg.th_hi, cfg.th_lo, budgets[lvl],
                cell=cfg.cell, border=EDGE, k_per_cell=cfg.k_per_cell,
                pre_nms=True, raw_score=score_raw,
            )
        else:
            score = fast_mod.fast_score(level_img)
            kps = fast_mod.select_keypoints(
                score, cfg.th_hi, cfg.th_lo, budgets[lvl],
                cell=cfg.cell, border=EDGE, k_per_cell=cfg.k_per_cell,
            )
        ang = ic_angle_from_moments(moment_maps(level_img), kps.xy)
        blur = gaussian_blur7(level_img)
        desc = brief_descriptors(blur, kps.xy, ang)
        scale_back = jnp.float32(cfg.scale**lvl)
        feats.append(
            OrbFeatures(
                xy=kps.xy * scale_back,
                angle=ang,
                score=kps.score,
                level=jnp.full((kps.xy.shape[0],), lvl, jnp.int32),
                desc=desc,
                valid=kps.valid,
            )
        )
    return OrbFeatures(*(jnp.concatenate(parts) for parts in zip(*feats)))
