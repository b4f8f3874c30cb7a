"""Device-side image remap (undistort + rectify) — gather + bilinear blend.

Replaces the per-frame `cv::remap(..., INTER_LINEAR)` calls of the reference
front-end (`/root/reference/src/feature-tracker.cpp:75-76`). The sampling map
comes from `pose_estimation_tpu.camera` (host, once); the remap itself is a
fused XLA gather that runs on device every frame, batchable over images.

Border policy: constant 0 outside the source image (cv::BORDER_CONSTANT,
OpenCV's default for remap).
"""

from __future__ import annotations

import jax.numpy as jnp


def rectify_points(
    xy: jnp.ndarray,
    k_raw: jnp.ndarray,
    dist: jnp.ndarray,
    r_rect: jnp.ndarray,
    p_new: jnp.ndarray,
    iters: int = 5,
) -> jnp.ndarray:
    """Rectified pixel coordinates of RAW-image keypoints, on device.

    The sparse, TPU-first alternative to dense image remap: instead of
    resampling the whole frame (a 1.4M-point arbitrary gather — the single
    slowest op on this chip, see BASELINE.md), detection runs on the raw
    image and only the K keypoint COORDS are undistorted + rectified. This
    is the ORB-SLAM2 design; the reference remaps full frames instead
    (`feature-tracker.cpp:75-76`), which `remap_bilinear` still provides for
    the dense mode and offline tooling.

    Same iterative compensation as cv::undistortPoints (and the host
    `camera.undistort_points`, whose outputs it matches to float tolerance).

    xy [..., 2] raw pixels; k_raw [4] = (fx, fy, cx, cy) of the raw camera;
    dist [5] = (k1, k2, p1, p2, k3); r_rect [3,3] rectifying rotation (R1 or
    R2); p_new [3,4] rectified projection. Returns [..., 2] rectified px.
    """
    fx, fy, cx, cy = k_raw[0], k_raw[1], k_raw[2], k_raw[3]
    k1, k2, p1, p2, k3 = dist[0], dist[1], dist[2], dist[3], dist[4]
    x0 = (xy[..., 0] - cx) / fx
    y0 = (xy[..., 1] - cy) / fy
    x, y = x0, y0
    for _ in range(iters):
        r2 = x * x + y * y
        icdist = 1.0 / (1.0 + ((k3 * r2 + k2) * r2 + k1) * r2)
        dx = 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
        dy = p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
        x = (x0 - dx) * icdist
        y = (y0 - dy) * icdist
    v = jnp.stack([x, y, jnp.ones_like(x)], axis=-1) @ r_rect.T
    xr = v[..., 0] / v[..., 2]
    yr = v[..., 1] / v[..., 2]
    return jnp.stack(
        [xr * p_new[0, 0] + p_new[0, 2], yr * p_new[1, 1] + p_new[1, 2]],
        axis=-1,
    )


def remap_bilinear(img: jnp.ndarray, mapxy: jnp.ndarray) -> jnp.ndarray:
    """img: [H, W] (any float/int dtype); mapxy: [Ho, Wo, 2] float (x, y).

    Returns [Ho, Wo] in float32. Batching: leading batch dims on `img` with
    an unbatched map broadcast the map; a batched map `[B, Ho, Wo, 2]` with
    `img [B, H, W]` remaps each image with its own map in one gather (the
    L/R stereo pair case).
    """
    h, w = img.shape[-2], img.shape[-1]
    x = mapxy[..., 0]
    y = mapxy[..., 1]
    paired = img.ndim == 3 and mapxy.ndim == 4 and img.shape[0] == mapxy.shape[0]

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0).astype(jnp.float32)
    fy = (y - y0).astype(jnp.float32)
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def gather(yi, xi):
        inb = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        xi_c = jnp.clip(xi, 0, w - 1)
        yi_c = jnp.clip(yi, 0, h - 1)
        flat = img.reshape(*img.shape[:-2], h * w)
        idx = yi_c * w + xi_c
        if paired:
            b = img.shape[0]
            vals = jnp.take_along_axis(flat, idx.reshape(b, -1), axis=1)
            vals = vals.reshape(idx.shape).astype(jnp.float32)
        else:
            vals = jnp.take(flat, idx.reshape(-1), axis=-1)
            vals = vals.reshape(*img.shape[:-2], *xi.shape).astype(jnp.float32)
        return jnp.where(inb, vals, 0.0)

    v00 = gather(y0i, x0i)
    v01 = gather(y0i, x0i + 1)
    v10 = gather(y0i + 1, x0i)
    v11 = gather(y0i + 1, x0i + 1)

    top = v00 * (1.0 - fx) + v01 * fx
    bot = v10 * (1.0 - fx) + v11 * fx
    return top * (1.0 - fy) + bot * fy
