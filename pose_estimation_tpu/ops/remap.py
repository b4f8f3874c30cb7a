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


def remap_bilinear(img: jnp.ndarray, mapxy: jnp.ndarray) -> jnp.ndarray:
    """img: [H, W] (any float/int dtype); mapxy: [Ho, Wo, 2] float (x, y).

    Returns [Ho, Wo] in float32. Supports leading batch dims on `img` if
    `mapxy` is unbatched (broadcasts the map).
    """
    h, w = img.shape[-2], img.shape[-1]
    x = mapxy[..., 0]
    y = mapxy[..., 1]

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
        vals = jnp.take(flat, (yi_c * w + xi_c).reshape(-1), axis=-1)
        vals = vals.reshape(*img.shape[:-2], *xi.shape).astype(jnp.float32)
        return jnp.where(inb, vals, 0.0)

    v00 = gather(y0i, x0i)
    v01 = gather(y0i, x0i + 1)
    v10 = gather(y0i + 1, x0i)
    v11 = gather(y0i + 1, x0i + 1)

    top = v00 * (1.0 - fx) + v01 * fx
    bot = v10 * (1.0 - fx) + v11 * fx
    return top * (1.0 - fy) + bot * fy
