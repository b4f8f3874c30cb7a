"""Benchmark: full VIO frame step on the TPU chip, vs the reference C++.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline metric: steady-state frames/sec of the fused VIO step (IMU
preintegration + rectify + ORB on BOTH stereo images + 3 matching passes +
motion-only BA + pool update) at EuRoC scale (752x480, 800 features, 8
levels), single chip, single sequence.

Baseline: the reference's own front-end micro-benchmark measured on this
machine (see BASELINE.md): 76.7 FPS for remap -> ORB-500 -> match ->
RANSAC -> triangulate on ONE 672x376 image at -O2. That is a conservative
baseline — the reference's true end-to-end loop does strictly more work per
frame (two images, 800-feature 8-level ORB-SLAM2 extraction, three matcher
passes, up to 20 Ceres iterations; an estimated 25-40 FPS).
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

REFERENCE_FRONTEND_FPS = 76.7  # measured, BASELINE.md


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import __graft_entry__

    fn, args = __graft_entry__.entry()
    step = jax.jit(fn, donate_argnums=(0,))

    log("devices:", jax.devices())
    t0 = time.time()
    state, metrics = step(*args)
    jax.block_until_ready(state)
    log(f"compile+first step: {time.time() - t0:.1f}s")

    # steady state: feed frames back-to-back, donated carry
    _, img_l, img_r, gyr, acc, mask, key = args
    n_warm, n_meas = 3, 15
    for i in range(n_warm):
        key, sub = jax.random.split(key)
        state, metrics = step(state, img_l, img_r, gyr, acc, mask, sub)
    jax.block_until_ready(state)

    t0 = time.time()
    for i in range(n_meas):
        key, sub = jax.random.split(key)
        state, metrics = step(state, img_l, img_r, gyr, acc, mask, sub)
    jax.block_until_ready(state)
    dt = (time.time() - t0) / n_meas
    fps = 1.0 / dt
    log(f"steady-state: {dt * 1e3:.2f} ms/frame, {fps:.1f} FPS")
    log(f"metrics: stereo={int(metrics['n_stereo'])} tracked={int(metrics['n_tracked'])}")

    print(json.dumps({
        "metric": "vio_full_step_fps_euroc_752x480_single_chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / REFERENCE_FRONTEND_FPS, 3),
    }))


if __name__ == "__main__":
    main()
