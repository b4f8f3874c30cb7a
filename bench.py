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
import os
import subprocess
import sys
import time

REFERENCE_FRONTEND_FPS = 76.7  # measured, BASELINE.md


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def supervise():
    """The axon TPU tunnel nondeterministically faults on large programs
    ("TPU worker process crashed"); identical programs succeed on retry.
    Run the measurement in a child process and retry a few times."""
    for attempt in range(4):
        if attempt:
            log(f"[bench] retry {attempt} after TPU fault; waiting for recovery...")
            time.sleep(150)
        env = dict(os.environ, BENCH_WORKER="1")
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, timeout=1800,
        )
        sys.stderr.write(proc.stderr)
        for line in proc.stdout.splitlines():
            if line.startswith("{"):
                print(line)
                return 0
        log(f"[bench] attempt {attempt} failed (rc={proc.returncode})")
    log("[bench] all attempts failed")
    return 1


def main():
    import functools

    import jax
    import jax.numpy as jnp
    import numpy as np

    from pose_estimation_tpu import load_config
    from pose_estimation_tpu.camera import CameraModel
    from pose_estimation_tpu.models import vio as vio_mod

    cfg = load_config("/root/reference/config/euroc.yml", dataset="euroc")
    cm = CameraModel.from_config(cfg)
    consts, static = vio_mod.build_constants(cfg, cm)

    # staged pipeline (4 dispatches/frame), same stages slam.py runs
    s_imu = jax.jit(functools.partial(vio_mod.stage_imu, consts=consts, static=static))
    s_fe = jax.jit(functools.partial(vio_mod.stage_frontend, consts=consts, static=static))
    s_ba = jax.jit(functools.partial(vio_mod.stage_ba, consts=consts, static=static))
    s_pool = jax.jit(functools.partial(vio_mod.stage_pool, consts=consts, static=static))

    rng = np.random.default_rng(0)
    state = vio_mod.init_vio_state(static)
    h, w = cfg.image_height, cfg.image_width
    img_l = jnp.asarray(rng.uniform(0, 255, (h, w)), jnp.float32)
    img_r = jnp.asarray(rng.uniform(0, 255, (h, w)), jnp.float32)
    m = cfg.imu_chunk
    gyr = jnp.asarray(rng.normal(size=(m, 3)) * 0.1, jnp.float32)
    acc = jnp.asarray(
        rng.normal(size=(m, 3)) * 0.3 + np.array([9.81, 0, 0]), jnp.float32)
    mask = jnp.arange(m) < 20
    key = jax.random.PRNGKey(0)

    def frame(state, key):
        state, imu_dt = s_imu(state, gyr, acc, mask)
        state, cur, tr = s_fe(state, img_l, img_r, key)
        state, cost, iters = s_ba(state, tr.n_matches)
        state = s_pool(state, cur, tr, tr.n_matches)
        return state, tr

    log("devices:", jax.devices())
    t0 = time.time()
    state, tr = frame(state, key)
    jax.block_until_ready(state)
    log(f"compile+first frame: {time.time() - t0:.1f}s")

    n_warm, n_meas = 3, 15
    for i in range(n_warm):
        key, sub = jax.random.split(key)
        state, tr = frame(state, sub)
    jax.block_until_ready(state)

    t0 = time.time()
    for i in range(n_meas):
        key, sub = jax.random.split(key)
        state, tr = frame(state, sub)
    jax.block_until_ready(state)
    dt = (time.time() - t0) / n_meas
    fps = 1.0 / dt
    log(f"steady-state: {dt * 1e3:.2f} ms/frame, {fps:.1f} FPS")

    print(json.dumps({
        "metric": "vio_full_step_fps_euroc_752x480_single_chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / REFERENCE_FRONTEND_FPS, 3),
    }))


if __name__ == "__main__":
    if os.environ.get("BENCH_WORKER") == "1":
        main()
    else:
        sys.exit(supervise())
