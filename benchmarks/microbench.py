"""Micro-benchmark suite mirroring the reference's `benchmark/` programs.

Reference counterparts (measured values in BASELINE.md):
  * `benchmark/preintegration/preintegrate.cpp` — per-IMU-step latency
  * `benchmark/bundleAdjustment/bundleAdjustment.cpp` — front-end stage
    breakdown (remap / ORB / match / RANSAC / triangulate) + FPS
  * `benchmark/cvRectify/cvRectify.cpp` — remap latency

Run:  python benchmarks/microbench.py [--json]
Prints per-stage steady-state latencies on the current JAX default device.

NOTE on interpreting results on the axon-tunneled chip: isolated small
dispatches pay a fixed per-dispatch/per-op latency floor (~20-35 ms once the
relay is warm), which dominates every individual stage here. The honest
whole-pipeline numbers come from `bench.py` (chained, batched, readback-
barriered): ~2.5 ms marginal compute per frame, 278 frames/s/chip at
batch 64. This suite is for RELATIVE comparisons between stages and for
non-tunneled hardware.
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
import time
import timeit
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def bench(fn, *args, n=20):
    import jax

    jax.block_until_ready(jax.tree.leaves(fn(*args))[0])  # compile
    dt = timeit.timeit(
        lambda: jax.block_until_ready(jax.tree.leaves(fn(*args))[0]), number=n
    ) / n
    return dt * 1e3


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", action="store_true")
    ap.add_argument("--out", default=None,
                    help="write results JSON artifact to this path")
    ap.add_argument("--config", default="/root/reference/config/euroc.yml")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from pose_estimation_tpu import load_config
    from pose_estimation_tpu.camera import CameraModel
    from pose_estimation_tpu.frontend import tracker
    from pose_estimation_tpu.imu import preintegration as pre
    from pose_estimation_tpu.models import vio as vio_mod
    from pose_estimation_tpu.ops import fast as fast_mod
    from pose_estimation_tpu.ops import matching, orb, ransac, remap, triangulate

    cfg = load_config(args.config, dataset="euroc")
    cm = CameraModel.from_config(cfg)
    consts, static = vio_mod.build_constants(cfg, cm)
    rng = np.random.default_rng(0)
    h, w = cfg.image_height, cfg.image_width
    img = jnp.asarray(rng.uniform(0, 255, (h, w)), jnp.float32)
    results = {}

    print(f"device: {jax.devices()[0]}", file=sys.stderr)

    # --- preintegration (vs preintegrate.cpp: 0.00188 ms/step measured) ---
    m = cfg.imu_chunk
    gyr = jnp.asarray(rng.normal(size=(m, 3)) * 0.1, jnp.float32)
    acc = jnp.asarray(rng.normal(size=(m, 3)), jnp.float32)
    mask = jnp.ones(m, bool)
    z = jnp.zeros(3, jnp.float32)
    f_pre = jax.jit(
        lambda g, a, k: pre.finalize(
            pre.integrate_chunk(pre.init_state(jnp.float32), g, a, k, z, z, consts.imu),
            z, z, consts.imu,
        )
    )
    ms = bench(f_pre, gyr, acc, mask)
    results["preintegration_chunk_ms"] = ms
    results["preintegration_per_sample_us"] = ms / m * 1e3

    # --- remap (vs 2.38 ms reference) ---
    f_rm = jax.jit(lambda i: remap.remap_bilinear(i, consts.map_l))
    results["remap_ms"] = bench(f_rm, img)
    rect = f_rm(img)

    # --- ORB extraction (vs 8.54 ms reference, cv::ORB 500 features) ---
    f_ex = jax.jit(lambda i: orb.extract(i, static.orb))
    results["orb_extract_ms"] = bench(f_ex, rect)
    feats = f_ex(rect)

    # --- matching (vs 1.02 ms reference BF match) ---
    f_mt = jax.jit(
        lambda a, b, va, vb: matching.match(a, b, va, vb, 2.0, 30.0)
    )
    results["hamming_match_ms"] = bench(
        f_mt, feats.desc, feats.desc, feats.valid, feats.valid
    )

    # --- RANSAC (vs 0.046 ms reference — OpenCV's is adaptive/CPU) ---
    pts = jnp.asarray(rng.uniform(0, 400, (static.cur_capacity, 2)), jnp.float32)
    f_rs = jax.jit(
        lambda a, b, k: ransac.fundamental_ransac(a, b, jnp.ones(len(a), bool), k)
    )
    results["ransac_ms"] = bench(f_rs, pts, pts + 1.0, jax.random.PRNGKey(0))

    # --- triangulation (vs 1.08 ms reference) ---
    pl = jnp.asarray(rng.uniform(0, 400, (static.cur_capacity, 2)), jnp.float32)
    f_tr = jax.jit(
        lambda a, b: triangulate.triangulate(consts.p1, consts.p2, a, b)
    )
    results["triangulate_ms"] = bench(f_tr, pl, pl - 5.0)

    total_fe = (
        2 * results["remap_ms"] + 2 * results["orb_extract_ms"]
        + 3 * results["hamming_match_ms"] + 2 * results["ransac_ms"]
        + results["triangulate_ms"]
    )
    results["frontend_stereo_total_ms"] = total_fe
    results["frontend_fps"] = 1000.0 / total_fe

    # --- cvAlgorithms analogs (`benchmark/cvAlgorithms/cvAlgorithms.cpp`) ---
    # (1) triangulate() chain (:21-68): ORB on BOTH stereo images -> BF
    #     match -> distance filter -> triangulatePoints (+cheirality sign).
    #     Here: one fused stereo extraction + Hamming match + DLT
    #     triangulation, a single jitted chain.
    imgs2 = jnp.stack([img, jnp.roll(img, -8, axis=1)])

    def cv_stereo(im2):
        f = orb.extract_batch(im2, static.orb)
        fl = jax.tree.map(lambda a: a[0], f)
        fr = jax.tree.map(lambda a: a[1], f)
        im, _, _ = matching.match(
            fl.desc, fr.desc, fl.valid, fr.valid, 2.0, 30.0
        )
        pr = jnp.take(fr.xy, jnp.maximum(im, 0), axis=0)
        pts = triangulate.triangulate(consts.p1, consts.p2, fl.xy, pr)
        return pts

    results["cvalg_stereo_triangulate_ms"] = bench(jax.jit(cv_stereo), imgs2)

    # (2) computePose() chain (:71-117): ORB on the next frame -> BF match
    #     vs prev -> distance filter -> solvePnPRansac. Here: Hamming match
    #     + EPnP RANSAC on the matched 3D-2D set.
    from pose_estimation_tpu.ops import pnp as pnp_mod

    pts3d = jnp.asarray(
        rng.uniform(-2, 2, (int(feats.desc.shape[0]), 3))
        + np.array([0, 0, 6.0]), jnp.float32,
    )

    def cv_pose(desc_a, desc_b, va, vb, p3, xy_b, key):
        im, _, _ = matching.match(desc_a, desc_b, va, vb, 2.0, 30.0)
        pix = jnp.take(xy_b, jnp.maximum(im, 0), axis=0)
        ok = im >= 0
        k_mat = jnp.array(
            [[consts.calib.fx, 0.0, consts.calib.cx],
             [0.0, consts.calib.fy, consts.calib.cy],
             [0.0, 0.0, 1.0]], jnp.float32,
        )
        return pnp_mod.pnp_ransac(p3, pix, ok, k_mat, key)

    f_pose = jax.jit(cv_pose)
    results["cvalg_pnp_chain_ms"] = bench(
        f_pose, feats.desc, feats.desc, feats.valid, feats.valid,
        pts3d, feats.xy, jax.random.PRNGKey(1),
    )

    if args.json:
        print(json.dumps(results))
    else:
        for k, v in results.items():
            print(f"{k:32s} {v:10.3f}")
    if args.out:
        # per-round stage-latency artifact (VERDICT r3 #9): regressions in
        # individual stages become visible in the committed record
        payload = {
            "metric": "microbench_stage_latencies_ms",
            "device": str(jax.devices()[0]),
            "note": ("standalone per-call latencies through the axon "
                     "tunnel (~24 ms dispatch floor, NON-additive); for "
                     "pipeline throughput use bench.py — this artifact "
                     "tracks RELATIVE per-stage regressions only"),
            "results": {k: round(v, 4) for k, v in results.items()},
        }
        Path(args.out).write_text(json.dumps(payload, indent=1) + "\n")
        print(f"wrote {args.out}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
