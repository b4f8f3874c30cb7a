"""Honest per-stage budget of the VIO step: chained prefixes on sim frames.

The tunnel's dispatch dedup/pipelining makes standalone stage timings
non-additive (NOTES.md), and ablation changes data-dependent branch costs.
This profiler instead times CHAINED PREFIXES of the staged pipeline
(`models/vio.py` stage_imu/frontend/ba/pool) on physically consistent
simulator frames with live tracking, exactly like bench.py's protocol:
state chained across iterations, per-iteration-fresh frame/IMU args, scalar
host readback as the barrier. Stage cost = difference of adjacent prefixes.

Front-end internals get the same treatment at the extraction level, with a
carried scalar injected into the input image (`img + c * 1e-30`) to create
a true data dependency chain for stateless sub-stages.

Usage:
    python benchmarks/profile_chain.py             # all groups
    python benchmarks/profile_chain.py step        # the 4-stage prefixes
    python benchmarks/profile_chain.py frontend    # extract/match split
    python benchmarks/profile_chain.py extract     # pyramid/select/sample
Batch via PROF_B (default 32), iterations via PROF_N (default 5).
"""
import functools
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

import bench as bench_mod
from pose_estimation_tpu.camera import CameraModel
from pose_estimation_tpu.models import vio as vio_mod

B = int(os.environ.get("PROF_B", "32"))
N_IT = int(os.environ.get("PROF_N", "5"))
GROUPS = set(sys.argv[1:]) or {"step", "frontend", "extract"}

cfg = bench_mod.bench_config()
cm = CameraModel.from_config(cfg)
consts, static = vio_mod.build_constants(cfg, cm)

n_frames = B + N_IT + 1
t0 = time.time()
frames, gyrs, accs, imu_mask, state0 = bench_mod.make_sim_world(cfg, n_frames)
print(f"sim world: {n_frames} frames in {time.time() - t0:.1f}s", flush=True)


def batch_args(i):
    idx = np.arange(B) + i
    il = jnp.stack([frames[j][0] for j in idx])
    ir = jnp.stack([frames[j][1] for j in idx])
    g = jnp.stack([gyrs[j] for j in idx])
    a = jnp.stack([accs[j] for j in idx])
    keys = jax.random.split(jax.random.PRNGKey(i), B)
    return il, ir, g, a, keys


ARGS = [batch_args(i) for i in range(N_IT + 1)]


def init_state():
    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tests"))
    from sim import seeded_state

    sts = [seeded_state(static, state0, j) for j in range(B)]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *sts)


ST0 = init_state()


def readback(x):
    leaf = jax.tree.leaves(x)[0]
    idx = (0,) * getattr(leaf, "ndim", 0)
    return float(np.asarray(leaf[idx] if idx else leaf))


def chain_time(name, step):
    """step(state, il, ir, g, a, keys) -> state-like carry. Chained timing,
    bench.py protocol. Returns ms per iteration."""
    jstep = jax.jit(step)
    s = jstep(ST0, *ARGS[0])
    readback(s)
    t0 = time.time()
    s = ST0
    for i in range(1, N_IT + 1):
        s = jstep(s, *ARGS[i])
    readback(s)
    dt = (time.time() - t0) / N_IT * 1e3
    print(f"{name}: {dt:.2f} ms/it  ({dt / B:.3f} ms/frame)", flush=True)
    return dt


# --------------------------------------------------------------- step level
def prefix_step(n_stages):
    def one(s, il, ir, g, a, key):
        s, _dt = vio_mod.stage_imu(s, g, a, imu_mask, consts, static)
        if n_stages == 1:
            return s
        s, cur, tr = vio_mod.stage_frontend(s, il, ir, key, consts, static)
        if n_stages == 2:
            return s
        s, _c, _i = vio_mod.stage_ba(s, tr.n_matches, consts, static)
        if n_stages == 3:
            return s
        return vio_mod.stage_pool(s, cur, tr, tr.n_matches, consts, static)

    return jax.vmap(one, in_axes=(0, 0, 0, 0, 0, 0))


# ----------------------------------------------------------- frontend level
from pose_estimation_tpu.frontend import tracker  # noqa: E402


def frontend_sub(depth):
    """depth 1: extract only; 2: + internal match; 3: full front-end.
    Carries (state, c) where c chains a scalar into the next frame."""

    def one(s, c, il, ir, g, a, key):
        il = il + c * 1e-30
        feats_l, feats_r = vio_mod.extract_rectified(il, ir, consts, static)
        if depth == 1:
            return s, feats_l.score[0]
        k1, k2 = jax.random.split(key)
        cur = tracker.internal_match(
            feats_l, feats_r, k1, static.cur_capacity,
            static.match_ratio, static.min_match_dist,
            static.max_vertical_dist,
        )
        if depth == 2:
            return s, cur.px_l[0, 0]
        tr = tracker.external_track(
            cur, s.pool, k2, static.match_ratio, static.min_match_dist
        )
        from pose_estimation_tpu.models import pool as pool_mod

        pool = pool_mod.record_observations(s.pool, tr.slot, tr.matched, cur.px_l)
        return s._replace(pool=pool), cur.px_l[0, 0]

    def step(carry, il, ir, g, a, keys):
        s, c = carry
        return jax.vmap(one, in_axes=(0, 0, 0, 0, 0, 0, 0))(s, c, il, ir, g, a, keys)

    return step


# ------------------------------------------------------------ extract level
from pose_estimation_tpu.ops import fast as fast_mod  # noqa: E402
from pose_estimation_tpu.ops import orb  # noqa: E402


def extract_sub(depth):
    """Plane-stack level on [2B, H, W] images. depth 1: pyramid einsums;
    2: + fused select kernel; 3: + plane top-k/subpixel/slice; 4: full
    extract_batch (+ sampler + BRIEF)."""
    ocfg = static.orb
    h, w = cfg.image_height, cfg.image_width
    budgets = orb.level_budgets(ocfg)
    shapes = orb.pyramid_shapes(h, w, ocfg)
    nl = ocfg.n_levels

    def step(carry, il, ir, g, a, keys):
        c = carry
        imgs = jnp.concatenate([il, ir], axis=0) + c * 1e-30   # [2B, H, W]
        b = imgs.shape[0]
        if depth >= 4:
            feats = orb.extract_batch(imgs, ocfg)
            return feats.xy[0, 0, 0]
        stack = orb.pyramid_stack(imgs, ocfg)
        if depth == 1:
            return stack[0, 0, 0]
        bounds = [shapes[p // b] for p in range(nl * b)]
        if depth == 2:
            from pose_estimation_tpu.ops.pallas_fast import fast_select_pallas

            flat_s, flat_code, flat_x, flat_y = fast_select_pallas(
                stack, bounds, ocfg.th_hi, ocfg.th_lo, orb.EDGE,
                ocfg.k_per_cell, False, compute_dtype=jnp.bfloat16,
            )
            return flat_s[0, 0] + flat_code[0, 0] + flat_x[0, 0] + flat_y[0, 0]
        kps = fast_mod.select_keypoints_fused(
            stack, bounds, ocfg.th_hi, ocfg.th_lo, budgets[0],
            border=orb.EDGE, k_per_cell=ocfg.k_per_cell,
            compute_dtype=jnp.bfloat16,
        )
        return kps.xy[0, 0, 0] + kps.score[0, 0]

    return step


def main():
    if "step" in GROUPS:
        print(f"== step prefixes (B={B}) ==", flush=True)
        prev = 0.0
        for n, name in ((1, "imu"), (2, "imu+fe"), (3, "imu+fe+ba"), (4, "full")):
            dt = chain_time(name, prefix_step(n))
            print(f"   -> stage {name.split('+')[-1]}: "
                  f"{(dt - prev) / B:.3f} ms/frame", flush=True)
            prev = dt

    if "frontend" in GROUPS:
        print(f"== frontend prefixes (B={B}) ==", flush=True)
        c0 = jnp.zeros(B)
        prev = 0.0
        for d, name in ((1, "extract"), (2, "+internal"), (3, "+external")):
            f = frontend_sub(d)
            jstep = jax.jit(f)
            carry = jstep((ST0, c0), *ARGS[0][:5])
            readback(carry)
            t0 = time.time()
            carry = (ST0, c0)
            for i in range(1, N_IT + 1):
                carry = jstep(carry, *ARGS[i][:5])
            readback(carry)
            dt = (time.time() - t0) / N_IT * 1e3
            print(f"{name}: {dt:.2f} ms/it ({dt / B:.3f} ms/frame)"
                  f"  -> delta {(dt - prev) / B:.3f} ms/frame", flush=True)
            prev = dt

    if "extract" in GROUPS:
        print(f"== extract sub-stages (2B={2 * B} images) ==", flush=True)
        prev = 0.0
        for d, name in ((1, "pyramid"), (2, "+selectkrnl"), (3, "+planetopk"),
                        (4, "+sample/desc")):
            f = extract_sub(d)
            jstep = jax.jit(f)
            c = jstep(jnp.zeros(()), *ARGS[0][:5])
            readback(c)
            t0 = time.time()
            c = jnp.zeros(())
            for i in range(1, N_IT + 1):
                c = jstep(c, *ARGS[i][:5])
            readback(c)
            dt = (time.time() - t0) / N_IT * 1e3
            print(f"{name}: {dt:.2f} ms/it ({dt / (2 * B):.3f} ms/img,"
                  f" {dt / B:.3f} ms/frame)"
                  f"  -> delta {(dt - prev) / B:.3f} ms/frame", flush=True)
            prev = dt


if __name__ == "__main__":
    main()
