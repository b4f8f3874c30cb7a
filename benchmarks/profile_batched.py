"""Per-stage TPU profile of the BATCHED (vmapped) VIO step.

Identifies where the batched ms/frame goes (the throughput headline). Each
stage is vmapped over B sequences and timed with a chained readback, same
protocol as bench.py. Run stages selectively: argv stage names.
"""
import os
import sys
import time
import functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from pose_estimation_tpu import load_config
from pose_estimation_tpu.camera import CameraModel
from pose_estimation_tpu.models import vio as vio_mod
from pose_estimation_tpu.models import pool as pool_mod
from pose_estimation_tpu.backend import ba as ba_mod
from pose_estimation_tpu.backend.ba import LandmarkObs
from pose_estimation_tpu.frontend import tracker
from pose_estimation_tpu.imu import preintegration as pre
from pose_estimation_tpu.ops import orb

B = int(__import__("os").environ.get("PB_BATCH", "8"))
STAGES = set(sys.argv[1:])

cfg = load_config("/root/reference/config/euroc.yml", dataset="euroc")
cm = CameraModel.from_config(cfg)
consts, static = vio_mod.build_constants(cfg, cm)
rng = np.random.default_rng(0)
h, w = cfg.image_height, cfg.image_width
imgs = jnp.asarray(rng.uniform(0, 255, (B, 2, h, w)), jnp.float32)


def timeit(name, f, *a, n=6):
    """Dedup-proof chained timing: n calls inside ONE lax.scan whose carry
    perturbs an input with the previous output, so the tunnel can neither
    dedup identical dispatches nor pipeline independent ones (both observed
    to corrupt per-call timings — see NOTES.md)."""
    if STAGES and name.split("(")[0] not in STAGES:
        r = jax.eval_shape(f, *a)
        return jax.tree.map(
            lambda s: jnp.zeros(s.shape, s.dtype), r,
            is_leaf=lambda x: hasattr(x, "shape"))

    leaves, treedef = jax.tree.flatten(a)
    fi = next(
        (i for i, l in enumerate(leaves)
         if hasattr(l, "dtype") and jnp.issubdtype(l.dtype, jnp.floating)),
        None,
    )

    # the inputs must be jit ARGUMENTS, not closure captures: captured
    # concrete arrays are serialized into the program as literal constants,
    # and a B=32 plane stack (~740 MB) blows the remote-compile helper's
    # request-body limit (HTTP 413)
    def g(*ls):
        def body(c, _):
            ls2 = list(ls)
            if fi is not None:
                ls2[fi] = ls2[fi] + c
            out = f(*jax.tree.unflatten(treedef, ls2))
            # consume EVERY output with a full reduction: a scalar-slice
            # carry lets XLA dead-code/slice-propagate away the very work
            # under test
            s = jnp.float32(0.0)
            for l in jax.tree.leaves(out):
                s = s + jnp.sum(l.astype(jnp.float32))
            return s * 1e-30, None

        return jax.lax.scan(body, jnp.float32(0.0), None, length=n)[0]

    g = jax.jit(g)
    float(np.asarray(g(*leaves)))  # compile + warm
    t0 = time.time()
    float(np.asarray(g(*leaves)))
    dt = (time.time() - t0) / n * 1e3
    print(f"{name}: {dt:.1f} ms/call, {dt / B:.2f} ms/frame", flush=True)
    return jax.jit(f)(*a)


# front-end: extract both stereo images of all sequences
feats = timeit(
    "extract",
    jax.vmap(lambda im: orb.extract_batch(im, static.orb)),
    imgs)

# ---- extract sub-stages (flattened plane stack, like extract_batch) ----
from pose_estimation_tpu.ops import fast as fast_mod

ocfg = static.orb
budgets = orb.level_budgets(ocfg)
shapes = orb.pyramid_shapes(h, w, ocfg)
nl = ocfg.n_levels


def build_stack(ims):  # ims [N, H, W] -> [nl*N, H, W]
    n_img = ims.shape[0]
    planes = []
    for lvl in range(nl):
        lh, lw = shapes[lvl]
        lv = ims if lvl == 0 else jax.image.resize(
            ims, (n_img, lh, lw), method="linear")
        planes.append(jnp.pad(lv, ((0, 0), (0, h - lh), (0, w - lw))))
    return jnp.concatenate(planes, axis=0)


flat_imgs = imgs.reshape(B * 2, h, w)
stack = timeit("x_stack", build_stack, flat_imgs)
bounds = [shapes[p // (B * 2)] for p in range(nl * B * 2)]

# the real TPU default path: FAST+NMS+gates+cell-top-k in one kernel
# (x_fselk = kernel only; x_fsel = + plane top-k sort + subpixel, the
# whole selection as extract_batch runs it)
timeit(
    "x_fselk",
    lambda s: __import__(
        "pose_estimation_tpu.ops.pallas_fast", fromlist=["x"]
    ).fast_select_pallas(s, bounds, ocfg.th_hi, ocfg.th_lo, orb.EDGE,
                         ocfg.k_per_cell),
    stack)
timeit(
    "x_fsel",
    lambda s: fast_mod.select_keypoints_fused(
        s, bounds, ocfg.th_hi, ocfg.th_lo, budgets[0],
        border=orb.EDGE, k_per_cell=ocfg.k_per_cell),
    stack)

if ocfg.fast_backend == "pallas":
    from pose_estimation_tpu.ops.pallas_fast import fast_score_nms_pallas

    raw_masked = timeit("x_fast", fast_score_nms_pallas, stack)
    kps = timeit(
        "x_select",
        lambda sm, raw: fast_mod.select_keypoints_batched(
            sm, bounds, ocfg.th_hi, ocfg.th_lo, budgets[0],
            cell=ocfg.cell, border=orb.EDGE, k_per_cell=ocfg.k_per_cell,
            pre_nms=True, raw_score=raw),
        raw_masked[1], raw_masked[0])
else:
    score = timeit("x_fast", fast_mod.fast_score, stack)
    kps = timeit(
        "x_select",
        lambda s: fast_mod.select_keypoints_batched(
            s, bounds, ocfg.th_hi, ocfg.th_lo, budgets[0],
            cell=ocfg.cell, border=orb.EDGE, k_per_cell=ocfg.k_per_cell),
        score)

k_tot = sum(budgets)
nplanes = nl * B * 2
kk = B * 2 * k_tot
rngl = np.random.default_rng(1)
xy_flat = jnp.asarray(np.stack([
    rngl.uniform(20, w - 20, kk), rngl.uniform(20, h - 20, kk)], -1),
    jnp.float32)
base_flat = jnp.asarray(
    rngl.integers(0, nplanes, kk) * (h * w), jnp.int32)
ang = timeit(
    "x_angle",
    lambda s, b, p: orb.ic_angle_planes(s.reshape(-1), b, p, h, w),
    stack, base_flat, xy_flat)
timeit(
    "x_angle_integral",
    lambda s, b, p: orb.ic_angle_integral(
        *(m.reshape(-1) for m in orb.moment_maps_integral(s)), b, p, h, w),
    stack, base_flat, xy_flat)
blur = timeit("x_blur", orb.gaussian_blur7, stack)
timeit(
    "x_brief",
    lambda bl, b, p, a: orb.brief_descriptors_planes(
        bl.reshape(-1), b, p, a, h, w),
    blur, base_flat, xy_flat, ang)
timeit(
    "x_brief_pool",
    lambda bl, b, p, a: orb.brief_descriptors_pool(
        bl.reshape(-1), b, p, a, h, w),
    blur, base_flat, xy_flat, ang)

# fused Pallas sampler over the same flattened stack (chunk-uniform planes:
# level-major sorted ids, the layout extract_batch feeds it); pad K to the
# chunk size like extract_batch does per level block
kk32 = -(-kk // 32) * 32
plane_sorted = jnp.asarray(
    np.sort(rngl.integers(0, nplanes, kk32)).astype(np.int32))
xy_pad32 = jnp.pad(xy_flat, ((0, kk32 - kk), (0, 0)), constant_values=30.0)
timeit(
    "x_sample",
    lambda s, p, x: orb._pool_sampler(False)(s, p, x),
    stack, plane_sorted, xy_pad32)
fl = jax.tree.map(lambda a: a[:, 0], feats)
fr = jax.tree.map(lambda a: a[:, 1], feats)
keys = jax.random.split(jax.random.PRNGKey(0), B)

cur = timeit(
    "internal_match",
    jax.vmap(lambda a, b, k: tracker.internal_match(
        a, b, k, static.cur_capacity, static.match_ratio,
        static.min_match_dist, static.max_vertical_dist)),
    fl, fr, keys)

state1 = vio_mod.init_vio_state(static)
state = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + a.shape), state1)

tr = timeit(
    "external_track",
    jax.vmap(lambda c, p, k: tracker.external_track(
        c, p, k, static.match_ratio, static.min_match_dist)),
    cur, state.pool, keys)

timeit(
    "record_obs",
    jax.vmap(pool_mod.record_observations),
    state.pool, tr.slot, tr.matched, cur.px_l)

m = cfg.imu_chunk
gyr = jnp.asarray(rng.normal(size=(B, m, 3)) * 0.1, jnp.float32)
acc = jnp.asarray(rng.normal(size=(B, m, 3)) * 0.3 + np.array([9.81, 0, 0]), jnp.float32)
mask = jnp.broadcast_to(jnp.arange(m) < 20, (B, m))
timeit(
    "preint",
    jax.vmap(lambda p_, g, a, mk, bg, ba: pre.integrate_chunk(
        p_, g, a, mk, bg, ba, consts.imu)),
    state.preint, gyr, acc, mask, state.bg, state.ba)

npool = static.pool_capacity
pos = jnp.asarray(rng.normal(size=(B, npool, 3)) * 3 + np.array([0, 0, 5]), jnp.float32)
obs_px = jnp.asarray(rng.uniform(0, 400, size=(B, npool, static.window, 2)), jnp.float32)
obs_mask = jnp.asarray(rng.uniform(size=(B, npool, static.window)) < 0.3)
timeit(
    "motion_ba",
    jax.vmap(lambda w_, po, px, mk: ba_mod.motion_only_ba(
        w_, LandmarkObs(po, px, mk), consts.calib, consts.gravity,
        static.prior_factor, static.max_iterations)[0]),
    state.win, pos, obs_px, obs_mask)

timeit(
    "pool_update",
    jax.vmap(lambda s, c, t: vio_mod.pool_update(s, c, t, consts, static)),
    state, cur, tr)

fn = functools.partial(vio_mod.ok_step, consts=consts, static=static)
timeit(
    "ok_step",
    jax.vmap(lambda s, il, ir, g, a, mk, k: fn(s, il, ir, g, a, mk, k)[0]),
    state, imgs[:, 0], imgs[:, 1], gyr, acc, mask, keys)
print("done", flush=True)
