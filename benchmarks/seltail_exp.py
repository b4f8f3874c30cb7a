"""Chip microbench: select_keypoints_fused tail (plane top-k) variants.

Times the full selection (kernel + XLA tail) with the single flat sort
(budgets=None) vs the per-level top-k (budgets=...), plus the raw kernel,
at bench shapes (B=32 -> 512 planes).

Run: python benchmarks/seltail_exp.py [B]
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from pose_estimation_tpu import load_config
from pose_estimation_tpu.camera import CameraModel
from pose_estimation_tpu.models import vio as vio_mod
from pose_estimation_tpu.ops import fast as fast_mod
from pose_estimation_tpu.ops import orb
from pose_estimation_tpu.ops.pallas_fast import fast_select_pallas

B = int(sys.argv[1]) if len(sys.argv) > 1 else 32

cfg = load_config("/root/reference/config/euroc.yml", dataset="euroc")
cm = CameraModel.from_config(cfg)
consts, static = vio_mod.build_constants(cfg, cm)
ocfg = static.orb
budgets = orb.level_budgets(ocfg)
h, w = cfg.image_height, cfg.image_width
shapes = orb.pyramid_shapes(h, w, ocfg)
nl = ocfg.n_levels
n_img = B * 2

rng = np.random.default_rng(0)
imgs = [jnp.asarray(rng.uniform(0, 255, (n_img, h, w)).astype(np.float32))
        for _ in range(2)]
bounds = [shapes[p // n_img] for p in range(nl * n_img)]


def build_stack(ims):
    planes = []
    for lvl in range(nl):
        lh, lw = shapes[lvl]
        lv = ims if lvl == 0 else jax.image.resize(
            ims, (n_img, lh, lw), method="linear")
        planes.append(jnp.pad(lv, ((0, 0), (0, h - lh), (0, w - lw))))
    return jnp.concatenate(planes, axis=0)


stacks = [jax.jit(build_stack)(im) for im in imgs]
jax.block_until_ready(stacks)


def timeit(name, f, n=6):
    def g(c, s):
        out = f(s + c * 1e-30)
        first = jax.tree.leaves(out)[0]
        return first.ravel()[:1].astype(jnp.float32).reshape(()) * 1e-20, out

    gj = jax.jit(g)
    c, out = gj(jnp.zeros(()), stacks[0])
    float(np.asarray(c))
    t0 = time.time()
    c = jnp.zeros(())
    for i in range(1, n + 1):
        c, out = gj(c, stacks[i % 2])
    float(np.asarray(c))
    dt = (time.time() - t0) / n * 1e3
    print(f"{name:36s} {dt:8.2f} ms/call  {dt / B:6.3f} ms/frame", flush=True)


timeit("kernel only (flat build)", lambda s: fast_select_pallas(
    s, bounds, ocfg.th_hi, ocfg.th_lo, orb.EDGE, ocfg.k_per_cell))
timeit("kernel only (parts)", lambda s: [
    p[1] for p in fast_select_pallas(
        s, bounds, ocfg.th_hi, ocfg.th_lo, orb.EDGE, ocfg.k_per_cell,
        flat=False)])
timeit("fused select, flat sort", lambda s: fast_mod.select_keypoints_fused(
    s, bounds, ocfg.th_hi, ocfg.th_lo, budgets[0], border=orb.EDGE,
    k_per_cell=ocfg.k_per_cell))
timeit("fused select, per-level sort", lambda s: fast_mod.select_keypoints_fused(
    s, bounds, ocfg.th_hi, ocfg.th_lo, budgets[0], border=orb.EDGE,
    k_per_cell=ocfg.k_per_cell, budgets=budgets))

# raw lax.top_k at the two shape regimes
flat = jnp.asarray(rng.uniform(0, 90, (nl * n_img, 5760)).astype(np.float32))
timeit2_src = [flat, flat + 1.0]


def timeit_arr(name, f, srcs, n=6):
    def g(c, s):
        out = f(s + c * 1e-30)
        first = jax.tree.leaves(out)[0]
        return first.ravel()[:1].astype(jnp.float32).reshape(()) * 1e-20, out

    gj = jax.jit(g)
    c, out = gj(jnp.zeros(()), srcs[0])
    float(np.asarray(c))
    t0 = time.time()
    c = jnp.zeros(())
    for i in range(1, n + 1):
        c, out = gj(c, srcs[i % 2])
    float(np.asarray(c))
    dt = (time.time() - t0) / n * 1e3
    print(f"{name:36s} {dt:8.2f} ms/call  {dt / B:6.3f} ms/frame", flush=True)


timeit_arr(f"lax.top_k [{nl*n_img},5760]->217",
           lambda s: jax.lax.top_k(s, 217), timeit2_src)
sub = jnp.asarray(rng.uniform(0, 90, (n_img, 4992)).astype(np.float32))
timeit_arr(f"lax.top_k [{n_img},4992]->217 x8",
           lambda s: [jax.lax.top_k(s + i, 217) for i in range(8)],
           [sub, sub + 1.0])
print("done", flush=True)

# approx_max_k variants (TPU-accelerated partial top-k)
for rt in (0.99, 0.95, 0.90):
    timeit_arr(
        f"approx_max_k [512,5760]->217 rt={rt}",
        lambda s, rt=rt: jax.lax.approx_max_k(s, 217, recall_target=rt),
        timeit2_src)
