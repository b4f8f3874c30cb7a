"""Decompose the batched pool_update cost: aging scatter, DLT-eigh
triangulation, insert scatters (argsort + per-field scatter)."""
import os
import sys
import time
import functools
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from pose_estimation_tpu import load_config
from pose_estimation_tpu.camera import CameraModel
from pose_estimation_tpu.models import vio as vio_mod
from pose_estimation_tpu.models import pool as pool_mod
from pose_estimation_tpu.frontend import tracker
from pose_estimation_tpu.ops import triangulate as tri_mod

B = int(os.environ.get("PB_BATCH", "32"))
cfg = load_config("/root/reference/config/euroc.yml", dataset="euroc")
cm = CameraModel.from_config(cfg)
consts, static = vio_mod.build_constants(cfg, cm)
rng = np.random.default_rng(0)


def timeit(name, f, *a, n=6):
    leaves, treedef = jax.tree.flatten(a)
    fi = next(
        (i for i, l in enumerate(leaves)
         if hasattr(l, "dtype") and jnp.issubdtype(l.dtype, jnp.floating)),
        None)

    def body(c, _):
        ls = list(leaves)
        if fi is not None:
            ls[fi] = ls[fi] + c
        out = f(*jax.tree.unflatten(treedef, ls))
        s = jnp.float32(0.0)
        for l in jax.tree.leaves(out):
            s = s + jnp.sum(l.astype(jnp.float32))
        return s * 1e-30, None

    g = jax.jit(lambda: jax.lax.scan(body, jnp.float32(0.0), None, length=n)[0])
    float(np.asarray(g()))
    t0 = time.time()
    float(np.asarray(g()))
    dt = (time.time() - t0) / n * 1e3
    print(f"{name}: {dt:.1f} ms/call, {dt / B:.2f} ms/frame", flush=True)


state1 = vio_mod.init_vio_state(static)
state = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + a.shape), state1)
pool = state.pool
M = static.cur_capacity
P = static.pool_capacity
slot = jnp.asarray(rng.integers(0, P, (B, M)), jnp.int32)
matched = jnp.asarray(rng.uniform(size=(B, M)) < 0.5)
pxl = jnp.asarray(rng.uniform(30, 400, (B, M, 2)), jnp.float32)
pxr = pxl - jnp.asarray(
    rng.uniform(2, 40, (B, M, 1)), jnp.float32) * jnp.asarray([[1.0, 0.0]])

timeit("age_evict",
       jax.vmap(lambda p, s, m: pool_mod.age_and_evict(
           p, s, m, static.max_feature_age)),
       pool, slot, matched)
timeit("tri_dlt",
       jax.vmap(lambda a, b: tri_mod.triangulate(consts.p1, consts.p2, a, b)),
       pxl, pxr)
fx, fy = consts.p1[0, 0], consts.p1[1, 1]
cx, cy = consts.p1[0, 2], consts.p1[1, 2]
bl = -consts.p2[0, 3] / fx
timeit("tri_rect",
       jax.vmap(lambda a, b: tri_mod.triangulate_rectified(
           fx, cx, cy, fy, bl, a, b)),
       pxl, pxr)
desc = jnp.asarray(rng.integers(0, 2, (B, M, 256)), jnp.int8)
pos = jnp.asarray(rng.normal(size=(B, M, 3)), jnp.float32)
want = jnp.asarray(rng.uniform(size=(B, M)) < 0.3)
timeit("insert",
       jax.vmap(pool_mod.insert_features),
       pool, pxl, desc, desc, pos, want)
print("done", flush=True)
