"""Stage-level TPU profile of ok_step: where do 295 ms go?"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import time, functools
import jax, jax.numpy as jnp, numpy as np

from pose_estimation_tpu import load_config
from pose_estimation_tpu.camera import CameraModel
from pose_estimation_tpu.models import vio as vio_mod
from pose_estimation_tpu.models import pool as pool_mod
from pose_estimation_tpu.backend import ba as ba_mod
from pose_estimation_tpu.backend.ba import LandmarkObs
from pose_estimation_tpu.frontend import tracker
from pose_estimation_tpu.imu import preintegration as pre
from pose_estimation_tpu.ops import orb, remap

cfg = load_config("/root/reference/config/euroc.yml", dataset="euroc")
cm = CameraModel.from_config(cfg)
consts, static = vio_mod.build_constants(cfg, cm)
rng = np.random.default_rng(0)
h, w = cfg.image_height, cfg.image_width
img2 = jnp.asarray(rng.uniform(0, 255, (2, h, w)), jnp.float32)
maps2 = jnp.stack([consts.map_l, consts.map_r])


import sys
STAGES = set(sys.argv[1:])


def _scalar_readback(r):
    # index ON DEVICE and transfer 4 bytes: np.asarray(full_leaf) would pull
    # the whole (possibly 23 MB) array through the tunnel and dominate the
    # measurement (observed: 14 ms stages reading as ~190 ms)
    leaf = jax.tree.leaves(r)[0]
    idx = (0,) * getattr(leaf, "ndim", 0)
    return float(np.asarray(leaf[idx] if idx else leaf))


def timeit(name, f, *a, n=5):
    g = jax.jit(f)
    if STAGES and name.split("(")[0] not in STAGES:
        r = jax.eval_shape(f, *a)
        return jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), r,
                            is_leaf=lambda x: hasattr(x, "shape"))
    r = g(*a)
    _scalar_readback(r)
    t0 = time.time()
    for _ in range(n):
        r = g(*a)
    _scalar_readback(r)
    dt = (time.time() - t0) / n * 1e3
    print(f"{name}: {dt:.1f} ms", flush=True)
    return r


# ---- front-end pieces ----
rect = timeit("remap_pair", lambda i, m: remap.remap_bilinear(i, m), img2, maps2)
feats = timeit("extract_batch(2)", lambda im: orb.extract_batch(im, static.orb), rect)
fl = jax.tree.map(lambda a: a[0], feats)
fr = jax.tree.map(lambda a: a[1], feats)
key = jax.random.PRNGKey(0)
k1, k2 = jax.random.split(key)
cur = timeit(
    "internal_match",
    lambda a, b, k: tracker.internal_match(
        a, b, k, static.cur_capacity, static.match_ratio,
        static.min_match_dist, static.max_vertical_dist),
    fl, fr, k1)
state = vio_mod.init_vio_state(static)
pool = state.pool
tr = timeit(
    "external_track",
    lambda c, p, k: tracker.external_track(
        c, p, k, static.match_ratio, static.min_match_dist),
    cur, pool, k2)
timeit("record_obs", lambda p, s, m, px: pool_mod.record_observations(p, s, m, px),
       pool, tr.slot, tr.matched, cur.px_l)

# ---- IMU ----
m = cfg.imu_chunk
gyr = jnp.asarray(rng.normal(size=(m, 3)) * 0.1, jnp.float32)
acc = jnp.asarray(rng.normal(size=(m, 3)) * 0.3 + np.array([9.81, 0, 0]), jnp.float32)
mask = jnp.arange(m) < 20
timeit("preint_chunk",
       lambda p, g, a, mk: pre.integrate_chunk(p, g, a, mk, state.bg, state.ba, consts.imu),
       state.preint, gyr, acc, mask)

# ---- BA (forced, realistic pool occupancy) ----
npool = static.pool_capacity
win = state.win
pos = jnp.asarray(rng.normal(size=(npool, 3)) * 3 + np.array([0, 0, 5]), jnp.float32)
obs_px = jnp.asarray(rng.uniform(0, 400, size=(npool, static.window, 2)), jnp.float32)
obs_mask = jnp.asarray(rng.uniform(size=(npool, static.window)) < 0.3)
obs = LandmarkObs(pos, obs_px, obs_mask)
timeit("motion_only_ba",
       lambda w_, o: ba_mod.motion_only_ba(
           w_, o, consts.calib, consts.gravity,
           static.prior_factor, static.max_iterations)[0],
       win, obs)

# ---- pool update ----
timeit("pool_update",
       lambda s, c, t: vio_mod.pool_update(s, c, t, consts, static),
       state, cur, tr)

# ---- whole step ----
fn = functools.partial(vio_mod.ok_step, consts=consts, static=static)
timeit("ok_step(full)", lambda s: fn(s, img2[0], img2[1], gyr, acc, mask, key)[0], state)
print("done", flush=True)
