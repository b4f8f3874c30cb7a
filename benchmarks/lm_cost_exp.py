"""On-chip cost anatomy of the motion-BA LM solve (vmapped, bench shapes).

Times lm_solve_normal at several iteration CAPS (the while_loop runs to the
cap on non-converging random data), isolating per-iteration cost, plus the
two candidate bodies: the 15W-dim damped Cholesky solve alone and the
normal_fn (weighted block sums) alone. Batched B lanes like the bench.

Run: PB_BATCH=32 python benchmarks/lm_cost_exp.py
"""
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from pose_estimation_tpu import load_config
from pose_estimation_tpu.backend import ba as ba_mod
from pose_estimation_tpu.backend import lm as lm_mod
from pose_estimation_tpu.backend.ba import LandmarkObs
from pose_estimation_tpu.camera import CameraModel
from pose_estimation_tpu.models import vio as vio_mod

B = int(os.environ.get("PB_BATCH", "32"))

cfg = load_config("/root/reference/config/euroc.yml", dataset="euroc")
cm = CameraModel.from_config(cfg)
consts, static = vio_mod.build_constants(cfg, cm)
rng = np.random.default_rng(0)

state1 = vio_mod.init_vio_state(static)
win = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + a.shape), state1.win)
npool = static.pool_capacity
pos = jnp.asarray(rng.normal(size=(B, npool, 3)) * 3 + np.array([0, 0, 5]),
                  jnp.float32)
obs_px = jnp.asarray(rng.uniform(0, 400, size=(B, npool, static.window, 2)),
                     jnp.float32)
obs_mask = jnp.asarray(rng.uniform(size=(B, npool, static.window)) < 0.3)


def timeit(name, f, *a, n=6):
    leaves, treedef = jax.tree.flatten(a)

    def g(*ls):
        def body(c, _):
            ls2 = [ls[0] + c] + list(ls[1:])
            out = f(*jax.tree.unflatten(treedef, ls2))
            first = jax.tree.leaves(out)[0]
            return (first.ravel()[:1] * 1e-20).reshape(()).astype(ls[0].dtype), out
        return jax.lax.scan(body, jnp.zeros((), ls[0].dtype), None, length=n)

    gj = jax.jit(g)
    out = gj(*leaves)
    jax.block_until_ready(out)
    float(jax.tree.leaves(out)[0].ravel()[0])
    t0 = time.time()
    out = gj(*leaves)
    float(jax.tree.leaves(out)[0].ravel()[0])
    dt = (time.time() - t0) / n * 1e3
    print(f"{name:28s} {dt:8.3f} ms/call  {dt / B * 1e3:8.1f} us/frame",
          flush=True)
    return out


def solve_at_cap(cap):
    def one(w_, po, px, mk):
        return ba_mod.motion_only_ba(
            w_, LandmarkObs(po, px, mk), consts.calib, consts.gravity,
            static.prior_factor, cap)[0]
    return jax.vmap(one)


for cap in (2, 5, 10, 20):
    timeit(f"motion_ba cap={cap}", solve_at_cap(cap), win, pos, obs_px,
           obs_mask)


# isolated bodies at bench shapes
def chol_solve(h, g, lam):
    d = jnp.diagonal(h, axis1=-2, axis2=-1)
    d = jnp.where(d > 0, d, 1.0)
    hd = h + lam[..., None, None] * jax.vmap(jnp.diag)(d)
    chol = jnp.linalg.cholesky(hd)
    return jax.scipy.linalg.cho_solve((chol, True), g[..., None])[..., 0]


n = 15 * static.window
hmat = jnp.asarray(rng.normal(size=(B, n, n)), jnp.float32)
hmat = hmat @ jnp.swapaxes(hmat, -1, -2) + 10.0 * jnp.eye(n)
gvec = jnp.asarray(rng.normal(size=(B, n)), jnp.float32)
lam = jnp.full((B,), 1e-3, jnp.float32)
timeit("damped chol_solve x1", chol_solve, hmat, gvec, lam)


def chol20(h, g, lam):
    def body(c, _):
        s = chol_solve(h, g + c * 1e-20, lam)
        return s[:, 0], s
    return jax.lax.scan(body, jnp.zeros(B), None, length=20)


timeit("damped chol_solve x20", chol20, hmat, gvec, lam)


def normal20(w_, po, px, mk):
    def one(w1, po1, px1, mk1):
        nf, x0, _ = ba_mod.build_normal_problem(
            w1, LandmarkObs(po1, px1, mk1), consts.calib, consts.gravity,
            static.prior_factor)

        def body(c, _):
            h, g, cost = nf(x0 + c * 1e-20)
            return cost * 1e-20, (h, g, cost)
        return jax.lax.scan(body, jnp.zeros((), jnp.float32), None, length=20)
    return jax.vmap(one)(w_, po, px, mk)


timeit("normal_fn x20", normal20, win, pos, obs_px, obs_mask)
print("done", flush=True)
