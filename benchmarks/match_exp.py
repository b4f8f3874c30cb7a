"""Chip microbench: internal_match cost anatomy at bench shapes.

profile_chain (B=32) showed internal_match at 1.62 ms/frame — the single
largest stage — while external_track (two Hamming matches + a RANSAC) is
0.13. This isolates the suspects: the batched 9x9 eigh inside
fundamental_ransac, the compact() scatter, and the one-hot row selects.

Run: PB_BATCH=32 python benchmarks/match_exp.py
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
from pose_estimation_tpu.camera import CameraModel
from pose_estimation_tpu.frontend import tracker
from pose_estimation_tpu.models import vio as vio_mod
from pose_estimation_tpu.ops import matching, orb, ransac

B = int(os.environ.get("PB_BATCH", "32"))

cfg = load_config("/root/reference/config/euroc.yml", dataset="euroc")
cm = CameraModel.from_config(cfg)
consts, static = vio_mod.build_constants(cfg, cm)

rng = np.random.default_rng(0)
K = sum(orb.level_budgets(static.orb))
CAP = static.cur_capacity


def mk_feats(key):
    return orb.OrbFeatures(
        xy=jnp.asarray(rng.uniform(30, 400, (B, K, 2)), jnp.float32),
        angle=jnp.zeros((B, K), jnp.float32),
        score=jnp.asarray(rng.uniform(1, 90, (B, K)), jnp.float32),
        level=jnp.zeros((B, K), jnp.int32),
        desc=jnp.asarray(
            rng.integers(0, 2, (B, K, 256)) * 2 - 1, jnp.int8
        ),
        valid=jnp.asarray(rng.uniform(size=(B, K)) < 0.9),
    )


fl, fr = mk_feats(0), mk_feats(1)
# correlated descriptors so matches exist: right = left with bit noise
flip = jnp.asarray(rng.uniform(size=(B, K, 256)) < 0.08)
fr = fr._replace(
    desc=jnp.where(flip, -fl.desc, fl.desc),
    xy=fl.xy + jnp.asarray(rng.normal(0, 1.0, (B, K, 2)), jnp.float32)
    * jnp.array([8.0, 0.3]),
)
keys = jax.random.split(jax.random.PRNGKey(0), B)


def timeit(name, f, *a, n=6):
    leaves, treedef = jax.tree.flatten(a)

    def g(*ls):
        def body(c, _):
            ls2 = [ls[0] + c] + list(ls[1:])
            out = f(*jax.tree.unflatten(treedef, ls2))
            first = jax.tree.leaves(out)[0]
            return (
                first.ravel()[:1].astype(jnp.float32) * 1e-20
            ).reshape(()).astype(ls[0].dtype), out

        return jax.lax.scan(body, jnp.zeros((), ls[0].dtype), None, length=n)

    gj = jax.jit(g)
    out = gj(*leaves)
    jax.block_until_ready(out)
    t0 = time.time()
    out = gj(*leaves)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / n * 1e3
    print(f"{name:32s} {dt:8.3f} ms/call  {dt / B * 1e3:8.1f} us/frame",
          flush=True)
    return out


def vm(f):
    return jax.vmap(f)


# full internal_match
timeit("internal_match (full)", vm(
    lambda l, r, k: tracker.internal_match(
        l, r, k, CAP, static.match_ratio, static.min_match_dist,
        static.max_vertical_dist)
), fl, fr, keys)

# stereo match only
sm = timeit("stereo_match", vm(
    lambda l, r: matching.stereo_match(
        l.desc, r.desc, l.valid, r.valid, l.xy, r.xy,
        static.match_ratio, static.min_match_dist,
        static.max_vertical_dist)
), fl, fr)

# + ransac
def to_ransac(l, r, k):
    m = matching.stereo_match(
        l.desc, r.desc, l.valid, r.valid, l.xy, r.xy,
        static.match_ratio, static.min_match_dist,
        static.max_vertical_dist)
    return ransac.fundamental_ransac(l.xy, r.xy[m.index], m.valid, k)


timeit("stereo_match + ransac", vm(to_ransac), fl, fr, keys)

# ransac internals: eigh of the 9x9 normal matrices
a9 = jnp.asarray(rng.normal(size=(B, 64, 8, 9)), jnp.float32)


def eigh_only(a):
    ata = jnp.einsum("bij,bik->bjk", a, a)
    _, vecs = jnp.linalg.eigh(ata)
    return vecs


timeit("eigh [64,9,9] per lane", vm(eigh_only), a9)

# no-ransac internal match (gates only)
timeit("internal_match (no ransac)", vm(
    lambda l, r, k: tracker.internal_match(
        l, r, k, CAP, static.match_ratio, static.min_match_dist,
        static.max_vertical_dist, use_ransac=False)
), fl, fr, keys)

# compact alone (narrow payloads)
mask = jnp.asarray(rng.uniform(size=(B, K)) < 0.5)
xyp = fl.xy


def compact_only(m, xy):
    return tracker.compact(
        m, CAP, xy, xy, jnp.arange(K, dtype=jnp.int32),
        jnp.arange(K, dtype=jnp.int32))


timeit("compact (4 narrow payloads)", vm(compact_only), mask, xyp)

# one-hot row selects
idx = jnp.asarray(rng.integers(0, K, (B, CAP)), jnp.int32)
vmask = jnp.asarray(rng.uniform(size=(B, CAP)) < 0.9)
timeit("select_rows_mxu x2", vm(
    lambda d, i, v: (matching.select_rows_mxu(d, i, v),
                     matching.select_rows_mxu(d, i, v))
), fl.desc, idx, vmask)

print("done", flush=True)
