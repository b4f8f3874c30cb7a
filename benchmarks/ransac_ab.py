"""A/B the RANSAC nullspace solver's effect on LM convergence.

Replays the bench sim world through ok_scan twice — _null8 (production)
vs the eigh oracle patched into _eight_point — and prints per-frame
tracked / ba_iters / inlier stats. Motivation: scan-chain mean ba_iters
moved 13.0 -> 19.5 across the round-4 session; this isolates whether the
nullspace swap is responsible.

Run: python benchmarks/ransac_ab.py [eigh|null8|both]
"""
import functools
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
from pose_estimation_tpu.ops import ransac

mode = sys.argv[1] if len(sys.argv) > 1 else "both"

cfg = bench_mod.bench_config()
cm = CameraModel.from_config(cfg)
consts, static = vio_mod.build_constants(cfg, cm)
n_scan = 24
frames, gyrs, accs, imu_mask, state0 = bench_mod.make_sim_world(cfg, 2 * n_scan)

_null8_orig = ransac._null8


def _null_eigh(a):
    ata = jnp.einsum("bij,bik->bjk", a, a)
    _, vecs = jnp.linalg.eigh(ata)
    return vecs[..., 0]


def run(name, koff=0):
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))
    from sim import seeded_state

    st = seeded_state(static, state0, 0)

    def window(lo):
        idx = np.arange(n_scan) + lo
        return (
            jnp.stack([frames[j][0] for j in idx]),
            jnp.stack([frames[j][1] for j in idx]),
            jnp.stack([gyrs[j] for j in idx]),
            jnp.stack([accs[j] for j in idx]),
            jax.random.split(jax.random.PRNGKey(lo + koff), n_scan),
        )

    def scan_fn(carry, xs):
        il, ir, g, a, k = xs
        s2, met = vio_mod.ok_step(
            carry, il, ir, g, a, imu_mask, k, consts, static)
        return s2, (met["n_tracked"], met["ba_iters"], met["n_stereo"])

    run_scan = jax.jit(lambda s, xs: jax.lax.scan(scan_fn, s, xs))
    t0 = time.time()
    st, _ = run_scan(st, window(0))
    float(np.asarray(jax.tree.leaves(st)[0]).ravel()[0])
    t0 = time.time()
    st, (trk, bai, nst) = run_scan(st, window(n_scan))
    trk, bai, nst = map(np.asarray, (trk, bai, nst))
    dt = (time.time() - t0) / n_scan * 1e3
    print(f"{name}: {dt:.2f} ms/frame  tracked={trk.mean():.1f} "
          f"stereo={nst.mean():.1f} ba_iters={bai.mean():.2f}", flush=True)
    print(f"  per-frame ba_iters: {bai.astype(int).tolist()}", flush=True)


for koff in (0, 1000, 2000):
    if mode in ("null8", "both"):
        run(f"null8 k{koff}", koff)
    if mode in ("eigh", "both"):
        ransac._null8 = _null_eigh
        try:
            run(f"eigh  k{koff}", koff)
        finally:
            ransac._null8 = _null8_orig
