"""Chip microbench: fused select kernel row-band size sweep.

The detection kernel's cost has a per-program component (tile load, fixed
overhead) and a per-row compute component; larger bands launch fewer
programs over the same content rows. Chained protocol (scalar carry into
fresh args, scalar readback).

Usage: python benchmarks/selband_exp.py [B]
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from pose_estimation_tpu.ops import orb
from pose_estimation_tpu.ops.pallas_fast import fast_select_pallas

B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
H, W = 480, 752
N_IT = 5

cfg = orb.OrbConfig(n_features=800, n_levels=8)
shapes = orb.pyramid_shapes(H, W, cfg)
nl = cfg.n_levels
nplanes = nl * 2 * B
bounds = [shapes[p // (2 * B)] for p in range(nplanes)]

rng = np.random.default_rng(0)
imgs = [
    jnp.asarray(
        np.round(rng.uniform(0, 255, (2 * B, H, W))).astype(np.float32)
    )
    for _ in range(N_IT + 1)
]


def run(name, band, dtype=jnp.bfloat16):
    def step(c, ims):
        stack = orb.pyramid_stack(ims + c * 1e-30, cfg)
        vals, codes, xs, ys = fast_select_pallas(
            stack, bounds, cfg.th_hi, cfg.th_lo, orb.EDGE,
            cfg.k_per_cell, False, compute_dtype=dtype, band=band,
        )
        return vals[0, 0] + codes[0, 0].astype(jnp.float32) + xs[0, 0] + ys[0, 0]

    j = jax.jit(step)
    c = j(jnp.zeros(()), imgs[0])
    float(np.asarray(c))
    t0 = time.time()
    c = jnp.zeros(())
    for i in range(1, N_IT + 1):
        c = j(c, imgs[i])
    float(np.asarray(c))
    dt = (time.time() - t0) / N_IT * 1e3
    print(f"{name}: {dt:.2f} ms total, {dt / B:.3f} ms/frame", flush=True)


bands = [int(x) for x in sys.argv[2].split(",")] if len(sys.argv) > 2 else [32, 64, 96]
dtypes = (
    [dict(bf16=jnp.bfloat16, f32=jnp.float32)[d] for d in sys.argv[3].split(",")]
    if len(sys.argv) > 3 else [jnp.bfloat16]
)
for dtype in dtypes:
    for band in bands:
        try:
            run(f"pyramid+select band={band} dtype={dtype.__name__} B={B}",
                band, dtype)
        except Exception as e:  # noqa: BLE001
            print(f"band={band} dtype={dtype.__name__}: FAILED "
                  f"{type(e).__name__}: {str(e)[:300]}", flush=True)
