"""Chip microbench: Pallas block-DMA / launch cost model.

Round-3 finding: a null kernel over a [512, 480, 752] f32 stack with
full-plane input blocks costs ~12 ms/call REGARDLESS of program count
(512..4096 programs revisiting the same 512 plane blocks) — the cost
tracks the DISTINCT block DMAs, not the programs. Both production
kernels stream full-plane blocks (select: one per plane x width-run;
sampler: one two-phase canvas plane per plane), so their floors are set
by this, not by their ALU work or their per-keypoint VMEM loads.

This sweep separates the three candidate terms
    t_call = fixed_call + n_dma * dma_issue + bytes * (1 / BW)
by varying, one at a time:
  - n_planes at fixed plane bytes  (n_dma)
  - plane height at fixed n_planes (bytes per DMA)
  - dtype f32 vs bf16              (bytes per DMA, same DMA count)

Usage: python benchmarks/launch_overhead_exp.py
"""
import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

W = 768
rng = np.random.default_rng(0)


def null_kernel(pp_ref, img_ref, out_ref):
    out_ref[:, :] = img_ref[0, 0:8, 0:128].astype(jnp.float32) * 2.0


def run(n_planes, h, dtype, progs_per_plane=2):
    stacks = [
        jnp.asarray(
            rng.uniform(0, 255, (n_planes, h, W)).astype(np.float32)
        ).astype(dtype)
        for _ in range(2)
    ]
    n_progs = n_planes * progs_per_plane
    pp = np.repeat(np.arange(n_planes, dtype=np.int32), progs_per_plane)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_progs,),
        in_specs=[pl.BlockSpec((1, h, W), lambda g, pp_: (pp_[g], 0, 0))],
        out_specs=pl.BlockSpec((8, 128), lambda g, pp_: (g, 0)),
    )
    f = pl.pallas_call(
        null_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((8 * n_progs, 128), jnp.float32),
    )

    def step(c, s):
        return f(jnp.asarray(pp), s + c * jnp.asarray(1e-30, dtype))[0, 0]

    j = jax.jit(step)
    c = j(jnp.zeros (()), stacks[0])
    float(np.asarray(c))
    t0 = time.time()
    c = jnp.zeros(())
    for i in range(1, 7):
        c = j(c, stacks[i % 2])
    float(np.asarray(c))
    dt = (time.time() - t0) / 6 * 1e3
    mb = n_planes * h * W * jnp.dtype(dtype).itemsize / 1e6
    print(
        f"planes={n_planes:4d} h={h:3d} {jnp.dtype(dtype).name:9s} "
        f"{mb:7.1f} MB: {dt:6.2f} ms/call "
        f"({dt * 1e3 / n_planes:5.1f} us/DMA, {mb / dt:6.1f} GB/s)",
        flush=True,
    )
    return dt


for planes in (64, 128, 256, 512):
    run(planes, 480, jnp.float32)
for h in (120, 240, 480):
    run(256, h, jnp.float32)
for dt_ in (jnp.float32, jnp.bfloat16):
    run(256, 480, dt_)
