"""Chip microbench: fused sampler kernel cost by debug stage.

Isolates where `pallas_sample._kernel`'s time goes by running the kernel at
its debug stages (each stage returns early after progressively more work):

  10  static load only (no rolls)
  11  aligned dynamic loads only (no re-center rolls)
  12  loads + sublane roll (no lane roll)
   1  full loads/rolls + IC moments (indicator matmul)
   4  full kernel (+ per-keypoint blur-folded 7-tap sampling dots)

Also sweeps t_chunk at the full stage. Chained protocol (fresh args,
scalar readback). Usage: python benchmarks/sampler_exp.py [K_total]
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from pose_estimation_tpu.ops import orb
from pose_estimation_tpu.ops.pallas_sample import sample_patches_pallas

K = int(sys.argv[1]) if len(sys.argv) > 1 else 55680  # = B32 bench load
NPLANES = 512
H, W = 480, 752
N_IT = 4

rng = np.random.default_rng(0)
stacks = [
    jnp.asarray(rng.uniform(0, 255, (NPLANES, H, W)).astype(np.float32))
    for _ in range(2)
]
pool_xy = orb.POOL_POINTS.astype(np.float32)


def run(name, debug_stage, t_chunk, canvas_dtype=jnp.float32):
    kk = -(-K // t_chunk) * t_chunk
    plane = jnp.asarray(
        np.sort(rng.integers(0, NPLANES, kk)).astype(np.int32)
    )
    xy = jnp.asarray(
        np.stack([rng.uniform(25, W - 25, kk),
                  rng.uniform(25, H - 25, kk)], -1).astype(np.float32))

    def step(c, s):
        vals, m10, m01 = sample_patches_pallas(
            s + c * 1e-30, plane, xy, pool_xy,
            t_chunk=t_chunk, debug_stage=debug_stage,
            canvas_dtype=canvas_dtype)
        return vals[0, 0] + m10[0] + m01[0]

    j = jax.jit(step)
    c = j(jnp.zeros(()), stacks[0])
    float(np.asarray(c))
    t0 = time.time()
    c = jnp.zeros(())
    for i in range(1, N_IT + 1):
        c = j(c, stacks[i % 2])
    float(np.asarray(c))
    dt = (time.time() - t0) / N_IT * 1e3
    print(f"{name}: {dt:.2f} ms/call ({dt / (K / 1740):.1f} us/chunk32eq)",
          flush=True)


for stage, label in [(10, "load-static"), (11, "load-dyn"),
                     (12, "load+subroll"), (1, "rolls+moments"),
                     (4, "full")]:
    try:
        run(f"stage {stage:>2} {label} t=32", stage, 32)
    except Exception as e:  # noqa: BLE001
        print(f"stage {stage}: FAILED {type(e).__name__}: {str(e)[:200]}",
              flush=True)

for t in (64, 128):
    try:
        run(f"stage  4 full t={t}", 4, t)
    except Exception as e:  # noqa: BLE001
        print(f"t={t}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)

for stage, label in [(10, "load-static"), (4, "full")]:
    for t in (32, 128):
        try:
            run(f"bf16 stage {stage:>2} {label} t={t}", stage, t,
                jnp.bfloat16)
        except Exception as e:  # noqa: BLE001
            print(f"bf16 t={t}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
