"""Chip microbench: alternatives for the plane-level top-k in
select_keypoints_fused ([N_planes, n_cand] -> per-plane top-k values +
codes). Chained protocol: scalar carry into fresh args, scalar readback.

Usage: python benchmarks/topk_exp.py
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

N, C, K = 512, 5640, 174
N_IT = 5

rng = np.random.default_rng(0)
XS = [
    jnp.asarray(
        np.where(rng.random((N, C)) < 0.1,
                 rng.uniform(7, 255, (N, C)), -1e9).astype(np.float32)
    )
    for _ in range(N_IT + 1)
]
CODES = jnp.asarray(rng.integers(0, 752 * 480, (N, C)).astype(np.int32))


def chain(name, fn):
    j = jax.jit(fn)
    c = j(jnp.zeros(()), XS[0])
    float(np.asarray(c))
    t0 = time.time()
    c = jnp.zeros(())
    for i in range(1, N_IT + 1):
        c = j(c, XS[i])
    float(np.asarray(c))
    dt = (time.time() - t0) / N_IT * 1e3
    print(f"{name}: {dt:.2f} ms", flush=True)


def f_topk(c, x):
    x = x + c * 1e-30
    v, i = jax.lax.top_k(x, K)
    g = jnp.take_along_axis(CODES, i, axis=1)
    return v[0, 0] + g[0, 0].astype(jnp.float32)


def f_topk_only(c, x):
    x = x + c * 1e-30
    v, i = jax.lax.top_k(x, K)
    return v[0, 0] + i[0, 0].astype(jnp.float32)


def f_argsort(c, x):
    x = x + c * 1e-30
    i = jnp.argsort(-x, axis=1)[:, :K]
    v = jnp.take_along_axis(x, i, axis=1)
    return v[0, 0] + i[0, 0].astype(jnp.float32)


def f_approx(c, x):
    x = x + c * 1e-30
    v, i = jax.lax.approx_max_k(x, K)
    g = jnp.take_along_axis(CODES, i, axis=1)
    return v[0, 0] + g[0, 0].astype(jnp.float32)


def f_count_binsearch(c, x):
    """k-th-largest threshold via 16-step bisection on score values."""
    x = x + c * 1e-30
    lo = jnp.full((N,), 0.0)
    hi = jnp.full((N,), 256.0)
    for _ in range(16):
        mid = 0.5 * (lo + hi)
        cnt = jnp.sum(x > mid[:, None], axis=1)
        take = cnt >= K
        lo = jnp.where(take, mid, lo)
        hi = jnp.where(take, lo * 0 + mid, hi)
    return lo[0]


def f_binsearch_compact(c, x):
    """bisection threshold + cumsum-rank + scatter compaction of (val,
    code) into K slots."""
    x = x + c * 1e-30
    lo = jnp.full((N,), 0.0)
    hi = jnp.full((N,), 256.0)
    for _ in range(16):
        mid = 0.5 * (lo + hi)
        cnt = jnp.sum(x > mid[:, None], axis=1)
        take = cnt >= K
        lo = jnp.where(take, mid, lo)
        hi = jnp.where(take, lo * 0 + mid, hi)
    sel = x > lo[:, None]
    rank = jnp.cumsum(sel.astype(jnp.int32), axis=1) - 1
    tgt = jnp.where(sel & (rank < K), rank, K)
    v = jnp.full((N, K + 1), -1e9).at[jnp.arange(N)[:, None], tgt].set(
        jnp.where(sel, x, -1e9)
    )[:, :K]
    g = jnp.zeros((N, K + 1), jnp.int32).at[
        jnp.arange(N)[:, None], tgt
    ].set(CODES)[:, :K]
    return v[0, 0] + g[0, 0].astype(jnp.float32)


def f_approx_recall1(c, x):
    x = x + c * 1e-30
    v, i = jax.lax.approx_max_k(x, K, recall_target=1.0)
    g = jnp.take_along_axis(CODES, i, axis=1)
    return v[0, 0] + g[0, 0].astype(jnp.float32)


XS2 = [jnp.asarray(rng.uniform(0, 480, (N, C)).astype(np.float32))
       for _ in range(2)]


def f_bisect_full(c, x):
    """The real candidate: bisect threshold + scatter-compact (vals + 3
    payloads) + small top-k sort of the compacted block + payload gathers."""
    x = x + c * 1e-30
    xs_p, ys_p = XS2
    lo = jnp.zeros((N, 1), jnp.float32)
    hi = jnp.full((N, 1), 512.0, jnp.float32)
    for _ in range(24):
        mid = 0.5 * (lo + hi)
        take = jnp.sum(x > mid, axis=1, keepdims=True) >= K
        lo = jnp.where(take, mid, lo)
        hi = jnp.where(take, hi, mid)
    gt = x > hi
    n_gt = jnp.sum(gt, axis=1, keepdims=True)
    eq = (x > lo) & ~gt
    fill = jnp.cumsum(eq.astype(jnp.int32), axis=1) <= (K - n_gt)
    sel = gt | (eq & fill)
    rank = jnp.cumsum(sel.astype(jnp.int32), axis=1) - 1
    tgt = jnp.where(sel, rank, K)
    rows = jnp.arange(N)[:, None]
    comp_s = jnp.full((N, K + 1), -1e9, jnp.float32).at[rows, tgt].set(
        jnp.where(sel, x, -1e9)
    )[:, :K]
    v, idx = jax.lax.top_k(comp_s, K)
    outs = []
    for p in (xs_p, ys_p):
        compp = jnp.zeros((N, K + 1), p.dtype).at[rows, tgt].set(p)[:, :K]
        outs.append(jnp.take_along_axis(compp, idx, axis=1))
    return v[0, 0] + outs[0][0, 0] + outs[1][0, 0]


def f_subpix_gather(c, x):
    """cost of the 5-point subpixel stencil gather at [N, 5K] from a
    [N, H*W] raw map."""
    raw = jnp.broadcast_to(x, (N, C)) + c * 1e-30
    idx = jnp.abs(CODES[:, : 5 * K]) % C
    s5 = jnp.take_along_axis(raw, idx, axis=1)
    return s5[0, 0]


for name, fn in [
    ("top_k[512,5640]k174 + code-gather", f_topk),
    ("top_k only", f_topk_only),
    ("argsort-slice", f_argsort),
    ("approx_max_k + code-gather", f_approx),
    ("binsearch count only", f_count_binsearch),
    ("binsearch + scatter compaction", f_binsearch_compact),
    ("approx_max_k recall=1.0", f_approx_recall1),
    ("bisect24 + compact + sort174 + 2 payloads", f_bisect_full),
    ("5-point subpixel gather [512,870]", f_subpix_gather),
]:
    try:
        chain(name, fn)
    except Exception as e:  # noqa: BLE001
        print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)
