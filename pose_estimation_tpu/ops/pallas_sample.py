"""Fused per-keypoint descriptor sampling as a Pallas TPU kernel.

Replaces the three gather-bound description stages of `ops/orb.py`
(`ic_angle_sparse` prefix-sum gathers, the full-stack `gaussian_blur7`, and
the `brief_descriptors_pool` [K,P] image gather — together the largest
measured chunk of the extraction step, see NOTES.md) with ONE kernel that,
for each keypoint:

  1. loads a tile-aligned [56, 128] window around it from the VMEM-resident
     plane (Mosaic requires dynamic load offsets/sizes to be (8, 128)-tile
     aligned; the canvas carries a 64-lane-shifted second copy of each
     plane so one of the two phases always holds the whole 43-lane patch
     in a single lane tile) and re-centers it with two `pltpu.roll` dynamic
     rotates, yielding the 43x43 raw patch (rotated pattern reach
     13*sqrt(2) -> 18, + blur radius 3 = 21);
  2. computes the IC moments (m10, m01) of the 31x31 circular patch center
     (`ORBextractor.cc:77-104` semantics, identical to the patch-gather
     oracle `orb.ic_angle`);
  3. blurs the patch in VMEM with the exact op ordering of
     `orb.gaussian_blur7` (vertical then horizontal, ascending-tap sums);
  4. rotates the P pool sample points by the patch orientation WITHOUT
     transcendentals (cos = m10/r, sin = m01/r) and samples the blurred
     patch at the rounded offsets via a separable one-hot contraction
         vals[t,p] = sum_rc blur[t,r,c] * (r==row[t,p]) * (c==col[t,p])
     — no per-element dynamic indexing (slow in Mosaic), no HBM gather.

Everything in-kernel is strictly <= 2-D: this chip's Mosaic crashes
(layout.h:320 assert) on ANY rank-3 value tensor in a kernel, so the T
patches are stacked VERTICALLY into one tall [T*48, 43] array (48-row
stride keeps each patch 8-sublane-aligned for static slicing), per-patch
moment reductions are an indicator matmul over the row-group structure,
and the one-hot sampling is an unrolled loop of per-keypoint 2-D dots.
Compiled dynamic SUBLANE rotates also mis-handle negative shifts (lane
rotates are fine) — sublane roll amounts are biased by the axis size.

Grid: chunks of T keypoints, plane-major (the keypoint->plane map is STATIC
in `extract_batch` — level blocks are trace-time slices — so consecutive
chunks share their plane and Pallas's pipeline keeps the padded [Hp, Wp]
plane block VMEM-resident across them). Per-keypoint scalars (patch origin)
ride in SMEM via scalar prefetch; the chunk->plane map drives the block
index map.

Outputs lane-concatenated as [K, P+2]: lanes 0..P-1 = blurred pool-point
samples, P = m10, P+1 = m01 (separate outputs would need sublane->lane
transposes in-kernel; the downstream [K,P] @ DIFF matmul and arctan2 stay
in XLA where they are MXU/VPU-cheap).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PATCH_R = 15          # orientation patch radius (orb.PATCH_R)
# Pool points live in a +-13 SQUARE, so a rotated coordinate reaches
# 13*sqrt(2) -> rounds to <= 18; +3 more for the blur stencil.
REACH = 21
PS = 2 * REACH + 1    # 43: raw patch side
PAD = 2               # reflect-101 canvas pad (= sample reach past EDGE=19)
LD_R = 56             # aligned load rows: 43 + max 8-align remainder 7 -> 56
# Aligned load lanes: ONE 128-lane tile. A 43-lane patch at arbitrary x0
# fits a single 128-aligned window iff x0 % 128 <= 85; the canvas therefore
# carries a SECOND copy of every plane shifted left by 64 lanes — when
# x0 % 128 > 85, the shifted copy has (x0 - 64) % 128 <= 63 and the patch
# fits its aligned window instead. Halves the per-keypoint load+roll
# traffic vs a 256-lane cover-all window.
LD_C = 128
PHASE = 64            # lane shift of the second plane copy
SR = 48               # tall-layout row stride per patch (43 rounded up to 8)


_BLUR_K = None


def _blur_taps(dtype=np.float32):
    global _BLUR_K
    if _BLUR_K is None:
        k = np.exp(-np.arange(-3, 4) ** 2 / (2.0 * 2.0 * 2.0))
        _BLUR_K = (k / k.sum()).astype(dtype)
    return _BLUR_K


def _moment_masks_iota():
    """In-kernel circular moment masks [1, 31, 31] built from iota (Pallas
    kernels cannot capture array constants; Mosaic only lowers int iota)."""
    side = 2 * PATCH_R + 1
    ys = jax.lax.broadcasted_iota(
        jnp.int32, (1, side, side), 1
    ).astype(jnp.float32) - PATCH_R
    xs = jax.lax.broadcasted_iota(
        jnp.int32, (1, side, side), 2
    ).astype(jnp.float32) - PATCH_R
    circ = (xs * xs + ys * ys) <= float(PATCH_R * PATCH_R)
    zero = jnp.zeros_like(xs)
    return jnp.where(circ, xs, zero), jnp.where(circ, ys, zero)


def _kernel(
    chunk_plane_ref,        # SMEM [n_chunks] int32 (drives the index map)
    origins_ref,            # SMEM [3, K] int32: (y0, xcomb, xshift) per kp
    plane_ref,              # VMEM [1, Hp2, Wc] two-phase canvas (pipelined)
    poolxy_ref,             # VMEM [2, P] f32 pool sample points (x; y)
    out_ref,                # VMEM [T, out_w]
    *, t_chunk: int, n_pool: int, debug_stage: int = 4,
):
    # Mosaic on this chip crashes (layout.h assert) on rank-3 VALUE tensors
    # inside kernels, so everything here is strictly <= 2-D: patches are
    # stacked VERTICALLY into a tall [T*SR, 43] array (SR=48 keeps each
    # patch's origin 8-sublane-aligned for static slicing), per-patch
    # reductions become an indicator matmul, and the one-hot sampling is an
    # unrolled loop of 2-D dots.
    g = pl.program_id(0)
    kern = _blur_taps()

    # ---- aligned loads + dynamic-roll re-centering, one per keypoint ----
    # xcomb is a precomputed 128-aligned lane offset into the two-phase
    # canvas (base copy or the 64-shifted copy, whichever holds the whole
    # 43-lane patch in one tile); xshift <= 85 is the patch's lane offset
    # within the loaded window.
    patches = []
    for t in range(t_chunk):
        i = g * t_chunk + t
        y0 = origins_ref[0, i]
        # lane-tile index from SMEM, scaled in-kernel: Mosaic must be able
        # to statically PROVE the dynamic lane offset is a 128-multiple
        xcomb = origins_ref[1, i] * LD_C
        xshift = origins_ref[2, i]
        y0a = (y0 // 8) * 8          # provably 8-aligned sublane offset
        if debug_stage == 10:        # static load only (wrong values)
            block = plane_ref[0, 0:SR, 0:LD_C]
        else:
            block = plane_ref[0, pl.ds(y0a, LD_R), pl.ds(xcomb, LD_C)]
            if debug_stage not in (11,):
                # row r <- r + (y0 - y0a). Shift biased by LD_R: compiled
                # Mosaic dynamic SUBLANE rotates mis-handle negative shifts
                # (verified on-chip; lane rotates are fine) — roll by
                # s + size is equivalent and always non-negative.
                block = pltpu.roll(block, y0a - y0 + LD_R, 0)
            block = block[0:SR, :]
            if debug_stage not in (11, 12):
                # lane l <- l + xshift; wrapped lanes land at columns
                # >= 128 - 85 = 43 and are sliced away below
                block = pltpu.roll(block, LD_C - xshift, 1)
        patches.append(block)
    # [T*SR, LD_C]; rows t*SR .. t*SR+42 hold patch t, rows +43..47 junk
    tall = jnp.concatenate(patches, axis=0)[:, 0:PS]

    if debug_stage >= 10:
        s = jnp.sum(tall, axis=1, keepdims=True)          # [T*SR, 1]
        gi = jax.lax.broadcasted_iota(jnp.int32, (t_chunk, t_chunk * SR), 0)
        gj = jax.lax.broadcasted_iota(jnp.int32, (t_chunk, t_chunk * SR), 1)
        gsel = (gj // SR == gi).astype(jnp.float32)
        tot = jax.lax.dot_general(
            gsel, s, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                  # [T, 1]
        out_ref[:, 0:n_pool] = jnp.broadcast_to(tot, (t_chunk, n_pool))
        out_ref[:, n_pool:] = jnp.zeros(
            (t_chunk, out_ref.shape[1] - n_pool), jnp.float32
        )
        return

    # ---- IC moments over the 31x31 circular center (raw pixels) ----
    # masks from 2-D iota over the tall layout: local row lr = r % SR,
    # center (REACH, REACH), circle radius PATCH_R. Junk rows (lr >= 43)
    # fall outside the circle automatically.
    lr = jax.lax.broadcasted_iota(
        jnp.int32, (t_chunk * SR, PS), 0
    ) % SR
    cc = jax.lax.broadcasted_iota(jnp.int32, (t_chunk * SR, PS), 1)
    dxm = (cc - REACH).astype(jnp.float32)
    dym = (lr - REACH).astype(jnp.float32)
    circ = dxm * dxm + dym * dym <= float(PATCH_R * PATCH_R)
    zero = jnp.zeros_like(dxm)
    rowm10 = jnp.sum(
        tall * jnp.where(circ, dxm, zero), axis=1, keepdims=True
    )
    rowm01 = jnp.sum(
        tall * jnp.where(circ, dym, zero), axis=1, keepdims=True
    )
    rowm = jnp.concatenate([rowm10, rowm01], axis=1)      # [T*SR, 2]
    gi = jax.lax.broadcasted_iota(jnp.int32, (t_chunk, t_chunk * SR), 0)
    gj = jax.lax.broadcasted_iota(jnp.int32, (t_chunk, t_chunk * SR), 1)
    gsel = (gj // SR == gi).astype(jnp.float32)
    mom = jax.lax.dot_general(
        gsel, rowm, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )                                                      # [T, 2]
    m10 = mom[:, 0:1]                                      # [T, 1]
    m01 = mom[:, 1:2]

    if debug_stage < 2:
        out_ref[:, 0:n_pool] = jnp.broadcast_to(m10, (t_chunk, n_pool))
        out_ref[:, n_pool:n_pool + 1] = m10
        out_ref[:, n_pool + 1:n_pool + 2] = m01
        out_ref[:, n_pool + 2:] = jnp.zeros(
            (t_chunk, out_ref.shape[1] - n_pool - 2), jnp.float32
        )
        return

    # ---- 7x7 sigma=2 Gaussian blur, orb.gaussian_blur7 op order ----
    # (vertical taps first, then horizontal, ascending i). Vertical rolls
    # cross patch boundaries only within each patch's 3-px margin + the
    # 5 junk rows; sampled rows (REACH +- 18 = 3..39) never see them.
    v = kern[0] * jnp.roll(tall, 3, axis=0)
    for i in range(1, 7):
        sh = 3 - i
        v = v + kern[i] * (jnp.roll(tall, sh, axis=0) if sh else tall)
    blur = kern[0] * jnp.roll(v, 3, axis=1)
    for i in range(1, 7):
        sh = 3 - i
        blur = blur + kern[i] * (jnp.roll(v, sh, axis=1) if sh else v)

    if debug_stage < 3:
        srow = jnp.sum(blur, axis=1, keepdims=True)
        tot = jax.lax.dot_general(
            gsel, srow, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        out_ref[:, 0:n_pool] = jnp.broadcast_to(tot, (t_chunk, n_pool))
        out_ref[:, n_pool:n_pool + 1] = m10
        out_ref[:, n_pool + 1:n_pool + 2] = m01
        out_ref[:, n_pool + 2:] = jnp.zeros(
            (t_chunk, out_ref.shape[1] - n_pool - 2), jnp.float32
        )
        return

    # ---- rotation from the moments, no transcendentals ----
    # cos = m10 / r, sin = m01 / r; r == 0 (flat patch) degenerates to
    # sampling the center for every pair -> constant descriptor, exactly
    # what a flat patch deserves (invalid slots are masked downstream).
    r2 = m10 * m10 + m01 * m01
    inv = jax.lax.rsqrt(jnp.maximum(r2, 1e-12))
    ca = m10 * inv                                        # [T, 1]
    sa = m01 * inv
    px = poolxy_ref[0:1, :]                               # [1, P]
    py = poolxy_ref[1:2, :]
    col = jnp.round(px * ca - py * sa) + float(REACH)     # [T, P]
    row = jnp.round(px * sa + py * ca) + float(REACH)

    # ---- separable one-hot sampling, one 2-D dot per keypoint ----
    iota_p = jax.lax.broadcasted_iota(
        jnp.int32, (PS, n_pool), 0
    ).astype(jnp.float32)
    vrows = []
    for t in range(t_chunk):
        rowsel = (iota_p == row[t:t + 1, :]).astype(jnp.float32)
        colsel = (iota_p == col[t:t + 1, :]).astype(jnp.float32)
        blur_t = blur[t * SR:t * SR + PS, :]              # [43(r), 43(c)]
        # DEFAULT (one-bf16-pass) precision: rowsel is one-hot (exact in
        # bf16) and each output element selects exactly ONE blur value, so
        # this is a bf16 rounding of the blurred sample — the SAME rounding
        # the downstream BRIEF difference matmul (DEFAULT, ops/orb.py)
        # applies to these values anyway; descriptor bits are unchanged.
        # The IC-moment dot above stays HIGHEST (geometry, not bits).
        t1 = jax.lax.dot_general(
            blur_t, rowsel,
            dimension_numbers=(((0,), (0,)), ((), ())),   # [43(c), P]
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )
        vrows.append(jnp.sum(t1 * colsel, axis=0, keepdims=True))
    vals = jnp.concatenate(vrows, axis=0)                 # [T, P]

    out_ref[:, 0:n_pool] = vals
    out_ref[:, n_pool:n_pool + 1] = m10
    out_ref[:, n_pool + 1:n_pool + 2] = m01
    out_ref[:, n_pool + 2:] = jnp.zeros(
        (t_chunk, out_ref.shape[1] - n_pool - 2), jnp.float32
    )


def sample_patches_pallas(
    stack: jnp.ndarray,     # [N, H, W] f32 raw plane canvases
    plane: jnp.ndarray,     # [K] int32 plane id per keypoint (chunk-uniform)
    xy: jnp.ndarray,        # [K, 2] f32 plane-local coords
    pool_xy: np.ndarray,    # [P, 2] static pool sample points
    t_chunk: int = 32,
    interpret: bool = False,
    debug_stage: int = 4,
):
    """(vals [K, P], m10 [K], m01 [K]) — blurred pool-point samples and IC
    moments per keypoint.

    K must be a multiple of t_chunk and every chunk's keypoints must share
    one plane (callers pad per-plane groups; `extract_batch`'s level blocks
    are static, so this is free). Keypoints are clamped so the 43x43 patch
    stays inside the (2px reflect-padded) canvas; valid detections (>= 19 px
    inside their level content) are never clamped.
    """
    n, h, w = stack.shape
    k = xy.shape[0]
    n_pool = int(np.asarray(pool_xy).shape[0])
    out_w = -(-(n_pool + 2) // 128) * 128
    assert k % t_chunk == 0, (k, t_chunk)
    n_chunks = k // t_chunk

    # 2-px reflect-101 canvas pad: valid detections sit >= EDGE=19 inside
    # their level content, but a rotated pattern sample reaches 18 px and
    # its blur stencil another 3 — 2 px past the canvas edge for level-0
    # keypoints on the detection margin. Reflect-101 matches what
    # `orb.gaussian_blur7` computes at the canvas border. Beyond that, the
    # canvas carries TWO lane-phase copies of each plane (base + shifted
    # left by PHASE=64) so every 43-lane patch fits ONE 128-lane aligned
    # window (see LD_C above); extra area is loaded but rolled/sliced away.
    hp, wp = h + 2 * PAD, w + 2 * PAD
    hp2 = ((hp - PS) // 8) * 8 + LD_R
    # each copy's lane span must cover BOTH its largest aligned window and
    # its full content (whichever reaches further), rounded to lane tiles
    wb = 128 * max((wp - PS) // 128 + 1, -(-wp // 128))
    ws = 128 * max((wp - PHASE - PS) // 128 + 1, -(-(wp - PHASE) // 128))
    stack_p = jnp.pad(
        stack, ((0, 0), (PAD, PAD), (PAD, PAD)), mode="reflect"
    )
    stack_p = jnp.pad(stack_p, ((0, 0), (0, hp2 - hp), (0, 0)))
    base = jnp.pad(stack_p, ((0, 0), (0, 0), (0, wb - wp)))
    shifted = jnp.pad(
        stack_p[:, :, PHASE:], ((0, 0), (0, 0), (0, ws - (wp - PHASE)))
    )
    stack_p = jnp.concatenate([base, shifted], axis=2)    # [N, hp2, wb+ws]

    cx = jnp.round(xy[:, 0]).astype(jnp.int32)
    cy = jnp.round(xy[:, 1]).astype(jnp.int32)
    y0 = jnp.clip(cy + PAD - REACH, 0, hp - PS)
    x0 = jnp.clip(cx + PAD - REACH, 0, wp - PS)
    # lane phase: patches with x0 % 128 > 128 - PS use the shifted copy
    # (whose in-copy offset x0 - PHASE has remainder <= 128 - PS - ...)
    m = x0 % 128
    use2 = m > 128 - PS                                   # 43-lane fit test
    # passed as a lane-TILE index (kernel rescales by 128 so Mosaic can
    # prove alignment of the dynamic load offset)
    xtile = jnp.where(
        use2, wb // 128 + (x0 - PHASE) // 128, x0 // 128
    )
    xshift = jnp.where(use2, (x0 - PHASE) % 128, m)
    origins = jnp.stack([y0, xtile, xshift], axis=0)      # [3, K] int32
    chunk_plane = plane.astype(jnp.int32).reshape(n_chunks, t_chunk)[:, 0]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,                            # chunk_plane, origins
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((1, hp2, wb + ws), lambda g, cp, og: (cp[g], 0, 0)),
            pl.BlockSpec((2, n_pool), lambda g, cp, og: (0, 0)),
        ],
        out_specs=pl.BlockSpec((t_chunk, out_w), lambda g, cp, og: (g, 0)),
    )
    poolxy = jnp.asarray(np.asarray(pool_xy, np.float32).T)  # [2, P]
    out = pl.pallas_call(
        functools.partial(
            _kernel, t_chunk=t_chunk, n_pool=n_pool, debug_stage=debug_stage
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((k, out_w), jnp.float32),
        interpret=interpret,
    )(chunk_plane, origins, stack_p, poolxy)
    return out[:, :n_pool], out[:, n_pool], out[:, n_pool + 1]


def make_batchable_sampler(pool_xy: np.ndarray, t_chunk: int = 32,
                           interpret: bool = False):
    """`sample_patches_pallas` closed over the statics, with a custom vmap
    rule that FLATTENS the batch into the plane axis instead of lifting the
    kernel grid: keypoints are independent and `plane` already addresses the
    stack, so a batch of (stack [B,N,H,W], plane [B,K], xy [B,K,2]) is
    exactly one unbatched call on [B*N,H,W] with offset plane ids. This is
    both correct under `jax.vmap` (bench / batched_slam vmap the whole VIO
    step) and faster than a lifted grid (one kernel launch)."""
    from jax.custom_batching import custom_vmap

    @custom_vmap
    def sample(stack, plane, xy):
        return sample_patches_pallas(
            stack, plane, xy, pool_xy, t_chunk=t_chunk, interpret=interpret
        )

    @sample.def_vmap
    def _rule(axis_size, in_batched, stack, plane, xy):
        sb, pb, xb = in_batched
        b = axis_size
        if not sb:
            stack = jnp.broadcast_to(stack[None], (b,) + stack.shape)
        if not pb:
            plane = jnp.broadcast_to(plane[None], (b,) + plane.shape)
        if not xb:
            xy = jnp.broadcast_to(xy[None], (b,) + xy.shape)
        n = stack.shape[1]
        k = plane.shape[1]
        flat_plane = (plane + jnp.arange(b, dtype=plane.dtype)[:, None] * n)
        vals, m10, m01 = sample(
            stack.reshape((b * n,) + stack.shape[2:]),
            flat_plane.reshape(b * k),
            xy.reshape(b * k, 2),
        )
        out = (vals.reshape(b, k, -1), m10.reshape(b, k), m01.reshape(b, k))
        return out, (True, True, True)

    return sample
