"""Fused per-keypoint descriptor sampling as a Pallas TPU kernel.

Replaces the three gather-bound description stages of `ops/orb.py`
(`ic_angle_sparse` prefix-sum gathers, the full-stack `gaussian_blur7`, and
the `brief_descriptors_pool` [K,P] image gather — together the largest
measured chunk of the extraction step, see NOTES.md) with ONE kernel that,
for each keypoint:

  1. loads a tile-aligned [56, 256] window around it from the VMEM-resident
     plane (Mosaic requires dynamic load offsets/sizes to be (8, 128)-tile
     aligned; TWO adjacent 128-lane tiles always contain the whole 43-lane
     patch) and re-centers it with two `pltpu.roll` dynamic rotates,
     yielding the 43x43 raw patch (rotated pattern reach
     13*sqrt(2) -> 18, + blur radius 3 = 21);
  2. computes the IC moments (m10, m01) of the 31x31 circular patch center
     (`ORBextractor.cc:77-104` semantics, identical to the patch-gather
     oracle `orb.ic_angle`);
  3. rotates the P pool sample points by the patch orientation WITHOUT
     transcendentals (cos = m10/r, sin = m01/r) and samples the 7x7
     sigma=2 BLURRED patch at the rounded offsets via a separable 7-tap
     contraction of the RAW patch (blur-then-sample is linear, so the
     gaussian taps fold into the selection columns)
         vals[t,p] = sum_rc raw[t,r,c] * k[r-row[t,p]+3] * k[c-col[t,p]+3]
     — no dense blurred patch, no per-element dynamic indexing (slow in
     Mosaic), no HBM gather. Values equal `orb.gaussian_blur7` sampling up
     to f32 reassociation (~1e-4 relative; gated by the parity tests).

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
# bf16 canvases tile as (16, 128): dynamic sublane offsets must be
# 16-aligned (an 8-aligned bf16 load sent Mosaic's compiler into the
# weeds), so the load window grows to 43 + max remainder 15 -> 64
LD_R_BF16 = 64
ALIGN_BF16 = 16
# Aligned load lanes: TWO adjacent 128-lane tiles (a 43-lane patch at
# arbitrary x0 always fits the [x0-aligned-down, +256) window). The kernel
# used to load a single tile from a canvas carrying a 64-lane-shifted
# SECOND copy of every plane — but the chip's block-DMA cost model
# (benchmarks/launch_overhead_exp.py) shows the kernel floor is the
# full-canvas plane DMA, not the per-keypoint VMEM loads, so the 2x-wider
# per-keypoint load is ~free while the single-phase canvas cuts the DMA
# (and the canvas-construction HBM pass) by ~1.7x.
LD_C = 128            # lane-tile granularity of the dynamic offset
LD_W = 256            # per-keypoint load window lanes
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

    # ---- aligned loads + dynamic-roll re-centering, one per keypoint ----
    # xcomb is the patch's 128-aligned lane offset (lane-tile index scaled
    # in-kernel); xshift <= 127 is its offset within the 256-lane window.
    is_bf16 = plane_ref.dtype == jnp.bfloat16
    align = ALIGN_BF16 if is_bf16 else 8
    ld_r = LD_R_BF16 if is_bf16 else LD_R
    patches = []
    for t in range(t_chunk):
        i = g * t_chunk + t
        y0 = origins_ref[0, i]
        # lane-tile index from SMEM, scaled in-kernel: Mosaic must be able
        # to statically PROVE the dynamic lane offset is a 128-multiple
        xcomb = origins_ref[1, i] * LD_C
        xshift = origins_ref[2, i]
        # provably tile-aligned sublane offset (8 for f32, 16 for bf16)
        y0a = (y0 // align) * align
        if debug_stage == 10:        # static load only (wrong values)
            block = plane_ref[0, 0:SR, 0:LD_W].astype(jnp.float32)
        else:
            # upcast right after the (possibly bf16) load: everything past
            # the canvas read runs f32 regardless of canvas_dtype
            block = plane_ref[0, pl.ds(y0a, ld_r), pl.ds(xcomb, LD_W)]
            block = block.astype(jnp.float32)
            if debug_stage not in (11,):
                # row r <- r + (y0 - y0a). Shift biased by ld_r: compiled
                # Mosaic dynamic SUBLANE rotates mis-handle negative shifts
                # (verified on-chip; lane rotates are fine) — roll by
                # s + size is equivalent and always non-negative.
                block = pltpu.roll(block, y0a - y0 + ld_r, 0)
            block = block[0:SR, :]
            if debug_stage not in (11, 12):
                # lane l <- l + xshift; wrapped lanes land at columns
                # >= 256 - 127 = 129 and are sliced away below (the
                # modulo keeps the dynamic lane shift in [0, 255]:
                # xshift = 0 would otherwise roll by the full width)
                block = pltpu.roll(block, (LD_W - xshift) % LD_W, 1)
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

    # ---- blur FOLDED INTO the sampling contraction ----
    # blur-then-sample is linear, so sampling the 7x7 sigma=2 blurred
    # patch at (row_p, col_p) equals contracting the RAW patch with
    # separable 7-tap selection columns
    #     vals[p] = sum_rc raw[r, c] * k[r - row_p + 3] * k[c - col_p + 3]
    # (k = the gaussian_blur7 taps). This deletes the two dense blurred
    # tall arrays the kernel used to build (the old form blurred all
    # 48 x 128 patch pixels to sample 256 of them — measured 8.2 ms of the
    # 38.8 ms B=32-bench kernel cost — and their VMEM held the chunk size
    # at t<=32). The taps are regenerated in-kernel as exp(-d^2/8)/norm:
    # identical to _blur_taps up to f32 exp rounding (sampled values feed
    # only the BRIEF difference matmul, which bf16-rounds them anyway).
    iota_p = jax.lax.broadcasted_iota(
        jnp.int32, (PS, n_pool), 0
    ).astype(jnp.float32)
    norm = 1.0 / float(np.sum(np.exp(-np.arange(-3, 4) ** 2 / 8.0)))

    def taps(center):                                     # [PS, P]
        d = iota_p - center
        w = jnp.exp(d * d * (-1.0 / 8.0)) * norm
        return jnp.where(jnp.abs(d) <= 3.0, w, jnp.zeros_like(w))

    vrows = []
    for t in range(t_chunk):
        rowsel = taps(row[t:t + 1, :])
        colsel = taps(col[t:t + 1, :])
        raw_t = tall[t * SR:t * SR + PS, :]               # [43(r), 43(c)]
        # HIGHEST precision: with the blur folded into the taps, DEFAULT
        # (one-bf16-pass) rounds PIXELS x TAPS inside the blur accumulation
        # itself (~±1.5 intensity on the blurred sample vs ~±0.5 for the
        # old exact-f32-blur-then-round) — measured on chip to break the
        # e2e gates (noisy-sim seed 0: ATE 1.6 -> 7.8 %, |ba| 0.8 -> 2.3).
        # Descriptor VALUES are accuracy-critical through near-tie BRIEF
        # bits; only the final difference matmul may round (ops/orb.py).
        t1 = jax.lax.dot_general(
            raw_t, rowsel,
            dimension_numbers=(((0,), (0,)), ((), ())),   # [43(c), P]
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
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
    canvas_dtype=jnp.float32,
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
    # lane span only needs to cover the largest aligned 256-lane load
    # window AND the content (whichever reaches further), lane-tiled.
    hp, wp = h + 2 * PAD, w + 2 * PAD
    # max(..., 0): planes SMALLER than the 43px patch (tiny top pyramid
    # levels of small test images under the per-level content-shaped
    # calls) clamp every keypoint to the corner and read the zero fill
    # beyond their content — valid detections never sit on such planes
    if canvas_dtype == jnp.bfloat16:
        # 16-aligned max load start + the widened bf16 load window
        hp2 = (max(hp - PS, 0) // ALIGN_BF16) * ALIGN_BF16 + LD_R_BF16
    else:
        hp2 = (max(hp - PS, 0) // 8) * 8 + LD_R
    wb = max((max(wp - PS, 0) // 128) * 128 + LD_W, -(-wp // 128) * 128)
    stack_p = jnp.pad(
        stack, ((0, 0), (PAD, PAD), (PAD, PAD)), mode="reflect"
    )
    stack_p = jnp.pad(
        stack_p, ((0, 0), (0, hp2 - hp), (0, wb - wp))
    )                                                     # [N, hp2, wb]
    # canvas_dtype=bfloat16 halves the canvas HBM footprint and the
    # per-keypoint window DMA bytes (the kernel's measured floor is the
    # 32 aligned loads per chunk). Pixels are upcast to f32 right after
    # the load; effect on outputs = <= 0.5-intensity pixel rounding in the
    # sampled values (which the BRIEF diff matmul bf16-rounds anyway) and
    # ~0.2% relative IC-moment perturbation (angle noise ~1e-3 rad, inside
    # the 5e-3 oracle gate). It also halves the canvas's distance to the
    # 2^31-byte Mosaic buffer ceiling at large batched extractions (the
    # old f32 two-phase canvas crossed it at B=64 EuRoC scale).
    stack_p = stack_p.astype(canvas_dtype)

    cx = jnp.round(xy[:, 0]).astype(jnp.int32)
    cy = jnp.round(xy[:, 1]).astype(jnp.int32)
    y0 = jnp.clip(cy + PAD - REACH, 0, max(hp - PS, 0))
    x0 = jnp.clip(cx + PAD - REACH, 0, max(wp - PS, 0))
    # passed as a lane-TILE index (kernel rescales by 128 so Mosaic can
    # prove alignment of the dynamic load offset); the 256-lane window at
    # the aligned-down offset always contains the 43-lane patch
    xtile = x0 // 128
    xshift = x0 % 128
    origins = jnp.stack([y0, xtile, xshift], axis=0)      # [3, K] int32
    chunk_plane = plane.astype(jnp.int32).reshape(n_chunks, t_chunk)[:, 0]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,                            # chunk_plane, origins
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((1, hp2, wb), lambda g, cp, og: (cp[g], 0, 0)),
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
                           interpret: bool = False,
                           canvas_dtype=jnp.float32):
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
            stack, plane, xy, pool_xy, t_chunk=t_chunk, interpret=interpret,
            canvas_dtype=canvas_dtype,
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
        h, w = stack.shape[2], stack.shape[3]

        # XLA/Mosaic buffers must stay under 2^31 BYTES (the old f32
        # two-phase canvas crossed the ceiling at B=64 EuRoC scale: 3.1 GB,
        # killing the compile). Lanes are independent, keypoints are
        # lane-major in the flattened layout, and each lane's chunks stay
        # plane-uniform — so splitting the batch into lane groups and
        # calling the kernel per group is exact, and only the per-call
        # canvas shrinks. Canvas dims mirror sample_patches_pallas.
        dsize = jnp.dtype(canvas_dtype).itemsize
        wp_, hp_ = w + 2 * PAD, h + 2 * PAD
        wb_ = max(
            (max(wp_ - PS, 0) // 128) * 128 + LD_W, -(-wp_ // 128) * 128
        )
        align_ = ALIGN_BF16 if canvas_dtype == jnp.bfloat16 else 8
        ldr_ = LD_R_BF16 if canvas_dtype == jnp.bfloat16 else LD_R
        hp2_ = (max(hp_ - PS, 0) // align_) * align_ + ldr_
        canvas_bytes = b * n * hp2_ * wb_ * dsize
        n_splits = 1
        while canvas_bytes / n_splits > 2**31 * 0.9 and n_splits < b:
            n_splits *= 2
        bs = -(-b // n_splits)

        def run(stack_g, plane_g, xy_g):
            bg = stack_g.shape[0]
            fp = plane_g + jnp.arange(bg, dtype=plane_g.dtype)[:, None] * n
            return sample(
                stack_g.reshape((bg * n,) + stack_g.shape[2:]),
                fp.reshape(bg * k),
                xy_g.reshape(bg * k, 2),
            )

        parts = [
            run(stack[i : i + bs], plane[i : i + bs], xy[i : i + bs])
            for i in range(0, b, bs)
        ]
        vals = jnp.concatenate([p[0] for p in parts], axis=0)
        m10 = jnp.concatenate([p[1] for p in parts], axis=0)
        m01 = jnp.concatenate([p[2] for p in parts], axis=0)
        out = (vals.reshape(b, k, -1), m10.reshape(b, k), m01.reshape(b, k))
        return out, (True, True, True)

    return sample
