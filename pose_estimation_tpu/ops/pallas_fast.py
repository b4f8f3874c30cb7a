"""Fused FAST-9/16 score + 3x3 NMS as a Pallas TPU kernel.

The XLA formulation (`ops/fast.py`) materializes 16 shifted images plus the
min-tree intermediates in HBM between fusions; this kernel keeps one image
tile (plus a 4-pixel halo) resident in VMEM and emits the NMS-masked corner
score in a single pass — HBM traffic drops to one read + one write per
pixel.

Grid: row-bands of the image; each program handles a (BAND, W) stripe. The
halo is re-read from the input ref (rows overlap by 8), which is cheap
relative to the fused arithmetic.

`fast_score_nms_pallas(img)` == `where(nms3(fast_score(img)),
fast_score(img), 0)` up to the border band (masked downstream by
`select_keypoints`'s 19px detection margin). Tested in interpret mode on CPU
and used on TPU behind `OrbConfig`'s backend switch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pose_estimation_tpu.ops.fast import CIRCLE

HALO = 4  # 3 for the FAST ring + 1 for the NMS neighborhood


def _kernel(img_ref, raw_ref, out_ref, *, band: int, width: int, n_bands: int):
    """img_ref: one full padded image plane (VMEM); out_ref: [band, W] block.

    Row windows overlap (halo), so the plane is passed whole and each
    program slices its band + halo; only per-band intermediates live in
    registers/VMEM. The flat grid walks planes x row-bands (a size-1 leading
    grid axis is collapsed by pallas, so the 2-D grid is linearized and the
    band index recovered by modulo)."""
    i = pl.program_id(0) % n_bands
    tile = img_ref[0, pl.ds(i * band, band + 2 * HALO), :]  # [band+8, W]

    # score rows cover the output band plus one NMS margin row on each side:
    # local score row r <-> padded-image row i*band + (HALO-1) + r.
    # All value-level slices use STATIC offsets (Pallas TPU has no
    # dynamic_slice lowering; the only dynamic index is the ref load above).
    def shift(arr, dy, dx):
        # rows have halo, columns wrap via roll (the wrapped columns land
        # outside the detection border); dx == 0 must skip the roll (it
        # lowers to a zero-size slice that Pallas rejects)
        rolled = arr if dx == 0 else jnp.roll(arr, -dx, axis=1)
        s = HALO - 1 + dy
        return rolled[s : s + band + 2]

    center = tile[HALO - 1 : HALO - 1 + band + 2]

    diffs = [shift(tile, dy, dx) - center for dy, dx in CIRCLE]  # 16x[band+2,W]

    def arc_min9(ds):
        m3 = [jnp.minimum(jnp.minimum(ds[i], ds[(i + 1) % 16]), ds[(i + 2) % 16])
              for i in range(16)]
        m9 = [jnp.minimum(jnp.minimum(m3[i], m3[(i + 3) % 16]), m3[(i + 6) % 16])
              for i in range(16)]
        out = m9[0]
        for i in range(1, 16):
            out = jnp.maximum(out, m9[i])
        return out

    bright = arc_min9(diffs)
    dark = arc_min9([-d for d in diffs])
    score = jnp.maximum(bright, dark)                   # [band+2, W]

    # 3x3 NMS with raster-order tie-breaking (match fast.nms3)
    def nshift(arr, dy, dx):
        rolled = arr if dx == 0 else jnp.roll(arr, -dx, axis=1)
        return rolled[1 + dy : 1 + dy + band]

    c = score[1 : 1 + band]
    keep = jnp.ones_like(c, dtype=jnp.bool_)
    strictly_before = True
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                strictly_before = False
                continue
            nb = nshift(score, dy, dx)
            keep = keep & ((c > nb) if strictly_before else (c >= nb))

    raw_ref[0, :, :] = c
    out_ref[0, :, :] = jnp.where(keep, c, 0.0)


def fast_score_nms_pallas(
    img: jnp.ndarray, band: int = 8, interpret: bool = False
):
    """(raw_score, nms_masked) FAST score maps, matching the input shape.

    Accepts [H, W] or a plane stack [N, H, W] (pyramid levels x images in
    one kernel launch; grid = planes x row-bands). The masked map is zero
    where suppressed or not a corner; the raw map feeds subpixel
    refinement."""
    squeeze = img.ndim == 2
    if squeeze:
        img = img[None]
    n, h, w = img.shape
    hp = -(-h // band) * band
    img_p = jnp.pad(img, ((0, 0), (HALO, hp - h + HALO), (0, 0)), mode="edge")

    n_bands = hp // band
    raw, out = pl.pallas_call(
        functools.partial(_kernel, band=band, width=w, n_bands=n_bands),
        out_shape=(
            jax.ShapeDtypeStruct((n, hp, w), img.dtype),
            jax.ShapeDtypeStruct((n, hp, w), img.dtype),
        ),
        grid=(n * n_bands,),
        in_specs=[
            pl.BlockSpec(
                (1,) + img_p.shape[1:], lambda g: (g // n_bands, 0, 0)
            )
        ],
        out_specs=(
            pl.BlockSpec((1, band, w), lambda g: (g // n_bands, g % n_bands, 0)),
            pl.BlockSpec((1, band, w), lambda g: (g // n_bands, g % n_bands, 0)),
        ),
        interpret=interpret,
    )(img_p)
    raw, out = raw[:, :h], out[:, :h]
    if squeeze:
        raw, out = raw[0], out[0]
    return raw, out


# --------------------------------------------------------------------------- #
# fused FAST + NMS + per-cell top-k selection
# --------------------------------------------------------------------------- #

_NEG = -1e9  # matches fast.select_keypoints_batched's invalid-score sentinel


def _seg_all(x, op, seg: int):
    """Rotation-based ALLREDUCE of `op` within aligned lane segments of
    `seg` (power of two; x.shape[1] % seg == 0). After log2(seg) steps every
    lane holds the reduction over its segment. All rolls are < seg lanes —
    cheap in Mosaic (the large-shift rolls of the cumsum formulation are
    what made moment_maps_pallas slow)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1) % seg
    s = 1
    while s < seg:
        fwd = jnp.roll(x, -s, axis=1)          # lane l <- l + s
        bwd = jnp.roll(x, seg - s, axis=1)     # lane l <- l + s - seg
        nb = jnp.where(lane < seg - s, fwd, bwd)
        x = op(x, nb)
        s *= 2
    return x


def _select_kernel(
    dims_ref, plane_ref, band_ref, img_ref, val_ref, pos_ref, x_ref, y_ref,
    *, band: int, cell: int, width: int,
    th_hi: float, th_lo: float, border: int, kpc: int,
    compute_dtype=jnp.float32,
):
    """One (plane, `band`-row band) program: FAST-9/16 score + 3x3 NMS +
    border/threshold gating + per-16x16-cell top-`kpc` selection, all in
    VMEM. A band covers band//cell cell-rows; they share the tile load, the
    FAST/NMS compute and its halo, and amortize the per-program overhead.

    Replaces the masked-score-map write + the host-side cell reshape +
    `kpc` argmax/mask passes of `fast.select_keypoints_batched` (~12
    full-stack HBM passes, the largest measured chunk of the extraction
    step). Outputs per selected candidate: score, flat-position code, and
    SUBPIXEL-refined (x, y) — the 1-D quadratic fit runs in-kernel on the
    score band (the stencil rows/columns are all VMEM-resident), which
    deletes both the full raw-score HBM output and the keypoint-sparse
    5-point stencil gather that used to consume it (~26 ms per million
    gathered elements on this chip). Every lane of a cell's segment
    carries that cell's value (the host wrapper strided-slices lane 0 of
    each segment).

    Selection semantics are exactly `select_keypoints_batched`'s: a cell
    with max > th_hi keeps only scores > th_hi, else scores > th_lo; ties
    break to the first element in within-cell row-major order.

    compute_dtype=bfloat16 runs the FAST diff + min/max score chain (the
    bulk of the kernel's vector work) in bf16 — EXACT (not approximate)
    whenever the plane values are integers in [0, 255] (level 0 of uint8
    frames): diffs/mins/maxes of such values stay integral <= 255, which
    bf16's 8-bit mantissa represents exactly. On fractional planes
    (resampled pyramid levels) scores carry <= 0.5-intensity rounding —
    strictly less than the reference's own uint8 pyramid quantization.
    NMS/gating/top-k comparisons stay f32 (Mosaic on this target rejects
    bf16 compares).

    dims_ref (SMEM, scalar-prefetched): [2, n] per-plane content (lh, lw).
    plane_ref/band_ref (SMEM): per-program plane id and band index — the
    grid enumerates only CONTENT bands (pyramid levels shrink, so ~45% of
    the uniform plane x band product is beyond a level's rows; those
    programs are never launched and their output slots are statically
    masked by the host wrapper).
    """
    g = pl.program_id(0)
    i = band_ref[g]
    plane = plane_ref[g]
    lh = dims_ref[0, plane]
    lw = dims_ref[1, plane]

    tile = img_ref[0, pl.ds(i * band, band + 2 * HALO), :]  # [band+8, W]
    tile = tile.astype(compute_dtype)

    def shift(arr, dy, dx):
        rolled = arr if dx == 0 else jnp.roll(arr, -dx, axis=1)
        s = HALO - 1 + dy
        return rolled[s : s + band + 2]

    center = tile[HALO - 1 : HALO - 1 + band + 2]
    diffs = [shift(tile, dy, dx) - center for dy, dx in CIRCLE]

    def arc_min9(ds):
        m3 = [jnp.minimum(jnp.minimum(ds[i], ds[(i + 1) % 16]), ds[(i + 2) % 16])
              for i in range(16)]
        m9 = [jnp.minimum(jnp.minimum(m3[i], m3[(i + 3) % 16]), m3[(i + 6) % 16])
              for i in range(16)]
        out = m9[0]
        for i in range(1, 16):
            out = jnp.maximum(out, m9[i])
        return out

    # comparisons happen in f32 — Mosaic on this target rejects bf16
    # compares ("Target does not support this comparison"); the min/max
    # score chain above is where the vreg pressure is anyway
    score = jnp.maximum(
        arc_min9(diffs), arc_min9([-d for d in diffs])
    ).astype(jnp.float32)

    def nshift(arr, dy, dx):
        rolled = arr if dx == 0 else jnp.roll(arr, -dx, axis=1)
        return rolled[1 + dy : 1 + dy + band]

    c = score[1 : 1 + band]
    keep = jnp.ones_like(c, dtype=jnp.bool_)
    strictly_before = True
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                strictly_before = False
                continue
            nb = nshift(score, dy, dx)
            keep = keep & ((c > nb) if strictly_before else (c >= nb))

    # ---- gating: NMS survivors, positive score, inside the per-plane
    # detection border (content sizes from SMEM)
    lane = jax.lax.broadcasted_iota(jnp.int32, c.shape, 1)
    row_g = jax.lax.broadcasted_iota(jnp.int32, c.shape, 0) + i * band
    inb = (
        (row_g >= border) & (row_g < lh - border)
        & (lane >= border) & (lane < lw - border)
    )
    neg = jnp.float32(_NEG)
    zero = jnp.float32(0.0)
    s = jnp.where(keep & (c > zero) & inb, c, neg)

    # ---- subpixel maps: 1-D quadratic fit per axis on the raw score,
    # same formula as fast.select_keypoints* (values identical: rows r-1
    # and r+1 are score[0:band] / score[2:band+2]; lane rolls never wrap
    # for gated detections, which sit >= border=19 lanes inside)
    def para(sm, s0, sp):
        den = sm - 2.0 * s0 + sp
        off = jnp.where(jnp.abs(den) > 1e-6, 0.5 * (sm - sp) / den, 0.0)
        return jnp.clip(off, -0.5, 0.5)

    xq = lane.astype(jnp.float32) + para(
        jnp.roll(c, 1, axis=1), c, jnp.roll(c, -1, axis=1)
    )
    yq = row_g.astype(jnp.float32) + para(
        score[0:band], c, score[2 : band + 2]
    )

    # flat-position tie-break codes stay f32 (codes reach H*W ~ 3.6e5,
    # needing the full 24-bit mantissa)
    code = (row_g * width + lane).astype(jnp.float32)       # < 2^24, exact
    big = jnp.float32(3e9)

    # ---- per cell-row: eligibility gate + top-kpc, first-index tie-break
    vrows, prows, xrows, yrows = [], [], [], []
    for cr in range(band // cell):
        sh = s[cr * cell : (cr + 1) * cell]
        codeh = code[cr * cell : (cr + 1) * cell]
        xq_h = xq[cr * cell : (cr + 1) * cell]
        yq_h = yq[cr * cell : (cr + 1) * cell]
        rowmax = jnp.max(sh, axis=0, keepdims=True)
        cellmax = _seg_all(rowmax, jnp.maximum, cell)       # [1, W] bcast
        # select the THRESHOLD value, not boolean vectors: Mosaic cannot
        # lower an i1 select_n (i8->i1 truncation error)
        thr = jnp.where(
            cellmax > th_hi, jnp.float32(th_hi), jnp.float32(th_lo)
        )
        cand = jnp.where(sh > thr, sh, neg)

        for k in range(kpc):
            rmax = jnp.max(cand, axis=0, keepdims=True)
            cmax = _seg_all(rmax, jnp.maximum, cell)        # [1, W]
            is_max = cand == cmax
            pcode = jnp.where(is_max, codeh, big)
            rmin = jnp.min(pcode, axis=0, keepdims=True)
            cmin = _seg_all(rmin, jnp.minimum, cell)        # [1, W]
            # extract the picked pixel's subpixel coords: `picked` is
            # one-hot within the cell block (codes are globally unique;
            # invalid cells have cmin == big, matching nothing -> 0)
            picked = codeh == cmin
            xk = _seg_all(
                jnp.sum(jnp.where(picked, xq_h, zero), axis=0,
                        keepdims=True), jnp.add, cell,
            )
            yk = _seg_all(
                jnp.sum(jnp.where(picked, yq_h, zero), axis=0,
                        keepdims=True), jnp.add, cell,
            )
            vrows.append(cmax)
            prows.append(cmin)
            xrows.append(xk)
            yrows.append(yk)
            cand = jnp.where(picked, neg, cand)

    # ---- lane compaction: each 16-lane segment carries its cell's value
    # broadcast; write only lane 0 of each segment. The outputs used to be
    # full-width [n_sub, kpc, W] (16x the useful lanes) — every downstream
    # tail op (written-band masking, int cast, flatten, the plane-top-k
    # sort input build) then re-read the 16x-fat tensors from HBM. A 0/1
    # selection dot (HIGHEST precision: bf16x3 splitting reproduces each
    # f32 input exactly, and each output column has exactly one nonzero)
    # compacts [R, W] -> [R, W/16] in-kernel. Strided slicing can't be
    # used here: a [W] -> [ncx, 16] reshape needs a rank-3/relayout Mosaic
    # path this chip rejects.
    ncx = val_ref.shape[3]
    width_c = cell * ncx
    lsel = (
        jax.lax.broadcasted_iota(jnp.int32, (width_c, ncx), 0)
        == cell * jax.lax.broadcasted_iota(jnp.int32, (width_c, ncx), 1)
    ).astype(jnp.float32)
    for rows, ref in (
        (vrows, val_ref), (prows, pos_ref), (xrows, x_ref), (yrows, y_ref)
    ):
        packed = jax.lax.dot_general(
            jnp.concatenate(rows, axis=0), lsel,           # [R, W]x[W, ncx]
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )                                                   # [R, ncx]
        for cr in range(band // cell):
            for k in range(kpc):
                ref[0, cr, k, :] = packed[cr * kpc + k, :]


def fast_select_pallas(
    stack: jnp.ndarray,
    bounds: list,
    th_hi: float,
    th_lo: float,
    border: int = 19,
    k_per_cell: int = 4,
    interpret: bool = False,
    compute_dtype=jnp.float32,
    band: int = 32,
    flat: bool = True,
):
    """Fused FAST score + NMS + per-cell top-k for a plane stack [N, H, W].

    Returns (vals [N, C], codes [N, C] int32 flat y*W+x positions,
    xs [N, C], ys [N, C] subpixel-refined coords), C = n_cells_total *
    kpc; invalid slots have vals == -1e9 and xs == ys == 0. Requires
    W % 16 == 0 (the lane-segment allreduce); callers fall back to the
    unfused path otherwise.

    flat=False instead returns the per-width-class parts unflattened:
    a list of (start_plane, vals, codes, xs, ys) with arrays shaped
    [n_run_planes, n_cr, ncx_run, kpc] — the cell-row axis exposed so the
    caller can slice a level's CONTENT rows before its plane top-k.

    compute_dtype=jnp.bfloat16 halves the score chain's vector-register
    footprint; bit-exact vs float32 on integer-valued planes, <= 0.5
    intensity score rounding on fractional ones (see `_select_kernel`)."""
    n, h, w = stack.shape
    cell = 16                      # selection cell size (lane segments)
    assert band % cell == 0       # rows per program (band // cell cell-rows)
    assert w % cell == 0, "fused select needs W % 16 == 0"
    n_sub = band // cell
    hp = -(-h // band) * band
    img_p = jnp.pad(
        stack, ((0, 0), (HALO, hp - h + HALO), (0, 0)), mode="edge"
    )
    n_bands = hp // band
    n_cr = hp // cell              # cell-rows (output granularity)
    ncx = w // cell

    # Width classes: a plane only needs lanes up to its content width
    # (detections are gated to lane < lw - border), so CONTIGUOUS runs of
    # planes sharing a lane class (lw rounded up to 128, capped at w)
    # launch as separate, NARROWER kernels — pyramid levels shrink, and
    # uniform-width padding was ~27% of the detection kernel's lane
    # compute. `bounds` is static, so the grouping, the content-band
    # program maps, and the written-slot masks are all numpy.
    wcls = [min(w, -(-max(b[1], 8 * cell) // 128) * 128) for b in bounds]
    runs = []                          # (start, end, w_c) contiguous
    for p, wc in enumerate(wcls):
        if runs and runs[-1][2] == wc:
            runs[-1] = (runs[-1][0], p + 1, wc)
        else:
            runs.append((p, p + 1, wc))

    val_parts = []
    max_cand = max(n_cr * (wc // cell) * k_per_cell for _, _, wc in runs)
    for start, end, w_c in runs:
        n_r = end - start
        ncx_c = w_c // cell
        dims = jnp.asarray(
            np.array([[b[0] for b in bounds[start:end]],
                      [b[1] for b in bounds[start:end]]]), jnp.int32
        )
        # content-band program list: a level's last useful row is
        # lh - border (subpixel refinement samples raw at gy + 1 with
        # gy <= lh - border - 1); bands past it are never launched.
        nb_per = [
            min(n_bands, (max(b[0] - border, 0)) // band + 1)
            for b in bounds[start:end]
        ]
        prog_plane = np.concatenate(
            [np.full(nb, p, np.int32) for p, nb in enumerate(nb_per)]
        )
        prog_band = np.concatenate(
            [np.arange(nb, dtype=np.int32) for nb in nb_per]
        )
        n_progs = int(prog_plane.shape[0])

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(n_progs,),
            in_specs=[
                pl.BlockSpec(
                    (1, img_p.shape[1], w_c),
                    lambda g, d, pp, pb, s=start: (s + pp[g], 0, 0),
                ),
            ],
            out_specs=tuple(
                pl.BlockSpec(
                    (1, n_sub, k_per_cell, ncx_c),
                    lambda g, d, pp, pb: (pp[g], pb[g], 0, 0),
                )
                for _ in range(4)
            ),
        )
        # `width=w` keeps position codes in GLOBAL canvas coordinates
        vals_r, codes_r, xs_r, ys_r = pl.pallas_call(
            functools.partial(
                _select_kernel, band=band, cell=cell, width=w,
                th_hi=float(th_hi), th_lo=float(th_lo), border=int(border),
                kpc=int(k_per_cell), compute_dtype=compute_dtype,
            ),
            grid_spec=grid_spec,
            out_shape=tuple(
                jax.ShapeDtypeStruct(
                    (n_r, n_cr, k_per_cell, ncx_c), jnp.float32
                )
                for _ in range(4)
            ),
            interpret=interpret,
        )(dims, jnp.asarray(prog_plane), jnp.asarray(prog_band), img_p)

        # outputs are lane-compacted in-kernel: one value per cell
        def seg4(a):
            return a.transpose(0, 1, 3, 2)               # [nr,ncr,ncx,kpc]

        vals_r, codes_r, xs_r, ys_r = map(seg4, (vals_r, codes_r, xs_r, ys_r))
        # slots of never-launched bands are uninitialized memory — mask
        # them with the same static band list before anything consumes them
        written = np.zeros((n_r, n_cr, 1, 1), bool)
        for p, nb in enumerate(nb_per):
            written[p, : nb * n_sub] = True
        wmask = jnp.asarray(written)
        vals_r = jnp.where(wmask, vals_r, _NEG)
        xs_r = jnp.where(wmask, xs_r, 0.0)
        ys_r = jnp.where(wmask, ys_r, 0.0)
        # Invalid slots (no candidate passed the gates, val == _NEG) carry
        # the 3e9 tie-break sentinel; route them to position 0 (their
        # subpixel coords are already 0 from the in-kernel one-hot sum).
        # Clip BEFORE the int32 cast (float->int overflow is unspecified).
        codes_r = jnp.clip(
            jnp.where(vals_r > _NEG / 2, codes_r, 0.0), 0.0, float(h * w - 1)
        ).astype(jnp.int32)
        val_parts.append((start, vals_r, codes_r, xs_r, ys_r))

    if not flat:
        return val_parts

    def flatpad(a, cv):
        n_r = a.shape[0]
        a = a.reshape(n_r, -1)
        return jnp.pad(
            a, ((0, 0), (0, max_cand - a.shape[1])), constant_values=cv
        )

    return tuple(
        jnp.concatenate([flatpad(p[i], cv) for p in val_parts], axis=0)
        for i, cv in ((1, _NEG), (2, 0), (3, 0.0), (4, 0.0))
    )


# --------------------------------------------------------------------------- #
# fused circular-moment maps (IC angle)
# --------------------------------------------------------------------------- #

MR = 15          # orientation patch radius (orb.PATCH_R)
_PADL = 16       # lane pad: window reads x - r - 1 >= -16, x + r <= W-1+15


def _moments_kernel(
    img_ref, m10_ref, m01_ref, *, band: int, width: int, n_bands: int
):
    """One (plane, row-band) program: in-VMEM lane prefix sums + windowed
    ramp/box filters + the 31-row circular accumulation. Same math as
    `orb.moment_maps_integral` (see its docstring for the decomposition and
    the precision argument) with the whole band's intermediate chain
    resident in VMEM — the XLA formulation materializes the shifted adds
    through HBM (~8-10 ms/frame; this kernel is one read + two writes)."""
    i = pl.program_id(0) % n_bands
    rows = band + 2 * MR
    # the plane is zero-meaned and zero-padded BEFORE the kernel, so pads
    # read as exact zeros and the prefix sums start clean
    tile = img_ref[0, pl.ds(i * band, rows), :]              # [rows, Wp]
    lane = jax.lax.broadcasted_iota(jnp.int32, tile.shape, 1)

    # centered x-weights (same centering as the XLA path)
    xc = lane.astype(tile.dtype) - (_PADL + width / 2.0)

    def cumsum_lanes(t):
        s = 1
        acc = t
        while s < t.shape[1]:
            acc = acc + jnp.where(lane >= s, jnp.roll(acc, s, axis=1), 0.0)
            s *= 2
        return acc

    p = cumsum_lanes(tile)
    q = cumsum_lanes(tile * xc)

    def window(c, r):
        # c[x+r] - c[x-r-1]; rolls wrap into the >=16-lane pads, never read.
        # A zero shift must bypass roll: Mosaic rejects the zero-size slice
        # jnp.roll(c, 0) lowers to.
        hi = c if r == 0 else jnp.roll(c, -r, axis=1)
        lo = jnp.roll(c, r + 1, axis=1)
        return hi - lo

    radii = sorted({int(np.floor(np.sqrt(MR * MR - dy * dy)))
                    for dy in range(MR + 1)})
    ramp = {}
    box = {}
    for r in radii:
        bx = window(p, r)
        ramp[r] = window(q, r) - xc * bx
        box[r] = bx

    m10 = jnp.zeros((band, tile.shape[1]), tile.dtype)
    m01 = jnp.zeros((band, tile.shape[1]), tile.dtype)
    for dy in range(-MR, MR + 1):
        r = int(np.floor(np.sqrt(MR * MR - dy * dy)))
        m10 = m10 + ramp[r][MR + dy : MR + dy + band]
        if dy:
            m01 = m01 + dy * box[r][MR + dy : MR + dy + band]

    m10_ref[0, :, :] = m10[:, _PADL : _PADL + width]
    m01_ref[0, :, :] = m01[:, _PADL : _PADL + width]


def moment_maps_pallas(
    stack: jnp.ndarray, band: int = 16, interpret: bool = False
):
    """(m10, m01) circular moment maps for a plane stack [N, H, W].

    Matches `orb.moment_maps_integral` to float tolerance (same prefix-sum
    decomposition, same per-plane mean subtraction and centered x-weights);
    border values within PATCH_R are garbage in both (masked by callers)."""
    n, h, w = stack.shape
    hp = -(-h // band) * band
    # per-plane mean subtraction happens OUTSIDE the kernel (one elementwise
    # pass) so the zero pads below are exact zeros for the prefix sums; see
    # orb.moment_maps_integral for why the moments are mean-invariant
    stack = stack - jnp.mean(stack, axis=(1, 2), keepdims=True)
    img_p = jnp.pad(
        stack, ((0, 0), (MR, hp - h + MR), (_PADL, _PADL))
    )

    n_bands = hp // band
    m10, m01 = pl.pallas_call(
        functools.partial(
            _moments_kernel, band=band, width=w, n_bands=n_bands
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, hp, w), stack.dtype),
            jax.ShapeDtypeStruct((n, hp, w), stack.dtype),
        ),
        grid=(n * n_bands,),
        in_specs=[
            pl.BlockSpec((1,) + img_p.shape[1:], lambda g: (g // n_bands, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, band, w), lambda g: (g // n_bands, g % n_bands, 0)),
            pl.BlockSpec((1, band, w), lambda g: (g // n_bands, g % n_bands, 0)),
        ),
        interpret=interpret,
    )(img_p)
    return m10[:, :h], m01[:, :h]
