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
