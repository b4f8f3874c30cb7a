"""FAST-9/16 corner scoring + NMS + spatially-uniform top-K selection.

TPU-native re-design of the keypoint-detection half of the vendored
ORB-SLAM2 extractor (`/root/reference/src/ORBextractor.cc`):

* `ComputeKeyPointsOctTree` (:765-853) runs OpenCV FAST per 30x30 cell with
  a threshold fallback 20 -> 7. Here the FAST decision + score are computed
  for EVERY pixel at once as pure VPU tensor math (16 shifted images, circular
  9-run min/max via a log-depth min-tree), and the per-cell fallback becomes a
  mask: a cell keeps its strong (>= th_hi) corners if it has any, else its
  weak (>= th_lo) ones.
* `DistributeOctTree` (:539-763) greedily splits a quadtree keeping the best
  corner per node. The lattice-friendly equivalent here: 3x3 NMS, then top-k
  per fixed cell, then global top-K by score — same spatial-uniformity
  semantics, fully static shapes.

Score follows OpenCV's FAST score: the largest t for which the pixel is
still a corner = max over contiguous 9-arcs of the min absolute
center-difference along the arc.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

# Bresenham circle of radius 3, clockwise from 12 o'clock: (dy, dx).
CIRCLE = (
    (-3, 0), (-3, 1), (-2, 2), (-1, 3), (0, 3), (1, 3), (2, 2), (3, 1),
    (3, 0), (3, -1), (2, -2), (1, -3), (0, -3), (-1, -3), (-2, -2), (-3, -1),
)


def _shift2d(img: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """Cyclic shift (cheap on TPU; the wrapped 3px edge ring lies outside the
    FAST detection border and is masked by `select_keypoints`)."""
    return jnp.roll(img, (-dy, -dx), axis=(-2, -1))


def fast_score(img: jnp.ndarray) -> jnp.ndarray:
    """Per-pixel FAST-9/16 corner score. img [...,H,W] float -> [...,H,W]
    float (leading batch dims supported; one fused program for all planes).

    score = max(arc_min over bright 9-arcs, arc_min over dark 9-arcs), i.e.
    the pixel is a FAST corner at threshold t iff score > t.

    The min tree is built over a python LIST of shifted images (16 separate
    elementwise chains XLA fuses into one loop), NOT a stacked tensor with
    rolls along the circle axis — the stacked form materializes a
    [..., 16, H, W] (and under vmap [B, 16, 16, H, W]) intermediate, which
    OOMs HBM at batch scale."""
    diffs = [_shift2d(img, dy, dx) - img for dy, dx in CIRCLE]

    def arc_min9(ds):
        m3 = [
            jnp.minimum(jnp.minimum(ds[i], ds[(i + 1) % 16]), ds[(i + 2) % 16])
            for i in range(16)
        ]
        m9 = [
            jnp.minimum(jnp.minimum(m3[i], m3[(i + 3) % 16]), m3[(i + 6) % 16])
            for i in range(16)
        ]
        out = m9[0]
        for i in range(1, 16):
            out = jnp.maximum(out, m9[i])
        return out

    bright = arc_min9(diffs)                 # > t  => bright corner
    dark = arc_min9([-d for d in diffs])     # > t  => dark corner
    return jnp.maximum(bright, dark)


def nms3(score: jnp.ndarray) -> jnp.ndarray:
    """3x3 non-max suppression mask (ties broken toward the top-left)."""
    strictly_before = True
    keep = jnp.ones_like(score, dtype=bool)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                strictly_before = False
                continue
            nb = _shift2d(score, dy, dx)
            if strictly_before:
                keep &= score > nb  # earlier neighbors must be strictly less
            else:
                keep &= score >= nb
    return keep


class Keypoints(NamedTuple):
    xy: jnp.ndarray      # [K, 2] float (x, y) in this image's coords
    score: jnp.ndarray   # [K]
    valid: jnp.ndarray   # [K] bool


def select_keypoints(
    score: jnp.ndarray,
    th_hi: float,
    th_lo: float,
    k_total: int,
    cell: int = 16,
    border: int = 19,
    k_per_cell: int = 4,
    pre_nms: bool = False,
    raw_score: jnp.ndarray | None = None,
) -> Keypoints:
    """NMS + per-cell threshold fallback + per-cell top-k + global top-K.

    border matches ORB-SLAM2's EDGE_THRESHOLD=19 detection margin
    (`ORBextractor.cc:770-773`). Set pre_nms=True when `score` is already
    NMS-masked (zeros where suppressed — e.g. from the Pallas kernel);
    `raw_score` then supplies unmasked values for subpixel refinement.
    """
    h, w = score.shape
    neg = jnp.float32(-1e9)

    keep = (score > 0.0) if pre_nms else nms3(score)
    ys = jnp.arange(h)[:, None]
    xs = jnp.arange(w)[None, :]
    inb = (ys >= border) & (ys < h - border) & (xs >= border) & (xs < w - border)

    s = jnp.where(keep & inb, score, neg)

    # pad to cell multiples
    hp = -(-h // cell) * cell
    wp = -(-w // cell) * cell
    s = jnp.pad(s, ((0, hp - h), (0, wp - w)), constant_values=neg)
    ncy, ncx = hp // cell, wp // cell
    cells = s.reshape(ncy, cell, ncx, cell).transpose(0, 2, 1, 3).reshape(
        ncy * ncx, cell * cell
    )

    # threshold fallback per cell (`ORBextractor.cc:809-815`)
    cell_max = jnp.max(cells, axis=1, keepdims=True)
    has_strong = cell_max > th_hi
    eligible = jnp.where(has_strong, cells > th_hi, cells > th_lo)
    cand = jnp.where(eligible, cells, neg)

    # top-k per cell
    top_s, top_i = _topk(cand, k_per_cell)
    # cell-local -> global pixel coords
    cy = jnp.arange(ncy * ncx) // ncx
    cx = jnp.arange(ncy * ncx) % ncx
    py = cy[:, None] * cell + top_i // cell
    px = cx[:, None] * cell + top_i % cell

    flat_s = top_s.reshape(-1)
    flat_x = px.reshape(-1)
    flat_y = py.reshape(-1)

    # global top-K
    k_total = min(k_total, flat_s.shape[0])
    g_s, g_i = _topk(flat_s[None, :], k_total)
    g_s, g_i = g_s[0], g_i[0]
    gx = flat_x[g_i]
    gy = flat_y[g_i]

    # subpixel refinement: 1D quadratic fit on the raw score map along each
    # axis (a quality upgrade over the reference, whose FAST corners are
    # integer-quantized — ORBextractor.cc has no refinement)
    sub_src = score if raw_score is None else raw_score

    def sc(yy, xx):
        yy = jnp.clip(yy, 0, h - 1)
        xx = jnp.clip(xx, 0, w - 1)
        return sub_src.reshape(-1)[yy * w + xx]

    s0 = sc(gy, gx)
    sl = sc(gy, gx - 1)
    sr = sc(gy, gx + 1)
    su = sc(gy - 1, gx)
    sd = sc(gy + 1, gx)

    def para(sm, s0, sp):
        den = sm - 2.0 * s0 + sp
        off = jnp.where(jnp.abs(den) > 1e-6, 0.5 * (sm - sp) / den, 0.0)
        return jnp.clip(off, -0.5, 0.5)

    dx = para(sl, s0, sr)
    dy = para(su, s0, sd)
    xy = jnp.stack(
        [gx.astype(jnp.float32) + dx, gy.astype(jnp.float32) + dy], axis=-1
    )
    return Keypoints(xy=xy, score=g_s, valid=g_s > neg / 2)


def _topk(x: jnp.ndarray, k: int):
    import jax

    return jax.lax.top_k(x, k)


def select_keypoints_fused(
    score_stack_src: jnp.ndarray,
    bounds: list,
    th_hi: float,
    th_lo: float,
    k_max: int,
    border: int = 19,
    k_per_cell: int = 4,
    interpret: bool = False,
    compute_dtype=jnp.float32,
    plane_topk: str = "sort",
    budgets: list[int] | None = None,
) -> Keypoints:
    """`select_keypoints_batched` with the FAST score + NMS + gating +
    per-cell top-k + SUBPIXEL refinement all fused into one Pallas kernel
    (`pallas_fast.fast_select_pallas`); input is the IMAGE plane stack, not
    a score map. Only the plane-level top-k remains in XLA — by default
    `lax.top_k` (measured 7.6 ms/call at [512, 5640] -> 174 on this chip
    vs 47.5 ms for the bisection form: the bisect's 24 masked-count passes
    are ~6x the cost of one full sort here — benchmarks/topk_exp.py), or
    `plane_topk="bisect"` for the count-based form. Results are identical to the
    unfused path (same gates, same raster tie-breaks, same quadratic
    subpixel fit evaluated in-kernel); with compute_dtype=bfloat16 that
    equality is exact on integer-valued planes and holds up to
    <= 0.5-intensity score rounding on fractional ones.

    budgets: optional per-LEVEL budget list for a LEVEL-MAJOR plane stack
    (len(bounds) == len(budgets) * b images). When given, the plane top-k
    runs PER LEVEL over only that level's CONTENT cell-rows and its own
    budget k. MEASURED SLOWER on-chip than the single flat sort (8 small
    sort networks at 45.5 ms/call standalone vs 39.8 for one [512, 5760]
    batched sort — benchmarks/seltail_exp.py; sort cost is pass-count-,
    not row-, dominated), so `extract_batch` does NOT use it; kept as an
    exact-semantics alternative for narrow-plane configurations. Slots
    past a level's budget come back invalid (score _NEG), which is exactly
    what `extract_batch` discards; candidate sets and ordering within each
    level's budget are unchanged."""
    from pose_estimation_tpu.ops.pallas_fast import fast_select_pallas

    neg = jnp.float32(-1e9)
    if budgets is not None and plane_topk == "sort":
        import numpy as np

        parts = fast_select_pallas(
            score_stack_src, bounds, th_hi, th_lo, border, k_per_cell,
            interpret, compute_dtype=compute_dtype, flat=False,
        )
        nl = len(budgets)
        n_planes = len(bounds)
        b = n_planes // nl
        band = 32
        cell = 16
        n_bands_tot = -(-score_stack_src.shape[1] // band)
        k_max = min(k_max, max(budgets))
        sx, sy, ss = [], [], []
        for lvl in range(nl):
            p0 = lvl * b
            # the level's planes live inside exactly one width-class run
            # (runs merge only whole levels — widths are per-level uniform)
            for start, v4, _c4, x4, y4 in parts:
                if start <= p0 < start + v4.shape[0]:
                    break
            else:  # pragma: no cover - structural invariant
                raise AssertionError("level not covered by any run")
            r0 = p0 - start
            lh = bounds[p0][0]
            nb_l = min(n_bands_tot, max(lh - border, 0) // band + 1)
            ncr_l = min(v4.shape[1], nb_l * (band // cell))
            fv = v4[r0 : r0 + b, :ncr_l].reshape(b, -1)
            fx = x4[r0 : r0 + b, :ncr_l].reshape(b, -1)
            fy = y4[r0 : r0 + b, :ncr_l].reshape(b, -1)
            k_l = min(budgets[lvl], fv.shape[1], k_max)
            g_s, g_i = _topk(fv, k_l)
            gx = jnp.take_along_axis(fx, g_i, axis=1)
            gy = jnp.take_along_axis(fy, g_i, axis=1)
            pad = ((0, 0), (0, k_max - k_l))
            ss.append(jnp.pad(g_s, pad, constant_values=neg))
            sx.append(jnp.pad(gx, pad))
            sy.append(jnp.pad(gy, pad))
        g_s = jnp.concatenate(ss, axis=0)
        xy = jnp.stack(
            [jnp.concatenate(sx, axis=0), jnp.concatenate(sy, axis=0)],
            axis=-1,
        )
        return Keypoints(xy=xy, score=g_s, valid=g_s > neg / 2)

    flat_s, _flat_code, flat_x, flat_y = fast_select_pallas(
        score_stack_src, bounds, th_hi, th_lo, border, k_per_cell, interpret,
        compute_dtype=compute_dtype,
    )
    k_max = min(k_max, flat_s.shape[1])
    if plane_topk == "bisect":
        g_s, (gx, gy) = topk_bisect(flat_s, (flat_x, flat_y), k_max)
    else:
        g_s, g_i = _topk(flat_s, k_max)
        gx = jnp.take_along_axis(flat_x, g_i, axis=1)
        gy = jnp.take_along_axis(flat_y, g_i, axis=1)
    xy = jnp.stack([gx, gy], axis=-1)
    return Keypoints(xy=xy, score=g_s, valid=g_s > neg / 2)


def topk_bisect(flat_s: jnp.ndarray, payloads, k: int,
                hi0: float = 512.0, iters: int = 24):
    """Top-k of flat_s [N, C] along axis 1, sorted descending, plus the
    matching rows of each payload — WITHOUT a full-length sort.

    `lax.top_k` lowers to a full O(C log C) sort on TPU (~4.6 ms at
    [16, 1410, 256]-class shapes, NOTES.md); this does a 24-step bisection
    on the k-th value (24 masked counts over [N, C]), a cumsum-rank scatter
    compaction of the ~k survivors, and a small top-k sort of the
    compacted [N, k] block.

    EXACTNESS: identical to `lax.top_k` (including lower-index tie-breaks)
    whenever distinct score values are separated by more than hi0 / 2^iters
    = 3e-5: within the final bisection interval every candidate value is
    then exactly equal, and both methods fill the tail slots in ascending
    index order. FAST scores from the bf16 fused kernel are bf16-quantized
    with spacing >= 0.0156 at score >= 4 (th_lo is 7), so the production
    path is bit-exact; arbitrary f32 scores can differ from top_k only by
    swaps among candidates < 3e-5 apart.

    Scores must lie in [0, hi0) or be the _NEG invalid sentinel. Returns
    (vals [N, k], [payload [N, k], ...]); slots past the number of
    positive-score candidates carry val == _NEG and payload == 0.
    """
    import jax

    n, c = flat_s.shape
    neg = jnp.float32(-1e9)
    lo = jnp.zeros((n, 1), flat_s.dtype)
    hi = jnp.full((n, 1), hi0, flat_s.dtype)
    for _ in range(iters):
        mid = 0.5 * (lo + hi)
        take = jnp.sum(flat_s > mid, axis=1, keepdims=True) >= k
        lo = jnp.where(take, mid, lo)
        hi = jnp.where(take, hi, mid)
    # invariant: count(> lo) >= k (or lo == 0), count(> hi) < k
    gt = flat_s > hi
    n_gt = jnp.sum(gt, axis=1, keepdims=True)
    eq = (flat_s > lo) & ~gt                 # k-th-value ties
    fill = jnp.cumsum(eq.astype(jnp.int32), axis=1) <= (k - n_gt)
    sel = gt | (eq & fill)
    rank = jnp.cumsum(sel.astype(jnp.int32), axis=1) - 1
    tgt = jnp.where(sel, rank, k)            # unselected -> dropped col k
    rows = jnp.arange(n)[:, None]
    comp_s = jnp.full((n, k + 1), neg, flat_s.dtype).at[rows, tgt].set(
        jnp.where(sel, flat_s, neg)
    )[:, :k]
    vals, idx = _topk(comp_s, k)             # sort k, not C
    outs = []
    for p in payloads:
        compp = jnp.zeros((n, k + 1), p.dtype).at[rows, tgt].set(p)[:, :k]
        outs.append(jnp.take_along_axis(compp, idx, axis=1))
    return vals, outs


def _topk_iter(x: jnp.ndarray, k: int):
    """top-k along the last axis via k iterative (max, mask) passes.

    Functionally = lax.top_k for small k. On this chip lax.top_k lowers to a
    full sort (~4.6 ms on the [N, C, 256] cell tensor); k passes of
    max+compare are pure VPU elementwise work (~10x cheaper for k=4).
    Ties break toward the LOWER index, like lax.top_k."""
    import jax

    n = x.shape[-1]
    iota = jax.lax.iota(jnp.int32, n)
    for _ in range(x.ndim - 1):
        iota = iota[None]
    comb = x
    idxs = []
    for _ in range(k):
        idx = jnp.argmax(comb, axis=-1)                  # first max wins
        idxs.append(idx)
        comb = jnp.where(iota == idx[..., None], -jnp.inf, comb)
    idxs = jnp.stack(idxs, axis=-1).astype(jnp.int32)
    vals = jnp.take_along_axis(x, idxs, axis=-1)         # exact values
    return vals, idxs


def select_keypoints_batched(
    score: jnp.ndarray,
    bounds: list[tuple[int, int]],
    th_hi: float,
    th_lo: float,
    k_max: int,
    cell: int = 16,
    border: int = 19,
    k_per_cell: int = 4,
    pre_nms: bool = False,
    raw_score: jnp.ndarray | None = None,
) -> Keypoints:
    """Batched `select_keypoints` over N image planes in one program.

    score: [N, H, W] corner scores (planes may be pyramid levels padded into
    a common canvas); bounds: static per-plane (lh, lw) content sizes — the
    detection margin is applied within each plane's content, exactly like the
    per-level path. Returns Keypoints with [N, k_max] fields.

    This is the op-count-collapsed form of the per-level selection: on the
    dispatch-latency-bound single chip, 16 per-level selections cost ~16x
    this one (see BASELINE.md / NOTES on per-op latency).
    """
    import numpy as np

    n, h, w = score.shape
    neg = jnp.float32(-1e9)
    assert len(bounds) == n

    keep = (score > 0.0) if pre_nms else nms3(score)
    lh = jnp.asarray(np.array([b[0] for b in bounds]), jnp.int32)[:, None, None]
    lw = jnp.asarray(np.array([b[1] for b in bounds]), jnp.int32)[:, None, None]
    ys = jnp.arange(h)[None, :, None]
    xs = jnp.arange(w)[None, None, :]
    inb = (ys >= border) & (ys < lh - border) & (xs >= border) & (xs < lw - border)

    s = jnp.where(keep & inb, score, neg)

    hp = -(-h // cell) * cell
    wp = -(-w // cell) * cell
    s = jnp.pad(s, ((0, 0), (0, hp - h), (0, wp - w)), constant_values=neg)
    ncy, ncx = hp // cell, wp // cell
    cells = s.reshape(n, ncy, cell, ncx, cell).transpose(0, 1, 3, 2, 4).reshape(
        n, ncy * ncx, cell * cell
    )

    cell_max = jnp.max(cells, axis=2, keepdims=True)
    has_strong = cell_max > th_hi
    eligible = jnp.where(has_strong, cells > th_hi, cells > th_lo)
    cand = jnp.where(eligible, cells, neg)

    top_s, top_i = _topk_iter(cand, k_per_cell)           # [n, C, k]
    cy = jnp.arange(ncy * ncx) // ncx
    cx = jnp.arange(ncy * ncx) % ncx
    py = cy[None, :, None] * cell + top_i // cell
    px = cx[None, :, None] * cell + top_i % cell

    flat_s = top_s.reshape(n, -1)
    flat_x = px.reshape(n, -1)
    flat_y = py.reshape(n, -1)

    k_max = min(k_max, flat_s.shape[1])
    g_s, g_i = _topk(flat_s, k_max)                        # [n, k_max]
    gx = jnp.take_along_axis(flat_x, g_i, axis=1)
    gy = jnp.take_along_axis(flat_y, g_i, axis=1)

    sub_src = (score if raw_score is None else raw_score).reshape(n, h * w)

    def sc(yy, xx):
        yy = jnp.clip(yy, 0, h - 1)
        xx = jnp.clip(xx, 0, w - 1)
        return jnp.take_along_axis(sub_src, yy * w + xx, axis=1)

    s0 = sc(gy, gx)
    sl = sc(gy, gx - 1)
    sr = sc(gy, gx + 1)
    su = sc(gy - 1, gx)
    sd = sc(gy + 1, gx)

    def para(sm, s0, sp):
        den = sm - 2.0 * s0 + sp
        off = jnp.where(jnp.abs(den) > 1e-6, 0.5 * (sm - sp) / den, 0.0)
        return jnp.clip(off, -0.5, 0.5)

    dx = para(sl, s0, sr)
    dy = para(su, s0, sd)
    xy = jnp.stack(
        [gx.astype(jnp.float32) + dx, gy.astype(jnp.float32) + dy], axis=-1
    )
    return Keypoints(xy=xy, score=g_s, valid=g_s > neg / 2)
