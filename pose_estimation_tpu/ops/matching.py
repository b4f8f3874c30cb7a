"""Brute-force binary-descriptor matching on the MXU.

Replaces the reference's `cv::BFMatcher(NORM_HAMMING)` calls (three full
matcher passes per frame, `/root/reference/src/feature-tracker.cpp:163,258,
303`). Descriptors are 256-bit; we carry them as {-1,+1} int8 vectors so the
O(N*K) Hamming-distance table is ONE int8 matmul on the systolic array:

    dot(a, b) = (#agree - #disagree) = 256 - 2 * hamming(a, b)
    => hamming = (256 - a . b) / 2

followed by a row-min reduction. The reference's gating rules (global-min
ratio, absolute distance floor, vertical epipolar distance) become masks.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from pose_estimation_tpu.utils.precision import full_precision

DESC_BITS = 256
_BIG = jnp.float32(1e9)


def pack_descriptors(bits: jnp.ndarray) -> jnp.ndarray:
    """bool bits [N, 256] -> signed {-1,+1} int8 [N, 256]."""
    return jnp.where(bits, jnp.int8(1), jnp.int8(-1))


@full_precision
def hamming_table(query: jnp.ndarray, train: jnp.ndarray) -> jnp.ndarray:
    """Pairwise Hamming distances. query [N,256] int8, train [K,256] int8 ->
    [N, K] float32. One MXU matmul."""
    dots = jnp.dot(
        query.astype(jnp.int8), train.astype(jnp.int8).T,
        preferred_element_type=jnp.int32,
    )
    return (DESC_BITS - dots).astype(jnp.float32) * 0.5


def select_rows_mxu(
    table: jnp.ndarray, idx: jnp.ndarray, valid: jnp.ndarray
) -> jnp.ndarray:
    """table[idx] * valid[:, None] as ONE one-hot int8 MXU matmul.

    table [K, D] int8, idx [M] int32 in [0, K), valid [M] bool -> [M, D]
    int8. Row gathers of 256-wide descriptors cost ~6 ms per million
    gathered elements on this chip (NOTES.md); the equivalent indicator
    matmul is a few dozen microseconds of MXU time and EXACT (integer
    dot products select single rows). Invalid rows come out zero."""
    k = table.shape[0]
    oh = (
        (idx[:, None] == jnp.arange(k, dtype=idx.dtype)[None, :])
        & valid[:, None]
    ).astype(jnp.int8)
    sel = jnp.dot(oh, table, preferred_element_type=jnp.int32)
    return sel.astype(table.dtype)


def scatter_rows_mxu(
    dest: jnp.ndarray, target: jnp.ndarray, vals: jnp.ndarray
) -> jnp.ndarray:
    """dest.at[target].set(vals) with unique in-range targets, as one
    one-hot int8 MXU matmul (same ~6 ms/M-element scatter avoidance as
    `select_rows_mxu`).

    dest [P, D] int8, target [M] int32 (rows with target >= P are
    dropped), vals [M, D] int8 -> [P, D] int8. Targets < P must be unique
    (the callers' compaction ranks guarantee it)."""
    p = dest.shape[0]
    oh = (
        target[:, None] == jnp.arange(p, dtype=target.dtype)[None, :]
    ).astype(jnp.int8)                                        # [M, P]
    ins = jnp.dot(oh.T, vals, preferred_element_type=jnp.int32)
    hit = jnp.sum(oh.astype(jnp.int32), axis=0) > 0           # [P]
    return jnp.where(hit[:, None], ins.astype(dest.dtype), dest)


class MatchResult(NamedTuple):
    index: jnp.ndarray   # [N] best train index per query
    dist: jnp.ndarray    # [N] its Hamming distance
    valid: jnp.ndarray   # [N] query & its match valid + passed gates


@full_precision
def match(
    query: jnp.ndarray,        # [N, 256] int8
    train: jnp.ndarray,        # [K, 256] int8
    query_mask: jnp.ndarray,   # [N] bool
    train_mask: jnp.ndarray,   # [K] bool
    match_ratio: float,
    min_match_dist: float,
) -> MatchResult:
    """Nearest-neighbour match with the reference's distance gate:

    keep if dist < max(matchRatio * min_over_all_matches, minMatchDist)
    (`feature-tracker.cpp:178,266`). The global min is taken over valid
    query rows, like BFMatcher's match list.
    """
    d = hamming_table(query, train)
    d = jnp.where(train_mask[None, :], d, _BIG)
    best_idx = jnp.argmin(d, axis=1)
    best_d = jnp.take_along_axis(d, best_idx[:, None], axis=1)[:, 0]
    row_valid = query_mask & (best_d < _BIG)

    global_min = jnp.min(jnp.where(row_valid, best_d, _BIG))
    thresh = jnp.maximum(match_ratio * global_min, min_match_dist)
    keep = row_valid & (best_d < thresh)
    return MatchResult(index=best_idx, dist=best_d, valid=keep)


@full_precision
def stereo_match(
    desc_l: jnp.ndarray, desc_r: jnp.ndarray,
    mask_l: jnp.ndarray, mask_r: jnp.ndarray,
    px_l: jnp.ndarray, px_r: jnp.ndarray,           # [N,2], [K,2]
    match_ratio: float, min_match_dist: float,
    max_vertical_dist: float,
) -> MatchResult:
    """L->R match + the rectified-epipolar gate |v_l - v_r| < maxVerticalDist
    (`feature-tracker.cpp:178`, internalMatch)."""
    m = match(desc_l, desc_r, mask_l, mask_r, match_ratio, min_match_dist)
    v_r = px_r[m.index, 1]
    keep = m.valid & (jnp.abs(px_l[:, 1] - v_r) < max_vertical_dist)
    return MatchResult(index=m.index, dist=m.dist, valid=keep)


@full_precision
def cross_check(
    fwd: MatchResult, n_train: int
) -> jnp.ndarray:
    """Mutual-best mask: query i keeps its match j only if no other valid
    query matched j with smaller distance (one-to-one assignment guard)."""
    n = fwd.index.shape[0]
    d = jnp.where(fwd.valid, fwd.dist, _BIG)
    # min distance per train index
    best_per_train = jnp.full((n_train,), _BIG, d.dtype).at[fwd.index].min(d)
    is_best = d <= best_per_train[fwd.index]
    return fwd.valid & is_best
