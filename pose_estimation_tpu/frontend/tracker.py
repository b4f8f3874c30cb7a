"""Stereo feature-tracking front-end: rectify -> ORB -> match -> track.

TPU-native re-design of `cfsd::FeatureTracker`
(`/root/reference/src/feature-tracker.cpp`). Differences from the reference
are architectural, not semantic:

* the two `std::thread` ORB extractions (:147-157) become two batched device
  extractions inside one jit (XLA overlaps them);
* `internalMatch` (:140-229): MXU Hamming matching + vertical-epipolar gate +
  vectorized fundamental RANSAC, then mask-compaction into a fixed-capacity
  "current feature" set;
* `externalTrack` (:231-328): cur-vs-pool left and right matches with the
  same gates, circular consistency as index equality;
* triangulation of current stereo pairs via batched DLT with the rectified
  P1/P2 (:367).

Coordinate-frame note: triangulated points live in the RECTIFIED left camera
frame. The reference applies the unrectified-camera extrinsics T_BC to them
(`feature-tracker.cpp:383`), silently folding the rectification rotation R1
into the extrinsics as a constant error. We use the rectified extrinsics
R_bc_rect = R_bc @ R1^T instead (see `VIOConstants.from_model`).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from pose_estimation_tpu.models.pool import FeaturePool
from pose_estimation_tpu.ops import matching, orb, ransac, triangulate


class CurrentFeatures(NamedTuple):
    """Stereo-matched features of the current frame (capacity M)."""

    px_l: jax.Array     # [M, 2]
    px_r: jax.Array     # [M, 2]
    desc_l: jax.Array   # [M, 256] int8
    desc_r: jax.Array   # [M, 256] int8
    valid: jax.Array    # [M]


class TrackResult(NamedTuple):
    matched: jax.Array   # [M] circular-match success
    slot: jax.Array      # [M] pool slot of the matched feature
    n_matches: jax.Array


def compact(mask: jax.Array, capacity: int, *payloads):
    """Pack rows where mask is True into the first `capacity` output slots
    (stable). Returns (out_mask [capacity], packed payloads...).

    Implemented as one-hot MXU matmuls instead of rank scatters (the same
    ~6 ms/M-element scatter avoidance as `matching.select_rows_mxu`; the
    four narrow scatters here measured ~0.15 ms/frame of the B=32 step).
    Row i of the [capacity, N] selection matrix picks the unique source row
    with rank i; HIGHEST-precision dots pass f32 payloads through exactly
    (single nonzero per row), and int payloads < 2^24 are exact via f32."""
    n = mask.shape[0]
    rank = jnp.cumsum(mask) - 1                    # [N]
    ok = mask & (rank < capacity)
    oh = (
        rank[None, :] == jnp.arange(capacity, dtype=rank.dtype)[:, None]
    ) & ok[None, :]                                # [capacity, N]
    ohf = oh.astype(jnp.float32)
    outs = []
    for p in payloads:
        flat = p.reshape(n, -1).astype(jnp.float32)
        sel = jax.lax.dot_general(
            ohf, flat, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        outs.append(sel.reshape((capacity,) + p.shape[1:]).astype(p.dtype))
    out_mask = jnp.any(oh, axis=1)
    return (out_mask, *outs)


def internal_match(
    feats_l: orb.OrbFeatures,
    feats_r: orb.OrbFeatures,
    key: jax.Array,
    capacity: int,
    match_ratio: float,
    min_match_dist: float,
    max_vertical_dist: float,
    use_ransac: bool = True,
) -> CurrentFeatures:
    """L/R stereo matching with distance + epipolar gates and RANSAC."""
    m = matching.stereo_match(
        feats_l.desc, feats_r.desc, feats_l.valid, feats_r.valid,
        feats_l.xy, feats_r.xy,
        match_ratio, min_match_dist, max_vertical_dist,
    )
    keep = m.valid
    px_r = feats_r.xy[m.index]
    if use_ransac:
        res = ransac.fundamental_ransac(feats_l.xy, px_r, keep, key)
        keep = res.inliers
    # compact only NARROW payloads (pixels + row indices); the 256-wide
    # descriptor rows are then selected by one-hot MXU matmuls — row
    # gathers/scatters of [K, 256] tensors were the measured bulk of this
    # function's cost (~6 ms per million gathered elements on this chip)
    n = keep.shape[0]
    cm, px_l_c, px_r_c, lidx, ridx = compact(
        keep, capacity, feats_l.xy, px_r,
        jnp.arange(n, dtype=jnp.int32), m.index.astype(jnp.int32),
    )
    dl_c = matching.select_rows_mxu(feats_l.desc, lidx, cm)
    dr_c = matching.select_rows_mxu(feats_r.desc, ridx, cm)
    return CurrentFeatures(
        px_l=px_l_c, px_r=px_r_c, desc_l=dl_c, desc_r=dr_c, valid=cm
    )


def external_track(
    cur: CurrentFeatures,
    pool: FeaturePool,
    key: jax.Array,
    match_ratio: float,
    min_match_dist: float,
    use_ransac: bool = True,
) -> TrackResult:
    """Circular matching cur-left<->pool-left and cur-right<->pool-right
    (`feature-tracker.cpp:231-328`)."""
    ml = matching.match(
        cur.desc_l, pool.desc_l, cur.valid, pool.valid,
        match_ratio, min_match_dist,
    )
    left_ok = ml.valid
    if use_ransac:
        hist_px = pool.pixel[ml.index]
        res = ransac.fundamental_ransac(cur.px_l, hist_px, left_ok, key)
        left_ok = res.inliers

    mr = matching.match(
        cur.desc_r, pool.desc_r, cur.valid, pool.valid,
        match_ratio, min_match_dist,
    )
    # circular consistency: the left and right matches land on the same pool
    # feature (`feature-tracker.cpp:311-312`)
    matched = left_ok & mr.valid & (ml.index == mr.index)
    return TrackResult(
        matched=matched, slot=ml.index, n_matches=jnp.sum(matched)
    )


def triangulate_current(
    cur: CurrentFeatures,
    p1: jax.Array, p2: jax.Array,
    R_wb: jax.Array, p_wb: jax.Array,
    R_bc: jax.Array, p_bc: jax.Array,
    max_depth: float,
) -> tuple[jax.Array, jax.Array]:
    """World positions of the current stereo pairs + depth-validity mask
    (`feature-tracker.cpp:365-383`)."""
    pts_cam = triangulate.triangulate(p1, p2, cur.px_l, cur.px_r)
    depth = pts_cam[:, 2]
    good = cur.valid & (depth > 0.0) & (depth <= max_depth)
    pts_body = jnp.einsum("ij,nj->ni", R_bc, pts_cam) + p_bc
    pts_w = jnp.einsum("ij,nj->ni", R_wb, pts_body) + p_wb
    return pts_w, good
