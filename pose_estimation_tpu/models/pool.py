"""Fixed-capacity landmark/feature pool with validity masks.

Replaces the reference's `std::map<size_t, Feature>` pool + per-frame
`MapPoint` lists (`/root/reference/include/cfsd/feature-tracker.hpp:127`,
`src/feature-tracker.cpp:330-412`) with static-shape SoA arrays so the whole
aging / eviction / insertion dance jits: erase = mask write, insert =
mask-compacted scatter into free slots, "hist descriptors" = the pool itself.

The pool also carries the window observation table the backend consumes
(the reference's `Map::_frames`): obs column W-1 is the current frame,
columns 0..W-2 are the previous keyframes; a keyframe shifts columns left
(in lockstep with the window-state roll).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class FeaturePool(NamedTuple):
    valid: jax.Array     # [P] bool
    age: jax.Array       # [P] int32
    pixel: jax.Array     # [P, 2] pixel in the feature's first frame (left)
    desc_l: jax.Array    # [P, 256] int8 {-1,+1}
    desc_r: jax.Array    # [P, 256] int8
    pos: jax.Array       # [P, 3] world position
    fid: jax.Array       # [P] int32 global feature id
    next_fid: jax.Array  # scalar int32
    obs_px: jax.Array    # [P, W, 2] window observations (left pixels)
    obs_mask: jax.Array  # [P, W] bool


def init_pool(capacity: int, window: int, dtype=jnp.float32) -> FeaturePool:
    return FeaturePool(
        valid=jnp.zeros(capacity, bool),
        age=jnp.zeros(capacity, jnp.int32),
        pixel=jnp.zeros((capacity, 2), dtype),
        desc_l=jnp.zeros((capacity, 256), jnp.int8),
        desc_r=jnp.zeros((capacity, 256), jnp.int8),
        pos=jnp.zeros((capacity, 3), dtype),
        fid=jnp.full(capacity, -1, jnp.int32),
        next_fid=jnp.zeros((), jnp.int32),
        obs_px=jnp.zeros((capacity, window, 2), dtype),
        obs_mask=jnp.zeros((capacity, window), bool),
    )


def shift_window(pool: FeaturePool) -> FeaturePool:
    """Advance the observation window by one frame (on keyframe)."""
    return pool._replace(
        obs_px=jnp.roll(pool.obs_px, -1, axis=1).at[:, -1].set(0.0),
        obs_mask=jnp.roll(pool.obs_mask, -1, axis=1).at[:, -1].set(False),
    )


def record_observations(
    pool: FeaturePool,
    slot: jax.Array,       # [M] pool slot per current feature
    matched: jax.Array,    # [M] circular-match success
    px: jax.Array,         # [M, 2] current left pixels
) -> FeaturePool:
    """Write the current frame's observations (column W-1), clearing the
    column first — the reference clears `_frames.back()` on every frame
    (`feature-tracker.cpp:302`)."""
    p = pool.valid.shape[0]
    safe_slot = jnp.where(matched, slot, p)  # rejects -> dummy padded row
    obs_px = jnp.concatenate(
        [pool.obs_px.at[:, -1].set(0.0),
         jnp.zeros((1,) + pool.obs_px.shape[1:], pool.obs_px.dtype)], axis=0
    ).at[safe_slot, -1].set(px)[:p]
    obs_mask = jnp.concatenate(
        [pool.obs_mask.at[:, -1].set(False),
         jnp.zeros((1,) + pool.obs_mask.shape[1:], bool)], axis=0
    ).at[safe_slot, -1].set(True)[:p]
    return pool._replace(obs_px=obs_px, obs_mask=obs_mask)


def age_and_evict(
    pool: FeaturePool, slot: jax.Array, matched: jax.Array, max_age: int
) -> FeaturePool:
    """Keyframe aging (`feature-tracker.cpp:341-363`): matched features get
    -1, every feature +2, evict age > maxFeatureAge."""
    age = pool.age
    safe_slot = jnp.where(matched, slot, 0)
    dec = jnp.zeros_like(age).at[safe_slot].add(jnp.where(matched, -1, 0))
    age = age + dec + jnp.where(pool.valid, 2, 0)
    valid = pool.valid & (age <= max_age)
    return pool._replace(age=age, valid=valid)


def insert_features(
    pool: FeaturePool,
    new_px_l: jax.Array,    # [M, 2]
    new_desc_l: jax.Array,  # [M, 256]
    new_desc_r: jax.Array,  # [M, 256]
    new_pos: jax.Array,     # [M, 3] world positions
    want: jax.Array,        # [M] insert mask (unmatched & depth-ok & valid)
) -> FeaturePool:
    """Scatter new features into free slots; observation for the current
    frame (column W-1) is recorded too (`feature-tracker.cpp:389-398`).

    If fewer free slots than requested, the surplus (highest insertion rank)
    is dropped — the bounded-capacity analog of the unbounded std::map.
    """
    p = pool.valid.shape[0]
    free = ~pool.valid
    # rank free slots and insertion requests
    free_rank = jnp.cumsum(free) - 1            # [P] rank of each free slot
    want_rank = jnp.cumsum(want) - 1            # [M] rank of each request
    n_free = jnp.sum(free)

    # target slot per request: the want_rank-th free slot. Rejected requests
    # are routed to a dummy row at index p (dropped after the scatter) so
    # duplicate-index scatters can never clobber a real slot.
    order = jnp.argsort(~free, stable=True)     # free slots first, by index
    target = order[jnp.clip(want_rank, 0, p - 1)]
    ok = want & (want_rank < n_free)
    safe_t = jnp.where(ok, target, p)

    def scat(arr, vals):
        pad = jnp.zeros((1,) + arr.shape[1:], arr.dtype)
        out = jnp.concatenate([arr, pad], axis=0).at[safe_t].set(vals)
        return out[:p]

    from pose_estimation_tpu.ops import matching as match_mod

    def scat_desc(arr, vals):
        # 256-wide descriptor rows: one-hot MXU matmul instead of a row
        # scatter (~6 ms per million scattered elements on this chip);
        # targets == p (rejected requests) fall outside [0, P) and drop
        return match_mod.scatter_rows_mxu(arr, safe_t, vals)

    fids = pool.next_fid + want_rank.astype(jnp.int32)
    new_obs_px = jnp.zeros(pool.obs_px.shape[1:], pool.obs_px.dtype)
    new_obs_px = jnp.broadcast_to(new_obs_px, (want.shape[0],) + new_obs_px.shape)
    new_obs_px = new_obs_px.at[:, -1].set(new_px_l)
    new_obs_mask = jnp.zeros(pool.obs_mask.shape[1:], bool)
    new_obs_mask = jnp.broadcast_to(new_obs_mask, (want.shape[0],) + new_obs_mask.shape)
    new_obs_mask = new_obs_mask.at[:, -1].set(True)
    new_pool = pool._replace(
        valid=scat(pool.valid, jnp.ones_like(want)),
        age=scat(pool.age, jnp.zeros(want.shape[0], jnp.int32)),
        pixel=scat(pool.pixel, new_px_l),
        desc_l=scat_desc(pool.desc_l, new_desc_l),
        desc_r=scat_desc(pool.desc_r, new_desc_r),
        pos=scat(pool.pos, new_pos),
        fid=scat(pool.fid, fids),
        next_fid=pool.next_fid + jnp.sum(want).astype(jnp.int32),
        obs_px=scat(pool.obs_px, new_obs_px),
        obs_mask=scat(pool.obs_mask, new_obs_mask),
    )
    return new_pool
