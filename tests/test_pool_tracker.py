"""Feature pool + tracker unit tests (aging/eviction/insertion semantics of
`feature-tracker.cpp:330-412` and the compaction/matching helpers)."""

import jax
import jax.numpy as jnp
import numpy as np

from pose_estimation_tpu.frontend import tracker
from pose_estimation_tpu.models import pool as pool_mod


def small_pool(capacity=16, window=4):
    return pool_mod.init_pool(capacity, window, jnp.float64)


class TestCompact:
    def test_packs_stably(self):
        mask = jnp.asarray([0, 1, 0, 1, 1, 0, 1], bool)
        vals = jnp.arange(7.0)
        out_mask, out_vals = tracker.compact(mask, 4, vals)
        np.testing.assert_array_equal(np.asarray(out_vals), [1, 3, 4, 6])
        assert bool(jnp.all(out_mask))

    def test_overflow_drops_tail(self):
        mask = jnp.ones(6, bool)
        vals = jnp.arange(6.0)
        out_mask, out_vals = tracker.compact(mask, 3, vals)
        np.testing.assert_array_equal(np.asarray(out_vals), [0, 1, 2])

    def test_empty(self):
        mask = jnp.zeros(5, bool)
        out_mask, out_vals = tracker.compact(mask, 3, jnp.arange(5.0))
        assert not bool(jnp.any(out_mask))


class TestPool:
    def test_insert_and_evict(self):
        p = small_pool()
        m = 6
        px = jnp.asarray(np.random.default_rng(0).uniform(0, 100, (m, 2)))
        desc = jnp.ones((m, 256), jnp.int8)
        pos = jnp.asarray(np.random.default_rng(1).normal(size=(m, 3)))
        want = jnp.asarray([1, 1, 0, 1, 0, 1], bool)
        p = pool_mod.insert_features(p, px, desc, desc, pos, want)
        assert int(jnp.sum(p.valid)) == 4
        # inserted rows carry the observation in the last window column
        assert int(jnp.sum(p.obs_mask[:, -1])) == 4
        np.testing.assert_array_equal(
            np.asarray(p.fid[np.asarray(p.valid)]), [0, 1, 2, 3]
        )

        # age them out: +2 per keyframe, evict at age > 3
        slot = jnp.zeros(m, jnp.int32)
        nomatch = jnp.zeros(m, bool)
        p1 = pool_mod.age_and_evict(p, slot, nomatch, max_age=3)
        assert int(jnp.sum(p1.valid)) == 4  # age 2 <= 3
        p2 = pool_mod.age_and_evict(p1, slot, nomatch, max_age=3)
        assert int(jnp.sum(p2.valid)) == 0  # age 4 > 3

    def test_matched_age_decrement(self):
        p = small_pool()
        m = 4
        px = jnp.zeros((m, 2))
        desc = jnp.ones((m, 256), jnp.int8)
        pos = jnp.zeros((m, 3))
        p = pool_mod.insert_features(p, px, desc, desc, pos, jnp.ones(m, bool))
        # feature in slot 0 is matched: net age +1; others +2
        slot = jnp.asarray([0, 0, 0, 0], jnp.int32)
        matched = jnp.asarray([1, 0, 0, 0], bool)
        p = pool_mod.age_and_evict(p, slot, matched, max_age=8)
        ages = np.asarray(p.age[:4])
        np.testing.assert_array_equal(ages, [1, 2, 2, 2])

    def test_capacity_overflow(self):
        p = small_pool(capacity=4)
        m = 8
        p = pool_mod.insert_features(
            p, jnp.zeros((m, 2)), jnp.ones((m, 256), jnp.int8),
            jnp.ones((m, 256), jnp.int8), jnp.zeros((m, 3)), jnp.ones(m, bool)
        )
        assert int(jnp.sum(p.valid)) == 4  # bounded, no overflow corruption

    def test_shift_window(self):
        p = small_pool()
        p = p._replace(
            obs_mask=p.obs_mask.at[2, 3].set(True),
            obs_px=p.obs_px.at[2, 3].set(jnp.asarray([5.0, 6.0])),
        )
        p2 = pool_mod.shift_window(p)
        assert bool(p2.obs_mask[2, 2])
        assert not bool(p2.obs_mask[2, 3])
        np.testing.assert_array_equal(np.asarray(p2.obs_px[2, 2]), [5.0, 6.0])

    def test_record_observations_clears_current(self):
        p = small_pool()
        p = p._replace(valid=p.valid.at[1].set(True))
        slot = jnp.asarray([1, 0], jnp.int32)
        matched = jnp.asarray([True, False])
        px = jnp.asarray([[10.0, 20.0], [0.0, 0.0]])
        p = pool_mod.record_observations(p, slot, matched, px)
        assert bool(p.obs_mask[1, -1])
        np.testing.assert_array_equal(np.asarray(p.obs_px[1, -1]), [10, 20])
        # re-record with nothing matched: column cleared
        p = pool_mod.record_observations(
            p, slot, jnp.zeros(2, bool), px
        )
        assert not bool(jnp.any(p.obs_mask[:, -1]))


class TestExternalTrack:
    def test_circular_consistency(self):
        rng = np.random.default_rng(3)
        p = small_pool()
        bits = rng.integers(0, 2, (3, 256)).astype(bool)
        descs = jnp.where(jnp.asarray(bits), jnp.int8(1), jnp.int8(-1))
        p = p._replace(
            valid=p.valid.at[:3].set(True),
            desc_l=p.desc_l.at[:3].set(descs),
            desc_r=p.desc_r.at[:3].set(descs),
            pixel=p.pixel.at[:3].set(jnp.asarray(rng.uniform(0, 100, (3, 2)))),
        )
        # cur features: 0 matches pool 0 on both sides; 1 matches pool 1 on
        # left but pool 2 on right (fails circular); 2 is novel
        def noisy(b, n):
            b = b.copy()
            idx = rng.choice(256, n, replace=False)
            b[idx] = ~b[idx]
            return b

        cl = np.stack([noisy(bits[0], 5), noisy(bits[1], 5), rng.integers(0, 2, 256).astype(bool)])
        cr = np.stack([noisy(bits[0], 5), noisy(bits[2], 5), rng.integers(0, 2, 256).astype(bool)])
        cur = tracker.CurrentFeatures(
            px_l=jnp.asarray(rng.uniform(0, 100, (3, 2))),
            px_r=jnp.asarray(rng.uniform(0, 100, (3, 2))),
            desc_l=jnp.where(jnp.asarray(cl), jnp.int8(1), jnp.int8(-1)),
            desc_r=jnp.where(jnp.asarray(cr), jnp.int8(1), jnp.int8(-1)),
            valid=jnp.ones(3, bool),
        )
        tr = tracker.external_track(
            cur, p, jax.random.PRNGKey(0), 3.0, 40.0, use_ransac=False
        )
        matched = np.asarray(tr.matched)
        assert matched[0]
        assert not matched[1]  # circular check must reject
        assert int(tr.slot[0]) == 0
