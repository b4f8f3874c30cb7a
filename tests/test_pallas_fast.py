"""Pallas fused FAST score+NMS kernel vs the XLA formulation (interpret
mode on CPU; the kernel runs compiled on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from pose_estimation_tpu.ops import fast as fast_mod
from pose_estimation_tpu.ops.pallas_fast import fast_score_nms_pallas


class TestPallasFast:
    def test_matches_xla_formulation(self):
        rng = np.random.default_rng(0)
        img = jnp.asarray(rng.uniform(0, 255, (120, 160)), jnp.float32)
        ref_score = fast_mod.fast_score(img)
        ref_masked = jnp.where(fast_mod.nms3(ref_score), ref_score, 0.0)
        raw, masked = fast_score_nms_pallas(img, interpret=True)
        # compare away from borders (column wrap + row halo live outside the
        # 19px detection margin)
        sl = np.s_[8:-8, 8:-8]
        np.testing.assert_array_equal(np.asarray(raw)[sl], np.asarray(ref_score)[sl])
        np.testing.assert_array_equal(np.asarray(masked)[sl], np.asarray(ref_masked)[sl])

    def test_select_keypoints_pre_nms_equivalence(self):
        """The pallas path through select_keypoints (pre_nms + raw_score)
        yields the same keypoints as the standard path."""
        rng = np.random.default_rng(1)
        img = jnp.asarray(rng.uniform(0, 255, (120, 160)), jnp.float32)
        score = fast_mod.fast_score(img)
        kps_std = fast_mod.select_keypoints(score, 20.0, 7.0, 64)
        raw, masked = fast_score_nms_pallas(img, interpret=True)
        kps_pal = fast_mod.select_keypoints(
            masked, 20.0, 7.0, 64, pre_nms=True, raw_score=raw
        )
        v1 = np.asarray(kps_std.valid)
        v2 = np.asarray(kps_pal.valid)
        np.testing.assert_array_equal(v1, v2)
        np.testing.assert_allclose(
            np.asarray(kps_std.xy)[v1], np.asarray(kps_pal.xy)[v2], atol=1e-6
        )

    def test_nonuniform_height(self):
        rng = np.random.default_rng(2)
        img = jnp.asarray(rng.uniform(0, 255, (101, 128)), jnp.float32)
        raw, masked = fast_score_nms_pallas(img, interpret=True)
        assert raw.shape == img.shape and masked.shape == img.shape

    def test_batched_planes_match_per_plane(self):
        """[N,H,W] plane-stack launch == N separate 2D launches."""
        rng = np.random.default_rng(3)
        stack = jnp.asarray(rng.uniform(0, 255, (3, 96, 128)), jnp.float32)
        raw_b, masked_b = fast_score_nms_pallas(stack, interpret=True)
        for i in range(3):
            raw_i, masked_i = fast_score_nms_pallas(stack[i], interpret=True)
            np.testing.assert_array_equal(np.asarray(raw_b[i]), np.asarray(raw_i))
            np.testing.assert_array_equal(
                np.asarray(masked_b[i]), np.asarray(masked_i)
            )


class TestFusedSelect:
    def test_matches_unfused_selection_exactly(self):
        """select_keypoints_fused (FAST+NMS+gates+per-cell top-k in one
        kernel) must reproduce the unfused pipeline bit-exactly: same valid
        mask, scores, and subpixel coordinates — gates, raster tie-breaks
        and flat ordering all line up."""
        from pose_estimation_tpu.ops import fast as fast_mod
        from pose_estimation_tpu.ops.pallas_fast import fast_score_nms_pallas

        rng = np.random.default_rng(5)
        h, w = 96, 128
        n = 6
        stack = jnp.asarray(rng.uniform(0, 255, (n, h, w)), jnp.float32)
        bounds = [(h, w)] * 2 + [(80, 112)] * 2 + [(64, 96)] * 2
        th_hi, th_lo, kmax, kpc = 20.0, 7.0, 100, 4

        raw, masked = fast_score_nms_pallas(stack, interpret=True)
        ref = fast_mod.select_keypoints_batched(
            masked, bounds, th_hi, th_lo, kmax, cell=16, border=19,
            k_per_cell=kpc, pre_nms=True, raw_score=raw)
        got = fast_mod.select_keypoints_fused(
            stack, bounds, th_hi, th_lo, kmax, border=19, k_per_cell=kpc,
            interpret=True)
        np.testing.assert_array_equal(np.asarray(ref.valid), np.asarray(got.valid))
        v = np.asarray(ref.valid)
        assert v.sum() > 100  # the fixture must actually exercise selection
        np.testing.assert_array_equal(
            np.asarray(ref.score)[v], np.asarray(got.score)[v])
        np.testing.assert_array_equal(
            np.asarray(ref.xy)[v], np.asarray(got.xy)[v])

    def test_width_classes_match_unfused(self):
        """Planes whose content is narrower than the canvas run through
        NARROWER kernel launches (contiguous width-class runs); selection
        must still equal the unfused full-width path exactly."""
        from pose_estimation_tpu.ops import fast as fast_mod
        from pose_estimation_tpu.ops.pallas_fast import fast_score_nms_pallas

        rng = np.random.default_rng(11)
        h, w = 96, 256
        stack = jnp.asarray(rng.uniform(0, 255, (4, h, w)), jnp.float32)
        # classes: 256, 256, 128, 128 -> two contiguous runs
        bounds = [(h, w), (88, 224), (80, 120), (64, 96)]
        th_hi, th_lo, kmax, kpc = 20.0, 7.0, 100, 4

        raw, masked = fast_score_nms_pallas(stack, interpret=True)
        ref = fast_mod.select_keypoints_batched(
            masked, bounds, th_hi, th_lo, kmax, cell=16, border=19,
            k_per_cell=kpc, pre_nms=True, raw_score=raw)
        got = fast_mod.select_keypoints_fused(
            stack, bounds, th_hi, th_lo, kmax, border=19, k_per_cell=kpc,
            interpret=True)
        np.testing.assert_array_equal(
            np.asarray(ref.valid), np.asarray(got.valid))
        v = np.asarray(ref.valid)
        assert v.sum() > 50
        np.testing.assert_array_equal(
            np.asarray(ref.score)[v], np.asarray(got.score)[v])
        np.testing.assert_array_equal(
            np.asarray(ref.xy)[v], np.asarray(got.xy)[v])

    def test_bf16_exact_on_integer_images(self):
        """compute_dtype=bfloat16 == the f32 unfused path BIT-EXACTLY on
        integer-valued images (the production case: extract_batch rounds
        the pyramid like the reference's uint8 one): FAST diffs of ints
        <= 255 are exactly representable in bf16."""
        from pose_estimation_tpu.ops import fast as fast_mod
        from pose_estimation_tpu.ops.pallas_fast import fast_score_nms_pallas

        rng = np.random.default_rng(9)
        h, w = 96, 128
        n = 4
        stack = jnp.asarray(
            np.round(rng.uniform(0, 255, (n, h, w))), jnp.float32)
        bounds = [(h, w)] * 2 + [(80, 112)] * 2
        th_hi, th_lo, kmax, kpc = 20.0, 7.0, 100, 4

        raw, masked = fast_score_nms_pallas(stack, interpret=True)
        ref = fast_mod.select_keypoints_batched(
            masked, bounds, th_hi, th_lo, kmax, cell=16, border=19,
            k_per_cell=kpc, pre_nms=True, raw_score=raw)
        got = fast_mod.select_keypoints_fused(
            stack, bounds, th_hi, th_lo, kmax, border=19, k_per_cell=kpc,
            interpret=True, compute_dtype=jnp.bfloat16)
        np.testing.assert_array_equal(
            np.asarray(ref.valid), np.asarray(got.valid))
        v = np.asarray(ref.valid)
        assert v.sum() > 50
        np.testing.assert_array_equal(
            np.asarray(ref.score)[v], np.asarray(got.score)[v])
        np.testing.assert_array_equal(
            np.asarray(ref.xy)[v], np.asarray(got.xy)[v])


class TestPallasMoments:
    def test_angles_match_integral_formulation(self):
        """moment_maps_pallas == orb.moment_maps_integral at the ANGLE level
        (raw moments differ by f32 summation-order noise only)."""
        from pose_estimation_tpu.ops import orb
        from pose_estimation_tpu.ops.pallas_fast import moment_maps_pallas

        rng = np.random.default_rng(3)
        h, w = 120, 160
        stack = jnp.asarray(rng.uniform(0, 255, (4, h, w)), jnp.float32)
        k = 300
        plane = jnp.asarray(rng.integers(0, 4, k), jnp.int32)
        xy = jnp.asarray(np.stack([
            rng.uniform(20, w - 20, k), rng.uniform(20, h - 20, k)], -1),
            jnp.float32)
        base = plane * (h * w)

        m10a, m01a = orb.moment_maps_integral(stack)
        m10b, m01b = moment_maps_pallas(stack, interpret=True)
        a1 = orb.ic_angle_integral(m10a.reshape(-1), m01a.reshape(-1), base, xy, h, w)
        a2 = orb.ic_angle_integral(m10b.reshape(-1), m01b.reshape(-1), base, xy, h, w)
        d = np.abs((np.asarray(a2 - a1) + np.pi) % (2 * np.pi) - np.pi)
        assert d.max() < 2e-3, d.max()

    def test_vmap_matches_flat(self):
        from pose_estimation_tpu.ops.pallas_fast import moment_maps_pallas
        import functools

        rng = np.random.default_rng(4)
        x = jnp.asarray(rng.uniform(0, 255, (2, 3, 96, 128)), jnp.float32)
        f = functools.partial(moment_maps_pallas, interpret=True)
        mv = jax.vmap(f)(x)
        mf = f(x.reshape(6, 96, 128))
        sl = np.s_[:, 16:-16, 16:-16]
        np.testing.assert_allclose(
            np.asarray(mv[0]).reshape(6, 96, 128)[sl], np.asarray(mf[0])[sl],
            atol=1e-2)


class TestPerLevelBudgets:
    def test_budgets_path_matches_flat_per_level(self):
        """ADVICE r4: the budgets= per-level top-k branch had no caller and
        no test. Semantics contract (select_keypoints_fused docstring): for
        a LEVEL-MAJOR stack, each level's planes carry that level's budget
        k_l of candidates, identical in value/order to the flat path's
        top-k_l for the same plane; slots past k_l are invalid."""
        from pose_estimation_tpu.ops import fast as fast_mod

        rng = np.random.default_rng(23)
        h, w = 96, 128
        b = 2          # images per level
        stack = jnp.asarray(rng.uniform(0, 255, (4, h, w)), jnp.float32)
        # level-major: [L0 img0, L0 img1, L1 img0, L1 img1]
        bounds = [(h, w)] * 2 + [(64, 96)] * 2
        budgets = [60, 25]
        th_hi, th_lo, kmax, kpc = 20.0, 7.0, 100, 4

        got = fast_mod.select_keypoints_fused(
            stack, bounds, th_hi, th_lo, kmax, border=19, k_per_cell=kpc,
            interpret=True, budgets=budgets)
        flat = fast_mod.select_keypoints_fused(
            stack, bounds, th_hi, th_lo, kmax, border=19, k_per_cell=kpc,
            interpret=True)
        # the budgets path trims the slot axis to max(budgets)
        assert got.score.shape == (4, max(budgets))
        for lvl in range(2):
            k_l = budgets[lvl]
            for i in range(b):
                p = lvl * b + i
                fs = np.asarray(flat.score[p])
                fx = np.asarray(flat.xy[p])
                gs = np.asarray(got.score[p])
                gx = np.asarray(got.xy[p])
                fv = np.asarray(flat.valid[p])
                # within the budget: identical candidates in order
                n_cand = min(k_l, int(fv.sum()))
                assert n_cand > 5, (lvl, i, n_cand)
                np.testing.assert_array_equal(gs[:n_cand], fs[:n_cand])
                np.testing.assert_array_equal(gx[:n_cand], fx[:n_cand])
                # past the budget: everything invalid
                assert not np.asarray(got.valid[p])[k_l:].any()
                assert not np.asarray(got.valid[p])[n_cand:k_l].any()
