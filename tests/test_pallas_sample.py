"""Fused per-keypoint sampling kernel (pallas_sample) vs the XLA path.

Interpret mode on CPU; the kernel runs compiled on TPU behind
`OrbConfig.sample_backend`.
"""

import jax
import jax.numpy as jnp
import numpy as np

from pose_estimation_tpu.ops import matching, orb
from pose_estimation_tpu.ops.brief_pattern import POOL_POINTS
from pose_estimation_tpu.ops.pallas_sample import sample_patches_pallas


def _mk_stack(n, h, w, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.uniform(0, 255, (n, h, w)).astype(np.float32)
    # smooth a little so moments/angles are stable
    base = (base + np.roll(base, 1, 1) + np.roll(base, 1, 2)) / 3.0
    return jnp.asarray(base), rng


class TestSampleKernel:
    def test_matches_xla_components(self):
        n, h, w = 4, 96, 128
        stack, rng = _mk_stack(n, h, w)
        t = 8
        k = 64
        plane = np.repeat(np.arange(n), k // n).astype(np.int32)
        xy = np.stack(
            [rng.uniform(20, w - 21, k), rng.uniform(20, h - 21, k)], -1
        ).astype(np.float32)

        vals, m10, m01 = sample_patches_pallas(
            stack, jnp.asarray(plane), jnp.asarray(xy),
            POOL_POINTS.astype(np.float32), t_chunk=t, interpret=True,
        )
        # angle oracle: direct patch-gather IC angle
        base = jnp.asarray(plane) * (h * w)
        ang_o = orb.ic_angle_planes(
            stack.reshape(-1), base, jnp.asarray(xy), h, w
        )
        ang_k = np.arctan2(np.asarray(m01), np.asarray(m10))
        d = np.angle(np.exp(1j * (ang_k - np.asarray(ang_o))))
        assert np.abs(d).max() < 5e-3

        # value oracle: blurred image sampled at the kernel's own rotation
        # (isolates the sampling machinery from angle rounding noise)
        blur = np.asarray(orb.gaussian_blur7(stack))
        r = np.sqrt(np.asarray(m10) ** 2 + np.asarray(m01) ** 2)
        ca = (np.asarray(m10) / np.maximum(r, 1e-12))[:, None]
        sa = (np.asarray(m01) / np.maximum(r, 1e-12))[:, None]
        px = POOL_POINTS[None, :, 0].astype(np.float32)
        py = POOL_POINTS[None, :, 1].astype(np.float32)
        col = np.round(px * ca - py * sa).astype(np.int32)
        row = np.round(px * sa + py * ca).astype(np.int32)
        cx = np.round(xy[:, 0]).astype(np.int32)[:, None]
        cy = np.round(xy[:, 1]).astype(np.int32)[:, None]
        vo = blur[
            plane[:, None],
            np.clip(cy + row, 0, h - 1),
            np.clip(cx + col, 0, w - 1),
        ]
        np.testing.assert_allclose(np.asarray(vals), vo, atol=1e-3)

    def test_border_keypoints_match_canvas_blur(self):
        """Keypoints ON the 19px detection margin: the patch runs 2px past
        the canvas; the reflect-101 pad must reproduce gaussian_blur7's
        border values."""
        n, h, w = 2, 80, 96
        stack, rng = _mk_stack(n, h, w, seed=3)
        t = 4
        pts = [(19.0, 19.0), (w - 20.0, h - 20.0), (19.0, h - 20.0),
               (w - 20.0, 19.0)]
        xy = np.asarray(pts * 2, np.float32)
        plane = np.repeat(np.arange(2), 4).astype(np.int32)
        vals, m10, m01 = sample_patches_pallas(
            stack, jnp.asarray(plane), jnp.asarray(xy),
            POOL_POINTS.astype(np.float32), t_chunk=t, interpret=True,
        )
        blur = np.asarray(orb.gaussian_blur7(stack))
        r = np.sqrt(np.asarray(m10) ** 2 + np.asarray(m01) ** 2)
        ca = (np.asarray(m10) / np.maximum(r, 1e-12))[:, None]
        sa = (np.asarray(m01) / np.maximum(r, 1e-12))[:, None]
        px = POOL_POINTS[None, :, 0].astype(np.float32)
        py = POOL_POINTS[None, :, 1].astype(np.float32)
        col = np.round(px * ca - py * sa).astype(np.int32)
        row = np.round(px * sa + py * ca).astype(np.int32)
        cx = np.round(xy[:, 0]).astype(np.int32)[:, None]
        cy = np.round(xy[:, 1]).astype(np.int32)[:, None]
        vo = blur[
            plane[:, None],
            np.clip(cy + row, 0, h - 1),
            np.clip(cx + col, 0, w - 1),
        ]
        np.testing.assert_allclose(np.asarray(vals), vo, atol=1e-3)

    def test_extract_batch_end_to_end_parity(self):
        """extract_batch(sample_backend=pallas_interpret) == the XLA path:
        same keypoints, angles within rounding noise, and (away from
        rounding ties) identical descriptor bits."""
        rng = np.random.default_rng(7)
        h, w = 120, 160
        imgs = jnp.asarray(rng.uniform(0, 255, (2, h, w)), jnp.float32)
        # pin f32 on BOTH sides: this test isolates the KERNEL vs the XLA
        # path (the XLA branch currently ignores sample_dtype, but the pin
        # keeps the comparison explicit if it ever honors it); the bf16
        # canvas default is covered by test_bf16_canvas_parity
        cfg_x = orb.OrbConfig(
            n_features=64, n_levels=3, sample_backend="xla",
            sample_dtype="f32",
        )
        cfg_p = cfg_x._replace(sample_backend="pallas_interpret")
        fx = orb.extract_batch(imgs, cfg_x)
        fp = orb.extract_batch(imgs, cfg_p)
        np.testing.assert_array_equal(np.asarray(fx.valid), np.asarray(fp.valid))
        np.testing.assert_allclose(
            np.asarray(fx.xy), np.asarray(fp.xy), atol=1e-5
        )
        v = np.asarray(fx.valid)
        da = np.angle(np.exp(1j * (np.asarray(fx.angle) - np.asarray(fp.angle))))
        assert np.abs(da[v]).max() < 5e-3
        bits_x = np.asarray(fx.desc)[v]
        bits_p = np.asarray(fp.desc)[v]
        mismatch = (bits_x != bits_p).mean()
        # angle-rounding ties may flip a handful of sample positions;
        # anything beyond a fraction of a percent means a real bug
        assert mismatch < 5e-3, mismatch

    def test_bf16_canvas_parity(self):
        """sample_dtype='bf16' (halved canvas HBM + loads): same keypoints,
        angles within IC-moment bf16 noise, descriptor bits equal away
        from rounding ties, sampled values within 1 intensity unit."""
        rng = np.random.default_rng(11)
        h, w = 120, 160
        imgs = jnp.asarray(rng.uniform(0, 255, (2, h, w)), jnp.float32)
        cfg_f = orb.OrbConfig(
            n_features=64, n_levels=3, sample_backend="pallas_interpret",
            sample_dtype="f32",
        )
        cfg_b = cfg_f._replace(sample_dtype="bf16")
        ff = orb.extract_batch(imgs, cfg_f)
        fb = orb.extract_batch(imgs, cfg_b)
        # detection path untouched by sample_dtype
        np.testing.assert_array_equal(
            np.asarray(ff.valid), np.asarray(fb.valid)
        )
        np.testing.assert_allclose(
            np.asarray(ff.xy), np.asarray(fb.xy), atol=1e-6
        )
        v = np.asarray(ff.valid)
        da = np.angle(
            np.exp(1j * (np.asarray(ff.angle) - np.asarray(fb.angle)))
        )
        # weak-gradient patches have small |(m10, m01)|, so per-pixel bf16
        # rounding can tilt the IC angle by up to a few centirad (measured
        # 0.025 worst on this fixture). BRIEF is robust far beyond that
        # (classic ORB quantizes angles to 12-degree bins); the binding
        # accuracy gates are the descriptor-quality and e2e-bias tests +
        # the on-chip artifact.
        assert np.abs(da[v]).max() < 0.05
        bits_f = np.asarray(ff.desc)[v]
        bits_b = np.asarray(fb.desc)[v]
        mismatch = (bits_f != bits_b).mean()
        assert mismatch < 3e-2, mismatch

        # direct value check on the raw sampler
        n = 2
        stack, rng2 = _mk_stack(n, 96, 128, seed=5)
        k = 32
        plane = np.repeat(np.arange(n), k // n).astype(np.int32)
        xy = np.stack(
            [rng2.uniform(22, 128 - 22, k), rng2.uniform(22, 96 - 22, k)],
            -1,
        ).astype(np.float32)
        vals, m10, m01 = sample_patches_pallas(
            stack, jnp.asarray(plane), jnp.asarray(xy),
            POOL_POINTS.astype(np.float32), t_chunk=8, interpret=True,
            canvas_dtype=jnp.bfloat16,
        )
        # value oracle AT THE KERNEL'S OWN ROTATION (bf16 moments shift the
        # rounded sample positions, so a fixed-position diff vs the f32 run
        # sees full pixel contrast; the machinery check must share the
        # rotation — same structure as test_matches_xla_components). The
        # remaining delta is bf16 pixel rounding through the blur: <= 0.5.
        h2, w2 = 96, 128
        blur = np.asarray(orb.gaussian_blur7(stack))
        r = np.sqrt(np.asarray(m10) ** 2 + np.asarray(m01) ** 2)
        ca = (np.asarray(m10) / np.maximum(r, 1e-12))[:, None]
        sa = (np.asarray(m01) / np.maximum(r, 1e-12))[:, None]
        px = POOL_POINTS[None, :, 0].astype(np.float32)
        py = POOL_POINTS[None, :, 1].astype(np.float32)
        col = np.round(px * ca - py * sa).astype(np.int32)
        row = np.round(px * sa + py * ca).astype(np.int32)
        cx = np.round(xy[:, 0]).astype(np.int32)[:, None]
        cy = np.round(xy[:, 1]).astype(np.int32)[:, None]
        vo = blur[
            plane[:, None],
            np.clip(cy + row, 0, h2 - 1),
            np.clip(cx + col, 0, w2 - 1),
        ]
        np.testing.assert_allclose(np.asarray(vals), vo, atol=1.0)

    def test_canvas_spans_cover_content(self):
        """Regression: for widths where (wp - PHASE - PS) % 128 > 85 the
        shifted-copy span used to come out SMALLER than its content and
        jnp.pad raised 'index can't contain negative values' (hit by the
        simulator's non-EuRoC frame size). Both phase copies must cover
        both their content and their largest aligned load window."""
        n, h, w = 2, 96, 200          # wp=204 -> old ws < content width
        stack, rng = _mk_stack(n, h, w, seed=5)
        k = 16
        plane = np.repeat(np.arange(n), k // n).astype(np.int32)
        xy = np.stack(
            [rng.uniform(20, w - 21, k), rng.uniform(20, h - 21, k)], -1
        ).astype(np.float32)
        vals, m10, m01 = sample_patches_pallas(
            stack, jnp.asarray(plane), jnp.asarray(xy),
            POOL_POINTS.astype(np.float32), t_chunk=8, interpret=True,
        )
        # values must equal the blurred-image oracle at the kernel's own
        # rotation (same oracle as test_matches_xla_components)
        blur = np.asarray(orb.gaussian_blur7(stack))
        r = np.sqrt(np.asarray(m10) ** 2 + np.asarray(m01) ** 2)
        ca = (np.asarray(m10) / np.maximum(r, 1e-12))[:, None]
        sa = (np.asarray(m01) / np.maximum(r, 1e-12))[:, None]
        px = POOL_POINTS[None, :, 0].astype(np.float32)
        py = POOL_POINTS[None, :, 1].astype(np.float32)
        col = np.round(px * ca - py * sa).astype(np.int32)
        row = np.round(px * sa + py * ca).astype(np.int32)
        cx = np.round(xy[:, 0]).astype(np.int32)[:, None]
        cy = np.round(xy[:, 1]).astype(np.int32)[:, None]
        vo = blur[
            plane[:, None],
            np.clip(cy + row, 0, h - 1),
            np.clip(cx + col, 0, w - 1),
        ]
        np.testing.assert_allclose(np.asarray(vals), vo, atol=1e-3)

    def test_vmap_flatten_rule(self):
        """vmapped sampler == per-batch loop (custom_vmap flattens into the
        plane axis)."""
        from pose_estimation_tpu.ops.pallas_sample import (
            make_batchable_sampler,
        )

        n, h, w = 2, 64, 96
        bsz = 3
        rng = np.random.default_rng(11)
        stacks = jnp.asarray(
            rng.uniform(0, 255, (bsz, n, h, w)), jnp.float32
        )
        k = 16
        plane = jnp.asarray(
            np.repeat(np.arange(n), k // n).astype(np.int32)
        )
        xys = jnp.asarray(
            np.stack(
                [rng.uniform(20, w - 21, (bsz, k)),
                 rng.uniform(20, h - 21, (bsz, k))], -1
            ), jnp.float32
        )
        sampler = make_batchable_sampler(
            POOL_POINTS.astype(np.float32), t_chunk=8, interpret=True
        )
        vb, m10b, m01b = jax.vmap(sampler, in_axes=(0, None, 0))(
            stacks, plane, xys
        )
        for i in range(bsz):
            v, a, b = sampler(stacks[i], plane, xys[i])
            np.testing.assert_allclose(np.asarray(vb[i]), np.asarray(v), atol=1e-5)
            np.testing.assert_allclose(np.asarray(m10b[i]), np.asarray(a), rtol=1e-6)
