"""Front-end device ops vs OpenCV / numpy oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from pose_estimation_tpu.ops import fast as fast_mod
from pose_estimation_tpu.ops import matching, orb, pnp, ransac, remap, triangulate
from pose_estimation_tpu.utils import lie


def sample_image():
    img = cv2.imread("/root/reference/benchmark/cvRectify/350_left.jpg", cv2.IMREAD_GRAYSCALE)
    assert img is not None
    return img


class TestRemap:
    def test_matches_cv2(self):
        img = sample_image().astype(np.float32)
        h, w = img.shape
        rng = np.random.default_rng(0)
        # a smooth warp
        ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
        mapx = xs + 5 * np.sin(ys / 37.0)
        mapy = ys + 3 * np.cos(xs / 53.0)
        ours = np.asarray(remap.remap_bilinear(jnp.asarray(img), jnp.asarray(np.stack([mapx, mapy], -1))))
        ref = cv2.remap(img, mapx, mapy, cv2.INTER_LINEAR, borderMode=cv2.BORDER_CONSTANT)
        # interior pixels must match to float tolerance (cv2 uses fixed-point
        # 5-bit interpolation weights -> ~1/32 quantization)
        np.testing.assert_allclose(ours[4:-4, 4:-4], ref[4:-4, 4:-4], atol=4.0)
        exact = np.abs(ours[4:-4, 4:-4] - ref[4:-4, 4:-4]) < 1.0
        assert exact.mean() > 0.95


class TestRectifyPoints:
    def test_matches_cv2_undistort_points(self):
        """Device sparse rectification == cv2.undistortPoints(R, P) on the
        EuRoC left camera (real distortion + rectifying rotation)."""
        from pose_estimation_tpu import load_config
        from pose_estimation_tpu.camera import CameraModel

        cfg = load_config("/root/reference/config/euroc.yml", dataset="euroc")
        cm = CameraModel.from_config(cfg)
        rng = np.random.default_rng(7)
        pts = np.stack([
            rng.uniform(20, cfg.image_width - 20, 200),
            rng.uniform(20, cfg.image_height - 20, 200),
        ], axis=1).astype(np.float32)

        k = np.asarray(cfg.k_left)
        ours = np.asarray(remap.rectify_points(
            jnp.asarray(pts),
            jnp.asarray([k[0, 0], k[1, 1], k[0, 2], k[1, 2]], jnp.float32),
            jnp.asarray(np.ravel(cfg.dist_left)[:5], jnp.float32),
            jnp.asarray(cm.R1, jnp.float32),
            jnp.asarray(cm.P1, jnp.float32),
        ))
        ref = cv2.undistortPoints(
            pts.reshape(-1, 1, 2), k, np.asarray(cfg.dist_left),
            R=cm.R1, P=cm.P1,
        ).reshape(-1, 2)
        np.testing.assert_allclose(ours, ref, atol=5e-2)


class TestIntegralMoments:
    def test_matches_patch_gather_on_fast_corners(self):
        """The prefix-sum moment maps must reproduce the patch-gather IC
        angles at real FAST corners (degenerate constant patches excluded —
        their angle is atan2(0,0), undefined either way)."""
        img = sample_image().astype(np.float32)
        h, w = img.shape
        score = fast_mod.fast_score(jnp.asarray(img))
        kps = fast_mod.select_keypoints(score, 20.0, 7.0, 400, border=31)
        xy = kps.xy[np.asarray(kps.valid)]
        st = jnp.asarray(img[None])
        base = jnp.zeros(xy.shape[0], jnp.int32)
        a_ref = orb.ic_angle_planes(st.reshape(-1), base, xy, h, w)
        m10, m01 = orb.moment_maps_integral(st)
        a_new = orb.ic_angle_integral(
            m10.reshape(-1), m01.reshape(-1), base, xy, h, w
        )
        d = np.abs((np.asarray(a_new - a_ref) + np.pi) % (2 * np.pi) - np.pi)
        # f32 prefix-sum cancellation bound: ~5e-3 rad worst-case = 0.06 px
        # sample displacement at BRIEF radius 13, far below the integer
        # rounding of the descriptor offsets
        assert d.max() < 5e-3, d.max()

    def test_sparse_matches_patch_gather(self):
        """ic_angle_sparse (keypoint-sparse P/Q gathers) must reproduce the
        patch-gather angles like the map formulation does — same windowed
        differences, different summation order."""
        img = sample_image().astype(np.float32)
        h, w = img.shape
        score = fast_mod.fast_score(jnp.asarray(img))
        kps = fast_mod.select_keypoints(score, 20.0, 7.0, 400, border=31)
        xy = kps.xy[np.asarray(kps.valid)]
        st = jnp.asarray(img[None])
        base = jnp.zeros(xy.shape[0], jnp.int32)
        a_ref = orb.ic_angle_planes(st.reshape(-1), base, xy, h, w)
        a_sp = orb.ic_angle_sparse(st, base, xy)
        d = np.abs((np.asarray(a_sp - a_ref) + np.pi) % (2 * np.pi) - np.pi)
        assert d.max() < 5e-3, d.max()

    def test_einsum_pyramid_matches_cv2_inter_linear(self):
        """The stacked-weight-matrix pyramid must equal cv::resize
        INTER_LINEAR per level (the reference's ComputePyramid resampling),
        with exact zeros in the canvas padding."""
        import cv2

        rng = np.random.default_rng(11)
        h, w = 96, 128
        cfg = orb.OrbConfig(n_features=200, n_levels=4)
        imgs = rng.uniform(0, 255, (2, h, w)).astype(np.float32)
        stack = np.asarray(orb.pyramid_stack(jnp.asarray(imgs), cfg))
        shapes = orb.pyramid_shapes(h, w, cfg)
        for l, (lh, lw) in enumerate(shapes[1:], start=1):
            lv = stack[2 * l : 2 * l + 2]
            for i in range(2):
                ref = cv2.resize(imgs[i], (lw, lh),
                                 interpolation=cv2.INTER_LINEAR)
                np.testing.assert_allclose(
                    lv[i, :lh, :lw], ref, atol=1e-3)
            assert np.abs(lv[:, lh:, :]).max() == 0.0
            assert np.abs(lv[:, :, lw:]).max() == 0.0

    def test_sparse_matches_integral_on_multiplane_stack(self):
        """Plane indexing: sparse gathers on a multi-plane stack must agree
        with the per-plane moment maps at every keypoint."""
        rng = np.random.default_rng(7)
        h, w = 96, 128
        st = jnp.asarray(rng.uniform(0, 255, (5, h, w)), jnp.float32)
        k = 400
        plane = rng.integers(0, 5, k)
        xy = np.stack(
            [rng.uniform(20, w - 20, k), rng.uniform(20, h - 20, k)], -1
        ).astype(np.float32)
        base = jnp.asarray(plane * (h * w), jnp.int32)
        m10, m01 = orb.moment_maps_integral(st)
        a_map = orb.ic_angle_integral(
            m10.reshape(-1), m01.reshape(-1), base, jnp.asarray(xy), h, w
        )
        a_sp = orb.ic_angle_sparse(st, base, jnp.asarray(xy))
        d = np.abs((np.asarray(a_sp - a_map) + np.pi) % (2 * np.pi) - np.pi)
        assert d.max() < 5e-3, d.max()


class TestHamming:
    def test_matches_numpy_popcount(self):
        rng = np.random.default_rng(1)
        bits_q = rng.integers(0, 2, size=(64, 256)).astype(bool)
        bits_t = rng.integers(0, 2, size=(96, 256)).astype(bool)
        dq = matching.pack_descriptors(jnp.asarray(bits_q))
        dt = matching.pack_descriptors(jnp.asarray(bits_t))
        ours = np.asarray(matching.hamming_table(dq, dt))
        ref = (bits_q[:, None, :] != bits_t[None, :, :]).sum(-1)
        np.testing.assert_array_equal(ours, ref)

    def test_match_gating(self):
        rng = np.random.default_rng(2)
        bits = rng.integers(0, 2, size=(20, 256)).astype(bool)
        # train = noisy copy of query (flip 10 bits) + decoys
        noisy = bits.copy()
        for i in range(20):
            flip = rng.choice(256, 10, replace=False)
            noisy[i, flip] = ~noisy[i, flip]
        decoys = rng.integers(0, 2, size=(30, 256)).astype(bool)
        train = np.concatenate([noisy, decoys])
        res = matching.match(
            matching.pack_descriptors(jnp.asarray(bits)),
            matching.pack_descriptors(jnp.asarray(train)),
            jnp.ones(20, bool), jnp.ones(50, bool),
            match_ratio=2.0, min_match_dist=30.0,
        )
        np.testing.assert_array_equal(np.asarray(res.index), np.arange(20))
        assert bool(np.all(np.asarray(res.valid)))
        np.testing.assert_array_equal(np.asarray(res.dist), 10.0)


class TestMxuRowOps:
    def test_select_rows_matches_gather(self):
        rng = np.random.default_rng(2)
        table = rng.integers(-1, 2, (37, 256)).astype(np.int8)
        idx = rng.integers(0, 37, 64).astype(np.int32)
        valid = rng.random(64) < 0.7
        got = np.asarray(matching.select_rows_mxu(
            jnp.asarray(table), jnp.asarray(idx), jnp.asarray(valid)))
        expect = table[idx] * valid[:, None]
        np.testing.assert_array_equal(got, expect)

    def test_scatter_rows_matches_set_and_drops_out_of_range(self):
        rng = np.random.default_rng(3)
        p, m = 29, 16
        dest = rng.integers(-1, 2, (p, 256)).astype(np.int8)
        vals = rng.integers(-1, 2, (m, 256)).astype(np.int8)
        # unique in-range targets + some dropped rows routed to index p
        tgt = np.concatenate([
            rng.permutation(p)[: m - 4], np.full(4, p)
        ]).astype(np.int32)
        got = np.asarray(matching.scatter_rows_mxu(
            jnp.asarray(dest), jnp.asarray(tgt), jnp.asarray(vals)))
        expect = dest.copy()
        for i, t in enumerate(tgt):
            if t < p:
                expect[t] = vals[i]
        np.testing.assert_array_equal(got, expect)


class TestCrossCheck:
    def test_one_to_one_assignment(self):
        """Two queries matched to the same train keep only the closer one."""
        rng = np.random.default_rng(7)
        t = rng.integers(0, 2, (4, 256)).astype(bool)
        q = np.stack([t[0], t[0], t[1], t[2]])
        # corrupt query 1 more than query 0 (both match train 0)
        q[1, :20] = ~q[1, :20]
        q[3, :5] = ~q[3, :5]
        res = matching.match(
            matching.pack_descriptors(jnp.asarray(q)),
            matching.pack_descriptors(jnp.asarray(t)),
            jnp.ones(4, bool), jnp.ones(4, bool), 100.0, 300.0,
        )
        keep = matching.cross_check(res, 4)
        np.testing.assert_array_equal(np.asarray(keep), [True, False, True, True])


class TestFast:
    def test_corners_superset_of_cv2(self):
        """Our per-pixel FAST decision (score > t) must agree with cv2.FAST
        (nonmax off) on the vast majority of pixels."""
        img = sample_image()
        t = 20
        det = cv2.FastFeatureDetector_create(threshold=t, nonmaxSuppression=False)
        kps = det.detect(img)
        ref = np.zeros(img.shape, bool)
        for k in kps:
            ref[int(round(k.pt[1])), int(round(k.pt[0]))] = True
        score = np.asarray(fast_mod.fast_score(jnp.asarray(img, jnp.float32)))
        ours = score > t
        # ignore 3px border (cv2 does not evaluate there)
        ours[:3] = ours[-3:] = False
        ours[:, :3] = ours[:, -3:] = False
        inter = (ours & ref).sum()
        union = (ours | ref).sum()
        assert inter / union > 0.95, (inter, union)

    def test_select_keypoints_shapes_and_spread(self):
        img = jnp.asarray(sample_image(), jnp.float32)
        score = fast_mod.fast_score(img)
        kps = fast_mod.select_keypoints(score, 20.0, 7.0, 200)
        assert kps.xy.shape == (200, 2)
        valid = np.asarray(kps.valid)
        assert valid.sum() > 100
        xy = np.asarray(kps.xy)[valid]
        # all inside detection border
        assert xy[:, 0].min() >= 19 and xy[:, 1].min() >= 19
        # spatially spread: stddev over both axes is a decent chunk of image
        assert xy[:, 0].std() > img.shape[1] * 0.15
        assert xy[:, 1].std() > img.shape[0] * 0.12

    def test_topk_bisect_matches_lax_topk(self):
        """topk_bisect == lax.top_k (values, payloads, tie order) on
        bf16-quantized scores with _NEG invalid slots — the production
        plane-level selection input (fused kernel emits bf16-rounded
        scores). Includes rows with heavy exact ties and rows with fewer
        than k candidates."""
        rng = np.random.default_rng(7)
        n, c, k = 12, 1600, 174
        scores = rng.uniform(7.0, 255.0, (n, c)).astype(np.float32)
        # bf16-quantize (what the fused kernel emits) -> massive tie mass
        scores = np.asarray(jnp.asarray(scores, jnp.bfloat16), np.float32)
        mask = rng.random((n, c)) < 0.12
        mask[-2] = False                      # empty plane
        mask[-1, : k // 2] = True             # under-filled plane
        mask[-1, k // 2 :] = False
        flat = np.where(mask, scores, -1e9).astype(np.float32)
        xs = rng.uniform(0, 752, (n, c)).astype(np.float32) * mask
        ys = rng.uniform(0, 480, (n, c)).astype(np.float32) * mask

        ref_v, ref_i = jax.lax.top_k(jnp.asarray(flat), k)
        ref_x = jnp.take_along_axis(jnp.asarray(xs), ref_i, axis=1)
        ref_y = jnp.take_along_axis(jnp.asarray(ys), ref_i, axis=1)
        got_v, (got_x, got_y) = fast_mod.topk_bisect(
            jnp.asarray(flat), (jnp.asarray(xs), jnp.asarray(ys)), k
        )
        np.testing.assert_array_equal(np.asarray(ref_v), np.asarray(got_v))
        valid = np.asarray(ref_v) > -1e9 / 2
        np.testing.assert_array_equal(
            np.asarray(ref_x)[valid], np.asarray(got_x)[valid]
        )
        np.testing.assert_array_equal(
            np.asarray(ref_y)[valid], np.asarray(got_y)[valid]
        )
        assert valid[-2].sum() == 0 and valid[-1].sum() == k // 2


class TestOrb:
    def test_ic_angle_matches_centroid(self):
        """Orientation of a synthetic gradient patch points along gradient."""
        h = w = 64
        ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
        img = xs  # intensity increases to the right -> centroid along +x
        ang = orb.ic_angle(jnp.asarray(img), jnp.asarray([[32.0, 32.0]]))
        assert abs(float(ang[0])) < 0.05

    def test_descriptor_rotation_invariance(self):
        """Descriptors of the same patch under image rotation stay close."""
        img = sample_image().astype(np.float32)
        center = (img.shape[1] / 2, img.shape[0] / 2)
        deg = 30
        m = cv2.getRotationMatrix2D(center, deg, 1.0)
        rot = cv2.warpAffine(img, m, (img.shape[1], img.shape[0]))

        # pick strong corners away from border in the original
        score = np.asarray(fast_mod.fast_score(jnp.asarray(img)))
        kps = fast_mod.select_keypoints(jnp.asarray(score), 30.0, 30.0, 40, border=120)
        xy = np.asarray(kps.xy)[np.asarray(kps.valid)]
        # map into rotated image
        xy_rot = (m[:, :2] @ xy.T).T + m[:, 2]

        blur1 = orb.gaussian_blur7(jnp.asarray(img))
        blur2 = orb.gaussian_blur7(jnp.asarray(rot))
        a1 = orb.ic_angle(blur1, jnp.asarray(xy))
        a2 = orb.ic_angle(blur2, jnp.asarray(xy_rot))
        d1 = orb.brief_descriptors(blur1, jnp.asarray(xy), a1)
        d2 = orb.brief_descriptors(blur2, jnp.asarray(xy_rot), a2)
        dist = np.asarray(matching.hamming_table(d1, d2))
        match_dist = np.diag(dist)
        rand_dist = dist[~np.eye(len(xy), dtype=bool)].mean()
        # matched pairs must be far below the random-pair baseline (~80-128;
        # BRIEF bits are correlated on natural images so it sits below 128)
        assert match_dist.mean() < 60, (match_dist.mean(), rand_dist)
        assert rand_dist > 2.5 * match_dist.mean()

    def test_extract_end_to_end(self):
        img = jnp.asarray(sample_image(), jnp.float32)
        cfg = orb.OrbConfig(n_features=500)
        feats = jax.jit(lambda x: orb.extract(x, cfg))(img)
        valid = np.asarray(feats.valid)
        assert valid.sum() > 250
        assert feats.desc.shape[1] == 256
        # level-0 coords stay in bounds
        xy = np.asarray(feats.xy)[valid]
        assert xy[:, 0].max() < img.shape[1] * 1.25
        assert (np.asarray(feats.level)[valid] > 0).any()


class TestTriangulate:
    def test_matches_cv2(self):
        rng = np.random.default_rng(3)
        p1 = np.hstack([np.eye(3) * 400, np.zeros((3, 1))])
        p1[2, 2] = 1.0
        p1[0, 2], p1[1, 2] = 370, 240
        p2 = p1.copy()
        p2[0, 3] = -400 * 0.11  # baseline
        X = np.stack([
            rng.uniform(-2, 2, 50), rng.uniform(-1, 1, 50), rng.uniform(3, 15, 50)
        ], axis=1)
        px1 = (p1 @ np.hstack([X, np.ones((50, 1))]).T).T
        px1 = px1[:, :2] / px1[:, 2:3]
        px2 = (p2 @ np.hstack([X, np.ones((50, 1))]).T).T
        px2 = px2[:, :2] / px2[:, 2:3]
        ours = np.asarray(triangulate.triangulate(
            jnp.asarray(p1), jnp.asarray(p2), jnp.asarray(px1), jnp.asarray(px2)))
        ref4 = cv2.triangulatePoints(p1, p2, px1.T, px2.T)
        ref = (ref4[:3] / ref4[3]).T
        np.testing.assert_allclose(ours, ref, atol=1e-6)
        np.testing.assert_allclose(ours, X, atol=1e-6)

    def test_rectified_closed_form(self):
        fx = fy = 400.0
        cx, cy = 370.0, 240.0
        b = 0.11
        rng = np.random.default_rng(4)
        X = np.stack([
            rng.uniform(-2, 2, 30), rng.uniform(-1, 1, 30), rng.uniform(2, 12, 30)
        ], axis=1)
        pxl = np.stack([fx * X[:, 0] / X[:, 2] + cx, fy * X[:, 1] / X[:, 2] + cy], 1)
        pxr = np.stack([fx * (X[:, 0] - b) / X[:, 2] + cx, fy * X[:, 1] / X[:, 2] + cy], 1)
        ours = np.asarray(triangulate.triangulate_rectified(
            fx, cx, cy, fy, b, jnp.asarray(pxl), jnp.asarray(pxr)))
        np.testing.assert_allclose(ours, X, rtol=1e-9)


class TestRansac:
    def test_null8_matches_eigh(self):
        """The Gauss-Jordan null vector (_null8) equals the smallest
        eigenvector of A^T A on generic 8-point samples: the 8x9 system has
        an exact 1-dim nullspace, so both must find the same direction."""
        rng = np.random.default_rng(11)
        # Hartley-normalized-scale correspondences, like production
        x1 = rng.normal(0, 1.0, (512, 8, 2))
        x2 = x1 + rng.normal(0, 0.2, (512, 8, 2))
        u1, v1 = x1[..., 0], x1[..., 1]
        u2, v2 = x2[..., 0], x2[..., 1]
        a = np.stack(
            [u2 * u1, u2 * v1, u2, v2 * u1, v2 * v1, v2, u1, v1,
             np.ones_like(u1)], axis=-1,
        ).astype(np.float64)
        x = np.asarray(ransac._null8(jnp.asarray(a)))
        # exact-nullspace residual
        resid = np.linalg.norm(np.einsum("bij,bj->bi", a, x), axis=1)
        scale = np.linalg.norm(a, axis=(1, 2))
        assert np.max(resid / scale) < 1e-9
        # direction matches the eigh null vector (up to sign)
        ata = np.einsum("bij,bik->bjk", a, a)
        _, vecs = np.linalg.eigh(ata)
        v0 = vecs[..., 0]
        dots = np.abs(np.sum(v0 * x, axis=1))
        assert np.min(dots) > 1 - 1e-8

    def test_rejects_outliers(self):
        rng = np.random.default_rng(5)
        n_in, n_out = 150, 50
        X = np.stack([
            rng.uniform(-3, 3, n_in), rng.uniform(-2, 2, n_in), rng.uniform(4, 20, n_in)
        ], axis=1)
        R = np.asarray(lie.so3_exp(jnp.asarray([0.02, -0.3, 0.01])))
        t = np.array([-0.3, 0.02, 0.05])
        fx, cx, cy = 400.0, 370.0, 240.0
        p1 = np.stack([fx * X[:, 0] / X[:, 2] + cx, fx * X[:, 1] / X[:, 2] + cy], 1)
        X2 = (R @ X.T).T + t
        p2 = np.stack([fx * X2[:, 0] / X2[:, 2] + cx, fx * X2[:, 1] / X2[:, 2] + cy], 1)
        # outliers: random correspondence
        o1 = np.stack([rng.uniform(0, 740, n_out), rng.uniform(0, 460, n_out)], 1)
        o2 = np.stack([rng.uniform(0, 740, n_out), rng.uniform(0, 460, n_out)], 1)
        pts1 = np.concatenate([p1, o1])
        pts2 = np.concatenate([p2, o2])
        res = ransac.fundamental_ransac(
            jnp.asarray(pts1), jnp.asarray(pts2),
            jnp.ones(n_in + n_out, bool), jax.random.PRNGKey(0))
        inl = np.asarray(res.inliers)
        assert inl[:n_in].mean() > 0.95          # keeps the true matches
        assert inl[n_in:].mean() < 0.1           # rejects the garbage


class TestPnP:
    def test_recovers_pose_with_outliers(self):
        rng = np.random.default_rng(6)
        n_in, n_out = 120, 40
        X = np.stack([
            rng.uniform(-3, 3, n_in), rng.uniform(-2, 2, n_in), rng.uniform(4, 15, n_in)
        ], axis=1)
        rvec_true = np.array([0.1, -0.25, 0.05])
        t_true = np.array([0.4, -0.1, 0.6])
        R = np.asarray(lie.so3_exp(jnp.asarray(rvec_true)))
        K = np.array([[400.0, 0, 370], [0, 400, 240], [0, 0, 1]])
        Xc = (R @ X.T).T + t_true
        px = (K @ Xc.T).T
        px = px[:, :2] / px[:, 2:3]
        ox = np.stack([rng.uniform(-3, 3, n_out), rng.uniform(-2, 2, n_out), rng.uniform(4, 15, n_out)], 1)
        opx = np.stack([rng.uniform(0, 740, n_out), rng.uniform(0, 460, n_out)], 1)
        obj = np.concatenate([X, ox])
        pxs = np.concatenate([px, opx])
        res = pnp.pnp_ransac(
            jnp.asarray(obj), jnp.asarray(pxs), jnp.ones(n_in + n_out, bool),
            jnp.asarray(K), jax.random.PRNGKey(1))
        np.testing.assert_allclose(np.asarray(res.rvec), rvec_true, atol=1e-4)
        np.testing.assert_allclose(np.asarray(res.tvec), t_true, atol=1e-3)
        assert int(res.n_inliers) >= n_in * 0.95

    @pytest.mark.parametrize("solver", ["epnp", "epnp_min"])
    def test_solver_switch_recovers_pose(self, solver):
        """The EPnP / 4-point minimal solver paths (reference `solvePnP`
        switch, `feature-tracker.cpp:513-531`) recover the same pose."""
        rng = np.random.default_rng(8)
        n_in, n_out = 120, 30
        X = np.stack([
            rng.uniform(-3, 3, n_in), rng.uniform(-2, 2, n_in),
            rng.uniform(4, 15, n_in)
        ], axis=1)
        rvec_true = np.array([0.08, -0.2, 0.12])
        t_true = np.array([0.3, -0.2, 0.5])
        R = np.asarray(lie.so3_exp(jnp.asarray(rvec_true)))
        K = np.array([[400.0, 0, 370], [0, 400, 240], [0, 0, 1]])
        Xc = (R @ X.T).T + t_true
        px = (K @ Xc.T).T
        px = px[:, :2] / px[:, 2:3]
        ox = np.stack([rng.uniform(-3, 3, n_out), rng.uniform(-2, 2, n_out),
                       rng.uniform(4, 15, n_out)], 1)
        opx = np.stack([rng.uniform(0, 740, n_out), rng.uniform(0, 460, n_out)], 1)
        obj = np.concatenate([X, ox])
        pxs = np.concatenate([px, opx])
        res = pnp.pnp_ransac(
            jnp.asarray(obj), jnp.asarray(pxs), jnp.ones(n_in + n_out, bool),
            jnp.asarray(K), jax.random.PRNGKey(2), solver=solver)
        np.testing.assert_allclose(np.asarray(res.rvec), rvec_true, atol=1e-4)
        np.testing.assert_allclose(np.asarray(res.tvec), t_true, atol=1e-3)
        assert int(res.n_inliers) >= n_in * 0.95


@pytest.mark.slow  # ~9 min of full-scale pyramid compiles; fast tier skips
class TestExtractBatch:
    def test_batch_matches_single(self):
        """extract_batch over a stereo pair == per-image extract, exactly
        (identical plane content; only the plane-stack layout differs)."""
        img = sample_image().astype(np.float32)
        img_l = jnp.asarray(img)
        img_r = jnp.asarray(np.roll(img, 7, axis=1))
        cfg = orb.OrbConfig(n_features=300)
        fl, fr = orb.extract_pair(img_l, img_r, cfg)
        sl = orb.extract(img_l, cfg)
        sr = orb.extract(img_r, cfg)
        for pair, single in ((fl, sl), (fr, sr)):
            np.testing.assert_array_equal(np.asarray(pair.valid), np.asarray(single.valid))
            np.testing.assert_array_equal(np.asarray(pair.level), np.asarray(single.level))
            v = np.asarray(pair.valid)
            np.testing.assert_allclose(
                np.asarray(pair.xy)[v], np.asarray(single.xy)[v], atol=1e-5)
            np.testing.assert_array_equal(
                np.asarray(pair.desc)[v], np.asarray(single.desc)[v])

    def test_levels_respect_budgets_and_bounds(self):
        img = jnp.asarray(sample_image(), jnp.float32)
        cfg = orb.OrbConfig(n_features=400)
        feats = orb.extract(img, cfg)
        budgets = orb.level_budgets(cfg)
        assert feats.xy.shape[0] == sum(budgets)
        lv = np.asarray(feats.level)
        valid = np.asarray(feats.valid)
        shapes = orb.pyramid_shapes(*img.shape, cfg)
        xy = np.asarray(feats.xy)
        for l, (lh, lw) in enumerate(shapes):
            sel = valid & (lv == l)
            if not sel.any():
                continue
            # level-local coords (xy is scaled back to level 0)
            loc = xy[sel] / cfg.scale**l
            assert loc[:, 0].min() >= orb.EDGE - 1
            assert loc[:, 1].min() >= orb.EDGE - 1
            assert loc[:, 0].max() <= lw - orb.EDGE + 1
            assert loc[:, 1].max() <= lh - orb.EDGE + 1
