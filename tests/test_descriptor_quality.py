"""Descriptor quality vs OpenCV ORB on the reference's shipped sample
images (SURVEY.md section 4 oracle; VERDICT round-1 item #6).

Apples-to-apples protocol: the SAME keypoints (our FAST + IC-angle
detection, level 0 only so cv2 sees the same patch scale) are described by
(a) our rotated-BRIEF pattern and (b) cv2.ORB.compute. Both descriptor sets
are matched with the SAME matcher rule (MXU Hamming + ratio gate) across a
real stereo pair and a temporal pair, and judged by epipolar-RANSAC inlier
counts. The learned pattern must be within 15% of cv2's descriptor on both
match count and inlier count.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from pose_estimation_tpu.ops import fast as fast_mod
from pose_estimation_tpu.ops import matching, orb

LEFT = "/root/reference/benchmark/cvRectify/350_left.jpg"
RIGHT = "/root/reference/benchmark/cvRectify/350_right.jpg"
NEXT = "/root/reference/benchmark/cvRectify/352_left.jpg"


def detect(img, k=300):
    score = fast_mod.fast_score(jnp.asarray(img, jnp.float32))
    kps = fast_mod.select_keypoints(score, 20.0, 7.0, k, border=31)
    v = np.asarray(kps.valid)
    return np.asarray(kps.xy)[v]


def ours_descriptors(img, xy):
    jimg = jnp.asarray(img, jnp.float32)
    blur = orb.gaussian_blur7(jimg)
    ang = orb.ic_angle(jimg, jnp.asarray(xy))
    return orb.brief_descriptors(blur, jnp.asarray(xy), ang), np.asarray(ang)


def cv2_descriptors(img, xy, ang):
    """cv2.ORB descriptors at OUR keypoints (size 31, our IC angle —
    cv2 angles are degrees, clockwise-positive in image coords like ours)."""
    kps = [
        cv2.KeyPoint(float(x), float(y), 31.0, float(np.degrees(a) % 360.0))
        for (x, y), a in zip(xy, ang)
    ]
    det = cv2.ORB_create()
    kps_out, desc = det.compute(img.astype(np.uint8), kps)
    # map back: compute() may drop keypoints near the border
    kept = np.array(
        [[k.pt[0], k.pt[1]] for k in kps_out], np.float32
    ).reshape(-1, 2)
    return kept, desc


def unpack_cv2(desc):
    """uint8[N,32] -> signed {-1,+1} int8 [N,256]."""
    bits = np.unpackbits(desc, axis=1, bitorder="little").astype(bool)
    return matching.pack_descriptors(jnp.asarray(bits))


def match_stats(desc_a, desc_b, xy_a, xy_b):
    """(n_matches, n_inliers) under our gating + fundamental RANSAC."""
    m = matching.match(
        desc_a, desc_b,
        jnp.ones(desc_a.shape[0], bool), jnp.ones(desc_b.shape[0], bool),
        match_ratio=5.0, min_match_dist=30.0,
    )
    keep = np.asarray(m.valid)
    idx = np.asarray(m.index)
    n_match = int(keep.sum())
    if n_match < 8:
        return n_match, 0
    p1 = xy_a[keep]
    p2 = xy_b[idx[keep]]
    _, inl = cv2.findFundamentalMat(p1, p2, cv2.FM_RANSAC, 2.0, 0.99)
    n_inl = int(inl.sum()) if inl is not None else 0
    return n_match, n_inl


def run_pair(img_a, img_b):
    xy_a = detect(img_a)
    xy_b = detect(img_b)
    ours_a, ang_a = ours_descriptors(img_a, xy_a)
    ours_b, ang_b = ours_descriptors(img_b, xy_b)
    stats_ours = match_stats(ours_a, ours_b, xy_a, xy_b)

    kept_a, cvd_a = cv2_descriptors(img_a, xy_a, ang_a)
    kept_b, cvd_b = cv2_descriptors(img_b, xy_b, ang_b)
    stats_cv = match_stats(unpack_cv2(cvd_a), unpack_cv2(cvd_b), kept_a, kept_b)
    return stats_ours, stats_cv


class TestDescriptorQuality:
    @pytest.mark.parametrize("pair", [(LEFT, RIGHT), (LEFT, NEXT)])
    def test_within_15pct_of_cv2_orb(self, pair):
        img_a = cv2.imread(pair[0], cv2.IMREAD_GRAYSCALE)
        img_b = cv2.imread(pair[1], cv2.IMREAD_GRAYSCALE)
        assert img_a is not None and img_b is not None
        (m_ours, i_ours), (m_cv, i_cv) = run_pair(img_a, img_b)
        print(f"\n[desc-quality] ours: {m_ours} matches / {i_ours} inliers; "
              f"cv2.ORB: {m_cv} matches / {i_cv} inliers")
        assert m_ours >= 30, "too few matches to be meaningful"
        assert i_ours >= 0.85 * i_cv, (
            f"our descriptor underperforms cv2.ORB by >15%: "
            f"{i_ours} vs {i_cv} inliers"
        )
