"""Oriented binary descriptors over an image pyramid ("ORB" front-end).

TPU-native re-design of the description half of the vendored ORB-SLAM2
extractor (`/root/reference/src/ORBextractor.cc`):

* 8-level x1.2 pyramid (`ComputePyramid` :1107-1132) -> ONE pair of batched
  einsums against stacked static bilinear weight matrices (cv::resize
  INTER_LINEAR semantics, all levels at once; see `_pyramid_mats`);
* intensity-centroid orientation (`IC_Angle` :77-104) -> batched 31x31 patch
  gather contracted with precomputed circular moment masks (one matmul);
* 7x7 sigma=2 Gaussian blur (:1086) -> separable depthwise convolution;
* rotated 256-pair binary test (`computeOrbDescriptor` :108-147) -> batched
  rotate + gather + compare.

The sampling-pair pattern is NOT the learned ORB table (that is data married
to OpenCV); we use a fixed seeded Gaussian BRIEF pattern (sigma = patch/5,
the BRIEF-paper choice ORB builds on). Descriptors are therefore not
bit-compatible with OpenCV — matching happens entirely inside this framework
and the oracle is downstream matching quality / trajectory parity, per
SURVEY.md section 4.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from pose_estimation_tpu.ops import fast as fast_mod
from pose_estimation_tpu.ops import matching

PATCH_R = 15          # orientation patch radius (31x31), ORBextractor.cc HALF_PATCH_SIZE
EDGE = 19             # detection margin, ORB-SLAM2 EDGE_THRESHOLD
N_PAIRS = 256


def _make_pattern(seed: int = 12345, radius: int = 13) -> np.ndarray:
    """[256, 2, 2] int32 (pair, point, (x, y)) Gaussian BRIEF pattern (the
    pre-learning fallback; the shipped pattern is pool-constrained +
    greedily decorrelated, see brief_pattern.py)."""
    rng = np.random.default_rng(seed)
    sigma = 31 / 5.0
    pts = rng.normal(0.0, sigma, size=(N_PAIRS, 2, 2))
    return np.clip(np.round(pts), -radius, radius).astype(np.int32)


from pose_estimation_tpu.ops.brief_pattern import (  # noqa: E402
    POOL_PAIRS,
    POOL_POINTS,
)
from pose_estimation_tpu.utils.precision import full_precision  # noqa: E402

# all paths share the same 256 tests; PATTERN is their endpoint form
PATTERN = POOL_POINTS[POOL_PAIRS].astype(np.int32)

# difference matrix for the pool formulation: bit i = I[pool[a_i]] < I[pool
# [b_i]]  <=>  (vals @ DIFF)[i] > 0 with DIFF[b_i, i] = +1, DIFF[a_i, i] = -1
_DIFF = np.zeros((len(POOL_POINTS), N_PAIRS), np.float32)
_DIFF[POOL_PAIRS[:, 1], np.arange(N_PAIRS)] = 1.0
_DIFF[POOL_PAIRS[:, 0], np.arange(N_PAIRS)] = -1.0


def _moment_masks(dtype=jnp.float32):
    """x / y circular moment masks for IC angle, [31*31] each."""
    ys, xs = np.mgrid[-PATCH_R : PATCH_R + 1, -PATCH_R : PATCH_R + 1]
    circ = (xs * xs + ys * ys) <= PATCH_R * PATCH_R
    mx = (xs * circ).astype(np.float32).reshape(-1)
    my = (ys * circ).astype(np.float32).reshape(-1)
    return jnp.asarray(mx, dtype), jnp.asarray(my, dtype)


def gather_patches(img: jnp.ndarray, xy: jnp.ndarray, r: int) -> jnp.ndarray:
    """Gather (2r+1)^2 patches at integer keypoint centers.

    img [H,W], xy [N,2] float -> [N, (2r+1)^2] with edge clamping.
    """
    h, w = img.shape
    cx = jnp.round(xy[:, 0]).astype(jnp.int32)
    cy = jnp.round(xy[:, 1]).astype(jnp.int32)
    d = jnp.arange(-r, r + 1)
    yy = jnp.clip(cy[:, None] + d[None, :], 0, h - 1)       # [N, P]
    xx = jnp.clip(cx[:, None] + d[None, :], 0, w - 1)       # [N, P]
    idx = (yy[:, :, None] * w + xx[:, None, :]).reshape(xy.shape[0], -1)
    return jnp.take(img.reshape(-1), idx, axis=0)


def ic_angle(img: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """Intensity-centroid orientation per keypoint (radians).

    Gather-based: per-keypoint 31x31 patch gather contracted with the
    circular moment masks. See `ic_angle_conv` for the MXU formulation.
    """
    patches = gather_patches(img, xy, PATCH_R)               # [N, 961]
    mx, my = _moment_masks(patches.dtype)
    m10 = patches @ mx
    m01 = patches @ my
    return jnp.arctan2(m01, m10)


def moment_maps(img: jnp.ndarray) -> jnp.ndarray:
    """Whole-image circular moments (m10, m01) via one 2-channel 31x31
    convolution — MXU work instead of scattered gathers. [H,W] -> [2,H,W]."""
    mx, my = _moment_masks(img.dtype)
    kern = jnp.stack(
        [mx.reshape(31, 31), my.reshape(31, 31)], axis=0
    )[:, None]                                               # [2,1,31,31]
    out = jax.lax.conv_general_dilated(
        img[None, None],                                     # [1,1,H,W]
        kern,
        window_strides=(1, 1),
        padding="SAME",
    )
    return out[0]                                            # [2,H,W]


def ic_angle_from_moments(moments: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """Sample precomputed moment maps at (rounded) keypoint positions."""
    h, w = moments.shape[1:]
    cx = jnp.clip(jnp.round(xy[:, 0]).astype(jnp.int32), 0, w - 1)
    cy = jnp.clip(jnp.round(xy[:, 1]).astype(jnp.int32), 0, h - 1)
    idx = cy * w + cx
    m10 = jnp.take(moments[0].reshape(-1), idx, axis=0)
    m01 = jnp.take(moments[1].reshape(-1), idx, axis=0)
    return jnp.arctan2(m01, m10)


def gaussian_blur7(img: jnp.ndarray, sigma: float = 2.0) -> jnp.ndarray:
    """Separable 7x7 Gaussian with reflect-101 borders (cv::GaussianBlur).

    Operates on the last two axes; leading batch dims pass through."""
    k = np.exp(-np.arange(-3, 4) ** 2 / (2 * sigma * sigma))
    k = (k / k.sum()).astype(np.float32)
    kern = jnp.asarray(k, img.dtype)

    def conv1d(x, axis):
        x = jnp.moveaxis(x, axis, -1)
        pad = jnp.concatenate([x[..., 3:0:-1], x, x[..., -2:-5:-1]], axis=-1)
        out = sum(pad[..., i : i + x.shape[-1]] * kern[i] for i in range(7))
        return jnp.moveaxis(out, -1, axis)

    return conv1d(conv1d(img, -2), -1)


def brief_descriptors(
    img_blur: jnp.ndarray, xy: jnp.ndarray, angle: jnp.ndarray
) -> jnp.ndarray:
    """Rotated binary tests -> {-1,+1} int8 [N, 256].

    Rotation convention matches computeOrbDescriptor (:117-120):
      col' = round(x cos - y sin), row' = round(x sin + y cos).
    """
    h, w = img_blur.shape
    n = xy.shape[0]
    pat = jnp.asarray(PATTERN, jnp.float32)                  # [256, 2, 2]
    ca, sa = jnp.cos(angle), jnp.sin(angle)                  # [N]
    px = pat[None, :, :, 0]                                  # [1, 256, 2]
    py = pat[None, :, :, 1]
    col = jnp.round(px * ca[:, None, None] - py * sa[:, None, None])
    row = jnp.round(px * sa[:, None, None] + py * ca[:, None, None])
    cx = jnp.round(xy[:, 0]).astype(jnp.int32)[:, None, None]
    cy = jnp.round(xy[:, 1]).astype(jnp.int32)[:, None, None]
    xx = jnp.clip(cx + col.astype(jnp.int32), 0, w - 1)      # [N, 256, 2]
    yy = jnp.clip(cy + row.astype(jnp.int32), 0, h - 1)
    vals = jnp.take(img_blur.reshape(-1), (yy * w + xx).reshape(n, -1), axis=0)
    vals = vals.reshape(n, N_PAIRS, 2)
    bits = vals[:, :, 0] < vals[:, :, 1]
    return matching.pack_descriptors(bits)


class OrbConfig(NamedTuple):
    n_features: int = 800
    n_levels: int = 8
    scale: float = 1.2
    th_hi: float = 20.0
    th_lo: float = 7.0
    cell: int = 16
    k_per_cell: int = 4
    # "xla" = roll/min-tree formulation; "pallas" = fused score+NMS kernel
    # (ops/pallas_fast.py), one HBM read + one write per pixel
    fast_backend: str = "xla"
    # IC-angle moments: "sparse" = keypoint-sparse gathers on the P/Q
    # prefix images (2 cumsum passes + [K,124] gathered elements, see
    # ic_angle_sparse); "integral" = full moment MAPS via prefix sums +
    # shifted adds (~35 stack-sized HBM passes, ~14 ms measured);
    # "pallas" = experimental in-VMEM band kernel
    # (pallas_fast.moment_maps_pallas) — numerically equal but
    # per-program-overhead-bound on v5e (measured 371 ms), kept opt-in
    moments_backend: str = "sparse"
    # descriptor sampling: "xla" = moments_backend IC angle + full-stack
    # blur + pool-gather BRIEF; "pallas"/"pallas_interpret" = the fused
    # per-keypoint patch kernel (ops/pallas_sample.py) replacing all three
    sample_backend: str = "xla"
    # compute dtype of the fused select kernel's score chain ("bf16" or
    # "f32"). bf16 halves the vreg footprint but quantizes FAST scores
    # (spacing 1.0 at score ~128), perturbing the in-kernel subpixel fit
    # and near-tie selection — measured on chip to degrade the noisy-sim
    # e2e from ATE 2.2%/|ba| 0.52 (f32) to 6.3%/2.32 (bf16, seed 2), so
    # accuracy owns the default.
    select_dtype: str = "f32"
    # HBM dtype of the fused sampler's patch canvas ("f32" or "bf16").
    # bf16 halves the canvas footprint / per-keypoint window loads
    # (+~21 f/s at B=128), pixels upcast to f32 in-kernel. QUALIFIED
    # NEGATIVE and removed from the production config in round 5: the
    # full CHIP_ACCURACY protocol (3 famA seeds + 2 famB 12-s) failed on
    # seed 2 (ATE 4.43 % > 4.0 gate, |ba| 1.63 —
    # CHIP_ACCURACY_BF16_r05.json), consistent with the round-4 bisect
    # (doubled a cliff seed's ATE: the ~1e-3 rad IC-angle noise perturbs
    # matching on marginal basins). The kernel capability stays under
    # interpret-mode test (test_pallas_sample) for future hardware where
    # the accuracy/bandwidth trade-off may differ.
    sample_dtype: str = "f32"


class OrbFeatures(NamedTuple):
    xy: jnp.ndarray       # [K, 2] level-0 pixel coords
    angle: jnp.ndarray    # [K] radians
    score: jnp.ndarray    # [K]
    level: jnp.ndarray    # [K] int32
    desc: jnp.ndarray     # [K, 256] int8 in {-1, +1}
    valid: jnp.ndarray    # [K] bool


def level_budgets(cfg: OrbConfig) -> list[int]:
    """Per-level feature budgets, geometric decay like ORBextractor's ctor
    (`ORBextractor.cc:443-457`)."""
    inv = 1.0 / cfg.scale
    raw = [inv**l for l in range(cfg.n_levels)]
    s = sum(raw)
    budgets = [max(8, int(round(cfg.n_features * r / s))) for r in raw]
    return budgets


def ic_angle_planes(
    stack_flat: jnp.ndarray, base: jnp.ndarray, xy: jnp.ndarray,
    h: int, w: int,
) -> jnp.ndarray:
    """Plane-indexed intensity-centroid orientation.

    stack_flat [N*H*W] flattened plane stack, base [K] per-keypoint flat
    offset (plane_id * H * W), xy [K, 2] plane-local coords -> [K] radians.
    Keypoint-sparse: one gather + one moment matmul, no whole-image moment
    maps and no per-plane padding waste."""
    cx = jnp.round(xy[..., 0]).astype(jnp.int32)                 # [K]
    cy = jnp.round(xy[..., 1]).astype(jnp.int32)
    d = jnp.arange(-PATCH_R, PATCH_R + 1)
    yy = jnp.clip(cy[:, None] + d, 0, h - 1)                     # [K,P]
    xx = jnp.clip(cx[:, None] + d, 0, w - 1)
    idx = base[:, None, None] + yy[:, :, None] * w + xx[:, None, :]
    patches = jnp.take(stack_flat, idx.reshape(xy.shape[0], -1), axis=0)
    mx, my = _moment_masks(patches.dtype)
    mom = patches @ jnp.stack([mx, my], axis=1)                  # [K,2]
    return jnp.arctan2(mom[..., 1], mom[..., 0])


def brief_descriptors_planes(
    blur_flat: jnp.ndarray, base: jnp.ndarray, xy: jnp.ndarray,
    angle: jnp.ndarray, h: int, w: int,
) -> jnp.ndarray:
    """Plane-indexed rotated binary tests -> {-1,+1} int8 [K, 256].

    The two test points are processed as SEPARATE [K, 256] tensors end to
    end: any [K, 256, 2] intermediate puts 2 in the lane dimension, which
    TPU (8,128) tiling pads to 128 — a 64x HBM blowup that OOMs at batch
    scale (and costs layout conversions even at batch 1)."""
    ca, sa = jnp.cos(angle)[:, None], jnp.sin(angle)[:, None]    # [K,1]
    cx = jnp.round(xy[:, 0]).astype(jnp.int32)[:, None]
    cy = jnp.round(xy[:, 1]).astype(jnp.int32)[:, None]

    def sample(point):
        px = jnp.asarray(PATTERN[None, :, point, 0], jnp.float32)  # [1,256]
        py = jnp.asarray(PATTERN[None, :, point, 1], jnp.float32)
        col = jnp.round(px * ca - py * sa).astype(jnp.int32)
        row = jnp.round(px * sa + py * ca).astype(jnp.int32)
        xx = jnp.clip(cx + col, 0, w - 1)                        # [K,256]
        yy = jnp.clip(cy + row, 0, h - 1)
        return jnp.take(blur_flat, base[:, None] + yy * w + xx, axis=0)

    return matching.pack_descriptors(sample(0) < sample(1))


def brief_descriptors_pool(
    blur_flat: jnp.ndarray, base: jnp.ndarray, xy: jnp.ndarray,
    angle: jnp.ndarray, h: int, w: int,
) -> jnp.ndarray:
    """Pool-constrained rotated BRIEF -> {-1,+1} int8 [K, 256].

    All 256 tests draw from the SAME 128 sample points (the learned
    pool-constrained pattern, brief_pattern.py), so the per-keypoint image
    gather is [K, 128] — 4x fewer scattered elements than free endpoints
    (gathers cost ~6 ms/M here) — and the pair comparisons become ONE
    [K,128] @ [128,256] difference-matrix matmul on the MXU: bit i is
    (vals @ DIFF)[i] > 0, exact (two-term dot, f32). Bits are identical to
    `brief_descriptors*` with the same pattern (same per-point rotation +
    rounding)."""
    ca, sa = jnp.cos(angle)[:, None], jnp.sin(angle)[:, None]    # [K,1]
    cx = jnp.round(xy[:, 0]).astype(jnp.int32)[:, None]
    cy = jnp.round(xy[:, 1]).astype(jnp.int32)[:, None]
    px = jnp.asarray(POOL_POINTS[None, :, 0], jnp.float32)       # [1,P]
    py = jnp.asarray(POOL_POINTS[None, :, 1], jnp.float32)
    col = jnp.round(px * ca - py * sa).astype(jnp.int32)
    row = jnp.round(px * sa + py * ca).astype(jnp.int32)
    xx = jnp.clip(cx + col, 0, w - 1)                            # [K,P]
    yy = jnp.clip(cy + row, 0, h - 1)
    # Precision story for the two stages (they are different knobs):
    # * the GATHER source stays f32 — a bf16 source view makes standalone
    #   gathers ~30% cheaper but measured zero in-step win (the gather
    #   overlaps other work), so there is nothing to buy with its rounding;
    # * the difference MATMUL below runs at DEFAULT precision, which rounds
    #   the same gathered f32 values to bf16 on the MXU input anyway
    #   (~0.4% relative, <= ~1 intensity unit per difference). That makes
    #   descriptor bits near ties backend-dependent (TPU vs CPU f32) at a
    #   measured ~1e-4 flip rate; the on-chip e2e accuracy gates
    #   (benchmarks/chip_accuracy.py artifact + the |ba| canary) cover it,
    #   and the global "highest" default (see vio.build_constants) would
    #   6-pass this K x 441 x 256 matmul for nothing. +-1/0 weights keep
    #   each output a short signed sum, so no accumulation blow-up.
    vals = jnp.take(blur_flat, base[:, None] + yy * w + xx, axis=0)
    diff = jnp.einsum(
        "kp,pn->kn", vals, jnp.asarray(_DIFF),
        precision=jax.lax.Precision.DEFAULT,
    )
    return matching.pack_descriptors(diff > 0)


def moment_maps_integral(stack: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Whole-stack circular moments (m10, m01) via prefix sums — NO gather.

    The keypoint-sparse patch gather ([K, 961] elements) costs ~12 ms/frame
    on this chip (gathers run ~6 ms per million elements); the same circular
    sums decompose into row-windowed ramp/box filters built from two x-axis
    prefix sums + 31 shifted adds, all VPU elementwise work (~0.3 ms/frame).

    For each row offset dy in [-15, 15] the circle contributes a row segment
    of half-width r(|dy|) = floor(sqrt(R^2 - dy^2)); per row,
        ramp(x; r) = sum_{d=-r..r} d I[x+d]
                   = (Q[x+r] - Q[x-r-1]) - x (P[x+r] - P[x-r-1])
        box(x; r)  = P[x+r] - P[x-r-1]
    with P = cumsum(I), Q = cumsum(x I). Then
        m10 = sum_dy shift_y(ramp(.; r(|dy|)), dy)
        m01 = sum_dy dy * shift_y(box(.; r(|dy|)), dy).

    Precision: the circular window is x-symmetric per row and its dy-weighted
    row lengths are y-symmetric, so BOTH moments are invariant to adding a
    constant — the per-row mean is subtracted first, turning Q's cumsum into
    a random walk (|Q| ~ 1e6 instead of 2.7e8) and keeping the windowed-
    difference cancellation ~1e-4 rad worst-case (validated against the
    explicit-centroid path in tests).

    stack [..., H, W] -> (m10, m01) [..., H, W]; values within PATCH_R of
    the border are garbage (callers only sample >= EDGE=19 px inside).
    """
    h, w = stack.shape[-2], stack.shape[-1]
    # per-PLANE mean: the invariance needs one constant for the whole
    # 2-D window (a per-row mean would break the dy-antisymmetric m01 sum)
    stack = stack - jnp.mean(stack, axis=(-2, -1), keepdims=True)
    # prefix sums via jnp.cumsum, NOT a triangular matmul: sequential
    # partial sums share their rounding error so the windowed DIFFERENCES
    # cancel it; independent matmul dots have uncorrelated error (measured
    # ~10x worse). x-weights centered to halve the worst-case |q| growth:
    # sum (j - x) J[j] = win(q) - (x - c) win(p) for any constant c.
    xc = jnp.arange(w, dtype=stack.dtype) - w / 2.0
    p = jnp.cumsum(stack, axis=-1)
    q = jnp.cumsum(stack * xc, axis=-1)

    radii = sorted({int(np.floor(np.sqrt(PATCH_R**2 - dy * dy)))
                    for dy in range(PATCH_R + 1)})

    def window(c, r):
        """c[..., x+r] - c[..., x-r-1] with c[..., <0] = 0."""
        hi = jnp.concatenate(
            [c[..., r:], jnp.broadcast_to(c[..., -1:], c.shape[:-1] + (r,))],
            axis=-1)
        lo = jnp.concatenate(
            [jnp.zeros(c.shape[:-1] + (r + 1,), c.dtype), c[..., : -r - 1]],
            axis=-1)
        return hi - lo

    ramp = {}
    box = {}
    for r in radii:
        bx = window(p, r)
        ramp[r] = window(q, r) - xc * bx
        box[r] = bx

    zrow = jnp.zeros(stack.shape[:-2] + (PATCH_R,) + (w,), stack.dtype)

    def shift_y(a, dy):
        # a[..., y+dy, :] with zero fill (border rows are masked anyway)
        pad = jnp.concatenate([zrow, a, zrow], axis=-2)
        return pad[..., PATCH_R + dy : PATCH_R + dy + h, :]

    m10 = jnp.zeros_like(stack)
    m01 = jnp.zeros_like(stack)
    for dy in range(-PATCH_R, PATCH_R + 1):
        r = int(np.floor(np.sqrt(PATCH_R**2 - dy * dy)))
        m10 = m10 + shift_y(ramp[r], dy)
        if dy:
            m01 = m01 + dy * shift_y(box[r], dy)
    return m10, m01


def ic_angle_integral(
    m10_flat: jnp.ndarray, m01_flat: jnp.ndarray,
    base: jnp.ndarray, xy: jnp.ndarray, h: int, w: int,
) -> jnp.ndarray:
    """Sample the integral moment maps at keypoints -> [K] radians.

    Two K-element gathers instead of a [K, 961] patch gather."""
    cx = jnp.clip(jnp.round(xy[..., 0]).astype(jnp.int32), 0, w - 1)
    cy = jnp.clip(jnp.round(xy[..., 1]).astype(jnp.int32), 0, h - 1)
    idx = base + cy * w + cx
    return jnp.arctan2(jnp.take(m01_flat, idx), jnp.take(m10_flat, idx))


# circle geometry shared by all moment formulations: per row offset dy the
# circular patch covers x in [-r(|dy|), r(|dy|)]
_DYS = np.arange(-PATCH_R, PATCH_R + 1)
_RS = np.floor(np.sqrt(PATCH_R**2 - _DYS.astype(np.float64) ** 2)).astype(
    np.int32
)


def ic_angle_sparse(
    stack: jnp.ndarray, base: jnp.ndarray, xy: jnp.ndarray
) -> jnp.ndarray:
    """IC angles via keypoint-sparse sampling of the P/Q prefix images.

    Same windowed-difference decomposition as `moment_maps_integral` (see
    its docstring for the math and the precision argument) but WITHOUT
    materializing the ramp/box/moment maps: only the two prefix images are
    built (2 cumsum passes over the stack), then each keypoint gathers the
    4 prefix values (P, Q at the two row-segment ends) for each of its 31
    circle rows — a [K, 31] x4 gather, ~124 elements/keypoint instead of
    ~35 stack-sized HBM passes (the dominant front-end cost at 752x480x16
    planes: ~14 ms measured for the map form vs ~6 ms/M gathered elements).

    stack: [N, H, W] padded plane stack; base: [K] flat plane offsets
    (plane * H * W); xy: [K, 2] level-local pixel coords. Keypoints within
    PATCH_R+1 of the plane border get clamped-window garbage (callers keep
    detections >= EDGE=19 px inside; invalid slots are masked downstream).
    """
    h, w = stack.shape[-2], stack.shape[-1]
    stack = stack - jnp.mean(stack, axis=(-2, -1), keepdims=True)
    xc = jnp.arange(w, dtype=stack.dtype) - w / 2.0
    # prefix sums via jnp.cumsum, NOT a triangular MXU matmul: sequential
    # partial sums share rounding error so the windowed DIFFERENCES cancel
    # it; HIGHEST-precision matmul dots are ~10% faster but their
    # uncorrelated error pushes worst-case angles past the 5e-3 rad gate
    # (measured 6.2e-3 vs the patch-gather oracle)
    p = jnp.cumsum(stack, axis=-1).reshape(-1)
    q = jnp.cumsum(stack * xc, axis=-1).reshape(-1)

    cx = jnp.clip(
        jnp.round(xy[..., 0]).astype(jnp.int32), PATCH_R + 1, w - 1 - PATCH_R
    )
    cy = jnp.clip(
        jnp.round(xy[..., 1]).astype(jnp.int32), PATCH_R, h - 1 - PATCH_R
    )
    dys = jnp.asarray(_DYS, jnp.int32)                       # [31]
    rs = jnp.asarray(_RS, jnp.int32)                         # [31]
    rows = base[:, None] + (cy[:, None] + dys[None, :]) * w  # [K, 31]
    hi = rows + cx[:, None] + rs[None, :]
    lo = rows + cx[:, None] - rs[None, :] - 1
    hl = jnp.concatenate([hi, lo], axis=1)                   # [K, 62]
    pv = jnp.take(p, hl)                                     # 2 gathers, not 4
    qv = jnp.take(q, hl)
    box = pv[:, :31] - pv[:, 31:]                            # [K, 31]
    xck = cx.astype(stack.dtype)[:, None] - w / 2.0
    ramp = (qv[:, :31] - qv[:, 31:]) - xck * box
    m10 = jnp.sum(ramp, axis=1)
    m01 = jnp.sum(dys.astype(stack.dtype)[None, :] * box, axis=1)
    return jnp.arctan2(m01, m10)


def pyramid_shapes(h: int, w: int, cfg: OrbConfig) -> list[tuple[int, int]]:
    """Static per-level content sizes (level 0 = full resolution)."""
    shapes = [(h, w)]
    for lvl in range(1, cfg.n_levels):
        lh = max(int(round(h / cfg.scale**lvl)), 2 * EDGE + 8)
        lw = max(int(round(w / cfg.scale**lvl)), 2 * EDGE + 8)
        shapes.append((lh, lw))
    return shapes


def _bilinear_rows(n_out: int, n_canvas: int, n_in: int) -> np.ndarray:
    """[n_canvas, n_in] plain-bilinear resampling weights (cv::resize
    INTER_LINEAR src mapping: src = (dst + 0.5) * n_in/n_out - 0.5, clamped);
    rows >= n_out are zero (canvas padding)."""
    m = np.zeros((n_canvas, n_in), np.float32)
    r = np.arange(n_out)
    src = np.clip((r + 0.5) * (n_in / n_out) - 0.5, 0.0, n_in - 1)
    i0 = np.floor(src).astype(np.int64)
    t = (src - i0).astype(np.float32)
    i1 = np.minimum(i0 + 1, n_in - 1)
    np.add.at(m, (r, i0), 1.0 - t)
    np.add.at(m, (r, i1), t)
    return m


_PYR_MATS: dict = {}
_SAMPLERS: dict = {}


def _pool_sampler(interpret: bool, canvas_dtype: str = "f32"):
    """Cached batchable fused sampler (see pallas_sample.py); caching keeps
    one custom_vmap instance per mode so jit caches stay warm."""
    key = (interpret, canvas_dtype)
    if key not in _SAMPLERS:
        from pose_estimation_tpu.ops.pallas_sample import (
            make_batchable_sampler,
        )

        _SAMPLERS[key] = make_batchable_sampler(
            POOL_POINTS.astype(np.float32), t_chunk=32, interpret=interpret,
            canvas_dtype=(
                jnp.bfloat16 if canvas_dtype == "bf16" else jnp.float32
            ),
        )
    return _SAMPLERS[key]


def _pyramid_mats(h: int, w: int, cfg: OrbConfig):
    """Per-level CONTENT-shaped bilinear weight matrices for levels
    1..nl-1: list of (ra [lh, h], ca [w, lw]) numpy pairs (level 0 is the
    input itself). Content shapes keep the resampling matmuls ~4.8x
    smaller than the padded-canvas form (the canvas is ~2.2x over-content
    and the square [H, H] x [W, W] products were ~4.8x the content
    FLOPs); the zero canvas rows/cols are applied by padding AFTER."""
    key = (h, w, cfg.n_levels, cfg.scale)
    if key not in _PYR_MATS:
        shapes = pyramid_shapes(h, w, cfg)
        # cache NUMPY, not device arrays: a jnp constant created while a jit
        # trace is active is a tracer, and caching it leaks across traces
        _PYR_MATS[key] = [
            (_bilinear_rows(lh, lh, h), _bilinear_rows(lw, lw, w).T)
            for lh, lw in shapes[1:]
        ]
    return _PYR_MATS[key]


def pyramid_levels(imgs: jnp.ndarray, cfg: OrbConfig) -> list:
    """[B, H, W] images -> per-level CONTENT-shaped list [[B, lh, lw], ...].

    Each level l >= 1 is resampled from level 0 by two content-shaped
    einsums (cv::resize INTER_LINEAR semantics — the reference's
    ComputePyramid, `ORBextractor.cc:1107-1132`). HIGHEST precision keeps
    the MXU passes f32-accurate (bf16 rounding would be ~0.5 intensity
    units)."""
    parts = [imgs]
    for ra, ca in _pyramid_mats(imgs.shape[1], imgs.shape[2], cfg):
        lv = jnp.einsum(
            "rh,bhw->brw", jnp.asarray(ra), imgs, precision="highest"
        )
        lv = jnp.einsum(
            "brw,wc->brc", lv, jnp.asarray(ca), precision="highest"
        )
        parts.append(lv)
    return parts


def pyramid_stack(imgs: jnp.ndarray, cfg: OrbConfig) -> jnp.ndarray:
    """[B, H, W] images -> [n_levels * B, H, W] level-major plane stack.

    Levels from `pyramid_levels`, zero-padded into the canvas corner.
    Bit-identical to the former stacked full-canvas einsum pair (same
    per-element dot products; padded rows/cols are zero in both)."""
    b, h, w = imgs.shape
    return jnp.concatenate(
        [
            jnp.pad(lv, ((0, 0), (0, h - lv.shape[1]), (0, w - lv.shape[2])))
            for lv in pyramid_levels(imgs, cfg)
        ],
        axis=0,
    )


@full_precision
def extract_batch(imgs: jnp.ndarray, cfg: OrbConfig) -> OrbFeatures:
    """Full ORB front-end for a batch of grayscale images [B, H, W].

    TPU-first reformulation of the reference's per-level loop
    (`ORBextractor.cc:1043-1105`): ALL pyramid levels of ALL images are
    padded into one [B * n_levels, H, W] plane stack and every stage (FAST
    score, NMS, per-cell selection, orientation, blur, BRIEF) runs ONCE as a
    batched program. On the dispatch-latency-bound chip this collapses
    ~16 x 8 per-level stage subgraphs into ~1 x 8 (see BASELINE.md); the
    padding waste (levels 1+ occupy a corner of the full canvas) is marginal
    compute, which is ~free next to dispatch.

    Per-level semantics are preserved exactly: zero padding beyond each
    level's content only touches pixels outside the 19px detection margin
    (FAST ring 3, NMS 1, IC-angle patch 15 < 19; BRIEF samples may read the
    3px blur-contaminated band at the level edge — same few-bit effect as
    the per-level reflect-101 border, different values).

    Returns OrbFeatures with leading batch dim: fields [B, K_total, ...]
    where K_total = sum of per-level budgets, levels in ascending order,
    each level block sorted by score descending.
    """
    b, h, w = imgs.shape
    budgets = level_budgets(cfg)
    shapes = pyramid_shapes(h, w, cfg)
    nl = cfg.n_levels

    # All downsampled levels via per-level content-shaped einsum pairs
    # (see pyramid_stack): per-level bilinear resampling is a (sparse,
    # static) row-weight matrix x image x col-weight matrix product.
    # The pyramid stays full-precision f32 (the reference quantizes every
    # level to uint8 — cv::resize CV_8U, `ORBextractor.cc:1107-1132` — and
    # measurably loses tracking accuracy for it on the rendered simulator:
    # quantizing the resampled levels alone pushed the e2e |ba| gate from
    # ~1.4 to 3.2 m/s^2). Consequence for the bf16 fused-select kernel: its
    # scores are EXACT on integer-valued planes (level 0 of uint8 frames —
    # diffs <= 255 fit bf16's 8-bit mantissa) and carry <= 0.5-intensity
    # rounding on resampled levels — strictly less perturbation than the
    # reference's own uint8 pyramid.
    levels = pyramid_levels(imgs, cfg)
    stack = jnp.concatenate(
        [
            jnp.pad(lv, ((0, 0), (0, h - lv.shape[1]), (0, w - lv.shape[2])))
            for lv in levels
        ],
        axis=0,
    )
    bounds = [shapes[p // b] for p in range(nl * b)]

    if cfg.fast_backend == "pallas" and w % 16 == 0 and cfg.cell == 16:
        # fully fused: FAST score + NMS + gates + per-cell top-k in ONE
        # kernel; only the plane top-k sort + subpixel sampling stay in XLA
        kps = fast_mod.select_keypoints_fused(
            stack, bounds, cfg.th_hi, cfg.th_lo, budgets[0],
            border=EDGE, k_per_cell=cfg.k_per_cell,
            compute_dtype=(
                jnp.float32 if cfg.select_dtype == "f32" else jnp.bfloat16
            ),
        )
    elif cfg.fast_backend == "pallas":
        from pose_estimation_tpu.ops.pallas_fast import fast_score_nms_pallas

        score_raw, score_masked = fast_score_nms_pallas(stack)
        kps = fast_mod.select_keypoints_batched(
            score_masked, bounds, cfg.th_hi, cfg.th_lo, budgets[0],
            cell=cfg.cell, border=EDGE, k_per_cell=cfg.k_per_cell,
            pre_nms=True, raw_score=score_raw,
        )
    else:
        score = fast_mod.fast_score(stack)
        kps = fast_mod.select_keypoints_batched(
            score, bounds, cfg.th_hi, cfg.th_lo, budgets[0],
            cell=cfg.cell, border=EDGE, k_per_cell=cfg.k_per_cell,
        )

    # slice each plane to its level budget FIRST (top_k is score-sorted, so
    # the leading kb entries per plane are that level's selection), then run
    # orientation + BRIEF only on the kept keypoints via plane-indexed
    # gathers — no work on the 2.2x overcapacity the uniform Kmax implies
    xy_l, score_l, valid_l, level_l, base_l, scale_l = [], [], [], [], [], []
    for lvl in range(nl):
        sl = slice(lvl * b, (lvl + 1) * b)
        kb = budgets[lvl]
        xy_l.append(kps.xy[sl, :kb])                       # [b, kb, 2]
        score_l.append(kps.score[sl, :kb])
        valid_l.append(kps.valid[sl, :kb])
        level_l.append(jnp.full((b, kb), lvl, jnp.int32))
        plane = lvl * b + jnp.arange(b)
        base_l.append(
            jnp.broadcast_to(plane[:, None] * (h * w), (b, kb))
        )
        scale_l.append(jnp.full((b, kb), cfg.scale**lvl, jnp.float32))
    xy = jnp.concatenate(xy_l, axis=1)                     # [b, K_tot, 2]
    score_all = jnp.concatenate(score_l, axis=1)
    valid_all = jnp.concatenate(valid_l, axis=1)
    level_all = jnp.concatenate(level_l, axis=1)
    base_all = jnp.concatenate(base_l, axis=1)
    scale_all = jnp.concatenate(scale_l, axis=1)
    k_tot = xy.shape[1]

    xy_flat = xy.reshape(b * k_tot, 2)
    base_flat = base_all.reshape(b * k_tot)
    if cfg.sample_backend in ("pallas", "pallas_interpret"):
        # one fused per-keypoint kernel for IC moments + blur + rotated
        # pool sampling (ops/pallas_sample.py), called PER LEVEL on the
        # CONTENT-shaped level planes. The kernel's measured floor is the
        # per-chunk plane-block DMA (benchmarks/launch_overhead_exp.py), so
        # feeding it the full-canvas stack paid for the ~2.2x padding waste
        # of levels >= 1 on every plane fetch; per-level calls cut the DMA
        # bytes to the content. Side effect (deliberate): each level's
        # canvas is reflect-101-padded at its own CONTENT edge, which is
        # what the reference computes (per-level GaussianBlur with
        # BORDER_REFLECT_101, `ORBextractor.cc:1086-1090`) — the padded
        # full-canvas form read zero fill beyond upper-level content
        # instead (same few-edge-bits effect, closer-to-reference values).
        # The kernel's chunks must be plane-uniform (its grid keeps one
        # plane VMEM-resident per chunk), so each (level, image) block is
        # padded to the chunk size, and results sliced back.
        t_chunk = 32
        pads = [-(-budgets[l] // t_chunk) * t_chunk for l in range(nl)]
        sampler = _pool_sampler(
            cfg.sample_backend == "pallas_interpret", cfg.sample_dtype
        )
        packed_l = []
        for lvl in range(nl):
            kp_l = pads[lvl]
            xy_pad = jnp.pad(
                xy_l[lvl], ((0, 0), (0, kp_l - budgets[lvl]), (0, 0))
            )                                              # [b, kp_l, 2]
            plane_np = np.broadcast_to(
                np.arange(b, dtype=np.int32)[:, None], (b, kp_l)
            )
            vals, m10s, m01s = sampler(
                levels[lvl],
                jnp.asarray(plane_np.reshape(-1)),
                xy_pad.reshape(b * kp_l, 2),
            )
            pk = jnp.concatenate(
                [vals, m10s[:, None], m01s[:, None]], axis=1
            ).reshape(b, kp_l, -1)
            packed_l.append(pk[:, : budgets[lvl]])
        packed = jnp.concatenate(packed_l, axis=1)         # [b, K_tot, P+2]
        npool = POOL_POINTS.shape[0]
        ang = jnp.arctan2(
            packed[..., npool + 1], packed[..., npool]
        ).reshape(-1)
        # DEFAULT precision: same argument as brief_descriptors_pool's
        # difference matmul (near-tie bits only; keeps one bf16 MXU pass)
        diff = jnp.einsum(
            "kp,pn->kn",
            packed[..., :npool].reshape(b * k_tot, npool),
            jnp.asarray(_DIFF),
            precision=jax.lax.Precision.DEFAULT,
        )
        desc = matching.pack_descriptors(diff > 0)
    else:
        # IC angle from integral-image moment maps: prefix sums + shifted
        # adds + two K-element gathers, instead of a [K, 961] patch gather
        # (~12 ms/frame on this chip; see moment_maps_integral). The Pallas
        # kernel keeps the whole shifted-add chain in VMEM (the XLA form
        # round-trips it through HBM).
        if cfg.moments_backend == "sparse":
            ang = ic_angle_sparse(stack, base_flat, xy_flat)
        else:
            if cfg.moments_backend == "pallas":
                from pose_estimation_tpu.ops.pallas_fast import (
                    moment_maps_pallas,
                )

                m10, m01 = moment_maps_pallas(stack)
            else:
                m10, m01 = moment_maps_integral(stack)
            ang = ic_angle_integral(
                m10.reshape(-1), m01.reshape(-1), base_flat, xy_flat, h, w
            )
        blur = gaussian_blur7(stack)
        desc = brief_descriptors_pool(
            blur.reshape(-1), base_flat, xy_flat, ang, h, w
        )
    return OrbFeatures(
        xy=xy * scale_all[..., None],
        angle=ang.reshape(b, k_tot),
        score=score_all,
        level=level_all,
        desc=desc.reshape(b, k_tot, N_PAIRS),
        valid=valid_all,
    )


def extract(img: jnp.ndarray, cfg: OrbConfig) -> OrbFeatures:
    """Full ORB front-end for one grayscale image [H, W] float32.

    Returns fixed-capacity features (capacity = sum of level budgets).
    Thin wrapper over `extract_batch` (one batched program for all levels).
    """
    feats = extract_batch(img[None], cfg)
    return jax.tree.map(lambda a: a[0], feats)


def extract_pair(
    img_a: jnp.ndarray, img_b: jnp.ndarray, cfg: OrbConfig
) -> tuple[OrbFeatures, OrbFeatures]:
    """Extract features of a stereo pair in ONE batched program — the
    TPU-native form of the reference's two ORB threads
    (`feature-tracker.cpp:147-157`)."""
    feats = extract_batch(jnp.stack([img_a, img_b]), cfg)
    fa = jax.tree.map(lambda a: a[0], feats)
    fb = jax.tree.map(lambda a: a[1], feats)
    return fa, fb
