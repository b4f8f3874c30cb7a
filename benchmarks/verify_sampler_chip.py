"""On-chip validation + timing of the fused descriptor-sampling kernel.

Run on the real TPU (no args). Checks extract_batch(sample_backend="pallas")
against the XLA path on a full-size frame pair — keypoints/valids equal,
angles within rounding noise, descriptor bit flips at the rounding-tie
floor — then times both paths.  (CPU tests cover interpret mode; this
script is the compiled-Mosaic check: see NOTES.md for the two Mosaic
miscompile/crash classes it guards against.)
"""
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pose_estimation_tpu.ops import orb  # noqa: E402


def main():
    rng = np.random.default_rng(7)
    h, w = 480, 752
    imgs = jnp.asarray(rng.uniform(0, 255, (2, h, w)), jnp.float32)
    cfg_x = orb.OrbConfig(fast_backend="pallas", sample_backend="xla")
    cfg_p = cfg_x._replace(sample_backend="pallas")

    def run(cfg):
        f = jax.jit(lambda im: orb.extract_batch(im, cfg))
        out = f(imgs)
        float(out.xy[0, 0, 0])
        t0 = time.time()
        for _ in range(10):
            out = f(imgs)
        float(out.xy[0, 0, 0])
        return out, (time.time() - t0) / 10 * 1e3

    fx, tx = run(cfg_x)
    fp, tp = run(cfg_p)
    v = np.asarray(fx.valid)
    assert (np.asarray(fp.valid) == v).all(), "valid masks differ"
    np.testing.assert_allclose(np.asarray(fx.xy), np.asarray(fp.xy), atol=1e-4)
    da = np.angle(np.exp(1j * (np.asarray(fx.angle) - np.asarray(fp.angle))))
    bx, bp = np.asarray(fx.desc)[v], np.asarray(fp.desc)[v]
    mm = (bx != bp).mean()
    print(f"valid: {v.sum()}  max|dangle|: {np.abs(da[v]).max():.2e}  "
          f"desc mismatch: {mm:.2e}")
    assert np.abs(da[v]).max() < 5e-3
    assert mm < 5e-3
    print(f"extract_batch(2) xla: {tx:.2f} ms   pallas: {tp:.2f} ms")


if __name__ == "__main__":
    main()
