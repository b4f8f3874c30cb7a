"""ok_scan (streaming replay) equivalence + profiling utilities."""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from pose_estimation_tpu.camera import CameraModel
from pose_estimation_tpu.models import vio as vio_mod
from pose_estimation_tpu.testing import tiny_config
import pytest


@pytest.mark.slow  # scan-over-frames compile; fast tier skips
class TestOkScan:
    def test_matches_sequential_steps(self):
        cfg = tiny_config()
        cm = CameraModel.from_config(cfg)
        consts, static = vio_mod.build_constants(cfg, cm)
        rng = np.random.default_rng(0)
        h, w = cfg.image_height, cfg.image_width
        m = cfg.imu_chunk
        T = 3
        imgs = jnp.asarray(rng.uniform(0, 255, (T, h, w)), jnp.float32)
        gyrs = jnp.asarray(rng.normal(size=(T, m, 3)) * 0.1, jnp.float32)
        accs = jnp.asarray(rng.normal(size=(T, m, 3)), jnp.float32)
        masks = jnp.broadcast_to(jnp.arange(m) < 4, (T, m))
        keys = jax.random.split(jax.random.PRNGKey(0), T)

        state0 = vio_mod.init_vio_state(static)
        scan = jax.jit(functools.partial(vio_mod.ok_scan, consts=consts, static=static))
        s_scan, outs = scan(state0, imgs, imgs, gyrs, accs, masks, keys)

        step = jax.jit(functools.partial(vio_mod.ok_step, consts=consts, static=static))
        s_seq = state0
        for t in range(T):
            s_seq, _ = step(s_seq, imgs[t], imgs[t], gyrs[t], accs[t], masks[t], keys[t])

        for a, b in zip(jax.tree.leaves(s_scan), jax.tree.leaves(s_seq)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-5
            )
        # per-frame outputs are stacked [T, ...]
        assert outs["p"].shape == (T, 3)
        assert outs["n_tracked"].shape == (T,)


class TestProfiling:
    def test_stage_timers(self):
        from pose_estimation_tpu.profiling import StageTimers

        st = StageTimers()
        x = jnp.ones((64, 64))
        with st.stage("matmul", result=None):
            y = x @ x
        with st.stage("matmul", result=y):
            y = x @ x
        st.add("manual", 0.5)
        rep = st.report()
        assert "matmul" in rep and "x2" in rep
        assert "manual" in rep
