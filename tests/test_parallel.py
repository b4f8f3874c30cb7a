"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pose_estimation_tpu.camera import CameraModel
from pose_estimation_tpu.models import vio as vio_mod
from pose_estimation_tpu.parallel import batched
from pose_estimation_tpu.testing import tiny_config


@pytest.fixture(scope="module")
def setup():
    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    cfg = tiny_config()
    cm = CameraModel.from_config(cfg)
    consts, static = vio_mod.build_constants(cfg, cm)
    return cfg, consts, static


def run_batched(setup, data, model):
    cfg, consts, static = setup
    n = data * model
    mesh = batched.make_mesh(jax.devices()[:n], data=data, model=model)
    step = batched.make_batched_step(consts, static, mesh)
    state = batched.init_batched_state(static, data, mesh)
    rng = np.random.default_rng(0)
    h, w = cfg.image_height, cfg.image_width
    m = cfg.imu_chunk
    img = jnp.asarray(rng.uniform(0, 255, (data, h, w)), jnp.float32)
    gyr = jnp.asarray(rng.normal(size=(data, m, 3)) * 0.1, jnp.float32)
    acc = jnp.asarray(rng.normal(size=(data, m, 3)), jnp.float32)
    mask = jnp.broadcast_to(jnp.arange(m) < 6, (data, m))
    keys = jax.random.split(jax.random.PRNGKey(0), data)
    new_state, metrics = step(state, img, img, gyr, acc, mask, keys)
    jax.block_until_ready(new_state)
    return new_state, metrics


@pytest.mark.slow  # 8-device mesh compiles; fast tier skips
class TestBatchedStep:
    def test_dp_times_tp_mesh(self, setup):
        new_state, metrics = run_batched(setup, data=4, model=2)
        assert bool(jnp.all(jnp.isfinite(new_state.win.p)))
        assert new_state.win.R.shape[0] == 4

    def test_pure_dp_mesh(self, setup):
        new_state, metrics = run_batched(setup, data=8, model=1)
        assert bool(jnp.all(jnp.isfinite(new_state.win.p)))

    def test_tp_matches_single_device(self, setup):
        """Sharding the pool axis must not change the numerics."""
        s_dp, m_dp = run_batched(setup, data=2, model=1)
        s_tp, m_tp = run_batched(setup, data=2, model=4)
        np.testing.assert_allclose(
            np.asarray(s_dp.win.p), np.asarray(s_tp.win.p), atol=1e-5
        )
        np.testing.assert_array_equal(
            np.asarray(m_dp["n_stereo"]), np.asarray(m_tp["n_stereo"])
        )
