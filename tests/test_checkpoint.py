"""Checkpoint/resume + visualization smoke tests."""

import jax
import jax.numpy as jnp
import numpy as np

from pose_estimation_tpu import checkpoint as ckpt
from pose_estimation_tpu.camera import CameraModel
from pose_estimation_tpu.models import vio as vio_mod
from pose_estimation_tpu.testing import tiny_config


class TestCheckpoint:
    def test_roundtrip(self, tmp_path):
        cfg = tiny_config()
        cm = CameraModel.from_config(cfg)
        consts, static = vio_mod.build_constants(cfg, cm)
        state = vio_mod.init_vio_state(static)
        # mutate something so the roundtrip is nontrivial
        state = state._replace(
            bg=jnp.asarray([0.1, 0.2, 0.3], static.dtype),
            win=state.win._replace(p=state.win.p.at[2].set(jnp.asarray([1.0, 2.0, 3.0]))),
        )
        path = str(tmp_path / "ck.npz")
        ckpt.save_checkpoint(path, state, {"frame": 42, "ts": 123456789})
        loaded, meta = ckpt.load_checkpoint(path, static)
        assert meta == {"frame": 42, "ts": 123456789}
        for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(loaded)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_shape_mismatch_rejected(self, tmp_path):
        import pytest

        cfg = tiny_config()
        cm = CameraModel.from_config(cfg)
        consts, static = vio_mod.build_constants(cfg, cm)
        state = vio_mod.init_vio_state(static)
        path = str(tmp_path / "ck.npz")
        ckpt.save_checkpoint(path, state)

        cfg2 = tiny_config(pool_capacity=64)
        cm2 = CameraModel.from_config(cfg2)
        _, static2 = vio_mod.build_constants(cfg2, cm2)
        with pytest.raises(ValueError):
            ckpt.load_checkpoint(path, static2)


class TestViz:
    def test_plot_and_parse(self, tmp_path):
        from pose_estimation_tpu import viz

        n = 20
        ts = np.arange(n) * 1e8 + 1e9
        est = np.stack([ts, np.sin(ts / 1e9), np.cos(ts / 1e9), ts / 1e10], axis=1)
        out = viz.plot_trajectory(est, gt=est, out_path=str(tmp_path / "t.png"))
        assert (tmp_path / "t.png").exists()

        csv_path = tmp_path / "states.csv"
        with open(csv_path, "w") as f:
            f.write("timestamp,qw,qx,qy,qz,px,py,pz,vx,vy,vz,bgx,bgy,bgz,bax,bay,baz\n")
            for k in range(n):
                f.write(",".join(str(v) for v in [int(ts[k]), 1, 0, 0, 0,
                                                   1.0*k, 2.0, 3.0,
                                                   0.1, 0.2, 0.3,
                                                   0.01, 0.02, 0.03,
                                                   0.1, 0.2, 0.3]) + "\n")
        states = viz.load_states_csv(str(csv_path))
        assert states["p"].shape == (n, 3)
        out2 = viz.plot_states(states, str(tmp_path / "s.png"))
        assert (tmp_path / "s.png").exists()
