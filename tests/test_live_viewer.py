"""Live viewer analog (live_viewer.py) — the reference Pangolin viewer's
push API (`viewer.cpp:202-260`) + headless rendering + HTTP live page."""

import time
import urllib.request

import numpy as np

from pose_estimation_tpu.live_viewer import LiveViewer


def _feed(v, n=12):
    rng = np.random.default_rng(0)
    lms = rng.normal(size=(50, 3)) * 2
    for t in range(n):
        p = np.array([t * 0.1, np.sin(t * 0.3), 0.2 * t])
        for i in range(4):
            v.push_position(p + i * 0.02, i)
            v.push_raw_position(p + i * 0.02 + 0.01, i)
        v.push_pose(np.eye(3), p)
        if t % 3 == 0:
            v.push_keyframe()
        v.push_landmark(lms, np.ones(50, bool))


class TestLiveViewer:
    def test_push_and_render(self, tmp_path):
        out = tmp_path / "live.png"
        v = LiveViewer(out_path=str(out), port=None, interval=0.1)
        _feed(v)
        png = v.render_once()
        assert png[:8] == b"\x89PNG\r\n\x1a\n"
        assert out.exists() and out.stat().st_size > 1000
        # window-indexed overwrite + keyframe commit semantics
        pos, raw, pose, lms, n = v._snapshot()
        assert len(pos) == 4 + 4          # 4 committed keyframes + tail
        assert lms.shape == (50, 3)
        assert pose is not None

    def test_background_thread_and_http(self, tmp_path):
        v = LiveViewer(out_path=str(tmp_path / "v.png"), port=0,
                       interval=0.05)
        with v:
            _feed(v, 5)
            deadline = time.time() + 15
            while v._renders == 0 and time.time() < deadline:
                time.sleep(0.05)
            assert v._renders > 0
            page = urllib.request.urlopen(
                f"http://127.0.0.1:{v.port}/", timeout=10
            ).read()
            assert b"view.png" in page
            img = urllib.request.urlopen(
                f"http://127.0.0.1:{v.port}/view.png", timeout=10
            ).read()
            assert img[:8] == b"\x89PNG\r\n\x1a\n"

    def test_slam_integration(self):
        """VisualInertialSLAM.set_viewer drives the pushes end to end on
        the simulator (a couple of OK frames)."""
        import sys
        from pathlib import Path

        sys.path.insert(0, str(Path(__file__).resolve().parent))
        import functools

        import jax

        from pose_estimation_tpu.models import vio as vio_mod
        from pose_estimation_tpu.camera import CameraModel
        from pose_estimation_tpu.testing import tiny_config
        from sim import seeded_state, sim_world

        cfg = tiny_config(camera_frequency=40)
        cm = CameraModel.from_config(cfg)
        consts, static = vio_mod.build_constants(cfg, cm)
        frames, gyrs, accs, mask, state0 = sim_world(
            cfg, 3, n_landmarks=100, seed=0
        )
        fn = functools.partial(vio_mod.ok_step, consts=consts, static=static)
        step = jax.jit(
            lambda s, il, ir, g, a, k: fn(s, il, ir, g, a, mask, k)
        )
        st = seeded_state(static, state0)

        # a minimal host shim standing in for VisualInertialSLAM's OK path
        v = LiveViewer(out_path=None, port=None)
        for i in range(3):
            st, met = step(st, frames[i][0], frames[i][1], gyrs[i],
                           accs[i], jax.random.PRNGKey(i))
            assert "p_pred" in met
            v.push_raw_position(np.asarray(met["p_pred"]), 3)
            for j in range(4):
                v.push_position(np.asarray(st.win.p[1 + j]), j)
        pos, raw, *_ = v._snapshot()
        assert len(pos) == 4 and np.isfinite(pos).all()
