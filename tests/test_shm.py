"""cluon-SharedMemory frame transport: layout + loopback producer/consumer.

The producer here stands in for the car's camera daemon (a separate
process publishing side-by-side stereo into `cluon::SharedMemory`,
`/root/reference/src/cfsd-state-estimation.cpp:99-132`). Frames published
from a CHILD PROCESS must arrive through `ShmStereoSource` with correct
pixels, split, and mtime-carried timestamps — the wait/lock protocol is
exercised across a real process boundary, mirroring what tests/test_od4.py
does for the UDP wire.
"""

import os
import subprocess
import sys
import textwrap
import time

import numpy as np
import pytest

from pose_estimation_tpu.io import shm as shm_mod

pytestmark = pytest.mark.skipif(
    not shm_mod.available(), reason="libshmframes.so not built"
)

W, H, C = 128, 32, 4  # side-by-side stereo, CV_8UC4 like the car daemon


def make_frame(i):
    rng = np.random.default_rng(i)
    return rng.integers(0, 255, (H, W, C), dtype=np.uint8)


class TestLayout:
    def test_header_layout_matches_cluon(self):
        """The segment in /dev/shm must be header(96B on glibc x86-64:
        uint32 size + pad + 40B mutex + 48B cond) + payload, with __size
        readable at offset 0 — the exact cluon POSIX layout."""
        name = f"/pet-shm-layout-{os.getpid()}"
        prod = shm_mod.ShmStereoProducer(name, W, H, C)
        try:
            raw = open(f"/dev/shm{name}", "rb").read()
            assert len(raw) >= 4 + W * H * C
            stored = int.from_bytes(raw[:4], "little")
            assert stored == W * H * C
            assert len(raw) - W * H * C in (96,), (
                "header size drifted from cluon's glibc layout"
            )
        finally:
            prod.close()

    def test_timestamp_rides_on_mtime(self):
        name = f"/pet-shm-ts-{os.getpid()}"
        prod = shm_mod.ShmStereoProducer(name, W, H, C)
        try:
            ts = 1_703_155_200_123_456
            prod.publish(make_frame(0), ts_micros=ts)
            st = os.stat(f"/dev/shm{name}")
            assert int(st.st_mtime) == ts // 1_000_000
            assert prod.get_timestamp() == ts
        finally:
            prod.close()


PRODUCER_SCRIPT = textwrap.dedent(
    """
    import sys, time
    import numpy as np
    sys.path.insert(0, {root!r})
    from pose_estimation_tpu.io import shm as shm_mod

    name, n = sys.argv[1], int(sys.argv[2])
    prod = shm_mod.ShmStereoProducer(name, {w}, {h}, {c})
    print("ready", flush=True)
    sys.stdin.readline()          # consumer attached
    for i in range(n):
        rng = np.random.default_rng(i)
        frame = rng.integers(0, 255, ({h}, {w}, {c}), dtype=np.uint8)
        prod.publish(frame, ts_micros=1_000_000 + i)
        time.sleep(0.03)
    time.sleep(0.2)               # let the consumer drain
    prod.close()
    """
)


class TestLoopback:
    def test_cross_process_frames(self):
        """Frames published by a child process arrive with exact pixel
        content (gray conversion + L/R split) and timestamps."""
        name = f"/pet-shm-loop-{os.getpid()}"
        root = str(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        )
        script = PRODUCER_SCRIPT.format(root=root, w=W, h=H, c=C)
        proc = subprocess.Popen(
            [sys.executable, "-c", script, name, "6"],
            stdin=subprocess.PIPE, stdout=subprocess.PIPE, text=True,
        )
        try:
            assert proc.stdout.readline().strip() == "ready"
            src = shm_mod.ShmStereoSource(name, W, H, C, timeout_ms=2000)
            proc.stdin.write("go\n")
            proc.stdin.flush()
            got = []
            t_end = time.time() + 5.0
            while len(got) < 3 and time.time() < t_end:
                out = src.read()
                if out is not None:
                    got.append(out)
            assert len(got) >= 3, "missed too many frames"
            for ts, gl, gr in got:
                assert gl.shape == (H, W // 2) and gr.shape == (H, W // 2)
                i = ts - 1_000_000
                assert 0 <= i < 6
                frame = make_frame(i)
                gray = (
                    0.114 * frame[..., 0]
                    + 0.587 * frame[..., 1]
                    + 0.299 * frame[..., 2]
                ).astype(np.float32)
                np.testing.assert_allclose(gl, gray[:, : W // 2], atol=1e-4)
                np.testing.assert_allclose(gr, gray[:, W // 2 :], atol=1e-4)
            src.close()
        finally:
            try:
                proc.stdin.write("\n")
            except Exception:
                pass
            proc.wait(timeout=10)

    def test_consumer_timeout_when_producer_silent(self):
        name = f"/pet-shm-quiet-{os.getpid()}"
        prod = shm_mod.ShmStereoProducer(name, W, H, C)
        try:
            src = shm_mod.ShmStereoSource(name, W, H, C, timeout_ms=100)
            t0 = time.time()
            assert src.read() is None
            assert time.time() - t0 < 2.0
            src.close()
        finally:
            prod.close()
