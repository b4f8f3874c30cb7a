"""Post-fusion HLO op-count breakdown of the fused VIO step.

On the tunneled single chip, per-op dispatch latency (~10-20 us) dominates
single-stream latency, so the number of top-level instructions in the
compiled HLO entry (plus while-loop bodies x their trip counts) is the
latency model. This tool compiles each stage and prints those counts.

Usage:  python benchmarks/opcount.py [cpu|tpu]
"""

from __future__ import annotations

import functools
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def count_hlo(compiled_text: str) -> dict:
    """Per-computation instruction counts from compiled HLO text."""
    comps: dict[str, int] = {}
    cur = None
    for line in compiled_text.splitlines():
        m = re.match(r"^(ENTRY )?%?([\w.\-]+) \(.*\) -> ", line.strip())
        if m and ("{" in line):
            cur = ("ENTRY " if m.group(1) else "") + m.group(2)
            comps[cur] = 0
            continue
        if cur is not None:
            s = line.strip()
            if s.startswith("}"):
                cur = None
            elif "=" in s and not s.startswith("//"):
                comps[cur] = comps.get(cur, 0) + 1
    return comps


def summarize(name: str, fn, args):
    import jax

    lowered = jax.jit(fn).lower(*args)
    compiled = lowered.compile()
    txt = compiled.as_text()
    comps = count_hlo(txt)
    entry = sum(v for k, v in comps.items() if k.startswith("ENTRY"))
    rest = {k: v for k, v in comps.items() if not k.startswith("ENTRY")}
    print(f"== {name}: entry={entry}")
    for k, v in sorted(rest.items(), key=lambda kv: -kv[1])[:10]:
        if v > 20:
            print(f"   {k}: {v}")
    return entry, comps


def main():
    platform = sys.argv[1] if len(sys.argv) > 1 else "tpu"
    if platform == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from pose_estimation_tpu import load_config
    from pose_estimation_tpu.camera import CameraModel
    from pose_estimation_tpu.models import vio as vio_mod

    cfg = load_config("/root/reference/config/euroc.yml", dataset="euroc")
    cm = CameraModel.from_config(cfg)
    consts, static = vio_mod.build_constants(cfg, cm)

    rng = np.random.default_rng(0)
    h, w = cfg.image_height, cfg.image_width
    m = cfg.imu_chunk
    img_l = jnp.asarray(rng.uniform(0, 255, (h, w)), jnp.float32)
    img_r = jnp.asarray(rng.uniform(0, 255, (h, w)), jnp.float32)
    gyr = jnp.asarray(rng.normal(size=(m, 3)) * 0.1, jnp.float32)
    acc = jnp.asarray(rng.normal(size=(m, 3)) * 0.3, jnp.float32)
    mask = jnp.arange(m) < 20
    key = jax.random.PRNGKey(0)
    state = vio_mod.init_vio_state(static)

    print("backend:", jax.default_backend())

    summarize(
        "stage_imu",
        functools.partial(vio_mod.stage_imu, consts=consts, static=static),
        (state, gyr, acc, mask),
    )
    summarize(
        "stage_frontend",
        functools.partial(vio_mod.stage_frontend, consts=consts, static=static),
        (state, img_l, img_r, key),
    )
    summarize(
        "stage_ba",
        functools.partial(vio_mod.stage_ba, consts=consts, static=static),
        (state, jnp.int32(40)),
    )
    st2, cur, tr = jax.jit(
        functools.partial(vio_mod.stage_frontend, consts=consts, static=static)
    )(state, img_l, img_r, key)
    summarize(
        "stage_pool",
        functools.partial(vio_mod.stage_pool, consts=consts, static=static),
        (st2, cur, tr, tr.n_matches),
    )
    summarize(
        "ok_step (fused)",
        functools.partial(vio_mod.ok_step, consts=consts, static=static),
        (state, img_l, img_r, gyr, acc, mask, key),
    )


if __name__ == "__main__":
    main()
