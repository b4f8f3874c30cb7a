"""Per-round microbench artifact from the CHAINED per-stage profiler
(VERDICT r4 #7: the standalone-call MICROBENCH was dominated by the ~24 ms
tunnel dispatch floor and insensitive to real stage regressions; the
chained-prefix profile in benchmarks/profile_chain.py is the real
instrument). Runs profile_chain's three groups and writes
MICROBENCH_r<N>.json (or $MICROBENCH_OUT) with ms/frame per stage.

    python benchmarks/microbench_chain.py
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]


def main():
    env = dict(os.environ)
    env.setdefault("PROF_B", "32")
    env.setdefault("PROF_N", "5")
    proc = subprocess.run(
        [sys.executable, str(ROOT / "benchmarks" / "profile_chain.py")],
        capture_output=True, text=True, timeout=3000, env=env,
    )
    sys.stderr.write(proc.stderr[-2000:])
    results: dict[str, float] = {}
    # "   -> stage ba: 0.55 ms/frame" and delta lines from the sub-groups
    for line in proc.stdout.splitlines():
        m = re.search(r"-> stage (\w+): ([0-9.]+) ms/frame", line)
        if m:
            results[f"step_{m.group(1)}_ms_per_frame"] = float(m.group(2))
        m = re.search(r"^\+?(\w+(?:/\w+)?): .*-> delta ([0-9.]+) ms/frame",
                      line)
        if m:
            key = m.group(1).replace("/", "_")
            results[f"sub_{key}_ms_per_frame"] = float(m.group(2))
    assert results, proc.stdout[-2000:]
    import jax

    out = {
        "metric": "chained_stage_latencies_ms_per_frame",
        "device": str(jax.devices()[0]),
        "batch": int(env["PROF_B"]),
        "results": results,
        "note": "chained-prefix protocol (benchmarks/profile_chain.py): "
                "stage cost = difference of adjacent chained prefixes with "
                "live tracking state, NOT standalone dispatch latencies — "
                "additive and sensitive to sub-ms regressions.",
    }
    dest = os.environ.get("MICROBENCH_OUT", str(ROOT / "MICROBENCH_r05.json"))
    Path(dest).write_text(json.dumps(out, indent=1) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
