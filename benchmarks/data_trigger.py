"""IMU arrival-rate check — the analog of `benchmark/dataTrigger`
(`/root/reference/benchmark/dataTrigger/dataTrigger.cpp:6-54`), which prints
gyro inter-arrival microseconds from a live OD4 session.

Two modes:
  live    listen on an OD4 session (our wire-compatible `io.od4` adapter)
          and report wall-clock inter-arrival stats of AngularVelocityReading
          envelopes, filtered by ellipseID like the reference;
  replay  derive inter-arrival stats from recorded timestamps (EuRoC
          `imu0/data.csv` or a cfsd `imgTimestamp.txt`), i.e. the sample-clock
          arrival process the live path would see.

Usage:
  python benchmarks/data_trigger.py replay <imu.csv> [--limit N]
  python benchmarks/data_trigger.py live [--cid 253] [--ellipse-id 112] [--seconds 10]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def report(deltas_us: np.ndarray, label: str):
    if len(deltas_us) == 0:
        print(f"{label}: no arrivals")
        return
    print(
        f"{label}: n={len(deltas_us)} "
        f"mean={deltas_us.mean():.1f}us median={np.median(deltas_us):.1f}us "
        f"p99={np.percentile(deltas_us, 99):.1f}us max={deltas_us.max():.1f}us "
        f"rate={1e6 / max(deltas_us.mean(), 1e-9):.1f}Hz"
    )


def replay(path: str, limit: int | None):
    ts = []
    with open(path) as f:
        for line in f:
            if line.startswith("#") or not line.strip():
                continue
            tok = line.split(",")[0].strip()
            try:
                ts.append(int(tok))
            except ValueError:
                continue
            if limit and len(ts) >= limit:
                break
    ts_arr = np.asarray(ts, np.int64)
    unit = 1e-3 if ts_arr.max() > 1e15 else 1.0  # ns vs us timestamps
    report(np.diff(ts_arr) * unit, f"replay {path}")


def live(cid: int, ellipse_id: int, seconds: float):
    from pose_estimation_tpu.io import od4 as od4_mod

    arrivals: list[float] = []

    def on_gyr(env):
        if env.sender_stamp == ellipse_id:
            arrivals.append(time.monotonic())

    session = od4_mod.OD4Session(cid=cid)
    session.data_trigger(od4_mod.ANGULAR_VELOCITY_READING, on_gyr)
    print(f"listening on 225.0.0.{cid}:12175 for {seconds}s ...")
    try:
        time.sleep(seconds)
    finally:
        session.stop()
    report(np.diff(np.asarray(arrivals)) * 1e6, f"live cid={cid}")


def main(argv=None):
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="mode", required=True)
    rp = sub.add_parser("replay")
    rp.add_argument("path")
    rp.add_argument("--limit", type=int, default=None)
    lv = sub.add_parser("live")
    lv.add_argument("--cid", type=int, default=253)
    lv.add_argument("--ellipse-id", type=int, default=112)
    lv.add_argument("--seconds", type=float, default=10.0)
    args = ap.parse_args(argv)
    if args.mode == "replay":
        replay(args.path, args.limit)
    else:
        live(args.cid, args.ellipse_id, args.seconds)


if __name__ == "__main__":
    sys.exit(main())
