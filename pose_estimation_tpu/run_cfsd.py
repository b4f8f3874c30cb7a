"""CFSD entry — replay of `cluonRecordingsToLocal` outputs, optionally with
LIVE IMU over an OD4 session (the reference's car mode,
`cfsd-state-estimation.cpp:50-95`: cluon dataTrigger callbacks feeding
`collectImuData` while frames arrive on the main loop)."""

from __future__ import annotations

import argparse
import sys
import time


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--recording-dir", required=True,
                    help="output of tools/cluonRecordingsToLocal")
    ap.add_argument("--out", default="states.csv")
    ap.add_argument("--verbose", action="store_true")
    ap.add_argument("--live-imu", action="store_true",
                    help="ingest IMU from a live OD4 session (io/od4.py) "
                         "instead of the recording's imu.csv")
    ap.add_argument("--cid", type=int, default=253,
                    help="OD4 conference id (live mode)")
    ap.add_argument("--ellipse-id", type=int, default=112,
                    help="IMU sender stamp filter (live mode)")
    args = ap.parse_args(argv)

    from pose_estimation_tpu import load_config
    from pose_estimation_tpu.io.cfsd import CfsdRecording, run_cfsd
    from pose_estimation_tpu.slam import VisualInertialSLAM

    cfg = load_config(args.config, dataset="cfsd")
    rec = CfsdRecording(args.recording_dir)
    slam = VisualInertialSLAM(cfg, verbose=args.verbose)

    session = None
    if args.live_imu:
        from pose_estimation_tpu.io import od4 as od4_mod

        session = od4_mod.OD4Session(cid=args.cid)
        od4_mod.attach_imu(session, slam, ellipse_id=args.ellipse_id)
        rec.imu = []  # frames from the recording, IMU from the wire
        print(f"live IMU: OD4 cid={args.cid} ellipseID={args.ellipse_id}")

    t0 = time.time()
    try:
        n = run_cfsd(slam, rec)
    finally:
        if session is not None:
            session.stop()
    wall = time.time() - t0
    print(f"processed {n} frames in {wall:.1f}s ({n / wall:.1f} FPS)")
    slam.save_results(args.out)
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
