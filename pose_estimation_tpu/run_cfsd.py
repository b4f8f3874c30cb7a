"""CFSD recordings replay CLI — offline analog of cfsd-state-estimation."""

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
    args = ap.parse_args(argv)

    from pose_estimation_tpu import load_config
    from pose_estimation_tpu.io.cfsd import CfsdRecording, run_cfsd
    from pose_estimation_tpu.slam import VisualInertialSLAM

    cfg = load_config(args.config, dataset="cfsd")
    rec = CfsdRecording(args.recording_dir)
    slam = VisualInertialSLAM(cfg, verbose=args.verbose)

    t0 = time.time()
    n = run_cfsd(slam, rec)
    wall = time.time() - t0
    print(f"processed {n} frames in {wall:.1f}s ({n / wall:.1f} FPS)")
    slam.save_results(args.out)
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
