"""EuRoC replay CLI — the analog of the reference's euroc-state-estimation.

    python -m pose_estimation_tpu.run_euroc --config config/euroc.yml \
        [--dataset-dir /path/to/mav0] [--max-frames N] [--out states.csv]
"""

from __future__ import annotations

import argparse
import sys
import time


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--dataset-dir", default=None,
                    help="mav0 directory (default: `dataset` key in config)")
    ap.add_argument("--max-frames", type=int, default=None)
    ap.add_argument("--out", default="states.csv")
    ap.add_argument("--ate", action="store_true",
                    help="evaluate ATE RMSE against ground truth")
    ap.add_argument("--live-view", nargs="?", const=8642, type=int,
                    default=None, metavar="PORT",
                    help="serve the live raw-vs-optimized 3-D view on "
                         "http://localhost:PORT (also writes live_view.png)")
    ap.add_argument("--verbose", action="store_true")
    args = ap.parse_args(argv)

    from pose_estimation_tpu import load_config
    from pose_estimation_tpu.io.euroc import EurocDataset, run_euroc
    from pose_estimation_tpu.slam import VisualInertialSLAM

    cfg = load_config(args.config, dataset="euroc")
    root = args.dataset_dir or cfg.dataset_path
    ds = EurocDataset(root)
    slam = VisualInertialSLAM(cfg, verbose=args.verbose)
    viewer = None
    if args.live_view is not None:
        from pose_estimation_tpu.live_viewer import LiveViewer

        viewer = LiveViewer(port=args.live_view,
                            window_size=cfg.window_size).start()
        slam.set_viewer(viewer)
        print(f"live view: http://localhost:{viewer.port}/")

    t0 = time.time()
    n = run_euroc(slam, ds, speed_up=cfg.speed_up, max_frames=args.max_frames)
    wall = time.time() - t0
    print(f"processed {n} frames in {wall:.1f}s ({n / wall:.1f} FPS)")
    if viewer is not None:
        viewer.stop()

    slam.save_results(args.out)
    print(f"wrote {args.out}")

    if args.ate:
        from pose_estimation_tpu.io.ate import ate_rmse

        gt = ds.ground_truth()
        print(f"ATE RMSE: {ate_rmse(slam.trajectory, gt):.4f} m")
    return 0


if __name__ == "__main__":
    sys.exit(main())
