"""KITTI replay CLI — analog of the reference's kitti-state-estimation."""

from __future__ import annotations

import argparse
import sys
import time


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--dataset-dir", default=None)
    ap.add_argument("--max-num-imu", type=int, default=None)
    ap.add_argument("--max-num-image", type=int, default=None)
    ap.add_argument("--out", default="states.csv")
    ap.add_argument("--live-view", nargs="?", const=8642, type=int,
                    default=None, metavar="PORT",
                    help="serve the live raw-vs-optimized 3-D view on "
                         "http://localhost:PORT")
    ap.add_argument("--verbose", action="store_true")
    args = ap.parse_args(argv)

    from pose_estimation_tpu import load_config
    from pose_estimation_tpu.io.kitti import KittiDataset, run_kitti
    from pose_estimation_tpu.slam import VisualInertialSLAM
    from pose_estimation_tpu.utils.config import _parse_opencv_yaml

    cfg = load_config(args.config, dataset="kitti")
    raw = _parse_opencv_yaml(args.config)
    max_imu = args.max_num_imu or int(raw.get("maxNumImu", 10**9))
    max_img = args.max_num_image or int(raw.get("maxNumImage", 10**9))
    rate = cfg.sampling_rate // cfg.camera_frequency

    ds = KittiDataset(args.dataset_dir or cfg.dataset_path)
    slam = VisualInertialSLAM(cfg, verbose=args.verbose)
    if args.live_view is not None:
        from pose_estimation_tpu.live_viewer import LiveViewer

        viewer = LiveViewer(port=args.live_view,
                            window_size=cfg.window_size).start()
        slam.set_viewer(viewer)
        print(f"live view: http://localhost:{viewer.port}/")

    t0 = time.time()
    n = run_kitti(slam, ds, max_imu, max_img, rate)
    wall = time.time() - t0
    print(f"processed {n} frames in {wall:.1f}s ({n / wall:.1f} FPS)")
    slam.save_results(args.out)
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
