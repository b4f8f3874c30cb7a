"""Offline trajectory / landmark visualization.

Replacement for the reference's Pangolin viewer thread
(`/root/reference/src/viewer.cpp` — raw vs optimized trajectories, pose
frustum, landmark cloud): the core stays GL-free (SURVEY.md section 2.1);
plots are rendered offline from `states.csv` / in-memory arrays with
matplotlib when available.
"""

from __future__ import annotations

import csv

import numpy as np


def load_states_csv(path: str) -> dict:
    """Parse a states.csv written by `VisualInertialSLAM.save_results`."""
    with open(path) as f:
        reader = csv.reader(f)
        header = next(reader)
        rows = np.array([[float(v) for v in r] for r in reader])
    cols = {name: i for i, name in enumerate(header)}
    return {
        "ts": rows[:, cols["timestamp"]],
        "q": rows[:, cols["qw"] : cols["qz"] + 1],
        "p": rows[:, cols["px"] : cols["pz"] + 1],
        "v": rows[:, cols["vx"] : cols["vz"] + 1],
        "bg": rows[:, cols["bgx"] : cols["bgz"] + 1],
        "ba": rows[:, cols["bax"] : cols["baz"] + 1],
    }


def plot_trajectory(
    est: np.ndarray,
    gt: np.ndarray | None = None,
    landmarks: np.ndarray | None = None,
    out_path: str = "trajectory.png",
    title: str = "trajectory",
):
    """est/gt: [N, 4] (ts, x, y, z); landmarks: [L, 3]. Writes a 2-panel
    figure (top-down + altitude profile)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(12, 5))
    ax1.plot(est[:, 2], est[:, 3], "-", label="estimate", lw=1.5)
    if gt is not None and len(gt):
        ax1.plot(gt[:, 2], gt[:, 3], "--", label="ground truth", lw=1.0)
    if landmarks is not None and len(landmarks):
        ax1.scatter(landmarks[:, 1], landmarks[:, 2], s=2, alpha=0.3,
                    label="landmarks")
    ax1.set_xlabel("y [m]")
    ax1.set_ylabel("z [m]")
    ax1.set_title(title)
    ax1.axis("equal")
    ax1.legend()

    t0 = est[0, 0]
    ax2.plot((est[:, 0] - t0) / 1e9, est[:, 1], label="x (est)")
    if gt is not None and len(gt):
        ax2.plot((gt[:, 0] - t0) / 1e9, gt[:, 1], "--", label="x (gt)")
    ax2.set_xlabel("t [s]")
    ax2.set_ylabel("x [m]")
    ax2.legend()

    fig.tight_layout()
    fig.savefig(out_path, dpi=110)
    plt.close(fig)
    return out_path


def plot_states(states: dict, out_path: str = "states.png"):
    """Velocity and bias time series from a parsed states.csv."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    t = (states["ts"] - states["ts"][0]) / 1e9
    fig, axes = plt.subplots(3, 1, figsize=(10, 9), sharex=True)
    for i, lbl in enumerate("xyz"):
        axes[0].plot(t, states["v"][:, i], label=f"v{lbl}")
        axes[1].plot(t, states["bg"][:, i], label=f"bg{lbl}")
        axes[2].plot(t, states["ba"][:, i], label=f"ba{lbl}")
    axes[0].set_ylabel("velocity [m/s]")
    axes[1].set_ylabel("gyro bias [rad/s]")
    axes[2].set_ylabel("accel bias [m/s^2]")
    axes[2].set_xlabel("t [s]")
    for ax in axes:
        ax.legend(ncol=3, fontsize=8)
    fig.tight_layout()
    fig.savefig(out_path, dpi=110)
    plt.close(fig)
    return out_path
