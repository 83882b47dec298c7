"""Trajectory + tracked-feature visualization (host-side, matplotlib).

The reference ships a Pangolin live viewer in its non-ROS app (SURVEY.md §2
"Non-ROS EuRoC toolkit": trajectory render + tracked-feature overlay). A
batch-oriented TPU pipeline has no live window; the equivalent artifact is a
PNG written after the run: top-down (x-y) and altitude (z-t) trajectory
panels against ground truth when available, plus per-frame health strips and
an optional tracked-feature overlay on a sample frame.
"""

from __future__ import annotations

import numpy as np


def plot_run(
    out_path: str,
    t: np.ndarray,  # (T,)
    p: np.ndarray,  # (T, 3) estimated positions
    gt_p: np.ndarray | None = None,  # (T, 3) ground truth (optional)
    stats: dict | None = None,  # per-frame health arrays (tracks, clones, ...)
    frame: np.ndarray | None = None,  # (H, W) sample grayscale frame
    frame_pts: np.ndarray | None = None,  # (F, 2) tracked px positions on it
    frame_valid: np.ndarray | None = None,  # (F,)
    title: str = "larvio_tpu run",
) -> str:
    """Render the run summary PNG. Returns ``out_path``."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    have_overlay = frame is not None
    n_rows = 2 + (1 if stats else 0)
    fig = plt.figure(figsize=(11, 3.2 * n_rows))
    gs = fig.add_gridspec(n_rows, 2)

    # --- top-down (x, y) -----------------------------------------------------
    ax = fig.add_subplot(gs[0, 0])
    ax.plot(p[:, 0], p[:, 1], "-", lw=1.2, color="#1f77b4", label="estimate")
    if gt_p is not None:
        ax.plot(gt_p[:, 0], gt_p[:, 1], "--", lw=1.0, color="#555555", label="ground truth")
    ax.plot(p[0, 0], p[0, 1], "o", color="green", ms=5, label="start")
    ax.set_xlabel("x [m]")
    ax.set_ylabel("y [m]")
    ax.set_title("top-down")
    ax.axis("equal")
    ax.legend(fontsize=8)

    # --- altitude ------------------------------------------------------------
    ax = fig.add_subplot(gs[0, 1])
    ax.plot(t, p[:, 2], "-", lw=1.2, color="#1f77b4")
    if gt_p is not None:
        ax.plot(t, gt_p[:, 2], "--", lw=1.0, color="#555555")
    ax.set_xlabel("t [s]")
    ax.set_ylabel("z [m]")
    ax.set_title("altitude")

    # --- error / overlay row -------------------------------------------------
    ax = fig.add_subplot(gs[1, 0])
    if gt_p is not None:
        err = np.linalg.norm(p - gt_p, axis=1)
        ax.plot(t, err, "-", lw=1.0, color="#d62728")
        ax.set_ylabel("|error| [m]")
        ax.set_title("position error vs ground truth")
    else:
        ax.plot(t, np.linalg.norm(p, axis=1), lw=1.0)
        ax.set_ylabel("|p| [m]")
        ax.set_title("distance from origin")
    ax.set_xlabel("t [s]")

    ax = fig.add_subplot(gs[1, 1])
    if have_overlay:
        ax.imshow(frame, cmap="gray", vmin=0, vmax=255)
        if frame_pts is not None:
            v = (
                np.asarray(frame_valid, bool)
                if frame_valid is not None
                else np.ones(len(frame_pts), bool)
            )
            ax.plot(frame_pts[v, 0], frame_pts[v, 1], "o", ms=3,
                    markerfacecolor="none", markeredgecolor="#2ca02c")
        ax.set_title(f"tracked features ({int(v.sum()) if frame_pts is not None else 0})")
        ax.axis("off")
    else:
        ax.axis("off")

    # --- health strip ----------------------------------------------------------
    if stats:
        ax = fig.add_subplot(gs[2, 0])
        for key, color in (("tracks", "#1f77b4"), ("clones", "#ff7f0e"),
                           ("updated", "#2ca02c")):
            if key in stats:
                ax.plot(t, stats[key], lw=0.9, label=key, color=color)
        ax.set_xlabel("t [s]")
        ax.legend(fontsize=8)
        ax.set_title("estimator health")
        ax = fig.add_subplot(gs[2, 1])
        for key, color in (("zupt", "#9467bd"), ("resets", "#d62728")):
            if key in stats:
                ax.plot(t, np.asarray(stats[key], int), lw=0.9, label=key, color=color)
        ax.set_xlabel("t [s]")
        ax.set_ylim(-0.1, 1.1)
        ax.legend(fontsize=8)
        ax.set_title("events")

    fig.suptitle(title)
    fig.tight_layout()
    fig.savefig(out_path, dpi=110)
    plt.close(fig)
    return out_path
