"""BEV visualization — counterpart of the reference's
mmdet3d/core/visualizer (show_result / open3d dumps; here matplotlib BEV
PNGs, the form that works headless on a TPU VM)."""

from __future__ import annotations

import numpy as np


def _bev_corners_np(boxes):
    w = boxes[:, 3][:, None]
    l = boxes[:, 4][:, None]
    yaw = boxes[:, 6]
    base = np.stack([
        np.stack([w / 2, l / 2], -1), np.stack([w / 2, -l / 2], -1),
        np.stack([-w / 2, -l / 2], -1), np.stack([-w / 2, l / 2], -1),
    ], 1)[:, :, 0, :]
    c, s = np.cos(yaw), np.sin(yaw)
    x = base[..., 0] * c[:, None] + base[..., 1] * s[:, None]
    y = -base[..., 0] * s[:, None] + base[..., 1] * c[:, None]
    return np.stack([x + boxes[:, 0][:, None], y + boxes[:, 1][:, None]], -1)


def show_bev(points=None, gt_boxes=None, pred_boxes=None, pred_scores=None,
             out_file: str = "bev.png", pc_range: float = 80.0,
             max_points: int = 120000):
    """Scatter the cloud + draw gt (green) and predicted (red) boxes."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(12, 12))
    if points is not None:
        pts = np.asarray(points)
        if len(pts) > max_points:
            pts = pts[np.random.RandomState(0).choice(len(pts), max_points,
                                                      False)]
        ax.scatter(pts[:, 0], pts[:, 1], s=0.05, c="gray", alpha=0.5)
    for boxes, color in ((gt_boxes, "lime"), (pred_boxes, "red")):
        if boxes is None or not len(boxes):
            continue
        corners = _bev_corners_np(np.asarray(boxes))
        for i, quad in enumerate(corners):
            ax.plot(*np.vstack([quad, quad[:1]]).T, color=color, linewidth=0.8)
            if color == "red" and pred_scores is not None:
                ax.text(quad[0, 0], quad[0, 1], f"{float(pred_scores[i]):.2f}",
                        color=color, fontsize=5)
    ax.set_xlim(-pc_range, pc_range)
    ax.set_ylim(-pc_range, pc_range)
    ax.set_aspect("equal")
    fig.savefig(out_file, dpi=150, bbox_inches="tight")
    plt.close(fig)
    return out_file
