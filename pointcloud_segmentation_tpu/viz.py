"""Offline visualization — the RViz marker / analysis-plot analog.

The reference visualizes live in RViz (cylinder + text markers, intersection
spheres; node.cpp:676-842) and offline via the supervisor's matplotlib plots
(tests_structure.py:89-154).  This module renders the same content from the
engine's structured outputs, headless (Agg), so runs produce inspectable
artifacts without a sim in the loop.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np


def _plt():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def _draw_segment(ax, a, b, endpoints, color="b", linestyle="-", label=None):
    a = np.asarray(a, float)
    b = np.asarray(b, float)
    pts = [a + b * t for t in endpoints]
    xs, ys, zs = zip(*pts)
    ax.plot(xs, ys, zs, color=color, linestyle=linestyle, label=label)


def plot_world(segments: Sequence[dict], truth: Optional[Sequence[dict]] = None,
               matches: Optional[Sequence[tuple]] = None,
               intersections: Optional[Sequence[dict]] = None,
               out_path: Optional[str] = None):
    """3D overlay of extracted segments (dotted) vs ground truth (solid),
    matched pairs highlighted — tests_structure.py:89-131's figure."""
    plt = _plt()
    fig = plt.figure(figsize=(8, 6))
    ax = fig.add_subplot(111, projection="3d")

    if truth:
        for idx, seg in enumerate(truth):
            _draw_segment(ax, seg["a"], seg["b"], seg["endpoints"], color="b",
                          label="Ground truth" if idx == 0 else None)
    for idx, seg in enumerate(segments):
        e = seg.get("endpoints", [seg.get("t_min"), seg.get("t_max")])
        _draw_segment(ax, seg["a"], seg["b"], e, color="b", linestyle=":",
                      label="Extracted" if idx == 0 else None)
    if matches and truth:
        colors = ["g", "r", "c", "m", "y", "k"]
        for ci, (i, j, *_rest) in enumerate(matches):
            col = colors[ci % len(colors)]
            _draw_segment(ax, truth[i]["a"], truth[i]["b"], truth[i]["endpoints"],
                          color=col)
            sj = segments[j]
            e = sj.get("endpoints", [sj.get("t_min"), sj.get("t_max")])
            _draw_segment(ax, sj["a"], sj["b"], e, color=col, linestyle=":")
    if intersections:
        pts = np.array([p["position"] for p in intersections])
        ax.scatter(pts[:, 0], pts[:, 1], pts[:, 2], color="g", s=40,
                   label="Intersections")
    ax.set_xlabel("X axis [m]")
    ax.set_ylabel("Y axis [m]")
    ax.set_zlabel("Z axis [m]")
    ax.legend(loc="upper right")
    if out_path:
        fig.savefig(out_path, dpi=120)
    return fig


def plot_distance_vs_angle(matches: Sequence[tuple],
                           out_path: Optional[str] = None):
    """Error scatter (tests_structure.py:133-154)."""
    plt = _plt()
    fig = plt.figure(figsize=(8, 6))
    d = [m[2] for m in matches]
    a = [m[3] for m in matches]
    plt.scatter(d, a, color="red", label="Extracted Segments")
    for i, (x, y) in enumerate(zip(d, a)):
        plt.text(x, y, str(i + 1), fontsize=12)
    plt.xlabel("Distance Error [m]")
    plt.ylabel("Angle Error [rad]")
    plt.grid(True)
    plt.legend(loc="upper right")
    if out_path:
        fig.savefig(out_path, dpi=120)
    return fig


def plot_cloud_and_segments(points: np.ndarray, segments: Sequence[dict],
                            out_path: Optional[str] = None):
    """Debug view: a frame's (filtered) cloud + extracted segments —
    the filtered_pointcloud / hough_pointcloud topics' offline analog."""
    plt = _plt()
    fig = plt.figure(figsize=(8, 6))
    ax = fig.add_subplot(111, projection="3d")
    pts = np.asarray(points)
    pts = pts[np.isfinite(pts).all(axis=1)]
    if len(pts):
        ax.scatter(pts[:, 0], pts[:, 1], pts[:, 2], s=1, alpha=0.4)
    for seg in segments:
        e = seg.get("endpoints", [seg.get("t_min"), seg.get("t_max")])
        _draw_segment(ax, seg["a"], seg["b"], e, color="r")
    ax.set_xlabel("X [m]")
    ax.set_ylabel("Y [m]")
    ax.set_zlabel("Z [m]")
    if out_path:
        fig.savefig(out_path, dpi=120)
    return fig
