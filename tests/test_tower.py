"""Tower-structure mapping scenario (the wp_tower whole-structure flight)."""

import numpy as np
import pytest

from pointcloud_segmentation_tpu.config import default_config, StaticShapes
from pointcloud_segmentation_tpu.runtime import SegmentationEngine
from pointcloud_segmentation_tpu.io.scene import (
    tower_scene, spiral_waypoints, trajectory_poses, scene_truth)
from pointcloud_segmentation_tpu.io.simulator import simulate_trajectory, TofSpec
from pointcloud_segmentation_tpu.eval import match_report


def test_tower_scene_layout():
    scene = tower_scene(levels=3, width=1.0, level_height=0.8)
    assert len(scene) == 4 + 3 * 4
    # posts are vertical and span the full height
    posts = [c for c in scene if abs(c.axis[2]) > 0.99]
    assert len(posts) == 4
    assert posts[0].height == pytest.approx(2.4)
    # beams intersect posts: every level beam endpoint touches a post axis
    beams = [c for c in scene if abs(c.axis[2]) < 0.01]
    assert len(beams) == 12


def test_spiral_waypoints_schema():
    wps = spiral_waypoints(radius=2.0, n=20)
    assert len(wps) == 20
    assert all(len(w) == 5 for w in wps)
    z = [w[2] for w in wps]
    assert z == sorted(z)
    # yaw faces the center
    x, y, _, yaw, _ = wps[0]
    assert abs(((np.arctan2(-y, -x) - yaw + np.pi) % (2 * np.pi)) - np.pi) < 1e-9


def test_tower_mapping_recall():
    """Whole-structure recall gate on a properly-scaled flight.

    Scenario scaling diagnosed in round 2: the orbit radius must keep the
    tower's near face inside the 1.5 m forward crop window (1.2 m works;
    1.8 m pushed everything to the crop boundary -> 2/12), and the pca gate
    must use the report's benchmark value 0.99 (report §5.2 p.29 — the
    shipped config's 0.995 rejects oblique beam views measuring 0.99-0.995
    and caps recall at ~9/12).  Full budget (g4, 235 frames) maps 12/12."""
    scene = tower_scene(levels=2, width=1.0)
    poses = trajectory_poses(
        spiral_waypoints(radius=1.2, z0=0.4, z1=2.2, turns=2.0, n=32),
        hz=2.0, velocity=0.4)
    frames = simulate_trajectory(scene, poses, TofSpec(noise_frac=0.002), seed=0)
    cfg = default_config(
        granularity=3, min_pca_coeff=0.99,
        shapes=StaticShapes(max_raw_points=4096, max_points=2048,
                            max_world_segments=64))
    eng = SegmentationEngine(cfg, backend="jax")
    eng.run_replay(frames)
    segs = eng.world_segments()
    rep = match_report(scene_truth(scene),
                       [dict(s, endpoints=[s["t_min"], s["t_max"]]) for s in segs])
    assert rep["n_truth_matched"] >= 10  # measured 10/12 at this budget
    assert len(eng.intersections_rows()) >= 4
