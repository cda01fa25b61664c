"""Mockup-world scenario: four-sided vertical scan of a tall scaffold.

The reference's `flying_arena_ros_mockup.wbt` flies `wp_mockup.csv` (16
waypoints, four vertical scan strips around a structure) over an STL mesh
that is a missing large blob in the snapshot (.MISSING_LARGE_BLOBS:1-3).
The flight pattern is transcribed (WP_MOCKUP); the structure is an original
scaffold stand-in sized to the scan pattern (io/scene.py mockup_scene).
"""

import numpy as np

from pointcloud_segmentation_tpu.config import default_config, StaticShapes
from pointcloud_segmentation_tpu.runtime import SegmentationEngine
from pointcloud_segmentation_tpu.io.scene import (
    mockup_scene, WP_MOCKUP, trajectory_poses, scene_truth)
from pointcloud_segmentation_tpu.io.simulator import simulate_trajectory, TofSpec
from pointcloud_segmentation_tpu.eval import match_report


def test_mockup_scene_layout():
    scene = mockup_scene()
    assert len(scene) == 20            # 4 posts + 12 cross beams + 4 braces
    posts = [c for c in scene if abs(c.axis[2]) > 0.99]
    braces = [c for c in scene if 0.5 < abs(c.axis[2]) < 0.9]
    assert len(posts) == 4 and len(braces) == 4
    assert all(c.radius == 0.05 for c in scene)


def test_wp_mockup_schema():
    assert len(WP_MOCKUP) == 16
    assert all(len(w) == 5 for w in WP_MOCKUP)
    # four scan strips, one per side, each climbing to z=4
    assert max(w[2] for w in WP_MOCKUP) == 4.0
    yaws = sorted(set(w[3] for w in WP_MOCKUP))
    assert yaws == [-1.57, 0.0, 1.57, 3.14]


def test_mockup_mapping_recall():
    """Full scan maps the whole scaffold — all 20 beams including the
    diagonal braces (measured 20/20 with 24+ intersections)."""
    scene = mockup_scene()
    poses = trajectory_poses(WP_MOCKUP, hz=1.0, velocity=0.6)
    frames = simulate_trajectory(scene, poses, TofSpec(noise_frac=0.002),
                                 seed=0)
    cfg = default_config(
        granularity=3, min_pca_coeff=0.99,
        shapes=StaticShapes(max_raw_points=4096, max_points=2048,
                            max_world_segments=64))
    eng = SegmentationEngine(cfg, backend="jax")
    eng.run_replay(frames)
    segs = eng.world_segments()
    rep = match_report(scene_truth(scene),
                       [dict(s, endpoints=[s["t_min"], s["t_max"]]) for s in segs])
    assert rep["n_truth_matched"] >= 18
    assert len(eng.intersections_rows()) >= 15
