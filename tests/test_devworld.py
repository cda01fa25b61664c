"""Dev-world scenario: 9 beams r=0.1 + figure-eight flight + multi-radius.

The reference's development world `flying_arena_ros_obs.wbt` has 9 cylinder
obstacles of radius 0.1 m flown with a figure-eight trajectory
(launch/trajectory.launch:4, report §5.1).  These tests exercise that
scenario end-to-end, including the multi-radius `radius_sizes` list the
config documents (config_pc_seg/config.yaml:30-35) and the reference's
radius-gate quirk that makes multi-radius lists reject every candidate
snapping to a smaller radius (hough_3d_lines.h:298-307; report §6.3 lists
"single radius per run" as a known limitation).
"""

import numpy as np
import pytest

from pointcloud_segmentation_tpu.config import default_config, StaticShapes
from pointcloud_segmentation_tpu.runtime import SegmentationEngine
from pointcloud_segmentation_tpu.io.scene import (
    OBS_DEV_SCENE, figure_eight_waypoints, trajectory_poses, scene_truth)
from pointcloud_segmentation_tpu.io.simulator import simulate_trajectory, TofSpec
from pointcloud_segmentation_tpu.eval import match_report
from pointcloud_segmentation_tpu import oracle


def test_dev_scene_constants():
    assert len(OBS_DEV_SCENE) == 9
    for c in OBS_DEV_SCENE:
        assert c.radius == 0.1
        assert c.height == 2.0
        assert abs(np.linalg.norm(np.asarray(c.axis)) - 1.0) < 1e-9


def test_figure_eight_waypoints_shape():
    wps = figure_eight_waypoints(a=1.8, z=1.7, n=32)
    assert len(wps) == 32
    xs = np.array([w[0] for w in wps])
    ys = np.array([w[1] for w in wps])
    assert xs.max() <= 1.8 + 1e-9 and xs.min() >= -1.8 - 1e-9
    # a lemniscate crosses the origin twice per loop
    assert (np.hypot(xs, ys) < 0.3).sum() >= 2
    assert all(w[2] == 1.7 for w in wps)


@pytest.fixture(scope="module")
def dev_frames():
    poses = trajectory_poses(figure_eight_waypoints(a=1.8, z=1.7, n=32),
                             hz=1.0, velocity=0.5)
    return simulate_trajectory(OBS_DEV_SCENE, poses, TofSpec(noise_frac=0.002),
                               seed=0)


def test_devworld_recall_r01(dev_frames):
    """Figure-eight over the 9-beam r=0.1 dev world recovers most beams
    (dev-style parameters: single radius 0.1, relaxed pca gate — fat beams
    measure pca ~0.98, below the shipped 0.995 tuned for r=0.05)."""
    cfg = default_config(
        granularity=3, radius_sizes=(0.1,), min_pca_coeff=0.95,
        shapes=StaticShapes(max_raw_points=4096, max_points=2048,
                            max_world_segments=64))
    eng = SegmentationEngine(cfg, backend="jax")
    eng.run_replay(dev_frames)
    segs = eng.world_segments()
    rep = match_report(scene_truth(OBS_DEV_SCENE),
                       [dict(s, endpoints=[s["t_min"], s["t_max"]]) for s in segs])
    assert rep["n_truth_matched"] >= 6  # measured 7/9 at this budget
    assert all(s["radius"] == pytest.approx(0.1) for s in segs)


def test_multi_radius_list_rejects_smaller_radius(dev_frames):
    """radius_sizes=(0.05, 0.1) end to end: the reference's max_radius
    quirk (h:298-307) folds rs.max() into the acceptance bound, so any
    candidate snapping to the SMALLER radius fails `max_radius <= closest`
    — r=0.1 surface strips measure ~0.06, snap to 0.05, and are rejected.
    Both backends agree: the run maps nothing (report §6.3's "single
    radius per run" limitation, reproduced)."""
    cfg = default_config(
        granularity=3, radius_sizes=(0.05, 0.1), min_pca_coeff=0.95,
        shapes=StaticShapes(max_raw_points=4096, max_points=2048,
                            max_world_segments=64))
    eng = SegmentationEngine(cfg, backend="jax")
    eng.run_replay(dev_frames[:8])
    assert eng.world_segments() == []

    wm = oracle.WorldMap(cfg)
    for fr in dev_frames[:4]:
        oracle.process_frame(wm, fr.points, fr.position, fr.quat_wxyz, cfg)
    assert wm.segments == []
