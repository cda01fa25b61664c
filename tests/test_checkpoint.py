"""Checkpoint/resume: the world map survives engine restarts."""

import numpy as np
import pytest

from pointcloud_segmentation_tpu.config import default_config, StaticShapes
from pointcloud_segmentation_tpu.runtime import SegmentationEngine
from pointcloud_segmentation_tpu.io.scene import OBS_TESTS_SCENE, WP_TESTS, trajectory_poses
from pointcloud_segmentation_tpu.io.simulator import simulate_trajectory, TofSpec

CFG = default_config(
    granularity=2,
    shapes=StaticShapes(max_raw_points=4096, max_points=2048,
                        max_world_segments=32),
)


@pytest.fixture(scope="module")
def frames():
    poses = trajectory_poses(WP_TESTS, hz=1.0, velocity=0.4)[:8]
    return simulate_trajectory(OBS_TESTS_SCENE, poses, TofSpec(noise_frac=0.002),
                               seed=1)


@pytest.mark.parametrize("backend", ["jax", "oracle"])
def test_checkpoint_resume_equals_straight_run(tmp_path, frames, backend):
    ckpt = str(tmp_path / "state.npz")

    # straight run over all frames
    full = SegmentationEngine(CFG, backend=backend)
    full.run_replay(frames)

    # run half, checkpoint, resume in a fresh engine, run the rest
    e1 = SegmentationEngine(CFG, backend=backend)
    e1.run_replay(frames[:4])
    e1.save_checkpoint(ckpt)

    e2 = SegmentationEngine(CFG, backend=backend)
    e2.load_checkpoint(ckpt)
    assert e2.frames_processed == 4
    e2.run_replay(frames[4:])

    s_full = full.world_segments()
    s_res = e2.world_segments()
    assert len(s_full) == len(s_res)
    for a, b in zip(s_full, s_res):
        np.testing.assert_allclose(a["a"], b["a"], atol=1e-6)
        np.testing.assert_allclose(a["b"], b["b"], atol=1e-6)
        assert a["points_size"] == b["points_size"]
    assert full.intersections_rows() == e2.intersections_rows()
    assert len(e2.records) == len(frames)


def test_periodic_checkpoint(tmp_path, frames):
    ckpt = str(tmp_path / "auto.npz")
    eng = SegmentationEngine(CFG, backend="jax", checkpoint_every=3,
                             checkpoint_path=ckpt)
    eng.run_replay(frames[:6])
    e2 = SegmentationEngine(CFG, backend="jax")
    e2.load_checkpoint(ckpt)
    assert e2.frames_processed == 6


def test_backend_mismatch_rejected(tmp_path, frames):
    ckpt = str(tmp_path / "o.npz")
    e = SegmentationEngine(CFG, backend="oracle")
    e.run_replay(frames[:2])
    e.save_checkpoint(ckpt)
    ej = SegmentationEngine(CFG, backend="jax")
    with pytest.raises(ValueError):
        ej.load_checkpoint(ckpt)


def test_verbose_logging(frames, caplog):
    import logging

    with caplog.at_level(logging.INFO, logger="pointcloud_segmentation_tpu"):
        eng = SegmentationEngine(CFG.replace(verbose_level=2), backend="jax")
        eng.run_replay(frames[:2])
    text = caplog.text
    assert "Configuration" in text
    assert "Callback execution time" in text
    assert "Segment 0" in text
