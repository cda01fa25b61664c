"""Fuzz/robustness: hostile inputs through the full engine, parity kept."""

import numpy as np
import pytest

from pointcloud_segmentation_tpu.config import default_config, StaticShapes
from pointcloud_segmentation_tpu.runtime import SegmentationEngine
from pointcloud_segmentation_tpu import oracle

CFG = default_config(
    granularity=1,
    shapes=StaticShapes(max_raw_points=1024, max_points=512,
                        max_world_segments=16),
)


def random_hostile_frame(rng, n=400):
    """Clouds with NaN/Inf bursts, out-of-window points, duplicates."""
    pts = rng.uniform([-2, -3, -3], [3, 3, 3], size=(n, 3)).astype(np.float32)
    k = rng.integers(0, n // 4)
    pts[rng.choice(n, k, replace=False)] = np.nan
    if rng.random() < 0.5:
        pts[rng.choice(n, 3)] = np.inf
    if rng.random() < 0.5:
        dup = pts[rng.integers(0, n)]
        pts[rng.choice(n, n // 8)] = dup
    return pts


@pytest.mark.parametrize("backend", ["jax", "oracle"])
def test_engine_survives_hostile_stream(backend):
    rng = np.random.default_rng(42)
    eng = SegmentationEngine(CFG, backend=backend)
    for i in range(12):
        eng.push_pose(float(i), rng.normal(0, 0.5, 3), [1.0, 0, 0, 0])
        rec = eng.process_frame(float(i), random_hostile_frame(rng))
        assert rec is not None
        assert np.isfinite(rec["processing_time"])
    # world map stays finite and within capacity
    segs = eng.world_segments()
    assert len(segs) <= CFG.shapes.max_world_segments
    for s in segs:
        assert np.isfinite(s["a"]).all() and np.isfinite(s["b"]).all()
        assert np.isfinite([s["t_min"], s["t_max"]]).all()


def test_backends_agree_on_hostile_stream():
    """Segment counts/geometry stay in lockstep on nasty inputs."""
    rng = np.random.default_rng(7)
    frames = [random_hostile_frame(rng) for _ in range(8)]
    poses = [(float(i), rng.normal(0, 0.3, 3), np.array([1.0, 0, 0, 0]))
             for i in range(8)]

    engines = {b: SegmentationEngine(CFG, backend=b) for b in ("jax", "oracle")}
    for b, eng in engines.items():
        for (t, p, q), pts in zip(poses, frames):
            eng.push_pose(t, p, q)
            eng.process_frame(t, pts)

    sj = engines["jax"].world_segments()
    so = engines["oracle"].world_segments()
    assert len(sj) == len(so)
    for a, b in zip(sj, so):
        p1a = np.asarray(a["a"]) + a["t_min"] * np.asarray(a["b"])
        p1b = np.asarray(b["a"]) + b["t_min"] * np.asarray(b["b"])
        p2a = np.asarray(a["a"]) + a["t_max"] * np.asarray(a["b"])
        p2b = np.asarray(b["a"]) + b["t_max"] * np.asarray(b["b"])
        d = min(np.linalg.norm(p1a - p1b) + np.linalg.norm(p2a - p2b),
                np.linalg.norm(p1a - p2b) + np.linalg.norm(p2a - p1b))
        assert d < 5e-2


def test_world_capacity_overflow_drops_gracefully():
    """More distinct segments than capacity: extras dropped, no crash."""
    cfg = CFG.replace(shapes=StaticShapes(max_raw_points=1024, max_points=512,
                                          max_world_segments=4))
    rng = np.random.default_rng(3)
    eng = SegmentationEngine(cfg, backend="jax")
    for i in range(8):
        # a distinct parallel beam per frame, spaced far apart
        t = np.linspace(0, 1.4, 300)
        a = np.array([0.2, -1.2 + 0.35 * i, 0.8])
        pts = (a + t[:, None] * np.array([1.0, 0, 0])
               + rng.normal(0, 0.004, (300, 3))).astype(np.float32)
        eng.push_pose(float(i), np.zeros(3), [1.0, 0, 0, 0])
        eng.process_frame(float(i), pts)
    segs = eng.world_segments()
    assert len(segs) == 4  # capacity, not a crash


def test_frame_larger_than_capacity_truncates():
    rng = np.random.default_rng(5)
    eng = SegmentationEngine(CFG, backend="jax")
    eng.push_pose(0.0, np.zeros(3), [1.0, 0, 0, 0])
    big = rng.uniform([0, -1, -1], [1.4, 1, 1],
                      size=(CFG.shapes.max_raw_points * 3, 3)).astype(np.float32)
    rec = eng.process_frame(0.0, big)
    assert rec is not None


def test_lazy_package_exports():
    import pointcloud_segmentation_tpu as pkg

    assert pkg.SegmentationEngine is SegmentationEngine
    assert callable(pkg.make_process_frame)
    with pytest.raises(AttributeError):
        pkg.not_a_thing
