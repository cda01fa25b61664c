"""Golden-file regression: a committed fixture pins the end-to-end outputs.

The fixture (tests/fixtures/golden_segments.csv) was produced by the numpy
oracle on a deterministic simulated replay; both backends must keep
reproducing it within tight tolerances (BASELINE.md's golden-test plan).
Regenerate deliberately with:  python tests/test_golden.py regen
"""

import os
import sys

import numpy as np
import pytest

from pointcloud_segmentation_tpu.config import default_config, StaticShapes
from pointcloud_segmentation_tpu.runtime import SegmentationEngine
from pointcloud_segmentation_tpu.runtime.csvio import read_segments_csv, write_segments_csv
from pointcloud_segmentation_tpu.io.scene import OBS_TESTS_SCENE, WP_TESTS, trajectory_poses
from pointcloud_segmentation_tpu.io.simulator import simulate_trajectory, TofSpec

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "golden_segments.csv")

CFG = default_config(
    granularity=2,
    shapes=StaticShapes(max_raw_points=4096, max_points=2048,
                        max_world_segments=32),
)


def golden_frames():
    poses = trajectory_poses(WP_TESTS, hz=1.0, velocity=0.4)[:6]
    return simulate_trajectory(OBS_TESTS_SCENE, poses,
                               TofSpec(noise_frac=0.001), seed=7)


def run(backend):
    eng = SegmentationEngine(CFG, backend=backend)
    eng.run_replay(golden_frames())
    return eng.world_segments()


def segments_match(segs, golden, atol_pt):
    assert len(segs) == len(golden), (
        f"{len(segs)} segments vs golden {len(golden)}")
    for k, (s, g) in enumerate(zip(segs, golden)):
        p1 = np.asarray(s["a"]) + s["t_min"] * np.asarray(s["b"])
        p2 = np.asarray(s["a"]) + s["t_max"] * np.asarray(s["b"])
        g1 = np.asarray(g["a"]) + g["endpoints"][0] * np.asarray(g["b"])
        g2 = np.asarray(g["a"]) + g["endpoints"][1] * np.asarray(g["b"])
        d = min(np.linalg.norm(p1 - g1) + np.linalg.norm(p2 - g2),
                np.linalg.norm(p1 - g2) + np.linalg.norm(p2 - g1))
        assert d < atol_pt, f"segment {k} endpoints differ by {d}"


def test_fixture_exists():
    assert os.path.exists(FIXTURE), "run `python tests/test_golden.py regen`"


def test_oracle_reproduces_golden():
    golden = read_segments_csv(FIXTURE)
    segments_match(run("oracle"), golden, atol_pt=1e-4)


def test_jax_reproduces_golden():
    golden = read_segments_csv(FIXTURE)
    # float32 device path vs float64 oracle: a few mm over metre-scale spans
    segments_match(run("jax"), golden, atol_pt=2e-2)


# ---- second fixture: the SHIPPED configuration (granularity 6 — the
# reference's config_pc_seg/config.yaml:22), which resolves voting to the
# LAZY accumulator-free path; the g2 fixture above only ever exercises
# "carry".  Small sensor + frame budget keep the 20,481-direction oracle
# and CPU-jit runs tractable in CI.

FIXTURE_G6 = os.path.join(os.path.dirname(__file__), "fixtures",
                          "golden_segments_g6.csv")

CFG_G6 = default_config(
    granularity=6,
    shapes=StaticShapes(max_raw_points=2048, max_points=1024,
                        max_world_segments=32),
)
assert CFG_G6.voting_mode == "lazy"


def golden_frames_g6():
    poses = trajectory_poses(WP_TESTS, hz=1.0, velocity=0.4)[:4]
    return simulate_trajectory(OBS_TESTS_SCENE, poses,
                               TofSpec(width=32, height=32,
                                       noise_frac=0.001), seed=7)


def run_g6(backend):
    eng = SegmentationEngine(CFG_G6, backend=backend)
    eng.run_replay(golden_frames_g6())
    return eng.world_segments()


def test_g6_fixture_exists():
    assert os.path.exists(FIXTURE_G6), "run `python tests/test_golden.py regen`"


def test_oracle_reproduces_golden_g6():
    golden = read_segments_csv(FIXTURE_G6)
    assert len(golden) >= 3
    segments_match(run_g6("oracle"), golden, atol_pt=1e-4)


def test_jax_reproduces_golden_g6():
    """f32 device path at the shipped config — through the lazy voting
    state + tiered suspect re-exam (ops/hough.py)."""
    golden = read_segments_csv(FIXTURE_G6)
    segments_match(run_g6("jax"), golden, atol_pt=2e-2)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "regen":
        os.makedirs(os.path.dirname(FIXTURE), exist_ok=True)
        segs = run("oracle")
        write_segments_csv(FIXTURE, segs)
        print(f"wrote {len(segs)} segments -> {FIXTURE}")
        segs6 = run_g6("oracle")
        write_segments_csv(FIXTURE_G6, segs6)
        print(f"wrote {len(segs6)} segments -> {FIXTURE_G6}")


INTER_FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                             "golden_intersections.csv")


def run_intersections(backend):
    eng_cls = SegmentationEngine
    eng = eng_cls(CFG, backend=backend)
    eng.run_replay(golden_frames())
    return eng.intersections_rows()


def test_intersections_fixture_exists():
    assert os.path.exists(INTER_FIXTURE)


def test_oracle_reproduces_golden_intersections():
    rows = run_intersections("oracle")
    with open(INTER_FIXTURE) as f:
        header = f.readline().strip()
        assert header == "seg1,t1,seg2,t2"
        golden = [ln.strip().split(",") for ln in f if ln.strip()]
    assert len(rows) == len(golden)
    for (i, t1, j, t2), g in zip(rows, golden):
        assert i == int(g[0]) and j == int(g[2])
        assert abs(t1 - float(g[1])) < 1e-4
        assert abs(t2 - float(g[3])) < 1e-4


def test_jax_matches_golden_intersection_topology():
    rows = run_intersections("jax")
    with open(INTER_FIXTURE) as f:
        f.readline()
        golden = [ln.strip().split(",") for ln in f if ln.strip()]
    assert {(r[0], r[2]) for r in rows} == {(int(g[0]), int(g[2])) for g in golden}
    # t-parameters within float32-pipeline tolerance
    gmap = {(int(g[0]), int(g[2])): (float(g[1]), float(g[3])) for g in golden}
    for (i, t1, j, t2) in rows:
        g1, g2 = gmap[(i, j)]
        assert abs(t1 - g1) < 5e-2 and abs(t2 - g2) < 5e-2
