"""Live viz following (the RViz live-view analog) + hough_pointcloud
world-accumulated semantics.

The reference is watched live in RViz while the node maps
(node.cpp:676-842, rviz/drone_pc.rviz); `pcs-tpu viz --follow` serves the
HTML player plus a /stream endpoint that tails the growing viz JSONL.
node.cpp:823-829 republishes ALL world segments' accumulated inlier points
every frame; the engine reproduces that with
viz_points + collect_inlier_points.
"""

import json
import os
import urllib.request

import numpy as np

from pointcloud_segmentation_tpu.config import default_config, StaticShapes
from pointcloud_segmentation_tpu.runtime import SegmentationEngine
from pointcloud_segmentation_tpu.viz import VizStreamServer
from pointcloud_segmentation_tpu.io.scene import (
    OBS_TESTS_SCENE, WP_TESTS, trajectory_poses)
from pointcloud_segmentation_tpu.io.simulator import simulate_trajectory, TofSpec

CFG = default_config(
    granularity=2,
    shapes=StaticShapes(max_raw_points=4096, max_points=2048,
                        max_world_segments=32),
)


def _get(url):
    with urllib.request.urlopen(url, timeout=10) as r:
        return r.read()


def test_viz_server_follows_growing_stream(tmp_path):
    """One full refresh cycle: player served, initial frames fetched, the
    producer appends a frame, the incremental poll returns ONLY the new
    frame — live following of a growing stream."""
    path = str(tmp_path / "viz.jsonl")
    recs = [{"frame": i + 1, "t": 0.1 * i, "nlines": 1, "status": 0,
             "world_count": i + 1, "cylinders": [], "intersections": []}
            for i in range(3)]
    with open(path, "w") as f:
        for r in recs[:2]:
            f.write(json.dumps(r) + "\n")

    srv = VizStreamServer(path)
    srv.start_background()
    try:
        page = _get(srv.url).decode()
        assert "FRAMES" in page and "/stream?from=" in page  # live player
        got = json.loads(_get(srv.url + "stream?from=0"))
        assert [g["frame"] for g in got] == [1, 2]
        # producer appends while the server is live (one refresh cycle)
        with open(path, "a") as f:
            f.write(json.dumps(recs[2]) + "\n")
        new = json.loads(_get(srv.url + "stream?from=2"))
        assert [g["frame"] for g in new] == [3]
        # an incremental poll past the end returns nothing
        assert json.loads(_get(srv.url + "stream?from=3")) == []
    finally:
        srv.shutdown()


def test_viz_server_tolerates_missing_and_torn_file(tmp_path):
    path = str(tmp_path / "notyet.jsonl")
    srv = VizStreamServer(path)
    srv.start_background()
    try:
        assert json.loads(_get(srv.url + "stream?from=0")) == []
        # torn tail line (producer mid-write) is skipped, not fatal
        with open(path, "w") as f:
            f.write(json.dumps({"frame": 1, "cylinders": [],
                                "intersections": []}) + "\n")
            f.write('{"frame": 2, "cyl')
        got = json.loads(_get(srv.url + "stream?from=0"))
        assert [g["frame"] for g in got] == [1]
    finally:
        srv.shutdown()


def test_serve_session_watched_live(tmp_path):
    """The full live-RViz-loop analog: a serve session writes the viz
    stream while a follower server tails it — a watcher sees the world
    grow DURING the session (node.cpp:676-842's live loop, end to end)."""
    import time

    from pointcloud_segmentation_tpu.runtime.server import (
        SegmentationServer, SegmentationClient)

    path = str(tmp_path / "serve_viz.jsonl")
    eng = SegmentationEngine(CFG, backend="oracle", viz_stream=path)
    srv = SegmentationServer(eng, outdir=str(tmp_path)).start()
    watcher = VizStreamServer(path)
    watcher.start_background()
    try:
        cli = SegmentationClient(srv.host, srv.port)
        poses = trajectory_poses(WP_TESTS, hz=1.0, velocity=0.4)[:2]
        frames = simulate_trajectory(OBS_TESTS_SCENE, poses,
                                     TofSpec(noise_frac=0.002), seed=1)
        for fr in frames:
            want = int(eng.frames_processed) + 1
            cli.send_frame(fr.t, fr.position, fr.quat_wxyz, fr.points)
            deadline = time.time() + 60.0
            while eng.frames_processed < want and time.time() < deadline:
                time.sleep(0.02)
        # the watcher sees the session's frames while it is still live
        got = json.loads(_get(watcher.url + "stream?from=0"))
        assert [g["frame"] for g in got] == [1, 2]
        assert got[-1]["world_count"] >= got[0]["world_count"]
        cli.finalize()
        cli.close()
    finally:
        watcher.shutdown()
        srv.stop()


def test_viz_world_accumulated_hough_points():
    """With collect_inlier_points + viz_points, each viz record's
    hough_points carries the ACCUMULATED world inliers (node.cpp:823-829),
    so later frames' clouds are supersets in size of earlier ones."""
    poses = trajectory_poses(WP_TESTS, hz=1.0, velocity=0.4)[:3]
    frames = simulate_trajectory(OBS_TESTS_SCENE, poses,
                                 TofSpec(noise_frac=0.002), seed=1)
    got = []
    eng = SegmentationEngine(CFG, backend="jax", viz_stream=got.append,
                             viz_points=True, collect_inlier_points=True)
    eng.run_replay(frames)
    assert len(got) == 3
    assert all(r.get("hough_points_world_accumulated") for r in got)
    sizes = [len(r["hough_points"]) for r in got]
    # accumulated: monotone non-decreasing (an empty world republishes an
    # empty cloud), with real points once segments exist
    assert sizes == sorted(sizes)
    assert sizes[-1] > 0
    # the cap is enforced
    assert all(s <= 4096 for s in sizes)
