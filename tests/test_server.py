"""TCP serving mode (runtime/server.py): frames in over a socket through
the production streaming path (latest-wins mailbox + consumer thread),
world-map queries + CSV flush out — the deployable analog of the
reference's ROS loop (node.cpp:64-67)."""

import os
import time

import numpy as np
import pytest

from pointcloud_segmentation_tpu.config import default_config, StaticShapes
from pointcloud_segmentation_tpu.io.scene import (
    OBS_TESTS_SCENE, WP_TESTS, trajectory_poses)
from pointcloud_segmentation_tpu.io.simulator import simulate_trajectory, TofSpec
from pointcloud_segmentation_tpu.runtime import (
    SegmentationClient, SegmentationEngine, SegmentationServer)

CFG = default_config(
    granularity=2,
    shapes=StaticShapes(max_raw_points=4096, max_points=2048,
                        max_world_segments=32),
)


def make_frames(n=8):
    poses = trajectory_poses(WP_TESTS, hz=1.5, velocity=0.3)[:n]
    return simulate_trajectory(OBS_TESTS_SCENE, poses,
                               TofSpec(noise_frac=0.002), seed=11)


@pytest.mark.parametrize("backend", ["jax", "oracle"])
def test_serve_stream_query_finalize(tmp_path, backend):
    eng = SegmentationEngine(CFG, backend=backend)
    srv = SegmentationServer(eng, outdir=str(tmp_path)).start()
    try:
        cli = SegmentationClient(srv.host, srv.port)
        frames = make_frames()
        for fr in frames:
            cli.send_frame(fr.t, fr.position, fr.quat_wxyz, fr.points)
            time.sleep(0.02)   # sensor pacing; keeps latest-wins drops low
        # drain: the consumer lags the socket; poll until it catches up
        deadline = time.monotonic() + 120.0
        while time.monotonic() < deadline:
            snap = cli.query()
            done = (snap["frames_processed"] + snap["frames_dropped"]
                    + snap["frames_skipped_no_pose"])
            if done >= len(frames):
                break
            time.sleep(0.1)
        assert snap["frames_processed"] >= 1
        assert len(snap["world_segments"]) >= 1
        for s in snap["world_segments"]:
            assert len(s["a"]) == 3 and len(s["b"]) == 3
            assert np.isfinite(s["a"]).all() and np.isfinite(s["b"]).all()
        out = cli.finalize()
        for key in ("segments", "intersections", "processing_time"):
            assert os.path.exists(out["outputs"][key])
        cli.close()
    finally:
        srv.stop()


def test_serve_survives_bad_client_then_serves_next(tmp_path):
    import socket

    eng = SegmentationEngine(CFG, backend="oracle")
    srv = SegmentationServer(eng, outdir=str(tmp_path)).start()
    try:
        # client 1 sends garbage: the connection dies, the server lives
        raw = socket.create_connection((srv.host, srv.port), timeout=5.0)
        raw.sendall(b"\xde\xad\xbe\xef" * 4)
        raw.close()
        time.sleep(0.2)
        # client 2 gets normal service
        cli = SegmentationClient(srv.host, srv.port)
        fr = make_frames(2)[0]
        cli.send_frame(fr.t, fr.position, fr.quat_wxyz, fr.points)
        snap = cli.query()
        assert "world_segments" in snap
        cli.close()
    finally:
        srv.stop()


def test_wire_roundtrip_matches_replay_record():
    """A PCSL log record IS a valid frame payload: pack/unpack preserves
    t/pose/points exactly."""
    from pointcloud_segmentation_tpu.runtime.server import (
        pack_frame, _unpack_frame, _HDR)

    fr = make_frames(1)[0]
    msg = pack_frame(fr.t, fr.position, fr.quat_wxyz, fr.points)
    t, pos, quat, pts = _unpack_frame(msg[_HDR.size:])
    assert t == fr.t
    np.testing.assert_array_equal(pos, fr.position)
    np.testing.assert_array_equal(quat, fr.quat_wxyz)
    np.testing.assert_array_equal(
        pts, np.asarray(fr.points, np.float32).reshape(-1, 3))


def test_finalize_drains_in_flight_frames(tmp_path):
    """'X' right after the last frame must not silently drop the tail:
    every submitted frame ends up processed, dropped, or skipped before
    the CSVs are written."""
    eng = SegmentationEngine(CFG, backend="oracle")
    srv = SegmentationServer(eng, outdir=str(tmp_path)).start()
    try:
        cli = SegmentationClient(srv.host, srv.port, timeout=120.0)
        frames = make_frames(4)
        for fr in frames:
            cli.send_frame(fr.t, fr.position, fr.quat_wxyz, fr.points)
        out = cli.finalize()          # no client-side drain on purpose
        total = (eng.frames_processed + eng.dropped_frames
                 + eng.frames_skipped_no_pose + eng.frames_failed)
        assert total >= len(frames)
        import csv

        with open(out["outputs"]["processing_time"]) as f:
            rows = list(csv.DictReader(f))
        assert len(rows) == eng.frames_processed >= 1
        cli.close()
    finally:
        srv.stop()


def test_idle_client_stays_connected(tmp_path):
    """A slow-polling monitor (idle > the 1 s socket tick) keeps its
    connection; idleness is not an error."""
    eng = SegmentationEngine(CFG, backend="oracle")
    srv = SegmentationServer(eng, outdir=str(tmp_path)).start()
    try:
        cli = SegmentationClient(srv.host, srv.port, timeout=30.0)
        assert "world_segments" in cli.query()
        time.sleep(2.5)               # > conn.settimeout(1.0)
        assert "world_segments" in cli.query()
        cli.close()
    finally:
        srv.stop()


def test_engine_restarts_after_stop(tmp_path):
    """stop() then a second streaming run works: the closed mailbox is
    replaced and the returned counts are per-run, not cumulative."""
    from pointcloud_segmentation_tpu.io.replay import save_frames

    log = str(tmp_path / "r.pcsl")
    frames = make_frames(5)
    save_frames(log, frames)
    eng = SegmentationEngine(CFG, backend="oracle")
    s1 = eng.run_streaming_from_log(log, rate_hz=0.0)
    s2 = eng.run_streaming_from_log(log, rate_hz=0.0)
    for s in (s1, s2):
        assert s["fed"] == len(frames)
        assert s["processed"] + s["dropped"] <= len(frames)
        assert s["processed"] >= 1
    assert eng.frames_processed == s1["processed"] + s2["processed"]


def test_server_caps_hostile_message_length(tmp_path):
    """A malformed/hostile u32 length header (e.g. cat-ing a file at the
    socket) must drop that connection, not buffer toward 4 GiB."""
    import socket
    import struct

    eng = SegmentationEngine(CFG, backend="oracle")
    srv = SegmentationServer(eng, outdir=str(tmp_path)).start()
    try:
        assert srv._max_msg < 0xFFFFFFFF
        raw = socket.create_connection((srv.host, srv.port), timeout=5.0)
        raw.sendall(struct.pack("<BI", ord("F"), 0xFFFFFFFF))
        raw.sendall(b"x" * 4096)            # never gets buffered to 4 GiB
        time.sleep(0.3)
        raw.close()
        # the server survives and serves the next client
        cli = SegmentationClient(srv.host, srv.port)
        fr = make_frames(2)[0]
        cli.send_frame(fr.t, fr.position, fr.quat_wxyz, fr.points)
        out = cli.finalize()
        assert out["drained"] is True        # clean drain reported
        cli.close()
    finally:
        srv.stop()
