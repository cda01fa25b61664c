"""Offline ROS1 bag ingestion (io/rosbag.py): the reference's recorded
real-data format (`rosbag record` of /tof_pc PointCloud2 + the mavros pose
topic, node.cpp:64-67) read without a ROS installation, through the same
TF2-analog pose association the live runtime uses."""

import struct

import numpy as np
import pytest

from pointcloud_segmentation_tpu.config import default_config, StaticShapes
from pointcloud_segmentation_tpu.io import rosbag
from pointcloud_segmentation_tpu.io.scene import (
    OBS_TESTS_SCENE, WP_TESTS, trajectory_poses)
from pointcloud_segmentation_tpu.io.simulator import simulate_trajectory, TofSpec

CFG = default_config(
    granularity=2,
    shapes=StaticShapes(max_raw_points=4096, max_points=2048,
                        max_world_segments=32),
)


def _sim_frames(n=3):
    poses = trajectory_poses(WP_TESTS, hz=1.0, velocity=0.4)[:n]
    return simulate_trajectory(OBS_TESTS_SCENE, poses,
                               TofSpec(noise_frac=0.002), seed=1)


@pytest.mark.parametrize("compression", ["none", "bz2"])
def test_bag_roundtrip(tmp_path, compression):
    frames = _sim_frames(3)
    path = str(tmp_path / "t.bag")
    n = rosbag.frames_to_bag(path, frames, compression=compression)
    assert n == 6                      # 3 clouds + 3 poses
    clouds, poses = rosbag.read_bag(path)
    assert len(clouds) == 3 and len(poses) == 3
    for (t, pts), fr in zip(clouds, frames):
        assert t == pytest.approx(fr.t, abs=1e-9)
        np.testing.assert_array_equal(pts, np.asarray(fr.points, np.float32))
    for (t, pos, quat), fr in zip(poses, frames):
        np.testing.assert_allclose(pos, fr.position, atol=1e-12)
        np.testing.assert_allclose(quat, fr.quat_wxyz, atol=1e-12)


def test_bag_to_frames_pose_association(tmp_path):
    """Clouds between pose samples get the INTERPOLATED pose (slerp/lerp,
    the TF2 lookup semantics); clouds past the 1 s timeout are skipped
    (D-POSE), not fatal."""
    path = str(tmp_path / "assoc.bag")
    pts = np.zeros((4, 3), np.float32)
    clouds = [(0.5, pts), (1.0, pts), (9.0, pts)]   # 9.0: no pose in range
    poses = [(0.0, np.array([0.0, 0.0, 0.0]), np.array([1.0, 0, 0, 0])),
             (1.0, np.array([2.0, 0.0, 0.0]), np.array([1.0, 0, 0, 0]))]
    rosbag.write_bag(path, clouds, poses)
    frames = rosbag.bag_to_frames(path)
    assert len(frames) == 2
    np.testing.assert_allclose(frames[0].position, [1.0, 0, 0], atol=1e-12)
    np.testing.assert_allclose(frames[1].position, [2.0, 0, 0], atol=1e-12)


def test_bag_unindexed_reads_fine(tmp_path):
    """index_pos=0 ('bag not closed properly / needs reindex') must read:
    the parser is a linear scan, like `rosbag reindex` recovery."""
    frames = _sim_frames(2)
    path = str(tmp_path / "u.bag")
    rosbag.frames_to_bag(path, frames)
    with open(path, "r+b") as f:
        f.seek(len(rosbag._MAGIC))
        # bag header record: u32 hlen, then fields; index_pos is the 2nd
        # field — simplest robust edit: zero it via parse
        hlen = struct.unpack("<I", f.read(4))[0]
        hdr = bytearray(f.read(hlen))
        i = bytes(hdr).find(b"index_pos=")
        hdr[i + len(b"index_pos="):i + len(b"index_pos=") + 8] = b"\0" * 8
        f.seek(len(rosbag._MAGIC) + 4)
        f.write(hdr)
    clouds, poses = rosbag.read_bag(path)
    assert len(clouds) == 2 and len(poses) == 2


def test_parse_pointcloud2_padded_rows_and_f64_fields():
    """Organized (height > 1) clouds with row padding and non-f32 xyz
    fields — producers vary; the reader normalizes to (N, 3) f32."""
    rng = np.random.default_rng(3)
    h, w = 2, 3
    xyz = rng.normal(size=(h * w, 3))
    point_step = 8 * 3 + 4            # 3 f64 + 4 pad bytes
    row_step = w * point_step + 16    # padded rows
    rows = []
    for r in range(h):
        row = b""
        for c in range(w):
            row += xyz[r * w + c].astype("<f8").tobytes() + b"\0" * 4
        rows.append(row + b"\xff" * 16)
    body = b"".join(rows)
    msg = (struct.pack("<III", 0, 0, 0) + struct.pack("<I", 5) + b"drone"
           + struct.pack("<II", h, w) + struct.pack("<I", 3))
    for i, name in enumerate((b"x", b"y", b"z")):
        msg += struct.pack("<I", len(name)) + name
        msg += struct.pack("<IBI", 8 * i, 8, 1)          # FLOAT64
    msg += struct.pack("<BII", 0, point_step, row_step)
    msg += struct.pack("<I", len(body)) + body + struct.pack("<B", 1)
    stamp, pts = rosbag.parse_pointcloud2(msg)
    assert pts.shape == (6, 3) and pts.dtype == np.float32
    np.testing.assert_allclose(pts, xyz.astype(np.float32), atol=0)


def test_parse_pointcloud2_rejects_bigendian_and_missing_fields():
    msg = (struct.pack("<III", 0, 0, 0) + struct.pack("<I", 0)
           + struct.pack("<II", 1, 1) + struct.pack("<I", 1)
           + struct.pack("<I", 1) + b"x" + struct.pack("<IBI", 0, 7, 1)
           + struct.pack("<BII", 1, 4, 4)
           + struct.pack("<I", 4) + b"\0" * 4 + struct.pack("<B", 1))
    with pytest.raises(IOError, match="big-endian"):
        rosbag.parse_pointcloud2(msg)
    msg_le = msg.replace(struct.pack("<BII", 1, 4, 4),
                         struct.pack("<BII", 0, 4, 4))
    with pytest.raises(IOError, match="lacks"):
        rosbag.parse_pointcloud2(msg_le)


def test_parse_odometry_pose():
    """nav_msgs/Odometry pose extraction + ROS xyzw -> pipeline wxyz."""
    hdr = (struct.pack("<III", 7, 12, 500000000)
           + struct.pack("<I", 5) + b"world")
    child = struct.pack("<I", 4) + b"base"
    pose = struct.pack("<7d", 1.0, 2.0, 3.0, 0.1, 0.2, 0.3, 0.9)
    cov = np.zeros(36).tobytes()
    stamp, pos, quat = rosbag.parse_pose(hdr + child + pose + cov,
                                         "nav_msgs/Odometry")
    assert stamp == pytest.approx(12.5)
    np.testing.assert_allclose(pos, [1.0, 2.0, 3.0])
    np.testing.assert_allclose(quat, [0.9, 0.1, 0.2, 0.3])


def test_bag_engine_end_to_end(tmp_path):
    """The VERDICT round-4 'done' bar: a recorded bag round-trips into the
    engine and produces the reference CSVs — and the result matches the
    same frames replayed from the native .pcsl log format."""
    from pointcloud_segmentation_tpu.runtime import SegmentationEngine

    frames = _sim_frames(3)
    path = str(tmp_path / "flight.bag")
    rosbag.frames_to_bag(path, frames)
    bag_frames = rosbag.bag_to_frames(path)
    assert len(bag_frames) == 3

    eng = SegmentationEngine(CFG, backend="jax")
    eng.run_replay(bag_frames)
    paths = eng.finalize(str(tmp_path / "out"))
    for p in paths.values():
        assert (tmp_path / "out").exists() and len(open(p).read()) > 0

    ref = SegmentationEngine(CFG, backend="jax")
    ref.run_replay(frames)
    segs, ref_segs = eng.world_segments(), ref.world_segments()
    assert len(segs) == len(ref_segs) > 0
    for s, r in zip(segs, ref_segs):
        # bag clouds are exact; poses round-trip through f64 — results equal
        np.testing.assert_allclose(s["a"], r["a"], atol=1e-6)
        np.testing.assert_allclose(s["radius"], r["radius"], atol=1e-6)


def test_cli_run_bag(tmp_path, capsys):
    from pointcloud_segmentation_tpu.cli import main

    frames = _sim_frames(2)
    bag = str(tmp_path / "b.bag")
    rosbag.frames_to_bag(bag, frames)
    rc = main(["run", "--bag", bag, "--backend", "oracle",
               "--out", str(tmp_path / "o"),
               "--granularity", "2"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "2 frames" in out
    assert (tmp_path / "o" / "segments.csv").exists()


def test_cli_record_bag_conversion(tmp_path, capsys):
    """`record --bag in.bag out.pcsl` converts recorded ROS data into the
    native replay log (then `stream` replays it at sensor rate)."""
    from pointcloud_segmentation_tpu.cli import main
    from pointcloud_segmentation_tpu.io.replay import load_frames

    frames = _sim_frames(2)
    bag = str(tmp_path / "b.bag")
    rosbag.frames_to_bag(bag, frames)
    log = str(tmp_path / "out.pcsl")
    rc = main(["record", log, "--bag", bag])
    assert rc == 0
    back = load_frames(log)
    assert len(back) == 2
    np.testing.assert_array_equal(back[0].points,
                                  np.asarray(frames[0].points, np.float32))


def test_require_single_topic_guard():
    """Shared ambiguity guard (ROS1 + MCAP): several topics of the same
    type error with the candidate list instead of silently merging (a
    record-everything capture holds /tof_pc plus the node's republished
    clouds, node.cpp:417-420/823-841)."""
    import pytest

    one = {"/tof_pc": [1, 2]}
    assert rosbag.require_single_topic(one, "PointCloud2", "f.bag",
                                       "--cloud-topic") == [1, 2]
    assert rosbag.require_single_topic({}, "pose", "f.bag",
                                       "--pose-topic") == []
    two = {"/tof_pc": [1], "/filtered_pointcloud": [2]}
    with pytest.raises(IOError, match="2 topics.*filtered_pointcloud"
                                      "|filtered_pointcloud"):
        rosbag.require_single_topic(two, "PointCloud2", "f.bag",
                                    "--cloud-topic")


def test_requested_topic_matching_nothing_errors(tmp_path):
    """The mirror of the ambiguity guard: an EXPLICITLY requested
    --cloud-topic/--pose-topic that matches no messages (typo, or a topic
    of a different message type) must error, not silently yield zero
    frames and an empty-but-exit-0 segments.csv."""
    frames = _sim_frames(2)
    bag = str(tmp_path / "b.bag")
    rosbag.frames_to_bag(bag, frames)
    with pytest.raises(IOError, match="/tof_pc2.*no PointCloud2"):
        rosbag.read_bag(bag, cloud_topic="/tof_pc2")
    with pytest.raises(IOError, match="no pose"):
        rosbag.read_bag(bag, pose_topic="/typo")
    # pointing --cloud-topic at a pose-typed topic is the same error class
    with pytest.raises(IOError, match="no PointCloud2"):
        rosbag.read_bag(bag, cloud_topic="/mavros/local_position/pose")
    # unfiltered defaults still read everything
    clouds, poses = rosbag.read_bag(bag)
    assert len(clouds) == 2 and len(poses) == 2


def test_bag_info_and_cli(tmp_path, capsys):
    """bag_info / `pcs-tpu bag-info`: per-topic summary + which topics the
    ingestion would pick — the companion to the ambiguity error."""
    from pointcloud_segmentation_tpu.cli import main
    from pointcloud_segmentation_tpu.io.rosbag import bag_info

    frames = _sim_frames(3)
    bag = str(tmp_path / "b.bag")
    rosbag.frames_to_bag(bag, frames)
    info = bag_info(bag)
    assert info["format"] == "rosbag"
    assert info["topics"]["/tof_pc"]["count"] == 3
    assert info["topics"]["/tof_pc"]["type"] == "sensor_msgs/PointCloud2"
    assert (info["topics"]["/mavros/local_position/pose"]["type"]
            == "geometry_msgs/PoseStamped")
    rc = main(["bag-info", bag])
    out = capsys.readouterr().out
    assert rc == 0
    assert "clouds: /tof_pc" in out
    assert "poses: /mavros/local_position/pose" in out
