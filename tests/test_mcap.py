"""MCAP (ROS2 bag) ingestion (io/mcap.py): the successor recording format
for the same /tof_pc + pose topics, read without ROS2, routed through the
same --bag entry point as ROS1 bags (magic-dispatched)."""

import struct

import numpy as np
import pytest

from pointcloud_segmentation_tpu.io import mcap, rosbag
from pointcloud_segmentation_tpu.io.scene import (
    OBS_TESTS_SCENE, WP_TESTS, trajectory_poses)
from pointcloud_segmentation_tpu.io.simulator import simulate_trajectory, TofSpec


def _sim_frames(n=3):
    poses = trajectory_poses(WP_TESTS, hz=1.0, velocity=0.4)[:n]
    return simulate_trajectory(OBS_TESTS_SCENE, poses,
                               TofSpec(noise_frac=0.002), seed=1)


def test_mcap_roundtrip(tmp_path):
    frames = _sim_frames(3)
    path = str(tmp_path / "t.mcap")
    n = mcap.frames_to_mcap(path, frames)
    assert n == 6
    clouds, poses = mcap.read_bag_mcap(path)
    assert len(clouds) == 3 and len(poses) == 3
    for (t, pts), fr in zip(clouds, frames):
        assert t == pytest.approx(fr.t, abs=1e-9)
        np.testing.assert_array_equal(pts, np.asarray(fr.points, np.float32))
    for (t, pos, quat), fr in zip(poses, frames):
        np.testing.assert_allclose(pos, fr.position, atol=1e-12)
        np.testing.assert_allclose(quat, fr.quat_wxyz, atol=1e-12)


def test_mcap_requested_topic_matching_nothing_errors(tmp_path):
    """Same explicit-topic-matched-nothing guard as the ROS1 reader: a
    typo'd --cloud-topic against an MCAP bag errors instead of silently
    producing zero frames."""
    frames = _sim_frames(2)
    path = str(tmp_path / "t.mcap")
    mcap.frames_to_mcap(path, frames)
    with pytest.raises(IOError, match="/typo.*no PointCloud2"):
        mcap.read_bag_mcap(path, cloud_topic="/typo")
    with pytest.raises(IOError, match="no pose"):
        mcap.read_bag_mcap(path, pose_topic="/typo")


def test_rosbag_read_bag_routes_mcap_by_magic(tmp_path):
    """The single --bag entry point accepts BOTH containers: read_bag
    sniffs the MCAP magic and dispatches (cli run --bag flight.mcap)."""
    frames = _sim_frames(2)
    path = str(tmp_path / "t.mcap")
    mcap.frames_to_mcap(path, frames)
    clouds, poses = rosbag.read_bag(path)
    assert len(clouds) == 2 and len(poses) == 2
    out = rosbag.bag_to_frames(path)
    assert len(out) == 2
    np.testing.assert_allclose(out[0].position, frames[0].position,
                               atol=1e-9)


def test_mcap_zstd_chunked(tmp_path):
    """rosbag2's default output wraps messages in zstd CHUNK records —
    rewrap a plain file's message records into one and read it back."""
    zstandard = pytest.importorskip("zstandard")
    frames = _sim_frames(2)
    plain = str(tmp_path / "p.mcap")
    mcap.frames_to_mcap(plain, frames)
    # collect the data-section records, split header-ish from messages
    keep, blob = [], b""
    with open(plain, "rb") as f:
        f.read(len(mcap.MAGIC))
        while True:
            head = f.read(9)
            if len(head) < 9:
                break
            op = head[0]
            (clen,) = struct.unpack("<Q", head[1:9])
            content = f.read(clen)
            if op == mcap._OP_MESSAGE:
                blob += mcap._rec(op, content)
            elif op in (mcap._OP_HEADER, mcap._OP_SCHEMA, mcap._OP_CHANNEL):
                keep.append(mcap._rec(op, content))
    comp = zstandard.ZstdCompressor().compress(blob)
    chunk = (struct.pack("<QQQI", 0, 0, len(blob), 0)
             + struct.pack("<I", 4) + b"zstd"
             + struct.pack("<Q", len(comp)) + comp)
    chunked = str(tmp_path / "c.mcap")
    with open(chunked, "wb") as f:
        f.write(mcap.MAGIC)
        for r in keep:
            f.write(r)
        f.write(mcap._rec(mcap._OP_CHUNK, chunk))
        f.write(mcap._rec(mcap._OP_FOOTER, struct.pack("<QQI", 0, 0, 0)))
        f.write(mcap.MAGIC)
    clouds, poses = mcap.read_bag_mcap(chunked)
    assert len(clouds) == 2 and len(poses) == 2
    np.testing.assert_array_equal(
        clouds[0][1], np.asarray(frames[0].points, np.float32))


def test_cdr_alignment_odometry():
    """CDR 8-byte alignment after an odd-length child_frame_id — the case
    a naive unaligned reader mis-parses."""
    w = mcap._CdrW()
    w.header(12.5, "odom")
    w.string("base_link7")          # 11 bytes incl NUL -> forces padding
    w.f64(1.0, 2.0, 3.0, 0.1, 0.2, 0.3, 0.9)
    stamp, pos, quat = mcap.parse_pose_cdr(w.payload(),
                                           "nav_msgs/msg/Odometry")
    assert stamp == pytest.approx(12.5)
    np.testing.assert_allclose(pos, [1.0, 2.0, 3.0])
    np.testing.assert_allclose(quat, [0.9, 0.1, 0.2, 0.3])


def test_cdr_rejects_bigendian():
    payload = b"\x00\x00\x00\x00" + b"\x00" * 16    # CDR_BE representation
    with pytest.raises(IOError, match="big-endian"):
        mcap._Cdr(payload)


def test_mcap_engine_end_to_end(tmp_path):
    """An MCAP recording round-trips into the engine through the CLI."""
    from pointcloud_segmentation_tpu.cli import main

    frames = _sim_frames(2)
    path = str(tmp_path / "flight.mcap")
    mcap.frames_to_mcap(path, frames)
    rc = main(["run", "--bag", path, "--backend", "oracle",
               "--out", str(tmp_path / "o"), "--granularity", "2"])
    assert rc == 0
    assert (tmp_path / "o" / "segments.csv").exists()


def _two_cloud_topic_mcap(path, frames, enc1="cdr", enc2="cdr"):
    """Minimal MCAP with TWO PointCloud2 channels (/tof_pc + the node's
    republished filtered cloud) — the record-everything capture shape."""
    with open(path, "wb") as f:
        f.write(mcap.MAGIC)
        f.write(mcap._rec(mcap._OP_HEADER,
                          mcap._mstr("ros2") + mcap._mstr("test")))
        f.write(mcap._rec(mcap._OP_SCHEMA, struct.pack("<H", 1)
                          + mcap._mstr("sensor_msgs/msg/PointCloud2")
                          + mcap._mstr("ros2msg") + struct.pack("<I", 0)))
        for ch, (topic, enc) in ((1, ("/tof_pc", enc1)),
                                 (2, ("/filtered_pointcloud", enc2))):
            f.write(mcap._rec(mcap._OP_CHANNEL, struct.pack("<HH", ch, 1)
                              + mcap._mstr(topic) + mcap._mstr(enc)
                              + struct.pack("<I", 0)))
        for seq, fr in enumerate(frames):
            ns = int(round(fr.t * 1e9))
            payload = mcap._cdr_pointcloud2(fr.t, fr.points)
            for ch in (1, 2):
                f.write(mcap._rec(mcap._OP_MESSAGE,
                                  struct.pack("<HIQQ", ch, seq, ns, ns)
                                  + payload))
        f.write(mcap._rec(mcap._OP_DATA_END, struct.pack("<I", 0)))
        f.write(mcap._rec(mcap._OP_FOOTER, struct.pack("<QQI", 0, 0, 0)))
        f.write(mcap.MAGIC)


def test_two_cloud_topics_error_not_merge(tmp_path):
    """A record-everything capture holds /tof_pc PLUS the node's
    republished clouds (node.cpp:417-420/823-841); merging them would
    feed filtered clouds back in as raw frames — must error, naming the
    topics, unless --cloud-topic picks one."""
    frames = _sim_frames(2)
    path = str(tmp_path / "two.mcap")
    _two_cloud_topic_mcap(path, frames)
    with pytest.raises(IOError, match="filtered_pointcloud.*cloud-topic|"
                                      "cloud-topic"):
        mcap.read_bag_mcap(path)
    clouds, poses = mcap.read_bag_mcap(path, cloud_topic="/tof_pc")
    assert len(clouds) == 2 and poses == []
    # the same guard through the magic-dispatched entry point
    with pytest.raises(IOError, match="2 topics"):
        rosbag.read_bag(path)


def test_ros1_encoded_channel_rejected(tmp_path):
    """`mcap convert flight.bag` keeps ROS1 serialization under the same
    schema names; decoding it as CDR silently mis-parses — a non-cdr
    channel of interest must be a clear error."""
    frames = _sim_frames(1)
    path = str(tmp_path / "ros1enc.mcap")
    _two_cloud_topic_mcap(path, frames, enc1="ros1", enc2="cdr")
    with pytest.raises(IOError, match="ros1.*encoded|'ros1'"):
        mcap.read_bag_mcap(path, cloud_topic="/tof_pc")
    # ...but a topic filter that excludes the ros1 channel reads fine
    clouds, _ = mcap.read_bag_mcap(path, cloud_topic="/filtered_pointcloud")
    assert len(clouds) == 1


def test_bag_info_mcap_ambiguous(tmp_path, capsys):
    """bag-info on a two-cloud-topic MCAP reports the ambiguity and the
    candidates (what require_single_topic tells the user to resolve)."""
    from pointcloud_segmentation_tpu.cli import main
    from pointcloud_segmentation_tpu.io.rosbag import bag_info

    frames = _sim_frames(2)
    path = str(tmp_path / "two.mcap")
    _two_cloud_topic_mcap(path, frames)
    info = bag_info(path)
    assert info["format"] == "mcap"
    assert set(info["topics"]) == {"/tof_pc", "/filtered_pointcloud"}
    assert info["topics"]["/tof_pc"]["encoding"] == "cdr"
    rc = main(["bag-info", path])
    out = capsys.readouterr().out
    assert rc == 0
    assert "AMBIGUOUS" in out and "--cloud-topic" in out
