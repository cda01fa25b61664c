"""Failure envelope of the recorded-data readers (io/rosbag.py, io/mcap.py).

The ingestion surface replaces the reference node's live subscription
(`/root/reference/src/pointcloud_segmentation_node.cpp:64-67`); a recorder
dying mid-flight produces exactly these files — cut mid-record, mid-chunk,
or mid-payload.  Contract pinned here (VERDICT r4 #3):

* a file that ENDS mid-record stops cleanly at the last complete record
  with a warning (the torn-tail case — same spirit as the viz follower's
  torn-line resync);
* structural corruption (garbage headers, a nested record overrunning its
  chunk, a bz2/zstd chunk with flipped bytes, an undecodable payload in an
  intact record) raises a CONTEXTUAL IOError;
* a bare struct.error / KeyError / IndexError never escapes — the sweep
  tests truncate at every offset and assert the exception envelope.
"""

import logging
import struct

import numpy as np
import pytest

from pointcloud_segmentation_tpu.io import mcap, rosbag
from pointcloud_segmentation_tpu.io.scene import (
    OBS_TESTS_SCENE, WP_TESTS, trajectory_poses)
from pointcloud_segmentation_tpu.io.simulator import (simulate_trajectory,
                                                      TofSpec)


def _sim_frames(n=3):
    poses = trajectory_poses(WP_TESTS, hz=1.0, velocity=0.4)[:n]
    return simulate_trajectory(OBS_TESTS_SCENE, poses,
                               TofSpec(noise_frac=0.002), seed=1)


def _truncate(src: bytes, path, n: int) -> str:
    with open(path, "wb") as f:
        f.write(src[:n])
    return str(path)


def _unclose_bag(src: bytes) -> bytes:
    """Zero the bag header's index_pos — the on-disk form a recorder that
    DIED mid-flight leaves (rosbag writes index_pos=0 until close).  The
    torn-tail warn+stop contract applies to this form; a CLOSED bag
    (nonzero index_pos) that ends mid-record is corruption instead."""
    i = src.index(b"index_pos=")
    j = i + len(b"index_pos=")
    return src[:j] + b"\x00" * 8 + src[j + 8:]


def _tiny_clouds_poses(n=3):
    """Small fixed-size messages so the byte-exact truncation sweeps stay
    fast (the simulator's 4096-point clouds make a ~100 KB bag; these make
    ~5 KB)."""
    pts = np.arange(12, dtype=np.float32).reshape(4, 3)
    clouds = [(float(i), pts + i) for i in range(n)]
    poses = [(float(i), np.array([0.0, 0.0, 0.1 * i]),
              np.array([1.0, 0.0, 0.0, 0.0])) for i in range(n)]
    return clouds, poses


# ------------------------------------------------------------------ ROS1

def test_bag_truncation_sweep_never_raises_bare_errors(tmp_path):
    """Cut a valid bag at EVERY byte offset: the reader must return a
    prefix — never raise.  Truncation is the torn-tail case, not
    corruption."""
    full = str(tmp_path / "full.bag")
    rosbag.write_bag(full, *_tiny_clouds_poses())
    src = _unclose_bag(open(full, "rb").read())
    t = tmp_path / "cut.bag"
    for n in range(len(rosbag._MAGIC), len(src)):
        clouds, poses = rosbag.read_bag(_truncate(src, t, n))
        assert len(clouds) <= 3 and len(poses) <= 3


def test_bag_truncated_mid_record_warns_and_stops(tmp_path, caplog):
    frames = _sim_frames(2)
    full = str(tmp_path / "full.bag")
    rosbag.frames_to_bag(full, frames)
    src = _unclose_bag(open(full, "rb").read())
    # cut into the middle of the chunk record (mid-payload): magic is
    # 13 bytes, the padded bag-header record is exactly 4096, so the chunk
    # starts at 4109 — stop halfway through it
    cut = 4109 + (len(src) - 4109) // 2
    with caplog.at_level(logging.WARNING, logger="pcs_tpu.rosbag"):
        clouds, poses = rosbag.read_bag(
            _truncate(src, tmp_path / "cut.bag", cut))
    assert clouds == [] and poses == []
    assert any("truncated recording" in r.message for r in caplog.records)


def test_bag_truncated_after_chunk_keeps_messages(tmp_path, caplog):
    """A cut AFTER the chunk (inside the trailing index records) loses
    only the index — every message still reads, with a warning."""
    frames = _sim_frames(2)
    full = str(tmp_path / "full.bag")
    rosbag.frames_to_bag(full, frames)
    src = _unclose_bag(open(full, "rb").read())
    with caplog.at_level(logging.WARNING, logger="pcs_tpu.rosbag"):
        clouds, poses = rosbag.read_bag(
            _truncate(src, tmp_path / "cut.bag", len(src) - 10))
    assert len(clouds) == 2 and len(poses) == 2
    assert any("truncated recording" in r.message for r in caplog.records)


def test_bag_closed_recording_cut_midfile_is_ioerror(tmp_path):
    """A bag whose header records a nonzero index_pos was CLOSED by its
    recorder — an EOF mid-record there is a corrupt length field (or a
    storage-level cut), and silently dropping the remainder would build a
    silently sparse map.  Contextual IOError instead."""
    full = str(tmp_path / "full.bag")
    rosbag.write_bag(full, *_tiny_clouds_poses())
    src = open(full, "rb").read()
    cut = 4109 + (len(src) - 4109) // 2     # mid-chunk, header intact
    with pytest.raises(IOError, match="corrupt, not merely truncated"):
        rosbag.read_bag(_truncate(src, tmp_path / "cut.bag", cut))


def test_bag_bz2_chunk_flipped_byte_is_contextual_ioerror(tmp_path):
    frames = _sim_frames(2)
    path = str(tmp_path / "c.bag")
    rosbag.frames_to_bag(path, frames, compression="bz2")
    src = bytearray(open(path, "rb").read())
    # locate the chunk record's payload: walk top-level records
    off = len(rosbag._MAGIC)
    while True:
        (hlen,) = struct.unpack_from("<I", src, off)
        hdr = bytes(src[off + 4:off + 4 + hlen])
        (dlen,) = struct.unpack_from("<I", src, off + 4 + hlen)
        data_off = off + 4 + hlen + 4
        if rosbag._parse_fields(hdr).get("op", b"\x00")[0] == 0x05:
            break
        off = data_off + dlen
    mid = data_off + dlen // 2
    src[mid] ^= 0xFF
    with open(path, "wb") as f:
        f.write(src)
    with pytest.raises(IOError, match="corrupt bz2|bz2"):
        rosbag.read_bag(path)


def test_bag_garbage_header_field_is_contextual_ioerror(tmp_path):
    path = str(tmp_path / "g.bag")
    bad_field = struct.pack("<I", 5) + b"nopqr"     # no '='
    with open(path, "wb") as f:
        f.write(rosbag._MAGIC)
        f.write(rosbag._record(bad_field, b""))
    with pytest.raises(IOError, match="no '='"):
        list(rosbag.read_messages(path))


def test_bag_nested_record_overrun_is_contextual_ioerror(tmp_path):
    # chunk blob holding one nested record whose data length overruns
    blob = (struct.pack("<I", 7) + struct.pack("<I", 3) + b"a=b"
            + struct.pack("<I", 999))
    path = str(tmp_path / "o.bag")
    with open(path, "wb") as f:
        f.write(rosbag._MAGIC)
        f.write(rosbag._record(
            rosbag._field("op", bytes([0x05]))
            + rosbag._field("compression", b"none")
            + rosbag._field("size", struct.pack("<I", len(blob))), blob))
    with pytest.raises(IOError, match="corrupt chunk"):
        list(rosbag.read_messages(path))


def test_bag_record_missing_op_is_contextual_ioerror(tmp_path):
    path = str(tmp_path / "noop.bag")
    with open(path, "wb") as f:
        f.write(rosbag._MAGIC)
        f.write(rosbag._record(rosbag._field("conn",
                                             struct.pack("<I", 0)), b""))
    with pytest.raises(IOError, match="op"):
        list(rosbag.read_messages(path))


def test_bag_undecodable_payload_is_contextual_ioerror(tmp_path):
    """Intact record framing, garbage PointCloud2 payload -> IOError
    naming the topic and time, not a bare struct.error."""
    path = str(tmp_path / "u.bag")
    conn_hdr = (rosbag._field("op", bytes([0x07]))
                + rosbag._field("conn", struct.pack("<I", 0))
                + rosbag._field("topic", b"/tof_pc"))
    conn_data = (rosbag._field("topic", b"/tof_pc")
                 + rosbag._field("type", b"sensor_msgs/PointCloud2"))
    msg_hdr = (rosbag._field("op", bytes([0x02]))
               + rosbag._field("conn", struct.pack("<I", 0))
               + rosbag._field("time", rosbag._enc_time(1.5)))
    with open(path, "wb") as f:
        f.write(rosbag._MAGIC)
        f.write(rosbag._record(conn_hdr, conn_data))
        f.write(rosbag._record(msg_hdr, b"\x01\x02"))
    with pytest.raises(IOError, match="undecodable.*tof_pc"):
        rosbag.read_bag(path)


# ------------------------------------------------------------------ MCAP

def test_mcap_truncation_sweep_never_raises_bare_errors(tmp_path):
    full = str(tmp_path / "full.mcap")
    mcap.write_mcap(full, *_tiny_clouds_poses())
    src = open(full, "rb").read()
    t = tmp_path / "cut.mcap"
    for n in range(len(mcap.MAGIC), len(src)):
        clouds, poses = mcap.read_bag_mcap(_truncate(src, t, n))
        assert len(clouds) <= 3 and len(poses) <= 3


def test_mcap_truncated_mid_message_warns_and_stops(tmp_path, caplog):
    frames = _sim_frames(3)
    full = str(tmp_path / "full.mcap")
    mcap.frames_to_mcap(full, frames)
    src = open(full, "rb").read()
    # find the LAST message record and cut into the middle of it
    off = len(mcap.MAGIC)
    last_msg = None
    while off + 9 <= len(src):
        op = src[off]
        (clen,) = struct.unpack_from("<Q", src, off + 1)
        if op == mcap._OP_MESSAGE:
            last_msg = (off, clen)
        off += 9 + clen
    moff, mlen = last_msg
    with caplog.at_level(logging.WARNING, logger="pcs_tpu.mcap"):
        clouds, poses = mcap.read_bag_mcap(
            _truncate(src, tmp_path / "cut.mcap", moff + 9 + mlen // 2))
    assert len(clouds) + len(poses) == 5      # 6 messages, last one torn
    assert any("truncated recording" in r.message for r in caplog.records)


def test_mcap_closed_file_bad_length_is_ioerror(tmp_path):
    """An MCAP file that still ENDS with the magic was closed by its
    recorder; an EOF-mid-record inside it means a corrupt record length,
    not a torn tail -> contextual IOError, no silent message loss."""
    full = str(tmp_path / "full.mcap")
    mcap.write_mcap(full, *_tiny_clouds_poses())
    src = bytearray(open(full, "rb").read())
    # inflate the first message record's u64 content_len
    off = len(mcap.MAGIC)
    while off + 9 <= len(src):
        op = src[off]
        (clen,) = struct.unpack_from("<Q", src, off + 1)
        if op == mcap._OP_MESSAGE:
            struct.pack_into("<Q", src, off + 1, 10 ** 9)
            break
        off += 9 + clen
    path = str(tmp_path / "bad.mcap")
    with open(path, "wb") as f:
        f.write(src)
    with pytest.raises(IOError, match="corrupt record length"):
        list(mcap.read_messages(path))


def test_mcap_corrupt_chunk_header_is_contextual_ioerror(tmp_path):
    path = str(tmp_path / "c.mcap")
    with open(path, "wb") as f:
        f.write(mcap.MAGIC)
        f.write(mcap._rec(mcap._OP_CHUNK, b"way too short"))
    with pytest.raises(IOError, match="corrupt chunk"):
        list(mcap.read_messages(path))


def test_mcap_chunk_records_len_overrun_is_contextual_ioerror(tmp_path):
    content = (struct.pack("<QQQI", 0, 0, 16, 0)
               + struct.pack("<I", 0)                 # compression ""
               + struct.pack("<Q", 10 ** 6))          # rlen overruns
    path = str(tmp_path / "r.mcap")
    with open(path, "wb") as f:
        f.write(mcap.MAGIC)
        f.write(mcap._rec(mcap._OP_CHUNK, content))
    with pytest.raises(IOError, match="records_len overruns"):
        list(mcap.read_messages(path))


def test_mcap_nested_record_overrun_is_contextual_ioerror(tmp_path):
    blob = struct.pack("<BQ", mcap._OP_MESSAGE, 10 ** 6) + b"\x00" * 8
    content = (struct.pack("<QQQI", 0, 0, len(blob), 0)
               + struct.pack("<I", 0)
               + struct.pack("<Q", len(blob)) + blob)
    path = str(tmp_path / "n.mcap")
    with open(path, "wb") as f:
        f.write(mcap.MAGIC)
        f.write(mcap._rec(mcap._OP_CHUNK, content))
    with pytest.raises(IOError, match="overruns the chunk blob"):
        list(mcap.read_messages(path))


def test_mcap_short_schema_record_is_contextual_ioerror(tmp_path):
    path = str(tmp_path / "s.mcap")
    with open(path, "wb") as f:
        f.write(mcap.MAGIC)
        f.write(mcap._rec(mcap._OP_SCHEMA, b"\x01"))   # 1 byte < u16 id
    with pytest.raises(IOError, match="too short"):
        list(mcap.read_messages(path))


def test_mcap_undecodable_cdr_payload_is_contextual_ioerror(tmp_path):
    path = str(tmp_path / "u.mcap")
    with open(path, "wb") as f:
        f.write(mcap.MAGIC)
        f.write(mcap._rec(mcap._OP_SCHEMA, struct.pack("<H", 1)
                          + mcap._mstr("sensor_msgs/msg/PointCloud2")
                          + mcap._mstr("ros2msg") + struct.pack("<I", 0)))
        f.write(mcap._rec(mcap._OP_CHANNEL, struct.pack("<HH", 1, 1)
                          + mcap._mstr("/tof_pc") + mcap._mstr("cdr")
                          + struct.pack("<I", 0)))
        # intact message framing; 4-byte CDR payload = header only,
        # truncated before the stamp
        f.write(mcap._rec(mcap._OP_MESSAGE,
                          struct.pack("<HIQQ", 1, 0, 10 ** 9, 10 ** 9)
                          + b"\x00\x01\x00\x00"))
    with pytest.raises(IOError, match="undecodable.*tof_pc"):
        mcap.read_bag_mcap(path)


def test_mcap_flipped_byte_in_zstd_chunk_is_ioerror(tmp_path):
    zstandard = pytest.importorskip("zstandard")
    blob = mcap._rec(mcap._OP_SCHEMA, struct.pack("<H", 1)
                     + mcap._mstr("x") + mcap._mstr("ros2msg")
                     + struct.pack("<I", 0))
    comp = bytearray(
        zstandard.ZstdCompressor(write_checksum=True).compress(blob))
    comp[len(comp) // 2] ^= 0xFF
    content = (struct.pack("<QQQI", 0, 0, len(blob), 0)
               + struct.pack("<I", 4) + b"zstd"
               + struct.pack("<Q", len(comp)) + bytes(comp))
    path = str(tmp_path / "z.mcap")
    with open(path, "wb") as f:
        f.write(mcap.MAGIC)
        f.write(mcap._rec(mcap._OP_CHUNK, content))
    with pytest.raises(IOError, match="corrupt zstd|zstd"):
        list(mcap.read_messages(path))


def test_mcap_uncompressed_chunk_crc_mismatch_is_ioerror(tmp_path):
    """The chunk record's uncompressed_crc (nonzero = present) is
    verified: a flipped byte in an UNCOMPRESSED chunk is caught too."""
    import zlib

    blob = mcap._rec(mcap._OP_SCHEMA, struct.pack("<H", 1)
                     + mcap._mstr("x") + mcap._mstr("ros2msg")
                     + struct.pack("<I", 0))
    crc = zlib.crc32(blob)
    flipped = bytearray(blob)
    flipped[len(flipped) - 1] ^= 0xFF     # inside the schema name
    content = (struct.pack("<QQQI", 0, 0, len(blob), crc)
               + struct.pack("<I", 0)
               + struct.pack("<Q", len(flipped)) + bytes(flipped))
    path = str(tmp_path / "crc.mcap")
    with open(path, "wb") as f:
        f.write(mcap.MAGIC)
        f.write(mcap._rec(mcap._OP_CHUNK, content))
    with pytest.raises(IOError, match="CRC mismatch"):
        list(mcap.read_messages(path))


def test_bag_to_frames_survives_truncated_tail(tmp_path):
    """End to end: the engine-facing entry point on a torn bag yields the
    prefix frames (np arrays intact), no exception."""
    frames = _sim_frames(3)
    full = str(tmp_path / "full.bag")
    rosbag.frames_to_bag(full, frames)
    src = _unclose_bag(open(full, "rb").read())
    out = rosbag.bag_to_frames(
        _truncate(src, tmp_path / "cut.bag", len(src) - 10))
    assert len(out) == 3
    assert all(isinstance(fr.points, np.ndarray) for fr in out)
