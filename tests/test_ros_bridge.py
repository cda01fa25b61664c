"""ROS bridge message decoding + callback plumbing (no roscore needed)."""

import struct
import types

import numpy as np
import pytest

from pointcloud_segmentation_tpu.config import default_config, StaticShapes
from pointcloud_segmentation_tpu.io.ros_bridge import (
    RosBridge, decode_pointcloud2, stamp_to_sec)
from pointcloud_segmentation_tpu.runtime import SegmentationEngine


def make_cloud_msg(points, extra_field=True, bigendian=False):
    """A duck-typed sensor_msgs/PointCloud2."""
    pts = np.asarray(points, np.float32)
    step = 16 if extra_field else 12
    data = bytearray()
    dt = ">f4" if bigendian else "<f4"
    for p in pts:
        for v in p:
            data += np.asarray([v]).astype(dt).tobytes()
        if extra_field:
            data += b"\x00\x00\x00\x00"  # e.g. intensity padding
    fields = [types.SimpleNamespace(name=n, offset=o)
              for n, o in (("x", 0), ("y", 4), ("z", 8))]
    stamp = types.SimpleNamespace(secs=12, nsecs=500_000_000)
    return types.SimpleNamespace(
        fields=fields, point_step=step, is_bigendian=bigendian,
        data=bytes(data), header=types.SimpleNamespace(stamp=stamp))


def make_pose_msg(t, pos, quat_wxyz):
    secs = int(t)
    stamp = types.SimpleNamespace(secs=secs, nsecs=int((t - secs) * 1e9))
    p = types.SimpleNamespace(x=pos[0], y=pos[1], z=pos[2])
    q = types.SimpleNamespace(w=quat_wxyz[0], x=quat_wxyz[1],
                              y=quat_wxyz[2], z=quat_wxyz[3])
    return types.SimpleNamespace(
        header=types.SimpleNamespace(stamp=stamp),
        pose=types.SimpleNamespace(position=p, orientation=q))


def test_decode_pointcloud2():
    pts = np.array([[1.0, 2.0, 3.0], [-0.5, 0.25, 4.0]], np.float32)
    out = decode_pointcloud2(make_cloud_msg(pts))
    np.testing.assert_allclose(out, pts)
    out = decode_pointcloud2(make_cloud_msg(pts, extra_field=False))
    np.testing.assert_allclose(out, pts)
    out = decode_pointcloud2(make_cloud_msg(pts, bigendian=True))
    np.testing.assert_allclose(out, pts)


def test_stamp_to_sec():
    s = types.SimpleNamespace(secs=12, nsecs=500_000_000)
    assert stamp_to_sec(s) == pytest.approx(12.5)


def test_bridge_requires_rospy():
    cfg = default_config(granularity=1,
                         shapes=StaticShapes(max_raw_points=256, max_points=128))
    eng = SegmentationEngine(cfg, backend="oracle")
    with pytest.raises(ImportError, match="rospy"):
        RosBridge(eng)


def test_bridge_callbacks_feed_engine():
    """Invoke the callbacks directly with fake messages (transport-free)."""
    cfg = default_config(granularity=1,
                         shapes=StaticShapes(max_raw_points=256, max_points=128))
    eng = SegmentationEngine(cfg, backend="oracle")
    bridge = RosBridge.__new__(RosBridge)  # skip rospy wiring
    bridge.engine = eng

    bridge.on_pose(make_pose_msg(12.4, (1.0, 2.0, 0.5), (1.0, 0, 0, 0)))
    assert len(eng.poses) == 1

    pts = np.random.default_rng(0).normal(size=(50, 3)).astype(np.float32)
    bridge.on_cloud(make_cloud_msg(pts))
    item = eng.mailbox.take(timeout=0.5)
    assert item is not None
    t, got = item
    assert t == pytest.approx(12.5)
    np.testing.assert_allclose(got, pts, atol=1e-6)
