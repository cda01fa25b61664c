"""Native C++ runtime (mailbox + frame log) and replay interchange."""

import threading
import time

import numpy as np
import pytest

from pointcloud_segmentation_tpu import native
from pointcloud_segmentation_tpu.io.replay import save_frames, load_frames, _py_save, _py_load
from pointcloud_segmentation_tpu.io.simulator import Frame

needs_native = pytest.mark.skipif(not native.available(),
                                  reason="native runtime not built")


def make_frames(n=3, k=50, seed=0):
    rng = np.random.default_rng(seed)
    return [Frame(t=float(i) * 0.1,
                  position=rng.normal(size=3),
                  quat_wxyz=np.array([1.0, 0, 0, 0]),
                  points=rng.normal(size=(k, 3)).astype(np.float32))
            for i in range(n)]


def test_native_builds():
    assert native.available(), "native runtime failed to build"


@needs_native
def test_native_mailbox_latest_wins():
    mb = native.NativeMailbox(max_points=128)
    pts1 = np.ones((4, 3), np.float32)
    pts2 = 2 * np.ones((5, 3), np.float32)
    mb.put((1.0, pts1))
    mb.put((2.0, pts2))
    t, pts = mb.take(timeout=0.5)
    assert t == 2.0
    np.testing.assert_allclose(pts, pts2)
    assert mb.dropped == 1
    assert mb.take(timeout=0.05) is None
    mb.close()


@needs_native
def test_native_mailbox_threaded():
    mb = native.NativeMailbox(max_points=64)
    got = []

    def consumer():
        v = mb.take(timeout=2.0)
        got.append(v)

    th = threading.Thread(target=consumer)
    th.start()
    time.sleep(0.05)
    mb.put((7.0, np.zeros((2, 3), np.float32)))
    th.join(timeout=3)
    assert got and got[0][0] == 7.0


@needs_native
def test_native_framelog_roundtrip(tmp_path):
    frames = make_frames(4, 77)
    p = str(tmp_path / "log.pcsl")
    n = save_frames(p, frames)
    assert n == 4
    back = load_frames(p)
    assert len(back) == 4
    for a, b in zip(frames, back):
        assert a.t == b.t
        np.testing.assert_allclose(a.position, b.position)
        np.testing.assert_allclose(a.points, b.points)


@needs_native
def test_native_and_python_codecs_interchange(tmp_path):
    frames = make_frames(2, 10, seed=3)
    p1 = str(tmp_path / "native.pcsl")
    p2 = str(tmp_path / "python.pcsl")
    save_frames(p1, frames)          # native writer
    _py_save(p2, frames)             # python writer
    with open(p1, "rb") as f1, open(p2, "rb") as f2:
        assert f1.read() == f2.read()
    # python reader on native file
    back = list(_py_load(p1))
    assert len(back) == 2
    np.testing.assert_allclose(back[1].points, frames[1].points)


def test_python_codec_roundtrip(tmp_path):
    frames = make_frames(3, 20, seed=5)
    p = str(tmp_path / "py.pcsl")
    _py_save(p, frames)
    back = list(_py_load(p))
    assert len(back) == 3
    np.testing.assert_allclose(back[2].points, frames[2].points)
