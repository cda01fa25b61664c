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


@needs_native
def test_native_posebuffer_matches_python():
    """Random pushes (out of order, duplicates) + lookups: the C++ buffer
    must agree with runtime.posebuffer.PoseBuffer — interpolation, slerp,
    timeout extrapolation, and failure cases."""
    from pointcloud_segmentation_tpu.runtime.posebuffer import PoseBuffer

    rng = np.random.default_rng(11)
    py = PoseBuffer(capacity=32, timeout=1.0)
    nat = native.NativePoseBuffer(capacity=32, timeout=1.0)
    ts = list(rng.uniform(0.0, 10.0, 40)) + [3.0, 3.0]  # dup timestamps
    for t in ts:
        q = rng.normal(size=4)
        p = rng.normal(size=3)
        py.push(t, p, q)
        nat.push(t, p, q)
    assert len(py) == len(nat) == 32
    queries = list(rng.uniform(-2.0, 12.0, 60)) + [3.0, -1.5, 11.5]
    for t in queries:
        rp = py.lookup(t)
        rn = nat.lookup(t)
        assert (rp is None) == (rn is None), f"t={t}"
        if rp is not None:
            np.testing.assert_allclose(rn[0], rp[0], atol=1e-12)
            np.testing.assert_allclose(rn[1], rp[1], atol=1e-12)


@needs_native
def test_native_csv_writers_byte_identical(tmp_path):
    """The C++ writers must produce byte-identical files to runtime.csvio
    (printf %.6g == C++ ofstream default == Python's :.6g) across magnitude
    extremes."""
    from pointcloud_segmentation_tpu.runtime import csvio

    rng = np.random.default_rng(4)
    vals = np.concatenate([
        rng.normal(0, 1, 10), rng.normal(0, 1e-7, 5), rng.normal(0, 1e8, 5),
        [0.0, -0.0, 1.0, -1.0, 123456.789, 1e-300, -1e300]])
    segs = [{"a": vals[i:i+3], "b": vals[i+3:i+6],
             "t_min": float(vals[i+6]), "t_max": float(vals[(i+7) % len(vals)])}
            for i in range(0, 18, 6)]
    inter = [(0, float(vals[1]), 2, float(vals[5])),
             (1, -3.25e-9, 3, 7.0)]
    recs = [{"wall_time": float(abs(vals[i]) * 1e6),
             "processing_time": float(abs(vals[i+1]) * 1e3),
             "seg_vec_size": int(i), "nblines": int(i * 2)}
            for i in range(5)]
    for name, py_fn, nat_fn, data in [
            ("segments", csvio.write_segments_csv,
             native.write_segments_csv, segs),
            ("intersections", csvio.write_intersections_csv,
             native.write_intersections_csv, inter),
            ("processing", csvio.write_processing_time_csv,
             native.write_processing_time_csv, recs)]:
        p1 = str(tmp_path / f"{name}_py.csv")
        p2 = str(tmp_path / f"{name}_nat.csv")
        py_fn(p1, data)
        nat_fn(p2, data)
        with open(p1, "rb") as f1, open(p2, "rb") as f2:
            assert f1.read() == f2.read(), name


@needs_native
def test_native_feeder_paces_and_drops(tmp_path):
    """The C++ feeder replays a log into the mailbox + pose buffer; a slow
    consumer sees latest-wins drops; a keeping-up consumer sees every
    frame."""
    frames = make_frames(20, 10, seed=8)
    p = str(tmp_path / "feed.pcsl")
    save_frames(p, frames)

    # fast feed, slow consumer -> drops
    mb = native.NativeMailbox(max_points=64)
    pb = native.NativePoseBuffer()
    f = native.NativeFeeder(p, mb, pb, rate_hz=0.0, loops=1,
                            close_on_end=True)
    time.sleep(0.3)
    assert f.done
    got = []
    while True:
        item = mb.take(timeout=0.1)
        if item is None:
            break
        got.append(item)
    assert f.stop() == 20
    assert len(pb) == 20
    assert len(got) >= 1 and got[-1][0] == frames[-1].t  # newest survived
    assert mb.dropped >= 1

    # paced feed, immediate consumer -> sees (nearly) all frames
    mb2 = native.NativeMailbox(max_points=64)
    f2 = native.NativeFeeder(p, mb2, None, rate_hz=200.0, loops=1,
                             close_on_end=True)
    seen = 0
    while True:
        item = mb2.take(timeout=1.0)
        if item is None:
            break
        seen += 1
    assert f2.stop() == 20
    assert seen >= 15  # scheduler jitter may cost a few


@needs_native
def test_native_feeder_loops_monotonic_time(tmp_path):
    """Looped replay must keep the stream's clock strictly monotonic.

    Replaying the log's raw timestamps every loop rewinds t; the sorted
    pose ring then evicts everything but the globally-largest timestamps,
    and once it has seen `capacity` pushes every fresh-frame pose lookup
    starves (the 10-min endurance soak decayed 30 -> 10.5 proc/s this
    way).  The feeder now offsets each loop past the previous one."""
    frames = make_frames(5, 8, seed=3)
    p = str(tmp_path / "loop.pcsl")
    save_frames(p, frames)

    mb = native.NativeMailbox(max_points=64)
    pb = native.NativePoseBuffer(capacity=16)   # << loops * frames
    f = native.NativeFeeder(p, mb, pb, rate_hz=0.0, loops=20,
                            close_on_end=True)
    ts = []
    while True:
        item = mb.take(timeout=1.0)
        if item is None:
            break
        ts.append(item[0])
    assert f.stop() == 100
    # consumed timestamps strictly increase across loop boundaries
    assert all(b > a for a, b in zip(ts, ts[1:]))
    assert ts[-1] > frames[-1].t        # later loops offset past the log
    # the regression: after >> capacity pushes of a LOOPED log, the last
    # fed frame's pose lookup starved (buffer held only max-t duplicates)
    assert pb.lookup(ts[-1]) is not None


def test_python_feeder_loops_monotonic_time(tmp_path):
    """The Python fallback feeder applies the same per-loop offset."""
    from pointcloud_segmentation_tpu.config import default_config
    from pointcloud_segmentation_tpu.runtime.engine import SegmentationEngine
    from pointcloud_segmentation_tpu.runtime.posebuffer import PoseBuffer
    from pointcloud_segmentation_tpu.runtime.mailbox import LatestWinsMailbox

    frames = make_frames(4, 8, seed=4)
    p = str(tmp_path / "loop_py.pcsl")
    save_frames(p, frames)
    cfg = default_config(granularity=2)
    eng = SegmentationEngine(cfg, backend="oracle")
    # force the Python fallback pair regardless of native availability
    eng.poses = PoseBuffer(capacity=12)
    eng.mailbox = LatestWinsMailbox()
    stats = eng.run_streaming_from_log(p, rate_hz=500.0, loops=10)
    assert stats["fed"] == 40
    # with a monotonic feed the tiny pose buffer never starves: every
    # fed frame is either processed or latest-wins dropped, none skipped
    assert eng.frames_skipped_no_pose == 0
    assert stats["processed"] + stats["dropped"] == 40


@needs_native
def test_engine_run_streaming_from_log(tmp_path):
    """End-to-end: native feeder -> native mailbox/pose buffer -> engine
    consumer thread -> world map + CSVs, on the oracle backend."""
    from pointcloud_segmentation_tpu.config import default_config
    from pointcloud_segmentation_tpu.io.scene import (
        OBS_TESTS_SCENE, WP_TESTS, trajectory_poses)
    from pointcloud_segmentation_tpu.io.simulator import (
        simulate_trajectory, TofSpec)
    from pointcloud_segmentation_tpu.runtime.engine import SegmentationEngine

    cfg = default_config(granularity=2, path_to_output=str(tmp_path))
    poses = trajectory_poses(WP_TESTS, hz=2.0, velocity=0.3)[:6]
    frames = simulate_trajectory(OBS_TESTS_SCENE, poses,
                                 TofSpec(noise_frac=0.002), seed=0)
    p = str(tmp_path / "scene.pcsl")
    save_frames(p, frames)
    eng = SegmentationEngine(cfg, backend="oracle")
    assert isinstance(eng.mailbox, native.NativeMailbox)
    assert isinstance(eng.poses, native.NativePoseBuffer)
    stats = eng.run_streaming_from_log(p, rate_hz=20.0)
    assert stats["fed"] == len(frames)
    assert stats["processed"] + stats["dropped"] \
        + eng.frames_skipped_no_pose >= stats["fed"]
    assert stats["processed"] >= 1
    assert len(eng.world_segments()) >= 1
    paths = eng.finalize()
    for pth in paths.values():
        assert open(pth).readline().count(",") >= 2


def test_native_mailbox_oversized_cloud_truncates():
    """A cloud larger than the mailbox capacity must come back truncated to
    the bytes actually copied — not raise in frombuffer and kill the
    consumer (the C++ side clamps the copy; the Python side clamps npts)."""
    native = pytest.importorskip("pointcloud_segmentation_tpu.native")
    if not native.available():
        pytest.skip("native runtime not built")
    mb = native.NativeMailbox(max_points=64)
    big = np.arange(200 * 3, dtype=np.float32).reshape(200, 3)
    mb.put((1.5, big))
    t, pts = mb.take(timeout=1.0)
    assert t == 1.5
    assert pts.shape == (64, 3)
    np.testing.assert_array_equal(pts, big[:64])
    mb.close()
