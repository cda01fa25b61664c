"""ctypes bindings for the native runtime (native/pcs_runtime.cpp).

``available()`` reports whether the shared library could be built/loaded;
all consumers fall back to pure-Python implementations when it is not.
"""

from __future__ import annotations

import ctypes
import struct
import threading
from typing import Optional, Tuple

import numpy as np

from .build import library_path

_lib = None
_lib_tried = False
_lock = threading.Lock()


def _load():
    global _lib, _lib_tried
    with _lock:
        if _lib_tried:
            return _lib
        _lib_tried = True
        path = library_path()
        if path is None:
            return None
        try:
            lib = ctypes.CDLL(path)
        except OSError:
            return None
        # mailbox
        lib.pcs_mailbox_create.restype = ctypes.c_void_p
        lib.pcs_mailbox_destroy.argtypes = [ctypes.c_void_p]
        lib.pcs_mailbox_put.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                        ctypes.c_uint64]
        lib.pcs_mailbox_take.restype = ctypes.c_int64
        lib.pcs_mailbox_take.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                         ctypes.c_uint64, ctypes.c_int64]
        lib.pcs_mailbox_close.argtypes = [ctypes.c_void_p]
        lib.pcs_mailbox_dropped.restype = ctypes.c_uint64
        lib.pcs_mailbox_dropped.argtypes = [ctypes.c_void_p]
        # frame log
        lib.pcs_log_open_write.restype = ctypes.c_void_p
        lib.pcs_log_open_write.argtypes = [ctypes.c_char_p]
        lib.pcs_log_write_frame.restype = ctypes.c_int
        lib.pcs_log_write_frame.argtypes = [
            ctypes.c_void_p, ctypes.c_double, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_uint32]
        lib.pcs_log_close_write.restype = ctypes.c_uint64
        lib.pcs_log_close_write.argtypes = [ctypes.c_void_p]
        lib.pcs_log_open_read.restype = ctypes.c_void_p
        lib.pcs_log_open_read.argtypes = [ctypes.c_char_p]
        lib.pcs_log_read_frame.restype = ctypes.c_int64
        lib.pcs_log_read_frame.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_uint32]
        lib.pcs_log_close_read.argtypes = [ctypes.c_void_p]
        # pose buffer
        lib.pcs_posebuf_create.restype = ctypes.c_void_p
        lib.pcs_posebuf_create.argtypes = [ctypes.c_uint64, ctypes.c_double]
        lib.pcs_posebuf_destroy.argtypes = [ctypes.c_void_p]
        lib.pcs_posebuf_push.argtypes = [ctypes.c_void_p, ctypes.c_double,
                                         ctypes.c_void_p, ctypes.c_void_p]
        lib.pcs_posebuf_lookup.restype = ctypes.c_int
        lib.pcs_posebuf_lookup.argtypes = [ctypes.c_void_p, ctypes.c_double,
                                           ctypes.c_void_p, ctypes.c_void_p]
        lib.pcs_posebuf_size.restype = ctypes.c_uint64
        lib.pcs_posebuf_size.argtypes = [ctypes.c_void_p]
        # CSV writers
        for fn in (lib.pcs_csv_write_segments, lib.pcs_csv_write_intersections,
                   lib.pcs_csv_write_processing):
            fn.restype = ctypes.c_int
            fn.argtypes = [ctypes.c_char_p, ctypes.c_void_p, ctypes.c_uint64]
        # feeder
        lib.pcs_feeder_start.restype = ctypes.c_void_p
        lib.pcs_feeder_start.argtypes = [
            ctypes.c_char_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_double, ctypes.c_int, ctypes.c_int]
        lib.pcs_feeder_fed.restype = ctypes.c_uint64
        lib.pcs_feeder_fed.argtypes = [ctypes.c_void_p]
        lib.pcs_feeder_done.restype = ctypes.c_int
        lib.pcs_feeder_done.argtypes = [ctypes.c_void_p]
        lib.pcs_feeder_stop.restype = ctypes.c_uint64
        lib.pcs_feeder_stop.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


class NativeMailbox:
    """Latest-wins depth-1 mailbox backed by the C++ implementation.

    Payloads are (t, points) frames serialized as: double t, uint32 n,
    float32 points[n*3].  API-compatible with runtime.mailbox.LatestWinsMailbox
    for the engine's purposes.
    """

    def __init__(self, max_points: int = 65536):
        lib = _load()
        if lib is None:
            raise RuntimeError("native runtime unavailable")
        self._lib = lib
        self._h = ctypes.c_void_p(lib.pcs_mailbox_create())
        self._cap = 12 + max_points * 12
        self._buf = ctypes.create_string_buffer(self._cap)

    def put(self, value: Tuple[float, np.ndarray]) -> None:
        t, points = value
        pts = np.ascontiguousarray(points, dtype=np.float32).reshape(-1, 3)
        payload = struct.pack("<dI", float(t), len(pts)) + pts.tobytes()
        self._lib.pcs_mailbox_put(self._h, payload, len(payload))

    def take(self, timeout: Optional[float] = None):
        ms = -1 if timeout is None else int(timeout * 1000)
        n = self._lib.pcs_mailbox_take(self._h, self._buf, self._cap, ms)
        if n < 0:
            return None
        raw = self._buf.raw[: min(n, self._cap)]
        t, npts = struct.unpack_from("<dI", raw, 0)
        # An oversized frame is truncated to the buffer by pcs_mailbox_take
        # but the header's npts is intact — clamp to the bytes actually
        # copied (overflow points drop, like _pad_raw) instead of letting
        # np.frombuffer raise and kill the consumer thread.
        npts = min(npts, (len(raw) - 12) // 12)
        pts = np.frombuffer(raw, dtype=np.float32, count=npts * 3,
                            offset=12).reshape(npts, 3).copy()
        return (t, pts)

    def close(self) -> None:
        self._lib.pcs_mailbox_close(self._h)

    @property
    def dropped(self) -> int:
        return int(self._lib.pcs_mailbox_dropped(self._h))

    def __del__(self):
        try:
            if getattr(self, "_h", None):
                self._lib.pcs_mailbox_destroy(self._h)
                self._h = None
        except Exception:
            pass


class NativePoseBuffer:
    """C++ pose ring buffer — API-compatible with runtime.posebuffer.PoseBuffer
    (push / lookup / len), same interpolation + timeout semantics, GIL-free."""

    def __init__(self, capacity: int = 4096, timeout: float = 1.0):
        lib = _load()
        if lib is None:
            raise RuntimeError("native runtime unavailable")
        self._lib = lib
        self._h = ctypes.c_void_p(lib.pcs_posebuf_create(capacity,
                                                         float(timeout)))
        self.capacity = capacity
        self.timeout = timeout

    def push(self, t: float, position, quat_wxyz) -> None:
        pos = np.ascontiguousarray(position, dtype=np.float64)
        quat = np.ascontiguousarray(quat_wxyz, dtype=np.float64)
        self._lib.pcs_posebuf_push(
            self._h, float(t),
            pos.ctypes.data_as(ctypes.c_void_p),
            quat.ctypes.data_as(ctypes.c_void_p))

    def lookup(self, t: float):
        pos = np.empty(3, np.float64)
        quat = np.empty(4, np.float64)
        ok = self._lib.pcs_posebuf_lookup(
            self._h, float(t),
            pos.ctypes.data_as(ctypes.c_void_p),
            quat.ctypes.data_as(ctypes.c_void_p))
        return (pos, quat) if ok else None

    def __len__(self) -> int:
        return int(self._lib.pcs_posebuf_size(self._h))

    def __del__(self):
        try:
            if getattr(self, "_h", None):
                self._lib.pcs_posebuf_destroy(self._h)
                self._h = None
        except Exception:
            pass


def write_segments_csv(path: str, segments) -> None:
    """Native counterpart of csvio.write_segments_csv (byte-identical)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native runtime unavailable")
    segments = list(segments)
    rows = np.empty((len(segments), 8), np.float64)
    for i, s in enumerate(segments):
        rows[i, 0:3] = np.asarray(s["a"], np.float64)
        rows[i, 3:6] = np.asarray(s["b"], np.float64)
        rows[i, 6] = float(s["t_min"])
        rows[i, 7] = float(s["t_max"])
    rows = np.ascontiguousarray(rows)
    rc = lib.pcs_csv_write_segments(path.encode(),
                                    rows.ctypes.data_as(ctypes.c_void_p),
                                    len(segments))
    if rc != 0:
        raise IOError(f"native segments csv write failed: {path}")


def write_intersections_csv(path: str, rows_in) -> None:
    """Native counterpart of csvio.write_intersections_csv."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native runtime unavailable")
    rows_in = list(rows_in)
    rows = np.empty((len(rows_in), 4), np.float64)
    for i, (s1, t1, s2, t2) in enumerate(rows_in):
        rows[i] = (int(s1), float(t1), int(s2), float(t2))
    rows = np.ascontiguousarray(rows)
    rc = lib.pcs_csv_write_intersections(
        path.encode(), rows.ctypes.data_as(ctypes.c_void_p), len(rows_in))
    if rc != 0:
        raise IOError(f"native intersections csv write failed: {path}")


def write_processing_time_csv(path: str, records) -> None:
    """Native counterpart of csvio.write_processing_time_csv."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native runtime unavailable")
    records = list(records)
    rows = np.empty((len(records), 4), np.float64)
    for i, r in enumerate(records):
        rows[i] = (float(r["wall_time"]), float(r["processing_time"]),
                   int(r["seg_vec_size"]), int(r["nblines"]))
    rows = np.ascontiguousarray(rows)
    rc = lib.pcs_csv_write_processing(
        path.encode(), rows.ctypes.data_as(ctypes.c_void_p), len(records))
    if rc != 0:
        raise IOError(f"native processing csv write failed: {path}")


class NativeFeeder:
    """Background C++ thread replaying a frame log into a NativeMailbox and
    a NativePoseBuffer at a fixed rate — the sensor/ROS-spinner analog.

    The engine consumes through its normal streaming interface; when it
    falls behind, frames are dropped by the depth-1 mailbox exactly like
    the reference's queue-size-1 /tof_pc subscription (node.cpp:64)."""

    def __init__(self, log_path: str, mailbox: "NativeMailbox",
                 posebuf: Optional["NativePoseBuffer"] = None,
                 rate_hz: float = 0.0, loops: int = 1,
                 close_on_end: bool = True):
        lib = _load()
        if lib is None:
            raise RuntimeError("native runtime unavailable")
        self._lib = lib
        self._h = ctypes.c_void_p(lib.pcs_feeder_start(
            log_path.encode(), mailbox._h,
            posebuf._h if posebuf is not None else None,
            float(rate_hz), int(loops), 1 if close_on_end else 0))
        # keep referents alive for the C thread's lifetime
        self._mailbox = mailbox
        self._posebuf = posebuf

    @property
    def fed(self) -> int:
        return int(self._lib.pcs_feeder_fed(self._h))

    @property
    def done(self) -> bool:
        return bool(self._lib.pcs_feeder_done(self._h))

    def stop(self) -> int:
        """Stop (if running), join, and free; returns frames fed."""
        if self._h:
            n = int(self._lib.pcs_feeder_stop(self._h))
            self._h = None
            return n
        return 0

    def __del__(self):
        try:
            self.stop()
        except Exception:
            pass


class FrameLogWriter:
    def __init__(self, path: str):
        lib = _load()
        if lib is None:
            raise RuntimeError("native runtime unavailable")
        self._lib = lib
        self._h = ctypes.c_void_p(lib.pcs_log_open_write(path.encode()))
        if not self._h:
            raise IOError(f"cannot open {path}")

    def write(self, t: float, position, quat_wxyz, points) -> None:
        pos = np.ascontiguousarray(position, dtype=np.float64)
        quat = np.ascontiguousarray(quat_wxyz, dtype=np.float64)
        pts = np.ascontiguousarray(points, dtype=np.float32).reshape(-1, 3)
        rc = self._lib.pcs_log_write_frame(
            self._h, float(t),
            pos.ctypes.data_as(ctypes.c_void_p),
            quat.ctypes.data_as(ctypes.c_void_p),
            pts.ctypes.data_as(ctypes.c_void_p), len(pts))
        if rc != 0:
            raise IOError("frame write failed")

    def close(self) -> int:
        if self._h:
            n = int(self._lib.pcs_log_close_write(self._h))
            self._h = None
            return n
        return 0

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()


class FrameLogReader:
    def __init__(self, path: str, max_points: int = 65536):
        lib = _load()
        if lib is None:
            raise RuntimeError("native runtime unavailable")
        self._lib = lib
        self._h = ctypes.c_void_p(lib.pcs_log_open_read(path.encode()))
        if not self._h:
            raise IOError(f"cannot open {path}")
        self._max_points = max_points

    def __iter__(self):
        return self

    def __next__(self):
        t = ctypes.c_double()
        pos = np.empty(3, np.float64)
        quat = np.empty(4, np.float64)
        pts = np.empty((self._max_points, 3), np.float32)
        n = self._lib.pcs_log_read_frame(
            self._h, ctypes.byref(t),
            pos.ctypes.data_as(ctypes.c_void_p),
            quat.ctypes.data_as(ctypes.c_void_p),
            pts.ctypes.data_as(ctypes.c_void_p), self._max_points)
        if n < 0:
            self.close()
            raise StopIteration
        k = min(int(n), self._max_points)
        return float(t.value), pos, quat, pts[:k].copy()

    def close(self) -> None:
        if self._h:
            self._lib.pcs_log_close_read(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()
