"""Recorded frame logs: save/load replay streams.

The reference has no replay path (validation is simulation-in-the-loop,
SURVEY.md §4); this module closes that gap.  The on-disk format is the
native binary frame log (native/pcs_runtime.cpp) when the C++ runtime is
available, with an identical-layout pure-Python codec as fallback — the
files are interchangeable.
"""

from __future__ import annotations

import struct
from typing import Iterable, Iterator, List

import numpy as np

from .simulator import Frame
from .. import native

_MAGIC = b"PCSL"
_VERSION = 1


# ------------------------------------------------------------ python codec

def _py_save(path: str, frames: Iterable[Frame]) -> int:
    n = 0
    with open(path, "wb") as f:
        f.write(_MAGIC)
        f.write(struct.pack("<I", _VERSION))
        for fr in frames:
            pts = np.ascontiguousarray(fr.points, dtype=np.float32).reshape(-1, 3)
            f.write(struct.pack("<d", float(fr.t)))
            f.write(np.ascontiguousarray(fr.position, np.float64).tobytes())
            f.write(np.ascontiguousarray(fr.quat_wxyz, np.float64).tobytes())
            f.write(struct.pack("<I", len(pts)))
            f.write(pts.tobytes())
            n += 1
    return n


def _py_load(path: str) -> Iterator[Frame]:
    with open(path, "rb") as f:
        if f.read(4) != _MAGIC:
            raise IOError(f"{path}: not a PCSL frame log")
        (version,) = struct.unpack("<I", f.read(4))
        if version != _VERSION:
            raise IOError(f"{path}: unsupported version {version}")
        while True:
            head = f.read(8)
            if len(head) < 8:
                return
            (t,) = struct.unpack("<d", head)
            pos = np.frombuffer(f.read(24), np.float64).copy()
            quat = np.frombuffer(f.read(32), np.float64).copy()
            (n,) = struct.unpack("<I", f.read(4))
            pts = np.frombuffer(f.read(n * 12), np.float32).reshape(n, 3).copy()
            yield Frame(t=t, position=pos, quat_wxyz=quat, points=pts)


# ------------------------------------------------------------ public API

def save_frames(path: str, frames: Iterable[Frame]) -> int:
    """Write a replay log; returns the frame count."""
    if native.available():
        with native.FrameLogWriter(path) as w:
            n = 0
            for fr in frames:
                w.write(fr.t, fr.position, fr.quat_wxyz, fr.points)
                n += 1
            return n
    return _py_save(path, frames)


def load_frames(path: str, max_points: int = 65536) -> List[Frame]:
    """Read a replay log back into Frame objects."""
    if native.available():
        out = []
        with native.FrameLogReader(path, max_points=max_points) as r:
            for (t, pos, quat, pts) in r:
                out.append(Frame(t=t, position=pos, quat_wxyz=quat, points=pts))
        return out
    return list(_py_load(path))
