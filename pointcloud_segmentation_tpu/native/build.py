"""Lazy build of the native runtime library (g++ -> shared object).

pybind11 is not available in this image, so the native runtime exposes a C
ABI consumed via ctypes.  The library is compiled on first use into the
package directory (or a user cache when the source tree is read-only) and
reused afterwards; failures fall back to the pure-Python implementations.
"""

from __future__ import annotations

import os
import subprocess
import tempfile

_SRC_CANDIDATES = (
    os.path.join(os.path.dirname(__file__), "..", "..", "native", "pcs_runtime.cpp"),
    os.path.join(os.path.dirname(__file__), "pcs_runtime.cpp"),
)
_LIB_NAME = "libpcs_runtime.so"


def _source_path() -> str | None:
    for c in _SRC_CANDIDATES:
        p = os.path.abspath(c)
        if os.path.exists(p):
            return p
    return None


def library_path(rebuild: bool = False) -> str | None:
    """Path to the built shared library, building it if needed."""
    src = _source_path()
    if src is None:
        return None
    out_dir = os.path.dirname(__file__)
    if not os.access(out_dir, os.W_OK):
        out_dir = os.path.join(tempfile.gettempdir(), "pcs_native")
        os.makedirs(out_dir, exist_ok=True)
    lib = os.path.join(out_dir, _LIB_NAME)
    if not rebuild and os.path.exists(lib) and (
            os.path.getmtime(lib) >= os.path.getmtime(src)):
        return lib
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-o", lib, src,
           "-lpthread"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except Exception:
        return None
    return lib if os.path.exists(lib) else None
