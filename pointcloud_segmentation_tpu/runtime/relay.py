"""Axon relay client maintenance: bounded host RSS for endless streams.

The testbed reaches its TPU through the axon PJRT plugin (a loopback
relay).  The client keeps a **replay journal** of every operation — full
host->device transfer payloads included — so it can re-bind and replay the
session after a connection drop.  The journal is never compacted while the
connection is healthy, so host RSS grows without bound:

  * ~0.85x the payload bytes per host->device transfer (measured
    434 KB retained per 512 KB transfer),
  * ~1.5 KB per dispatched op,
  * ~0.35x bytes per device->host read.

For the streaming engine that is ~55 KB per processed frame (one padded
(4096, 3) float32 cloud + a handful of ops): a 10-minute 30 Hz soak grew
RSS 303 -> 911 MB and would exhaust the host in hours.  ``AXON_JOURNAL_
COMPACT`` is NOT a fix: measured, it leaves the transfer retention intact
and makes device->host reads ~170x slower (3.5 s each).

The plugin exports ``axon_reset()`` (no arguments), which clears the
journal and frees the retained payloads while keeping the session and
every **compiled executable** alive ("reset: exe_table retained; journal
cleared").  The cost: every live **device buffer** predates the new
journal watermark and is dead afterwards ("buffer bN was allocated before
axon reset()"), and a post-reset connection drop cannot be replayed.

The engine therefore runs a cadenced *journal reset*: snapshot the world
state to the host in ONE packed read (`make_pytree_packer`), call
``journal_reset()``, re-upload, continue.  Measured: RSS swing bounded to
the cadence window, state round-trip bit-exact, post-reset dispatches
re-inject their executables automatically.

No counterpart in the reference (its map lives in process RAM,
node.cpp:136-138); this is TPU-testbed runtime plumbing.
"""

from __future__ import annotations

import ctypes
import os
import threading
from typing import Callable, Tuple

import numpy as np

_SO_PATH = "/opt/axon/libaxon_pjrt.so"
_lib = None
_lib_lock = threading.Lock()


def _load():
    global _lib
    if _lib is None:
        with _lib_lock:
            if _lib is None:
                if not os.path.exists(_SO_PATH):
                    _lib = False
                else:
                    try:
                        h = ctypes.CDLL(_SO_PATH)
                        h.axon_reset.restype = ctypes.c_void_p
                        _lib = h
                    except Exception:
                        _lib = False
    return _lib or None


def is_axon_platform() -> bool:
    """True iff jax's ACTIVE backend comes through the axon relay plugin
    (without forcing a backend init error on hosts where axon is
    configured but down).

    The plugin's self-reported platform name is NOT stable across builds:
    it registered as 'axon' through round 3 and as plain 'tpu' after an
    image rebuild — which silently disabled the journal-reset auto-default
    and re-opened the ~55 KB/frame relay leak (caught by the round-4
    endurance soak: 30 min at 30 Hz grew RSS 303 -> 3262 MB with
    journal_resets=0).  So key on what IS stable: the axon backend
    factory being registered (sitecustomize registers it exactly where
    the relay is the TPU path; tests/tools pop it when forcing CPU) and
    the active backend being one the plugin produces.

    ``_backend_factories`` is a PRIVATE jax attr; if a jax upgrade moves
    it, silently returning False would re-open the exact leak above — so
    that case fails OPEN (and loud) on the relay's most stable marker,
    the plugin .so being loadable (reset_supported)."""
    try:
        import jax
        from jax._src import xla_bridge

        if jax.default_backend() not in ("axon", "tpu"):
            return False
        factories = getattr(xla_bridge, "_backend_factories", None)
        if factories is not None:
            return "axon" in factories
        import warnings
        warnings.warn(
            "jax._src.xla_bridge._backend_factories is gone (jax "
            "upgrade?) — relay detection falling back to the plugin .so "
            "marker; update runtime/relay.py:is_axon_platform")
        return reset_supported()
    except Exception:
        return False


def reset_supported() -> bool:
    return _load() is not None


_METRIC_FNS = ("axon_session_compile_s", "axon_session_hold_s",
               "axon_session_wait_s", "axon_session_wait_total_s")


def session_metrics() -> dict:
    """Snapshot the relay plugin's cumulative session counters (seconds
    spent compiling / holding / waiting on the remote since session
    start) plus the opaque ``counts`` machine word.

    QUIESCENT PROBES ONLY (tools/exp_reset_cost.py): calling the seconds
    counters while another thread is dispatching spins forever inside the
    plugin (measured: sampling thread pinned at 100% CPU for minutes
    mid-stream), so streaming monitors must use the engine's host-side
    forensics (pop_stall_max / reset_log) instead.  Returns {} when the
    plugin is absent; counters the live build doesn't export (or that
    report -1 = no session yet) are omitted."""
    h = _load()
    if h is None:
        return {}
    out = {}
    for name in _METRIC_FNS:
        try:
            fn = getattr(h, name)
            fn.restype = ctypes.c_double
            v = float(fn())
        except Exception:
            continue
        if v >= 0.0:
            out[name.replace("axon_session_", "")] = v
    try:
        fn = h.axon_session_counts
        # NOT a string: in-session this returns a small integer (treating
        # it as char* strlen-segfaults at that address — measured, fault
        # addr 0xc).  Record the raw machine word, never dereference.
        fn.restype = ctypes.c_void_p
        raw = fn()
        if raw:
            out["counts"] = int(raw)
    except Exception:
        pass
    return out


def journal_reset() -> bool:
    """Clear the relay client's replay journal (frees every retained
    transfer payload).  Returns False when the plugin library is absent.

    Caller contract: NO live device buffer may be used afterwards — every
    array the caller intends to keep must be read back to host before the
    call and re-uploaded after.  Compiled executables survive."""
    h = _load()
    if h is None:
        return False
    h.axon_reset()
    return True


def make_pytree_packer(tree) -> Tuple[Callable, Callable]:
    """(pack, unpack) for snapshotting a fixed-shape pytree across a
    journal reset in ONE device->host read + ONE host->device transfer.

    ``pack(tree) -> uint32[N]`` (jitted) bitcasts every leaf to uint32
    words and concatenates — float bits are preserved exactly, so the
    round-trip is bit-identical, not merely close.  ``unpack(uint32[N])
    -> tree`` (jitted) is its inverse on device: upload the single host
    vector, dispatch one unpack, and the state is live again.

    Built from a template tree; every later call must match its
    shapes/dtypes (they do: the world state is fixed-capacity SoA)."""
    import jax
    import jax.numpy as jnp

    leaves, treedef = jax.tree_util.tree_flatten(tree)
    specs = [(tuple(l.shape), np.dtype(l.dtype)) for l in leaves]

    def _to_words(x):
        flat = x.ravel()
        if flat.dtype == jnp.bool_:
            return flat.astype(jnp.uint32)
        if flat.dtype.itemsize == 4:
            return jax.lax.bitcast_convert_type(flat, jnp.uint32)
        if flat.dtype.itemsize == 8:
            # (n, 2) uint32 words, C-order ravel keeps the pairing
            return jax.lax.bitcast_convert_type(flat, jnp.uint32).ravel()
        # 1/2-byte dtypes: widen (exact for the integer/bool leaves used)
        return flat.astype(jnp.uint32)

    @jax.jit
    def pack(t):
        return jnp.concatenate([_to_words(x) for x in jax.tree_util.tree_leaves(t)])

    def _n_words(shape, dt) -> int:
        n = int(np.prod(shape, dtype=np.int64)) if shape else 1
        return n * 2 if dt.itemsize == 8 else n

    @jax.jit
    def unpack(vec):
        out = []
        off = 0
        for shape, dt in specs:
            n = int(np.prod(shape, dtype=np.int64)) if shape else 1
            w = _n_words(shape, dt)
            chunk = vec[off:off + w]
            off += w
            if dt == np.bool_:
                leaf = chunk.astype(jnp.bool_)
            elif dt.itemsize == 8:
                leaf = jax.lax.bitcast_convert_type(
                    chunk.reshape(n, 2), jnp.dtype(dt))
            elif dt.itemsize == 4:
                leaf = jax.lax.bitcast_convert_type(chunk, jnp.dtype(dt))
            else:
                leaf = chunk.astype(jnp.dtype(dt))
            out.append(leaf.reshape(shape))
        return jax.tree_util.tree_unflatten(treedef, out)

    return pack, unpack


def make_host_unpacker(tree) -> Callable:
    """Numpy twin of ``make_pytree_packer``'s ``unpack``: decode the packed
    uint32 snapshot entirely on HOST — zero device dispatches or reads.

    The deferred-streaming flusher uses this to render flush-cadence live
    viz from the SAME single packed read that costs one relay round-trip
    (runtime/engine._emit_viz_flush); dispatching the jitted ``unpack``
    plus per-field reads would cost ~9 round-trips per record instead.
    Bit-exactness vs the device unpack (word pairing for 8-byte dtypes
    included) is pinned by tests/test_journal_reset.py."""
    import jax

    leaves, treedef = jax.tree_util.tree_flatten(tree)
    specs = [(tuple(l.shape), np.dtype(l.dtype)) for l in leaves]

    def unpack_host(vec: np.ndarray):
        vec = np.ascontiguousarray(np.asarray(vec, dtype=np.uint32))
        out, off = [], 0
        for shape, dt in specs:
            n = int(np.prod(shape, dtype=np.int64)) if shape else 1
            w = n * 2 if dt.itemsize == 8 else n
            chunk = np.ascontiguousarray(vec[off:off + w])
            off += w
            if dt == np.bool_:
                leaf = chunk.astype(np.bool_)
            elif dt.itemsize == 8:
                # (n, 2) uint32 -> raw bytes -> dt: little-endian word order
                # matches jax.lax.bitcast_convert_type's minor-dim layout
                leaf = chunk.reshape(n, 2).view(dt).ravel()
            elif dt.itemsize == 4:
                leaf = chunk.view(dt)
            else:
                leaf = chunk.astype(dt)
            out.append(leaf.reshape(shape))
        return jax.tree_util.tree_unflatten(treedef, out)

    return unpack_host
