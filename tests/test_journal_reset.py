"""Axon journal reset: bounded host RSS for endless relay streams.

The relay client journals every operation (payloads included) for
replay-on-disconnect and never compacts — ~55 KB host RSS per processed
frame, unbounded (runtime/relay.py).  The engine's cadenced reset
snapshots the world state in ONE packed read, clears the journal, and
re-uploads.  These tests run the full machinery on CPU with the actual
`axon_reset()` call stubbed (the .so's reset is only meaningful against a
live relay session; its contract — all pre-reset device buffers die,
executables survive — is documented from measurement in relay.py).
"""

import threading
import time

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pointcloud_segmentation_tpu.config import default_config, StaticShapes
from pointcloud_segmentation_tpu.runtime import SegmentationEngine
from pointcloud_segmentation_tpu.runtime import relay
from pointcloud_segmentation_tpu.io.scene import (
    OBS_TESTS_SCENE, WP_TESTS, trajectory_poses)
from pointcloud_segmentation_tpu.io.simulator import simulate_trajectory, TofSpec
from pointcloud_segmentation_tpu.worldmap import WorldState, init_world

CFG = default_config(
    granularity=2,
    shapes=StaticShapes(max_raw_points=4096, max_points=2048,
                        max_world_segments=32),
)


@pytest.fixture()
def frames():
    poses = trajectory_poses(WP_TESTS, hz=1.0, velocity=0.4)[:8]
    return simulate_trajectory(OBS_TESTS_SCENE, poses,
                               TofSpec(noise_frac=0.002), seed=1)


def _rand_state(cfg, seed=7):
    """A WorldState with adversarial bit patterns (negative zeros, denormals,
    NaN payloads survive a BIT-exact snapshot; a value-level copy would not
    distinguish them)."""
    rng = np.random.default_rng(seed)
    S = cfg.shapes.max_world_segments
    f = np.float32
    a = rng.normal(size=(S, 3)).astype(f)
    a[0, 0] = np.float32(-0.0)
    a[1, 1] = np.float32(1e-42)            # denormal
    inter = rng.normal(size=(S, S, 2)).astype(f)
    inter[2, 3, 0] = np.nan
    return WorldState(
        a=jnp.asarray(a), b=jnp.asarray(rng.normal(size=(S, 3)).astype(f)),
        t_min=jnp.asarray(rng.normal(size=S).astype(f)),
        t_max=jnp.asarray(rng.normal(size=S).astype(f)),
        radius=jnp.asarray(rng.normal(size=S).astype(f)),
        points_size=jnp.asarray(
            rng.integers(-2**31, 2**31 - 1, size=S, dtype=np.int32)),
        pca_coeff=jnp.asarray(rng.normal(size=S).astype(f)),
        pca_eigenvalues=jnp.asarray(rng.normal(size=(S, 3)).astype(f)),
        valid=jnp.asarray(rng.integers(0, 2, size=S).astype(bool)),
        count=jnp.int32(17),
        inter=jnp.asarray(inter))


def _assert_state_bit_equal(x: WorldState, y: WorldState):
    for name in WorldState._fields:
        xa, ya = np.asarray(getattr(x, name)), np.asarray(getattr(y, name))
        assert xa.dtype == ya.dtype and xa.shape == ya.shape, name
        if xa.dtype.kind == "f":
            np.testing.assert_array_equal(
                xa.view(np.uint32 if xa.dtype.itemsize == 4 else np.uint64),
                ya.view(np.uint32 if xa.dtype.itemsize == 4 else np.uint64),
                err_msg=name)
        else:
            np.testing.assert_array_equal(xa, ya, err_msg=name)


def test_packer_roundtrip_bit_exact():
    st = _rand_state(CFG)
    pack, unpack = relay.make_pytree_packer(st)
    vec = np.asarray(pack(st))
    assert vec.dtype == np.uint32 and vec.ndim == 1
    # the reset path round-trips through HOST memory — include it
    _assert_state_bit_equal(st, unpack(jnp.asarray(vec)))


def test_packer_roundtrip_f64():
    """x64 leaves ride 2 uint32 words each; pairing must survive ravel."""
    with jax.enable_x64(True):
        st = init_world(CFG, dtype=jnp.float64)
        st = st._replace(
            a=st.a.at[0, 0].set(-0.0),
            t_min=st.t_min.at[1].set(np.nextafter(np.float64(1.0), 2.0)))
        pack, unpack = relay.make_pytree_packer(st)
        vec = np.asarray(pack(st))
        back = unpack(jnp.asarray(vec))
        for name in WorldState._fields:
            xa, ya = np.asarray(getattr(st, name)), np.asarray(
                getattr(back, name))
            assert xa.dtype == ya.dtype, name
            if xa.dtype.kind == "f":
                np.testing.assert_array_equal(
                    xa.view(np.uint64), ya.view(np.uint64), err_msg=name)
            else:
                np.testing.assert_array_equal(xa, ya, err_msg=name)


def test_host_unpacker_bit_exact():
    """relay.make_host_unpacker (flush-cadence viz decode) must agree with
    the device unpack bit-for-bit, adversarial float patterns included."""
    st = _rand_state(CFG)
    pack, _ = relay.make_pytree_packer(st)
    unpack_host = relay.make_host_unpacker(st)
    back = unpack_host(np.asarray(pack(st)))
    assert all(isinstance(np.asarray(getattr(back, n)), np.ndarray)
               for n in WorldState._fields)
    _assert_state_bit_equal(st, back)


def test_host_unpacker_f64_word_pairing():
    """8-byte leaves ride 2 uint32 words each; the host view() decode must
    pair them exactly like jax.lax.bitcast_convert_type's minor-dim layout."""
    with jax.enable_x64(True):
        st = init_world(CFG, dtype=jnp.float64)
        st = st._replace(
            a=st.a.at[0, 0].set(-0.0),
            t_min=st.t_min.at[1].set(np.nextafter(np.float64(1.0), 2.0)))
        pack, _ = relay.make_pytree_packer(st)
        back = relay.make_host_unpacker(st)(np.asarray(pack(st)))
        for name in WorldState._fields:
            xa, ya = np.asarray(getattr(st, name)), np.asarray(
                getattr(back, name))
            assert xa.dtype == ya.dtype, name
            if xa.dtype.kind == "f":
                np.testing.assert_array_equal(
                    xa.view(np.uint64), ya.view(np.uint64), err_msg=name)
            else:
                np.testing.assert_array_equal(xa, ya, err_msg=name)


def test_manual_journal_reset_state_identical(frames, monkeypatch):
    """journal_reset() between replay frames must be invisible: identical
    world map (bit-exact) and identical remaining-frame results versus an
    uninterrupted run."""
    calls = []
    monkeypatch.setattr(relay, "journal_reset", lambda: calls.append(1) or True)

    ref = SegmentationEngine(CFG, backend="jax", journal_reset_every=0)
    recs_ref = ref.run_replay(frames)

    eng = SegmentationEngine(CFG, backend="jax", journal_reset_every=0)
    recs = []
    for i, fr in enumerate(frames):
        eng.push_pose(fr.t, fr.position, fr.quat_wxyz)
        recs.append(eng.process_frame(fr.t, fr.points))
        if i == 3:
            before = jax.tree_util.tree_map(np.asarray, eng._state)
            assert eng.journal_reset()
            _assert_state_bit_equal(before, eng._state)
    assert len(calls) == 1 and eng.journal_resets == 1
    assert [r["seg_vec_size"] for r in recs] == \
        [r["seg_vec_size"] for r in recs_ref]
    _assert_state_bit_equal(ref._state, eng._state)


def test_streaming_cadence_reset(frames, monkeypatch):
    """The deferred-streaming worker runs resets on its frame cadence:
    pending scalar batches are flushed+read first (no -1 sentinels die with
    the journal), and the final map matches a synchronous replay."""
    calls = []
    monkeypatch.setattr(relay, "journal_reset", lambda: calls.append(1) or True)

    eng = SegmentationEngine(CFG, backend="jax", stream_sync_every=3,
                             journal_reset_every=3)
    assert eng._stream_deferred
    eng.start()
    for fr in frames:
        target = (eng.frames_processed + eng.frames_skipped_no_pose
                  + eng.frames_failed + 1)
        eng.push_pose(fr.t, fr.position, fr.quat_wxyz)
        eng.submit_cloud(fr.t, fr.points)
        deadline = time.time() + 60
        while (eng.frames_processed + eng.frames_skipped_no_pose
               + eng.frames_failed) < target and time.time() < deadline:
            time.sleep(0.002)
    # let the worker cross the final cadence in an idle window (generous
    # deadline: under an oversubscribed CI host the idle-gated flusher can
    # take tens of seconds to drain — measured as a load-flake at 10 s,
    # and again at 60 s with the suite niced to 19 under two CPU hogs)
    deadline = time.time() + 180
    while eng.journal_resets < 2 and time.time() < deadline:
        time.sleep(0.01)
    eng.stop()
    assert eng.journal_resets >= 2
    assert len(calls) == eng.journal_resets
    assert eng.frames_processed == len(frames)
    assert all(r["seg_vec_size"] >= 0 and r["nblines"] >= 0
               for r in eng.records)
    ref = SegmentationEngine(CFG, backend="jax")
    recs_ref = ref.run_replay(frames)
    assert [r["seg_vec_size"] for r in eng.records] == \
        [r["seg_vec_size"] for r in recs_ref]
    _assert_state_bit_equal(ref._state, eng._state)


def test_cadence_reset_waits_for_inflight_readback(frames, monkeypatch):
    """Regression: the pre-reset drain must treat a DEQUEUED-but-unread
    flush batch as in-flight.  A reset in that window kills the stacked
    device handle mid-read on the relay.  The old empty()+busy-flag check
    had exactly that hole (busy rose only after get() returned); the
    task_done()-based drain does not.  Exposed deterministically by making
    every dequeue linger before returning: during the linger the queue is
    empty and no read has started, yet the batch is live."""
    state = {"dequeued_unread": 0, "violations": 0}

    def fake_reset():
        if state["dequeued_unread"] > 0:
            state["violations"] += 1
        return True

    monkeypatch.setattr(relay, "journal_reset", fake_reset)

    eng = SegmentationEngine(CFG, backend="jax", stream_sync_every=2,
                             journal_reset_every=4)
    assert eng._stream_deferred
    eng.start()
    try:
        orig_get = eng._flush_q.get
        counted = set()     # batches whose dequeue went through the patch

        def lingering_get(*a, **k):
            item = orig_get(*a, **k)
            if item is not None:
                counted.add(id(item[0]))
                state["dequeued_unread"] += 1
                time.sleep(0.4)     # the danger window, held open
            return item

        orig_backfill = eng._backfill_batch

        def counted_backfill(batch, stacked):
            try:
                orig_backfill(batch, stacked)
            finally:
                # the flusher may already be parked inside the ORIGINAL
                # get when the patch lands — that first batch's dequeue is
                # uncounted, so only decrement for counted dequeues (an
                # unpaired decrement would park the counter at -1)
                if id(batch) in counted:
                    counted.remove(id(batch))
                    state["dequeued_unread"] -= 1

        # the flusher is parked inside the ORIGINAL get for its first
        # batch; every later dequeue (incl. the one racing the cadence
        # reset) takes the lingering path
        eng._flush_q.get = lingering_get
        eng._backfill_batch = counted_backfill

        for fr in frames:
            target = (eng.frames_processed + eng.frames_skipped_no_pose
                      + eng.frames_failed + 1)
            eng.push_pose(fr.t, fr.position, fr.quat_wxyz)
            eng.submit_cloud(fr.t, fr.points)
            deadline = time.time() + 60
            while (eng.frames_processed + eng.frames_skipped_no_pose
                   + eng.frames_failed) < target and time.time() < deadline:
                time.sleep(0.002)
        deadline = time.time() + 20
        while eng.journal_resets < 1 and time.time() < deadline:
            time.sleep(0.01)
    finally:
        eng.stop()
    assert eng.journal_resets >= 1
    assert state["violations"] == 0
    assert state["dequeued_unread"] == 0
    assert all(r["seg_vec_size"] >= 0 and r["nblines"] >= 0
               for r in eng.records)


def test_journal_reset_rejected_while_running(frames, monkeypatch):
    monkeypatch.setattr(relay, "journal_reset", lambda: True)
    eng = SegmentationEngine(CFG, backend="jax", journal_reset_every=0)
    eng.start()
    try:
        with pytest.raises(RuntimeError, match="streaming"):
            eng.journal_reset()
    finally:
        eng.stop()


def test_reset_unsupported_is_noop(frames, monkeypatch):
    """Without the plugin library journal_reset() reports False and the
    engine state is untouched (CPU backends don't leak — nothing to do)."""
    monkeypatch.setattr(relay, "journal_reset", lambda: False)
    eng = SegmentationEngine(CFG, backend="jax", journal_reset_every=0)
    eng.push_pose(frames[0].t, frames[0].position, frames[0].quat_wxyz)
    eng.process_frame(frames[0].t, frames[0].points)
    before = jax.tree_util.tree_map(np.asarray, eng._state)
    assert eng.journal_reset() is False
    assert eng.journal_resets == 0
    _assert_state_bit_equal(before, eng._state)


def test_auto_default_off_on_cpu():
    eng = SegmentationEngine(CFG, backend="jax")
    assert eng.journal_reset_every == 0   # tests force the CPU platform
    eng2 = SegmentationEngine(CFG, backend="oracle")
    assert eng2.journal_reset_every == 0


def test_is_axon_platform_survives_platform_rename(monkeypatch):
    """The relay plugin registered as platform 'axon' through round 3 and
    as plain 'tpu' after an image rebuild — the name-based check silently
    disabled the journal-reset auto-default and re-opened the
    ~55 KB/frame leak (caught by the round-4 endurance soak: 30 min at
    30 Hz grew RSS 303 -> 3262 MB with journal_resets=0).  The detection
    must key on the registered axon backend factory, not the reported
    platform name."""
    import jax
    from jax._src import xla_bridge

    monkeypatch.setitem(xla_bridge._backend_factories, "axon", object())
    for name in ("axon", "tpu"):           # old and rebuilt plugin names
        monkeypatch.setattr(jax, "default_backend", lambda n=name: n)
        assert relay.is_axon_platform(), name
    # axon registered but another backend actually active: not the relay
    monkeypatch.setattr(jax, "default_backend", lambda: "cpu")
    assert not relay.is_axon_platform()
    # no axon factory (real local TPU, or tests' forced-CPU config)
    monkeypatch.delitem(xla_bridge._backend_factories, "axon")
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert not relay.is_axon_platform()


def test_is_axon_platform_fails_open_without_factory_dict(monkeypatch):
    """``_backend_factories`` is a PRIVATE jax attr; a jax upgrade that
    moves it must not silently return False (that re-opens the journal
    leak with journal_resets=0 — the exact failure the factory check was
    written against).  Instead: fall back, loudly, to the plugin .so
    marker (reset_supported)."""
    import warnings

    import jax
    from jax._src import xla_bridge

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.delattr(xla_bridge, "_backend_factories")
    for so_present in (True, False):
        monkeypatch.setattr(relay, "reset_supported", lambda v=so_present: v)
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            assert relay.is_axon_platform() is so_present
        assert any("_backend_factories" in str(c.message) for c in caught)
    # non-TPU backend still short-circuits before the fallback
    monkeypatch.setattr(jax, "default_backend", lambda: "cpu")
    assert not relay.is_axon_platform()


def test_auto_default_on_when_relay_active(monkeypatch):
    """End-to-end: under the rebuilt plugin's identity ('tpu' + registered
    axon factory) the engine must default journal resets ON."""
    import jax
    from jax._src import xla_bridge

    monkeypatch.setitem(xla_bridge._backend_factories, "axon", object())
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(relay, "reset_supported", lambda: True)
    eng = SegmentationEngine(CFG, backend="jax")
    assert eng.journal_reset_every == eng._JOURNAL_RESET_EVERY_DEFAULT


def test_drain_loop_escapes_midway_wedge(monkeypatch):
    """Regression: the pre-reset drain's wedge check ran ONCE before the
    spin loop — a flusher read that parked AFTER the check (wedges grow
    from 0 s) stalled the worker for the whole 10-357 s park.  The loop
    now re-checks the wedge predicate and bails out, deferring the reset
    (cadence anchor untouched) instead of spinning.  Driven directly:
    an unfinished flush task that never completes + a wedge timestamp
    appearing mid-spin must return promptly WITHOUT resetting."""
    import queue

    calls = {"reset": 0}
    monkeypatch.setattr(relay, "journal_reset",
                        lambda: calls.__setitem__("reset", calls["reset"] + 1)
                        or True)

    eng = SegmentationEngine(CFG, backend="jax", stream_sync_every=2,
                             journal_reset_every=4)
    assert eng._stream_deferred
    # never start(): no flusher thread, so the queued task below stays
    # unfinished forever — the drain can only exit via the wedge escape
    eng._flush_q = queue.Queue()
    eng._flush_q.put(([], None))
    eng._pending = []
    eng._running = True
    eng.frames_processed = 100          # far past the cadence
    eng._read_started_mono = None       # pre-drain check passes

    def set_wedge_soon():
        time.sleep(0.15)
        eng._read_started_mono = time.monotonic() - 10.0   # > 3 s: wedged

    threading.Thread(target=set_wedge_soon, daemon=True).start()
    t = threading.Thread(target=eng._maybe_journal_reset, daemon=True)
    t.start()
    t.join(timeout=10.0)
    assert not t.is_alive(), "drain loop spun through a mid-drain wedge"
    assert calls["reset"] == 0 and eng.journal_resets == 0
    # anchor untouched: the reset retries as soon as reads recover
    assert eng._last_reset_processed == 0
    eng._running = False
