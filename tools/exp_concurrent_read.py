#!/usr/bin/env python
"""Relay-safety experiment: one dispatcher thread + one dedicated reader.

Question for the streaming engine: can the periodic batched scalar readback
(`np.asarray` on a stacked (K, 4) handle — ~25-50 ms relay round-trip) run
on a SEPARATE thread while the worker keeps dispatching jit'd steps, so the
flush stall comes off the dispatch critical path?  Today `_flush_pending`
holds `_state_lock` across the whole readback, which stalls dispatch for
1-2 frame periods per flush and is the source of the remaining ~4% drops
at a 30 Hz feed (bench_details streaming_map_build).

The characterized relay wedge (CLAUDE.md) is two threads doing synchronous
device->host READS concurrently.  The pattern here has exactly ONE reader
thread; the novel part is a read concurrent with dispatches.  This script
validates that pattern standalone before the engine adopts it:

  dispatcher thread: paces the packed node step at `RATE` Hz, records
      per-dispatch wall latency; every K frames stacks the pending scalar
      handles (a dispatch, still on this thread) and enqueues the stacked
      handle for the reader.
  reader thread: pops stacked handles, does the ONLY blocking read
      (np.asarray), records read latency.

Outputs one JSON line: dispatch p50/p95/max split by whether a read was in
flight, read p50/max, and wedge=false if both threads completed and the
process exits cleanly.  Run on the real TPU (plain `python`, no timeout —
never kill a TPU process).
"""

import json
import queue
import sys
import threading
import time

import numpy as np

sys.path.insert(0, ".")
import bench  # noqa: E402  (repo-root helpers)

RATE = float(sys.argv[1]) if len(sys.argv) > 1 else 100.0
N = int(sys.argv[2]) if len(sys.argv) > 2 else 300
K = 32


def main():
    import jax.numpy as jnp

    from pointcloud_segmentation_tpu.config import PipelineConfig
    from pointcloud_segmentation_tpu.pipeline import (
        init_world, make_process_frame_packed)

    cfg = PipelineConfig()
    frames = bench.build_frames(cfg, 40)
    step = make_process_frame_packed(cfg)
    state = init_world(cfg)

    def pad(fr):
        raw = np.full((cfg.shapes.max_raw_points, 3), np.nan, np.float32)
        k = min(len(fr.points), cfg.shapes.max_raw_points)
        raw[:k] = fr.points[:k]
        return (jnp.asarray(raw), jnp.asarray(fr.position, jnp.float32),
                jnp.asarray(fr.quat_wxyz, jnp.float32))

    args_all = [pad(fr) for fr in frames]

    # warm both programs (the step and the (K,4) stack) before timing
    state, _out, sc = step(state, *args_all[0])
    warm = jnp.stack([sc] * K)
    _ = np.asarray(warm)
    print("warmed", file=sys.stderr, flush=True)

    q = queue.Queue()
    read_flag = threading.Event()   # set while a read is in flight
    read_lat = []

    def reader():
        while True:
            item = q.get()
            if item is None:
                return
            t0 = time.perf_counter()
            read_flag.set()
            vals = np.asarray(item)     # the ONLY blocking read
            read_flag.clear()
            read_lat.append(time.perf_counter() - t0)
            assert vals.shape == (K, 4)

    rt = threading.Thread(target=reader, daemon=True)
    rt.start()

    period = 1.0 / RATE
    disp = []           # (latency, read_in_flight_at_start)
    pending = []
    nxt = time.perf_counter()
    for i in range(N):
        a = args_all[i % len(args_all)]
        now = time.perf_counter()
        if now < nxt:
            time.sleep(nxt - now)
        nxt = max(nxt + period, time.perf_counter())
        in_read = read_flag.is_set()
        t0 = time.perf_counter()
        state, _out, sc = step(state, *a)
        pending.append(sc)
        if len(pending) >= K:
            stacked = jnp.stack(pending)    # dispatch, this thread
            pending = []
            q.put(stacked)
        disp.append((time.perf_counter() - t0, in_read))

    q.put(None)
    rt.join()                       # completes iff no wedge
    # final sync proves the device stream is healthy after the run
    _ = int(np.asarray(sc)[0])

    lat = np.array([d for d, _ in disp])
    lat_r = np.array([d for d, f in disp if f]) if any(f for _, f in disp) \
        else np.array([np.nan])
    lat_n = np.array([d for d, f in disp if not f])
    rl = np.array(read_lat)
    print(json.dumps({
        "rate_hz": RATE, "n": N, "k": K, "wedge": False,
        "reads": len(read_lat),
        "dispatch_ms": {"p50": round(float(np.percentile(lat, 50)) * 1e3, 2),
                        "p95": round(float(np.percentile(lat, 95)) * 1e3, 2),
                        "max": round(float(lat.max()) * 1e3, 2)},
        "dispatch_during_read_ms": {
            "n": int(len(lat_r) if not np.isnan(lat_r).any() else 0),
            "p50": round(float(np.nanpercentile(lat_r, 50)) * 1e3, 2),
            "max": round(float(np.nanmax(lat_r)) * 1e3, 2)},
        "dispatch_no_read_ms": {
            "p50": round(float(np.percentile(lat_n, 50)) * 1e3, 2),
            "max": round(float(lat_n.max()) * 1e3, 2)},
        "read_ms": {"p50": round(float(np.percentile(rl, 50)) * 1e3, 2),
                    "max": round(float(rl.max()) * 1e3, 2)},
    }), flush=True)


if __name__ == "__main__":
    main()
