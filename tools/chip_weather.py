#!/usr/bin/env python
"""Chip-weather probe: measure the device's CURRENT service rate before
trusting any benchmark number.

The testbed's TPU is shared; identical code has measured 7 ms and 31 ms
device time per frame within a single hour (docs/PERF.md "mind the
weather").  This prints one line with the on-device fori-loop time per
full pipeline step (granularity 4, 64x64 frame) — compare against the
quiet-chip reference of ~6.5-7 ms before running `bench.py` or chasing a
perf regression.

Usage:  python tools/chip_weather.py   (runs on the real TPU, ~2 min incl.
        compile; do NOT kill it mid-run — stale-claim hazard, CLAUDE.md)
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    import bench
    from pointcloud_segmentation_tpu.config import PipelineConfig
    from pointcloud_segmentation_tpu.pipeline import init_world, process_frame

    cfg = PipelineConfig()
    frames = bench.build_frames(cfg, 3)
    raw = np.full((cfg.shapes.max_raw_points, 3), np.nan, np.float32)
    k = min(len(frames[0].points), len(raw))
    raw[:k] = frames[0].points[:k]
    a0 = (jnp.asarray(raw), jnp.asarray(frames[0].position, jnp.float32),
          jnp.asarray(frames[0].quat_wxyz, jnp.float32))
    # reps=64: the syncing scalar readback costs a full relay round-trip
    # (~25-50 ms) that divides by the rep count — at reps=16 it inflated
    # every reading by ~1.6-3 ms (measurement trap #3, docs/PERF.md).  64
    # keeps the floor under ~0.8 ms; the calibration floor is printed so a
    # reading can be judged against it.
    reps = 64

    @jax.jit
    def dev_loop(st, raw, pos, quat):
        def body(i, s):
            s2, _ = process_frame(s, raw, pos, quat, cfg)
            return s2
        return jax.lax.fori_loop(0, reps, body, st)

    st = dev_loop(init_world(cfg), *a0)
    _ = int(st.count)                       # compile + drain
    t0 = time.perf_counter()
    _ = int(init_world(cfg).count)          # readback floor (one RTT)
    floor_ms = (time.perf_counter() - t0) * 1e3
    t0 = time.perf_counter()
    st = dev_loop(init_world(cfg), *a0)
    _ = int(st.count)                       # one scalar sync
    ms = (time.perf_counter() - t0) / reps * 1e3
    verdict = ("quiet" if ms < 10 else "noisy" if ms < 20 else "stormy")
    print(f"device_ms_per_frame={ms:.2f} ({verdict}; quiet-chip ref ~6.5-7; "
          f"readback floor {floor_ms / reps:.2f} ms/rep already included)")


if __name__ == "__main__":
    main()
