#!/usr/bin/env python
"""Decompose the chip-weather probe's number into device compute vs
relay-read overhead.

Motivation (2026-08-20): tools/chip_weather.py read a rock-steady
~27 ms/frame for 4+ hours ("storm") while BENCH_CONFIG=all runs in the
SAME windows measured node_loop device time at 5.3-5.5 ms/frame with
0%-drop 100/200 Hz streaming — mutually inconsistent if 27 ms were real
chip service rate.  Hypothesis: the probe's single syncing readback pays
a relay read RTT that balloons from ~25 ms to ~1.4 s under neighbor
READ-path load; divided by reps=64 that adds ~21 ms/frame to a truly
quiet ~5.5 ms chip.  (The probe already prints its readback floor, but
the recorder's regex only consumed device_ms_per_frame.)

Method: time the same jitted fori_loop(process_frame) at reps 16 / 64 /
256 (each = dispatch + loop + ONE scalar read), plus the bare one-RTT
readback floor x3.  If wall(reps) fits  overhead + reps * per_frame,
the regression separates the two: slope = true device ms/frame,
intercept = fixed per-call overhead (read RTT + dispatch).  A genuine
chip storm moves the SLOPE; a read-path storm moves the INTERCEPT.

Each distinct `reps` is a separate remote compile (~10-40 s each,
CLAUDE.md) — total runtime ~2-4 min on a quiet chip.

Usage:  python tools/exp_probe_decompose.py   (real TPU; do NOT kill
        mid-run — stale-claim hazard)
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

    def make_loop(reps):
        @jax.jit
        def dev_loop(st, raw, pos, quat):
            def body(i, s):
                s2, _ = process_frame(s, raw, pos, quat, cfg)
                return s2
            return jax.lax.fori_loop(0, reps, body, st)
        return dev_loop

    # bare readback floor: one tiny computation + one scalar read
    floors = []
    for _ in range(3):
        t0 = time.perf_counter()
        _ = int(init_world(cfg).count)
        floors.append(time.perf_counter() - t0)
    print(f"readback floor x3: {[f'{f*1e3:.0f}ms' for f in floors]}",
          flush=True)

    pts = []
    for reps in (16, 64, 256):
        loop = make_loop(reps)
        st = loop(init_world(cfg), *a0)
        _ = int(st.count)                       # compile + drain
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            st = loop(init_world(cfg), *a0)
            _ = int(st.count)
            best = min(best, time.perf_counter() - t0)
        pts.append((reps, best))
        print(f"reps={reps:4d}: wall {best*1e3:8.1f} ms  "
              f"naive {best/reps*1e3:6.2f} ms/frame", flush=True)

    # Least-squares over ALL collected points (not just the endpoints):
    # one parked relay read (10 s-17 min observed, CLAUDE.md) at a single
    # reps level then shows up as a large fit residual instead of
    # silently corrupting an endpoint-only slope.
    reps_arr = np.array([r for r, _ in pts], dtype=np.float64)
    wall_arr = np.array([t for _, t in pts], dtype=np.float64)
    slope_s, intercept_s = np.polyfit(reps_arr, wall_arr, 1)
    slope_ms, intercept_ms = slope_s * 1e3, intercept_s * 1e3
    resid_ms = np.abs(wall_arr - (slope_s * reps_arr + intercept_s)) * 1e3
    print(f"fit: device {slope_ms:.2f} ms/frame + fixed "
          f"{intercept_ms:.0f} ms/call overhead "
          f"(floor median {np.median(floors)*1e3:.0f} ms, "
          f"max residual {resid_ms.max():.0f} ms)")
    if resid_ms.max() > 500:
        print("WARNING: fit residual > 500 ms — one timing likely caught "
              "a parked relay read; rerun before trusting the verdict")
    verdict = ("chip-storm" if slope_ms > 12 else
               "read-storm" if intercept_ms > 300 else "quiet")
    print(f"verdict={verdict} slope_ms={slope_ms:.2f} "
          f"intercept_ms={intercept_ms:.0f}")


if __name__ == "__main__":
    main()
