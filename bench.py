#!/usr/bin/env python
"""Benchmark: full per-frame pipeline (cloud -> segments + world map) on TPU.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

metric  = clouds/sec per chip on the full node loop (the reference's
          per-frame `processing_time` path: filter -> Hough -> transform ->
          cutoff -> fusion -> intersections), simulated wp_tests replay over
          the 7-beam benchmark scene at the shipped radius config.
baseline = the faithful numpy oracle (the CPU reference reimplementation —
          the C++ original cannot run here: no ROS/PCL and its Hough
          submodule is missing from the snapshot; BASELINE.md).
vs_baseline = TPU clouds/sec / CPU-oracle clouds/sec  (>1 is faster).

Extra diagnostics go to stderr.  Granularity defaults to 4 (the fork's
effective direction-table level — SURVEY.md §2.3); set BENCH_GRANULARITY=6
for the stress configuration.
"""

import json
import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_frames(cfg, n_frames):
    from pointcloud_segmentation_tpu.io.scene import (
        OBS_TESTS_SCENE, WP_TESTS, trajectory_poses)
    from pointcloud_segmentation_tpu.io.simulator import simulate_trajectory, TofSpec

    poses = trajectory_poses(WP_TESTS, hz=4.0, velocity=0.25)
    while len(poses) < n_frames:
        poses = poses + poses
    frames = simulate_trajectory(OBS_TESTS_SCENE, poses[:n_frames],
                                 TofSpec(noise_frac=0.002), seed=0)
    return frames


def bench_tpu(cfg, frames, warmup=2):
    """Measures both:
      * steady-state throughput — frames dispatched back-to-back (each step
        consumes the previous step's world state, so this is a real
        sequential pipeline rate), one device sync at the end;
      * per-frame latency — a device->host readback of the frame's world
        count after every step (NOTE: plain block_until_ready under-reports
        on the experimental axon platform, so latency is measured via an
        explicit scalar readback, which includes the host round-trip).
    """
    import jax
    import jax.numpy as jnp
    from pointcloud_segmentation_tpu.pipeline import make_process_frame, init_world

    step = make_process_frame(cfg)
    state = init_world(cfg)

    def pad(fr):
        raw = np.full((cfg.shapes.max_raw_points, 3), np.nan, np.float32)
        k = min(len(fr.points), cfg.shapes.max_raw_points)
        raw[:k] = fr.points[:k]
        return (jnp.asarray(raw), jnp.asarray(fr.position, jnp.float32),
                jnp.asarray(fr.quat_wxyz, jnp.float32))

    args_all = [pad(fr) for fr in frames]

    # warmup/compile
    t0 = time.perf_counter()
    for a in args_all[:warmup]:
        state, out = step(state, *a)
    _ = int(out.world_count)
    log(f"tpu compile+warmup: {time.perf_counter()-t0:.1f}s")

    # latency: per-frame readback
    lat = []
    half = warmup + (len(args_all) - warmup) // 2
    for a in args_all[warmup:half]:
        t0 = time.perf_counter()
        state, out = step(state, *a)
        _ = int(out.world_count)
        lat.append(time.perf_counter() - t0)
    lat = np.asarray(lat) if lat else np.asarray([np.nan])

    # throughput: chained dispatch, single sync
    t0 = time.perf_counter()
    n_tp = 0
    for a in args_all[half:]:
        state, out = step(state, *a)
        n_tp += 1
    _ = int(out.world_count)
    dt = time.perf_counter() - t0

    return {
        "p50_ms": float(np.percentile(lat, 50) * 1e3),
        "p95_ms": float(np.percentile(lat, 95) * 1e3),
        "clouds_per_sec": float(n_tp / dt) if n_tp else float("nan"),
        "world_segments": int(np.asarray(state.count)),
    }


def bench_oracle(cfg, frames):
    from pointcloud_segmentation_tpu import oracle

    wm = oracle.WorldMap(cfg)
    lat = []
    for fr in frames:
        t0 = time.perf_counter()
        oracle.process_frame(wm, fr.points, fr.position, fr.quat_wxyz, cfg)
        lat.append(time.perf_counter() - t0)
    lat = np.asarray(lat)
    return {
        "p50_ms": float(np.percentile(lat, 50) * 1e3),
        "clouds_per_sec": float(1.0 / np.percentile(lat, 50)),
        "world_segments": len(wm.segments),
    }


def main():
    from pointcloud_segmentation_tpu.config import default_config, StaticShapes

    granularity = int(os.environ.get("BENCH_GRANULARITY", "4"))
    n_frames = int(os.environ.get("BENCH_FRAMES", "40"))
    n_oracle = int(os.environ.get("BENCH_ORACLE_FRAMES", "12"))

    cfg = default_config(
        granularity=granularity,
        shapes=StaticShapes(max_raw_points=4096, max_points=2048,
                            max_world_segments=64),
    )
    frames = build_frames(cfg, n_frames)
    log(f"bench: granularity={granularity} frames={n_frames} "
        f"points/frame<=4096 (64x64 ToF)")

    import jax

    log(f"devices: {jax.devices()}")
    tpu = bench_tpu(cfg, frames)
    log(f"tpu: {tpu}")

    cpu = bench_oracle(cfg, frames[:n_oracle])
    log(f"cpu oracle: {cpu}")

    vs = tpu["clouds_per_sec"] / cpu["clouds_per_sec"]
    print(json.dumps({
        "metric": "clouds_per_sec_per_chip_full_node_loop",
        "value": round(tpu["clouds_per_sec"], 2),
        "unit": "clouds/s",
        "vs_baseline": round(vs, 2),
    }))


if __name__ == "__main__":
    main()
