"""Reproduce the endurance-soak degradation on CPU with instrumentation.

The 10-min TPU endurance soak (2026-08) showed, in ONE continuous stream:
  * throughput decaying 30 -> 10.5 proc/s,
  * ~6.3k frames neither processed nor mailbox-dropped (skipped_no_pose?),
  * RSS growing ~52 KB per processed frame (~ one padded (4096,3) cloud).

This experiment runs the same production path on the CPU backend for a
few minutes and prints every window: processed / skipped / failed /
mailbox-dropped deltas, RSS, records length, pending/flush-queue depth,
and the native pose-buffer occupancy — to separate the pose-eviction
pathology (looped timestamps + sorted ring) from the RSS growth.

Postmortem: both pathologies are found and fixed — the skips were the
looped feeder rewinding its clock until the sorted pose ring starved
(feeders now offset each loop), and the RSS growth was the axon relay's
replay journal (cadenced `axon_reset`, runtime/relay.py).  NOTE the
original runs labeled "CPU" actually ran on axon: the env var below was
set too late (sitecustomize already imported jax).  Now forced properly.

Usage: python tools/exp_stream_leak.py [minutes] [hz]
"""

import os
import sys
import tempfile
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("PLATFORM", "cpu") == "cpu":
    jax.config.update("jax_platforms", "cpu")


def rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) / 1024.0
    return float("nan")


def main() -> int:
    minutes = float(sys.argv[1]) if len(sys.argv) > 1 else 3.0
    rate = float(sys.argv[2]) if len(sys.argv) > 2 else 30.0

    import bench
    from pointcloud_segmentation_tpu.config import (
        default_config, StaticShapes)
    from pointcloud_segmentation_tpu.io.replay import save_frames
    from pointcloud_segmentation_tpu.runtime.engine import SegmentationEngine

    cfg = default_config(
        granularity=4,
        shapes=StaticShapes(max_raw_points=4096, max_points=2048,
                            max_world_segments=64))
    frames = bench.build_frames(cfg, 40)
    span = frames[-1].t - frames[0].t
    print(f"log: {len(frames)} frames, t span {span:.1f} s (sim)")
    log_path = os.path.join(tempfile.gettempdir(), "exp_leak.pcsl")
    save_frames(log_path, frames)

    eng = SegmentationEngine(cfg)
    eng.push_pose(frames[0].t, frames[0].position, frames[0].quat_wxyz)
    eng.process_frame(frames[0].t, frames[0].points)

    import math
    loops = max(1, math.ceil(minutes * 60.0 * rate / len(frames)))
    result = {}

    def _run():
        result.update(eng.run_streaming_from_log(
            log_path, rate_hz=rate, loops=loops))

    runner = threading.Thread(target=_run, daemon=True)
    runner.start()
    last = dict(p=eng.frames_processed, s=eng.frames_skipped_no_pose,
                f=eng.frames_failed, d=eng.dropped_frames,
                t=time.perf_counter())
    while runner.is_alive():
        runner.join(timeout=15.0)
        now = time.perf_counter()
        dt = now - last["t"]
        p, s = eng.frames_processed, eng.frames_skipped_no_pose
        f, d = eng.frames_failed, eng.dropped_frames
        try:
            pb_n = len(eng.poses)
        except Exception:
            pb_n = -1
        print(f"dt={dt:4.1f}s proc/s={(p - last['p']) / dt:5.1f} "
              f"skip/s={(s - last['s']) / dt:5.1f} "
              f"fail/s={(f - last['f']) / dt:4.1f} "
              f"drop/s={(d - last['d']) / dt:4.1f} "
              f"rss={rss_mb():6.1f}MB records={len(eng.records)} "
              f"pending={len(eng._pending)} q={eng._flush_q.qsize()} "
              f"posebuf={pb_n}", flush=True)
        last = dict(p=p, s=s, f=f, d=d, t=now)
    print(result)
    return 0


if __name__ == "__main__":
    sys.exit(main())
