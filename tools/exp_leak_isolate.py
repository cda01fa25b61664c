"""Isolate the per-processed-frame host RSS growth (~55 KB/frame).

Drives `_process_frame_deferred` + `_flush_pending`/`_backfill_batch`
directly (no feeder / flusher threads) and samples RSS, jax live-array
count+bytes, and gc object counts every N frames.

Postmortem note: this tool's original runs "on CPU" actually ran on the
axon backend — `os.environ.setdefault("JAX_PLATFORMS", "cpu")` is a no-op
here because sitecustomize imports jax with JAX_PLATFORMS=axon before any
script code runs.  The ~54 KB/frame "CPU leak" it measured was the axon
relay's replay journal retaining each frame's padded-cloud transfer
(see docs/PERF.md "relay journal leak").  MODE=pad reduces the repro to
the bare transfer.  Set PLATFORM=axon to measure the relay deliberately;
the default now REALLY forces CPU (where the leak is absent).

python tools/exp_leak_isolate.py [n_frames=3000]
"""

import gc
import os
import sys

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
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
    import jax
    import numpy as np

    import bench
    from pointcloud_segmentation_tpu.config import (
        default_config, StaticShapes)
    from pointcloud_segmentation_tpu.runtime.engine import SegmentationEngine

    cfg = default_config(
        granularity=4,
        shapes=StaticShapes(max_raw_points=4096, max_points=2048,
                            max_world_segments=64))
    frames = bench.build_frames(cfg, 40)

    import queue

    eng = SegmentationEngine(cfg, stream_sync_every=64)
    eng._stream_deferred = True
    eng._flush_q = queue.Queue()
    # per-loop monotonic offset so pose lookups never starve
    span = frames[-1].t - frames[0].t + 0.25

    def live_jax_mb():
        arrs = jax.live_arrays()
        return len(arrs), sum(a.nbytes for a in arrs) / 1e6

    base = None
    i = 0
    loop = 0
    mode = os.environ.get("MODE", "full")  # pose | step | nostack | full
    while i < n:
        for fr in frames:
            t = fr.t + loop * span
            eng.push_pose(t, fr.position, fr.quat_wxyz)
            if mode == "pad":
                import jax.numpy as jnp
                raw = jnp.asarray(eng._pad_raw(fr.points))
                del raw
            elif mode != "pose":
                ok = eng._process_frame_deferred(t, fr.points)
                assert ok
            if mode == "nostack":
                # drop handles without the (K,4) stack + readback
                if len(eng._pending) >= eng.stream_sync_every:
                    eng._pending.clear()
            elif mode == "full":
                if len(eng._pending) >= eng.stream_sync_every:
                    eng._flush_pending()
                    eng._backfill_batch(*eng._flush_q.get())
            i += 1
            if i % 500 == 0:
                gc.collect()
                cnt, mb = live_jax_mb()
                objs = len(gc.get_objects())
                r = rss_mb()
                if base is None:
                    base = r
                print(f"frame {i:5d}: rss={r:7.1f}MB (+{r - base:6.1f}) "
                      f"jax_arrays={cnt} jax_mb={mb:.1f} "
                      f"gc_objs={objs} records={len(eng.records)}",
                      flush=True)
            if i >= n:
                break
        loop += 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
