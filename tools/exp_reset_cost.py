"""Measure what axon_reset() costs under the CURRENT relay plugin build.

Round 3 measured the cadenced journal reset at ~50-80 ms with compiled
executables retained ("reset: exe_table retained; journal cleared").
The round-4 image rebuild changed the plugin (platform name 'axon' ->
'tpu'; new session-metric exports), and the fixed journal-reset cadence
now coincides with 30-90 s full-stream stalls (endurance r4 run B:
multi-window 0 proc/s outages right after resets).  Hypothesis: the new
build drops the executable table on reset, so the first post-reset
dispatch pays a full remote recompile.

This experiment times, on the real chip:
  1. a warm step dispatch+sync        (baseline)
  2. axon_reset() itself
  3. the FIRST dispatch+sync after    (recompile if exe table dropped)
  4. the SECOND dispatch+sync after   (must be warm again)
and reads the plugin's own cumulative session counters
(axon_session_compile_s etc.) around each phase.

Run bare on the TPU (owns the chip; no kill timeout):
    python tools/exp_reset_cost.py [n_resets=3]
"""

import ctypes
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _metric(lib, name):
    try:
        fn = getattr(lib, name)
        fn.restype = ctypes.c_double
        return float(fn())
    except Exception:
        return float("nan")


def main():
    n_resets = int(sys.argv[1]) if len(sys.argv) > 1 else 3

    import jax.numpy as jnp

    import bench
    from pointcloud_segmentation_tpu.config import default_config, StaticShapes
    from pointcloud_segmentation_tpu.pipeline import (init_world,
                                                      make_process_frame)
    from pointcloud_segmentation_tpu.runtime import relay
    from pointcloud_segmentation_tpu.runtime.relay import (_SO_PATH,
                                                           make_pytree_packer)

    lib = ctypes.CDLL(_SO_PATH)
    lib.axon_reset.restype = ctypes.c_void_p

    cfg = default_config(
        granularity=4,
        shapes=StaticShapes(max_raw_points=4096, max_points=2048,
                            max_world_segments=64))
    frames = bench.build_frames(cfg, 4)
    step = make_process_frame(cfg)
    state = init_world(cfg)

    def pad(fr):
        raw = np.full((cfg.shapes.max_raw_points, 3), np.nan, np.float32)
        k = min(len(fr.points), cfg.shapes.max_raw_points)
        raw[:k] = fr.points[:k]
        return (jnp.asarray(raw), jnp.asarray(fr.position, jnp.float32),
                jnp.asarray(fr.quat_wxyz, jnp.float32))

    args = [pad(fr) for fr in frames]

    def one_step(st, a):
        st, out = step(st, *a)
        _ = int(out.world_count)     # sync
        return st

    t0 = time.perf_counter()
    state = one_step(state, args[0])
    print(f"first compile+run: {time.perf_counter()-t0:.1f}s", flush=True)
    for a in args[1:]:
        state = one_step(state, a)
    t0 = time.perf_counter()
    state = one_step(state, args[0])
    warm_ms = (time.perf_counter() - t0) * 1e3
    print(f"warm step: {warm_ms:.1f} ms", flush=True)

    pack, unpack = make_pytree_packer(state)
    _ = np.asarray(pack(state))      # compile the packer pair
    state = unpack(jnp.asarray(np.asarray(pack(state))))
    _ = int(state.count)

    for i in range(n_resets):
        compile_s0 = _metric(lib, "axon_session_compile_s")
        vec = np.asarray(pack(state))
        t0 = time.perf_counter()
        lib.axon_reset()
        reset_ms = (time.perf_counter() - t0) * 1e3
        t0 = time.perf_counter()
        state = unpack(jnp.asarray(vec))
        _ = int(state.count)         # sync the re-upload + unpack
        reupload_ms = (time.perf_counter() - t0) * 1e3
        # every pre-reset device buffer is dead (stale watermark) — the
        # engine's steady state re-uploads the cloud from host each frame,
        # so mirror that: fresh arg arrays, exactly like _pad_raw
        args = [pad(fr) for fr in frames]
        t0 = time.perf_counter()
        state = one_step(state, args[i % len(args)])
        first_ms = (time.perf_counter() - t0) * 1e3
        t0 = time.perf_counter()
        state = one_step(state, args[(i + 1) % len(args)])
        second_ms = (time.perf_counter() - t0) * 1e3
        compile_s1 = _metric(lib, "axon_session_compile_s")
        print(f"reset {i}: axon_reset {reset_ms:.1f} ms, "
              f"unpack-reupload {reupload_ms:.1f} ms, "
              f"1st step after {first_ms:.1f} ms, "
              f"2nd {second_ms:.1f} ms, "
              f"session_compile_s {compile_s0:.2f} -> {compile_s1:.2f}",
              flush=True)


if __name__ == "__main__":
    main()
