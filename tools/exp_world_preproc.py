"""Perf experiment: world_step fusion formulations + preproc internals (TPU).

The round-3 stage decomposition of the g4 node loop (v5e) measured
preproc 1.77 ms, extraction ~2.6-5.6 ms (1-10 lines), world_step 1.95 ms.
This script measures, in isolation with the repo's microbench rules
(on-device fori_loop with a real `acc * eps` data dependency, scalar
readback sync — CLAUDE.md):

  * world_step with the vectorized last-writer-wins fuse_frame vs the
    literal 24-step sequential loop it replaced;
  * preprocess total, and its two candidate hotspots alone: the 4096-key
    argsort and the (n_out, N) one-hot centroid matmul;
  * the full jit'd process_frame step on a real simulated frame, for the
    end-to-end delta.

Run bare (owns the TPU; no kill timeout): python tools/exp_world_preproc.py
"""

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from pointcloud_segmentation_tpu.config import default_config, StaticShapes
    from pointcloud_segmentation_tpu.io.scene import (
        OBS_TESTS_SCENE, WP_TESTS, trajectory_poses)
    from pointcloud_segmentation_tpu.io.simulator import (
        simulate_trajectory, TofSpec)
    from pointcloud_segmentation_tpu import worldmap as W
    from pointcloud_segmentation_tpu.ops.preproc import (
        preprocess, window_mask, voxel_keys)
    from pointcloud_segmentation_tpu.pipeline import make_process_frame

    cfg = default_config(
        granularity=4,
        shapes=StaticShapes(max_raw_points=4096, max_points=2048,
                            max_world_segments=64))
    print("devices:", jax.devices(), file=sys.stderr)

    poses = trajectory_poses(WP_TESTS, hz=4.0, velocity=0.25)
    frames = simulate_trajectory(OBS_TESTS_SCENE, poses[:10],
                                 TofSpec(noise_frac=0.002), seed=0)

    def pack_raw(fr):
        raw = np.full((cfg.shapes.max_raw_points, 3), np.nan, np.float32)
        raw[: len(fr.points)] = fr.points
        return jnp.asarray(raw)

    rawj = pack_raw(frames[4])

    eps = jnp.float32(1e-20)
    reps = 32

    def timeit(label, loop_fn, *args):
        loop = jax.jit(loop_fn)
        _ = float(loop(*args))              # compile + warm
        t0 = time.perf_counter()
        _ = float(loop(*args))
        dt = (time.perf_counter() - t0) / reps * 1e3
        print(f"{label}: {dt:.3f} ms", flush=True)
        return dt

    # ---- build a realistic world state + frame batch by replaying frames
    step = make_process_frame(cfg)
    state = W.init_world(cfg)
    segs = None
    for fr in frames[:8]:
        state, out = step(state, pack_raw(fr),
                          jnp.asarray(fr.position, jnp.float32),
                          jnp.asarray(fr.quat_wxyz, jnp.float32))
        segs = out.segments
    nseg = int(np.asarray(state.count))
    nfr = int(np.asarray(segs.valid).sum())
    print(f"world segments={nseg} frame segs={nfr} L={segs.capacity}",
          file=sys.stderr)

    # ---- world_step: vectorized vs sequential fuse_frame
    def world_loop(fuse_fn):
        def loop(st_a, segs_, st_rest):
            def body(i, acc):
                st = st_rest._replace(a=st_a + acc * eps)
                fields, count, valid, modified, new_flags, slot = fuse_fn(
                    st, segs_, cfg)
                touched = modified | new_flags
                inter = W.update_intersections(fields, valid, st.inter,
                                               touched, cfg)
                return (acc + fields["a"].sum() * eps + inter.sum() * eps
                        + slot.sum().astype(jnp.float32) * eps)
            return jax.lax.fori_loop(0, reps, body, jnp.float32(0))
        return loop

    res = {}

    # harness floor: one big reduce per iteration (no real work)
    def noop_loop(raw):
        def body(i, acc):
            return acc + (raw + acc * eps).sum() * eps
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0))

    res["floor"] = timeit("harness floor (one reduce)", noop_loop, rawj)

    res["world_vec"] = timeit(
        "world_step (vectorized fuse)", world_loop(W.fuse_frame),
        state.a, segs, state)
    res["world_seq"] = timeit(
        "world_step (sequential fuse)", world_loop(W.fuse_frame_sequential),
        state.a, segs, state)

    # intersections alone (shared by both)
    fields = {k: getattr(state, k) for k in W._FUSE_KEYS}

    def inter_loop(a0, st):
        def body(i, acc):
            f = dict(fields, a=a0 + acc * eps)
            inter = W.update_intersections(
                f, st.valid, st.inter, st.valid, cfg)
            return acc + inter.sum() * eps
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0))

    res["intersections"] = timeit("update_intersections alone", inter_loop,
                                  state.a, state)

    # ---- preproc total + internals
    def pre_loop(raw):
        def body(i, acc):
            pts, valid, cnt = preprocess(raw + acc * eps, cfg)
            return (acc + pts.sum() * eps
                    + cnt.astype(jnp.float32) * eps)
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0))

    res["preproc_total"] = timeit("preprocess total", pre_loop, rawj)

    def sort_loop(raw):
        def body(i, acc):
            r = raw + acc * eps
            valid = window_mask(r, cfg.window_size)
            keys = voxel_keys(r, valid, cfg)
            order = jnp.argsort(keys)
            return acc + order.sum().astype(jnp.float32) * eps
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0))

    res["preproc_sort"] = timeit("window+keys+argsort alone", sort_loop, rawj)

    def onehot_loop(raw):
        n_out = cfg.shapes.max_points
        valid0 = window_mask(rawj, cfg.window_size)
        keys0 = voxel_keys(rawj, valid0, cfg)
        order0 = jnp.argsort(keys0)

        def body(i, acc):
            pts_s = (raw + acc * eps)[order0]
            keys_s = keys0[order0]
            valid_s = valid0[order0]
            isnew = jnp.concatenate(
                [jnp.array([True]), keys_s[1:] != keys_s[:-1]])
            first = isnew & valid_s
            group = jnp.cumsum(first.astype(jnp.int32)) - 1
            group = jnp.where(valid_s, group, n_out)
            g_iota = jax.lax.broadcasted_iota(jnp.int32, (n_out, 1), 0)
            onehot = (group[None, :] == g_iota).astype(raw.dtype)
            sums = jnp.dot(onehot, pts_s,
                           precision=jax.lax.Precision.HIGHEST)
            cnts = onehot.sum(axis=1)
            return acc + sums.sum() * eps + cnts.sum() * eps
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0))

    res["preproc_onehot"] = timeit("one-hot centroid matmul alone",
                                   onehot_loop, rawj)

    # ---- full step end-to-end on this frame (fresh state each iter would
    # donate; instead reuse a fixed state and chain via the raw points)
    from pointcloud_segmentation_tpu.pipeline import process_frame

    def step_loop(raw, st, pos, quat):
        def body(i, acc):
            st2, out = process_frame(st, raw + acc * eps, pos, quat, cfg)
            return (acc + st2.a.sum() * eps
                    + out.nlines.astype(jnp.float32) * eps)
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0))

    res["full_step"] = timeit(
        "full process_frame", step_loop, rawj, state,
        jnp.asarray(frames[4].position, jnp.float32),
        jnp.asarray(frames[4].quat_wxyz, jnp.float32))

    print("results_ms:", {k: round(v, 3) for k, v in res.items()})


if __name__ == "__main__":
    main()
