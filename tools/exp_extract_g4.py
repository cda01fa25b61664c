"""Perf decomposition of the g4 extraction path on the real TPU.

Measurement rules (CLAUDE.md) plus one more learned here: the scalar
readback that syncs the timing loop costs a full relay round-trip
(~25-50 ms), so divide it away with HIGH rep counts (>= 256) and report
the calibrated floor alongside — reps=8-32 runs bury sub-millisecond
stage costs under an additive ~0.8-3 ms RTT/reps term (this is what made
preproc/world_step look like ~0.9 ms each in earlier decompositions;
their real costs are ~10x smaller).

Run bare (owns the TPU; no kill timeout): python tools/exp_extract_g4.py
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
    from pointcloud_segmentation_tpu.ops import hough as H
    from pointcloud_segmentation_tpu.ops.preproc import preprocess
    from pointcloud_segmentation_tpu.pipeline import process_frame
    from pointcloud_segmentation_tpu.sphere import hough_space

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
    pos = jnp.asarray(frames[4].position, jnp.float32)
    quat = jnp.asarray(frames[4].quat_wxyz, jnp.float32)

    eps = jnp.float32(1e-20)

    def timeit(label, loop_builder, reps, *args):
        loop = jax.jit(loop_builder(reps))
        _ = float(loop(*args))              # compile + warm
        t0 = time.perf_counter()
        _ = float(loop(*args))
        dt = (time.perf_counter() - t0) / reps * 1e3
        print(f"{label}: {dt:.4f} ms  (reps={reps})", flush=True)
        return dt

    res = {}

    # ---- calibration floor
    def noop(reps):
        def loop(raw):
            def body(i, acc):
                return acc + (raw * eps + acc * eps).sum() * eps
            return jax.lax.fori_loop(0, reps, body, jnp.float32(0))
        return loop

    res["floor"] = timeit("floor (one fused reduce)", noop, 2048, rawj)

    # ---- preproc
    def pre(reps):
        def loop(raw):
            def body(i, acc):
                pts, valid, cnt = preprocess(raw + acc * eps, cfg)
                return acc + pts.sum() * eps + cnt.astype(jnp.float32) * eps
            return jax.lax.fori_loop(0, reps, body, jnp.float32(0))
        return loop

    res["preproc"] = timeit("preprocess", pre, 512, rawj)

    # ---- extraction inputs (shared prologue)
    filtered, fvalid, _ = jax.jit(lambda r: preprocess(r, cfg))(rawj)
    n_active = int(np.asarray(fvalid).sum())
    dirs_np, c1_np, c2_np = hough_space(cfg.granularity)
    dirs, c1, c2 = H._pad_dirs_to_tile(
        jnp.asarray(dirs_np, jnp.float32),
        jnp.asarray(c1_np, jnp.float32), jnp.asarray(c2_np, jnp.float32))
    B = dirs.shape[0]
    NXS = cfg.num_x_max
    dx = jnp.float32(cfg.opt_dx)
    p_min, p_max = H._masked_minmax(filtered, fvalid)
    diag = p_max - p_min
    d = jnp.sqrt(jnp.maximum((diag * diag).sum(), 0.0))
    shift = (p_min + p_max) / 2.0
    Xs = jnp.where(fvalid[:, None], filtered - shift, 0.0)
    num_x = jnp.maximum(jnp.floor(d / dx + 0.5).astype(jnp.int32), 1)
    N = Xs.shape[0]
    print(f"frame: active={n_active} B={B} NXS={NXS} num_x={int(num_x)}",
          file=sys.stderr)

    # ---- init vote histogram (carry mode)
    def init_hist(reps):
        def loop(X):
            def body(i, acc):
                v = H._vote_histogram(X + acc * eps, c1, c2, d, dx, num_x,
                                      fvalid, NXS)
                return acc + v.sum() * eps
            return jax.lax.fori_loop(0, reps, body, jnp.float32(0))
        return loop

    res["init_hist"] = timeit("carry init histogram", init_hist, 64, Xs)

    # ---- row-max + argmax over the carried accumulator
    v0 = jax.jit(lambda X: H._vote_histogram(X, c1, c2, d, dx, num_x,
                                             fvalid, NXS))(Xs)

    def argmax_only(reps):
        def loop(v):
            def body(i, acc):
                vv = v + acc * eps
                rm = vv.max(axis=(1, 2))
                M = rm.max()
                b_win = jnp.argmax(rm == M)
                row = jax.lax.dynamic_index_in_dim(vv, b_win, 0, False)
                cell = jnp.argmax(row.reshape(-1) == M)
                return acc + M * eps + (b_win + cell).astype(jnp.float32) * eps
            return jax.lax.fori_loop(0, reps, body, jnp.float32(0))
        return loop

    res["argmax"] = timeit("rowmax+argmax on (B,NX,NX)", argmax_only, 256, v0)

    # ---- vote subtract delta (typical removal)
    m2 = fvalid & (jax.lax.broadcasted_iota(jnp.int32, (N,), 0) % 7 == 0)
    n_rem = m2.sum().astype(jnp.int32)

    def sub_delta(reps):
        def loop(X):
            def body(i, acc):
                dv = H._vote_histogram_delta(X + acc * eps, c1, c2, d, dx,
                                             num_x, m2, n_rem,
                                             min(H._SUB_CHUNK, N), NXS)
                return acc + dv.sum() * eps
            return jax.lax.fori_loop(0, reps, body, jnp.float32(0))
        return loop

    res["sub_delta"] = timeit("incremental subtract histogram", sub_delta,
                              128, Xs)

    # ---- gap check: rank-matrix vs sort, at this N
    a_w = jnp.zeros(3, jnp.float32)
    bc = jnp.asarray([1.0, 0.0, 0.0], jnp.float32)
    t = Xs[:, 0]
    pn_all = jnp.sqrt(((a_w[None, :] + t[:, None] * bc[None, :]) ** 2).sum(-1))
    nv = m2.sum().astype(jnp.int32)

    def gap_rank(reps):
        def loop(tv0):
            def body(i, acc):
                tv = jnp.where(m2, tv0 + acc * eps, jnp.inf)
                row_i = jax.lax.broadcasted_iota(jnp.int32, (N, N), 0)
                col_j = jax.lax.broadcasted_iota(jnp.int32, (N, N), 1)
                before = (tv[None, :] < tv[:, None]) | (
                    (tv[None, :] == tv[:, None]) & (col_j < row_i))
                rank = before.sum(axis=1).astype(jnp.int32)
                succ = (rank[None, :] == rank[:, None] + 1) & m2[:, None] & m2[None, :]
                gap_mat = jnp.where(
                    succ, jnp.abs(pn_all[None, :] - pn_all[:, None]), -jnp.inf)
                mg = jnp.where(nv > 1, gap_mat.max(), 0.0)
                return acc + mg * eps
            return jax.lax.fori_loop(0, reps, body, jnp.float32(0))
        return loop

    def gap_sort(reps):
        def loop(tv0):
            def body(i, acc):
                tv = jnp.where(m2, tv0 + acc * eps, jnp.inf)
                order = jnp.argsort(tv)
                pn_s = pn_all[order]
                pair_ok = (jnp.arange(N - 1) + 1) < nv
                gaps = jnp.where(pair_ok, jnp.abs(pn_s[1:] - pn_s[:-1]),
                                 -jnp.inf)
                mg = jnp.where(nv > 1, gaps.max(), 0.0)
                return acc + mg * eps
            return jax.lax.fori_loop(0, reps, body, jnp.float32(0))
        return loop

    res["gap_rank"] = timeit("gap check rank-matrix (N=%d)" % N, gap_rank,
                             256, t)
    res["gap_sort"] = timeit("gap check argsort (N=%d)" % N, gap_sort, 256, t)

    # ---- masked LSQ + eigs (the refine cost, x2 per round)
    def lsq(reps):
        def loop(X):
            def body(i, acc):
                rc, a1, b1 = H._masked_lsq(X + acc * eps, m2)
                return acc + rc * eps + a1.sum() * eps + b1.sum() * eps
            return jax.lax.fori_loop(0, reps, body, jnp.float32(0))
        return loop

    res["masked_lsq"] = timeit("masked LSQ (one refine)", lsq, 512, Xs)

    # ---- full extract_lines at opt_nlines 1 and 10, carry vs lazy voting
    for nl in (1, 10):
        for mode in ("carry", "lazy"):
            cfg_n = default_config(
                granularity=4, opt_nlines=nl, voting=mode,
                shapes=StaticShapes(max_raw_points=4096, max_points=2048,
                                    max_world_segments=64))

            def ext(reps, cfg_n=cfg_n):
                def loop(pts, valid):
                    def body(i, acc):
                        r = H.extract_lines(pts + acc * eps, valid, cfg_n)
                        return (acc + r.nlines.astype(jnp.float32) * eps
                                + r.segments.a.sum() * eps)
                    return jax.lax.fori_loop(0, reps, body, jnp.float32(0))
                return loop

            res[f"extract_nl{nl}_{mode}"] = timeit(
                f"extract_lines opt_nlines={nl} voting={mode}",
                ext, 64, filtered, fvalid)

    # ---- lazy init state alone (for comparison with carry init_hist)
    def lazy_init(reps):
        def loop(X):
            def body(i, acc):
                b, k, u = H._vote_state_tiles(X + acc * eps, c1, c2, d, dx,
                                              num_x, fvalid, NXS)
                return (acc + b.sum() * eps + u.sum() * eps
                        + k.sum().astype(jnp.float32) * eps)
            return jax.lax.fori_loop(0, reps, body, jnp.float32(0))
        return loop

    res["lazy_init"] = timeit("lazy init (best,key,ub)", lazy_init, 64, Xs)

    # ---- world_step + full process_frame
    state = W.init_world(cfg)
    stepj = jax.jit(lambda st, r, p, q: process_frame(st, r, p, q, cfg))
    segs = None
    for fr in frames[:8]:
        state, out = stepj(state, pack_raw(fr),
                           jnp.asarray(fr.position, jnp.float32),
                           jnp.asarray(fr.quat_wxyz, jnp.float32))
        segs = out.segments

    def world(reps):
        def loop(st_a, segs_, st):
            def body(i, acc):
                st2 = st._replace(a=st_a + acc * eps)
                ns, slots = W.world_step(st2, segs_, cfg)
                return (acc + ns.a.sum() * eps + ns.inter.sum() * eps
                        + slots.sum().astype(jnp.float32) * eps)
            return jax.lax.fori_loop(0, reps, body, jnp.float32(0))
        return loop

    res["world_step"] = timeit("world_step (vec fuse + intersections)",
                               world, 512, state.a, segs, state)

    def full(reps):
        def loop(raw, st, p, q):
            def body(i, acc):
                st2, out = process_frame(st, raw + acc * eps, p, q, cfg)
                return (acc + st2.a.sum() * eps
                        + out.nlines.astype(jnp.float32) * eps)
            return jax.lax.fori_loop(0, reps, body, jnp.float32(0))
        return loop

    res["full_step"] = timeit("full process_frame", full, 64, rawj, state,
                              pos, quat)

    print("results_ms:", {k: round(v, 4) for k, v in res.items()})


if __name__ == "__main__":
    main()
