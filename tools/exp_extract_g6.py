"""Perf decomposition of the granularity-6 LAZY extraction path (real TPU).

Companion to exp_extract_g4.py (same measurement rules: reps >= 64 so the
~25-50 ms relay readback floor divides away; calibration floor printed
first).  The g6 init is characterized at ~8.8 ms (exp_g6_init.py); this
tool decomposes the PER-ROUND cost — node_loop_g6 spends ~1.4 ms/line
beyond init vs 0.31 at g4, and the B-dependent round stages
(`_removed_cell_keys` over all 20,608 padded directions, the tiered
suspect re-exam) are the candidates.

Run bare (owns the TPU; no kill timeout): python tools/exp_extract_g6.py
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

    shapes = StaticShapes(max_raw_points=4096, max_points=2048,
                          max_world_segments=64)
    cfg = default_config(granularity=6, shapes=shapes)
    assert cfg.voting_mode == "lazy"
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

    def noop(reps):
        def loop(raw):
            def body(i, acc):
                return acc + (raw * eps + acc * eps).sum() * eps
            return jax.lax.fori_loop(0, reps, body, jnp.float32(0))
        return loop

    res["floor"] = timeit("floor (one fused reduce)", noop, 2048, rawj)

    # ---- shared prologue (mirrors extract_lines)
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
    cells = NXS * NXS
    print(f"frame: active={n_active} B={B} NXS={NXS} num_x={int(num_x)}",
          file=sys.stderr)

    # ---- lazy init (the known ~8.8 ms floor; re-measured for this frame)
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

    best0, key0, ub0 = jax.jit(
        lambda X: H._vote_state_tiles(X, c1, c2, d, dx, num_x, fvalid, NXS)
    )(Xs)

    # ---- removed-keys binning + best-cell decrement (every round pays it)
    m2 = fvalid & (jax.lax.broadcasted_iota(jnp.int32, (N,), 0) % 7 == 0)
    n_rem = m2.sum().astype(jnp.int32)
    sub_chunk = min(H._SUB_CHUNK, N)

    def rem_dec(reps):
        def loop(X, key):
            def body(i, acc):
                keys_r = H._removed_cell_keys(X + acc * eps, c1, c2, d, dx,
                                              num_x, m2, n_rem, sub_chunk,
                                              NXS)
                dec = (keys_r == key[:, None]).sum(axis=1)
                return acc + dec.sum().astype(jnp.float32) * eps
            return jax.lax.fori_loop(0, reps, body, jnp.float32(0))
        return loop

    res["rem_dec"] = timeit("removed keys + dec (all B)", rem_dec, 128,
                            Xs, key0)

    # ---- suspect mask + compaction (cumsum over B) + winner argmax
    def sus_winner(reps):
        def loop(best, ub):
            def body(i, acc):
                b2 = best + acc * eps
                M = b2.max()
                b_win = jnp.argmax(b2 == M).astype(jnp.int32)
                suspect = ub >= M
                n_sus = suspect.sum()
                spos = jnp.cumsum(suspect.astype(jnp.int32)) - 1
                return (acc + M * eps
                        + (b_win + n_sus + spos[-1]).astype(jnp.float32) * eps)
            return jax.lax.fori_loop(0, reps, body, jnp.float32(0))
        return loop

    res["sus_winner"] = timeit("winner argmax + suspect compact", sus_winner,
                               256, best0, ub0)

    # ---- tier re-exam at s_tier=256 (the common per-round exam)
    s_tier = 2 * H._VOTE_TILE

    def exam(reps):
        idx_c = jnp.arange(s_tier, dtype=jnp.int32) * (B // s_tier)

        def loop(X):
            def body(i, acc):
                bs, ks, us = H._vote_state_tiles(
                    X + acc * eps, c1[idx_c], c2[idx_c], d, dx, num_x,
                    fvalid, NXS)
                return (acc + bs.sum() * eps + us.sum() * eps
                        + ks.sum().astype(jnp.float32) * eps)
            return jax.lax.fori_loop(0, reps, body, jnp.float32(0))
        return loop

    res["exam_tier256"] = timeit("tier re-exam (256 dirs)", exam, 128, Xs)

    # ---- full extract_lines at opt_nlines 1 / 10 (marginal = per-round)
    for nl in (1, 10):
        cfg_n = default_config(granularity=6, opt_nlines=nl, shapes=shapes)

        def ext(reps, cfg_n=cfg_n):
            def loop(pts, valid):
                def body(i, acc):
                    r = H.extract_lines(pts + acc * eps, valid, cfg_n)
                    return (acc + r.nlines.astype(jnp.float32) * eps
                            + r.segments.a.sum() * eps)
                return jax.lax.fori_loop(0, reps, body, jnp.float32(0))
            return loop

        res[f"extract_nl{nl}"] = timeit(
            f"extract_lines g6 opt_nlines={nl}", ext, 32, filtered, fvalid)

    # ---- full process_frame at g6
    state = W.init_world(cfg)
    stepj = jax.jit(lambda st, r, p, q: process_frame(st, r, p, q, cfg))
    for fr in frames[:8]:
        state, out = stepj(state, pack_raw(fr),
                           jnp.asarray(fr.position, jnp.float32),
                           jnp.asarray(fr.quat_wxyz, jnp.float32))

    def full(reps):
        def loop(raw, st, p, q):
            def body(i, acc):
                st2, out = process_frame(st, raw + acc * eps, p, q, cfg)
                return (acc + st2.a.sum() * eps
                        + out.nlines.astype(jnp.float32) * eps)
            return jax.lax.fori_loop(0, reps, body, jnp.float32(0))
        return loop

    res["full_step"] = timeit("full process_frame g6", full, 32, rawj, state,
                              pos, quat)

    marg = (res["extract_nl10"] - res["extract_nl1"]) / 9.0
    print(f"marginal per-round: {marg:.4f} ms", flush=True)
    print("results_ms:", {k: round(v, 4) for k, v in res.items()})


if __name__ == "__main__":
    main()
