"""Re-measure the g6 bound-pruning init idea with honest rep counts.

Round 2 rejected bound-pruning on a reps=8 measurement ("bounds pass
6.1 ms int8 / 11 ms f32") — but reps=8 adds a ~3 ms readback floor
(PERF.md measurement trap #3), so the real bounds cost may be ~3 ms,
which would flip the verdict: bounds (~3) + top-K seed exam (~0.35) +
exact exams of the ~13% surviving directions (~1.8) ≈ 5 ms vs the 8.7 ms
exact init.

The bound is exact counting logic, float-noise-free: for every direction,
max over 2-D cells of the vote histogram <= min(max_x hist_x, max_y
hist_y) where hist_x/hist_y are the 1-D bin histograms from the SAME
f32-binned xt/yt the 2-D histogram uses.

Run bare (owns the TPU; no kill timeout): python tools/exp_g6_bounds.py
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
    from pointcloud_segmentation_tpu.ops import hough as H
    from pointcloud_segmentation_tpu.ops.preproc import preprocess
    from pointcloud_segmentation_tpu.sphere import hough_space

    shapes = StaticShapes(max_raw_points=4096, max_points=2048,
                          max_world_segments=64)
    cfg = default_config(granularity=6, shapes=shapes)
    print("devices:", jax.devices(), file=sys.stderr)

    poses = trajectory_poses(WP_TESTS, hz=4.0, velocity=0.25)
    frames = simulate_trajectory(OBS_TESTS_SCENE, poses[:6],
                                 TofSpec(noise_frac=0.002), seed=0)
    raw = np.full((cfg.shapes.max_raw_points, 3), np.nan, np.float32)
    raw[: len(frames[4].points)] = frames[4].points
    rawj = jnp.asarray(raw)

    filtered, fvalid, _ = jax.jit(lambda r: preprocess(r, cfg))(rawj)
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
    print(f"B={B} NXS={NXS} num_x={int(num_x)} N={N}", file=sys.stderr)

    eps = jnp.float32(1e-20)
    x_iota = jax.lax.broadcasted_iota(jnp.int32, (NXS, 1), 0)

    def timeit(label, loop_builder, reps, *args):
        loop = jax.jit(loop_builder(reps))
        out = loop(*args)                    # compile + warm
        _ = float(out[0]) if isinstance(out, tuple) else float(out)
        t0 = time.perf_counter()
        out = loop(*args)
        _ = float(out[0]) if isinstance(out, tuple) else float(out)
        dt = (time.perf_counter() - t0) / reps * 1e3
        print(f"{label}: {dt:.4f} ms  (reps={reps})", flush=True)
        return dt

    T = B // H._VOTE_TILE
    c1t = c1.reshape(T, H._VOTE_TILE, 3)
    c2t = c2.reshape(T, H._VOTE_TILE, 3)

    # ---- A: compare-broadcast-reduce (int32 accumulate)
    def bounds_cmp(reps):
        def loop(X):
            def body(i, acc):
                def tile(args):
                    a, b = args
                    xt, yt = H._vote_bins(X + acc * eps, a, b, d, dx, num_x)
                    xt = jnp.where(fvalid[None, :], xt, NXS)
                    yt = jnp.where(fvalid[None, :], yt, NXS)
                    hx = (xt[:, None, :] == x_iota[None, :, :]).sum(
                        -1, dtype=jnp.int32)
                    hy = (yt[:, None, :] == x_iota[None, :, :]).sum(
                        -1, dtype=jnp.int32)
                    return jnp.minimum(hx.max(1), hy.max(1))
                bb = jax.lax.map(tile, (c1t, c2t)).reshape(-1)
                return acc + bb.sum().astype(jnp.float32) * eps
            return jax.lax.fori_loop(0, reps, body, jnp.float32(0))
        return loop

    bcmp = timeit("bounds: compare+reduce int32", bounds_cmp, 64, Xs)

    # ---- B: one-hot bf16 matmul against ones (8 lanes)
    ones8 = jnp.ones((N, 8), jnp.bfloat16)

    def bounds_mm(reps):
        def loop(X):
            def body(i, acc):
                def tile(args):
                    a, b = args
                    xt, yt = H._vote_bins(X + acc * eps, a, b, d, dx, num_x)
                    xt = jnp.where(fvalid[None, :], xt, NXS)
                    yt = jnp.where(fvalid[None, :], yt, NXS)
                    X1 = (xt[:, None, :] == x_iota[None, :, :]).astype(
                        jnp.bfloat16)
                    Y1 = (yt[:, None, :] == x_iota[None, :, :]).astype(
                        jnp.bfloat16)
                    hx = jnp.einsum("bxn,nk->bxk", X1, ones8,
                                    preferred_element_type=jnp.float32)[..., 0]
                    hy = jnp.einsum("bxn,nk->bxk", Y1, ones8,
                                    preferred_element_type=jnp.float32)[..., 0]
                    return jnp.minimum(hx.max(1), hy.max(1))
                bb = jax.lax.map(tile, (c1t, c2t)).reshape(-1)
                return acc + bb.sum() * eps
            return jax.lax.fori_loop(0, reps, body, jnp.float32(0))
        return loop

    bmm = timeit("bounds: one-hot bf16 matmul vs ones", bounds_mm, 64, Xs)

    # ---- top-k(256) on (B,) bounds + threshold compaction cost
    bound0 = jax.jit(lambda X: jax.lax.map(
        lambda ab: (lambda xt, yt: jnp.minimum(
            (jnp.where(fvalid[None, :], xt, NXS)[:, None, :]
             == x_iota[None, :, :]).sum(-1, dtype=jnp.int32).max(1),
            (jnp.where(fvalid[None, :], yt, NXS)[:, None, :]
             == x_iota[None, :, :]).sum(-1, dtype=jnp.int32).max(1)))(
                *H._vote_bins(X, ab[0], ab[1], d, dx, num_x)),
        (c1t, c2t)).reshape(-1))(Xs)

    def topk(reps):
        def loop(bnd):
            def body(i, acc):
                v, idx = jax.lax.top_k(bnd + acc * eps, 256)
                return acc + v.sum() * eps + idx.sum().astype(
                    jnp.float32) * eps
            return jax.lax.fori_loop(0, reps, body, jnp.float32(0))
        return loop

    tk = timeit("top_k(256) on (B,) bounds", topk, 256,
                bound0.astype(jnp.float32))

    # ---- how tight is the bound on this frame?  (decides the exam cap)
    best0, _, _ = jax.jit(
        lambda X: H._vote_state_tiles(X, c1, c2, d, dx, num_x, fvalid, NXS)
    )(Xs)
    bound_np = np.asarray(bound0)
    best_np = np.asarray(best0)
    assert (bound_np >= best_np).all(), "bound must dominate the true best"
    M = best_np.max()
    n_surv = int((bound_np >= M).sum())
    # simulate the real seeding: M_lb = max best among top-256 bounds
    order = np.argsort(-bound_np)[:256]
    m_lb = best_np[order].max()
    n_surv_seeded = int((bound_np >= m_lb).sum())
    print(f"true max M={M}  survivors(bound>=M)={n_surv} "
          f"({100.0 * n_surv / B:.1f}%)  seeded M_lb={m_lb} "
          f"survivors={n_surv_seeded} ({100.0 * n_surv_seeded / B:.1f}%)",
          flush=True)
    # exam cost estimate for the survivors at measured tile cost
    per_tile = 8.74 / T
    est = min(bcmp, bmm) + tk + 0.35 + per_tile * int(
        np.ceil(n_surv_seeded / H._VOTE_TILE))
    print(f"estimated pruned init: {est:.2f} ms vs exact 8.74 ms", flush=True)


if __name__ == "__main__":
    main()
