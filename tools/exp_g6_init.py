"""Perf experiment: granularity-6 lazy voting-init variants on the real TPU.

PERF.md pins node_loop_g6 at ~17.7 ms device with the ~13 ms lazy init
(`ops.hough._vote_state_tiles`) as the floor: per 128-direction tile the
(79, 2048) @ (2048, 79) one-hot dots pad both 79-dims to 128 MXU lanes
(38% util).  This script measures candidate structural changes in
isolation, with the repo's microbench rules (on-device fori_loop chaining
with a REAL data dependency `acc * eps`, scalar readback sync — CLAUDE.md):

  * _VOTE_TILE sweep (128 / 256 / 512): fewer lax.map steps, bigger
    transients;
  * 2-direction lane packing at NX'=64: two directions' one-hot rows
    stacked into the 128-lane tile, votes read from the two diagonal
    64x64 blocks — halves the matmul passes when the dynamic bin count
    fits 64 (measured 42% of benchmark frames, 100% of tower frames).

Run bare (owns the TPU; no kill timeout): python tools/exp_g6_init.py
"""

import sys
import time

import numpy as np

NXP = 64  # packed per-direction bin capacity (2 dirs x 64 = 128 MXU lanes)


def packed_init_fn(H, jax, jnp, d, dx, num_x, valid, T):
    """2-dir lane-packed (best, key, ub) init; valid iff num_x <= NXP."""
    cells = NXP * NXP

    def packed_init(Xp, c1_, c2_):
        x_iota = jax.lax.broadcasted_iota(jnp.int32, (2 * NXP, 1), 0)
        cell_iota = jax.lax.broadcasted_iota(jnp.int32, (1, cells), 1)
        off = (jnp.arange(256, dtype=jnp.int32) % 2) * NXP

        def tile_state(args):
            c1t, c2t = args                                    # (256, 3)
            xt, yt = H._vote_bins(Xp, c1t, c2t, d, dx, num_x)  # (256, N)
            xt = jnp.where(valid[None, :], xt, NXP)
            # pair p = dirs (2p, 2p+1): odd member shifted into rows 64..127;
            # anything out of [0, NXP) pre-shift becomes an out-of-range
            # sentinel whose one-hot row is all-zero
            xt = jnp.where(xt >= NXP, 2 * NXP, xt + off[:, None])
            yt = jnp.where(yt >= NXP, 2 * NXP, yt + off[:, None])
            xt2 = xt.reshape(128, 2, -1)
            yt2 = yt.reshape(128, 2, -1)
            X1 = ((xt2[:, 0, None, :] == x_iota[None, :, :])
                  | (xt2[:, 1, None, :] == x_iota[None, :, :])
                  ).astype(jnp.bfloat16)                       # (128, 128, N)
            yio = x_iota[None, :, :].transpose(0, 2, 1)
            Y1 = ((yt2[:, 0, :, None] == yio)
                  | (yt2[:, 1, :, None] == yio)).astype(jnp.bfloat16)
            v = jnp.einsum("pxn,pny->pxy", X1, Y1,
                           preferred_element_type=jnp.float32)
            va = v[:, :NXP, :NXP].reshape(128, cells)   # dir 2p histogram
            vb = v[:, NXP:, NXP:].reshape(128, cells)   # dir 2p+1 histogram
            vf = jnp.stack([va, vb], 1).reshape(256, cells)
            best = vf.max(axis=1)
            key = jnp.argmax(vf == best[:, None], axis=1).astype(jnp.int32)
            ub = jnp.where(cell_iota == key[:, None], -1.0, vf).max(axis=1)
            return best, key, ub

        def go(c1r, c2r):
            bs, ks, us = jax.lax.map(tile_state, (c1r, c2r))
            return bs.reshape(-1), ks.reshape(-1), us.reshape(-1)

        return go(c1_.reshape(T, 256, 3), c2_.reshape(T, 256, 3))

    return packed_init


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

    cfg = default_config(
        granularity=6,
        shapes=StaticShapes(max_raw_points=4096, max_points=2048,
                            max_world_segments=64))
    print("devices:", jax.devices(), file=sys.stderr)

    poses = trajectory_poses(WP_TESTS, hz=4.0, velocity=0.25)
    frames = simulate_trajectory(OBS_TESTS_SCENE, poses[:8],
                                 TofSpec(noise_frac=0.002), seed=0)
    raw = np.full((cfg.shapes.max_raw_points, 3), np.nan, np.float32)
    raw[: len(frames[4].points)] = frames[4].points
    rawj = jnp.asarray(raw)

    filtered, fvalid, _ = jax.jit(lambda r: preprocess(r, cfg))(rawj)
    n_active = int(np.asarray(fvalid).sum())

    dirs_np, c1_np, c2_np = hough_space(cfg.granularity)
    B = len(dirs_np)
    num_x_static = cfg.num_x_max
    dx = jnp.float32(cfg.opt_dx)
    print(f"frame: active={n_active} B={B} NX_static={num_x_static}",
          file=sys.stderr)

    # geometry (mirrors extract_lines' prologue)
    pts, valid = filtered, fvalid
    p_min, p_max = H._masked_minmax(pts, valid)
    diag = p_max - p_min
    d = jnp.sqrt(jnp.maximum((diag * diag).sum(), 0.0))
    shift = (p_min + p_max) / 2.0
    Xs = jnp.where(valid[:, None], pts - shift, 0.0)
    num_x = jnp.maximum(jnp.floor(d / dx + 0.5).astype(jnp.int32), 1)
    print("num_x (dynamic):", int(num_x), file=sys.stderr)

    eps = jnp.float32(1e-20)
    # NB reps=8 (the first run of this script) buries every number under a
    # ~3 ms RTT/reps readback floor — see PERF.md measurement trap #3.
    reps = 64

    def time_variant(label, fn, X0, *a):
        @jax.jit
        def loop(X, aa):
            def body(i, acc):
                b, k, u = fn(X + acc * eps, *aa)
                return (acc + b.sum() * eps + u.sum() * eps
                        + k.sum().astype(jnp.float32) * eps)
            return jax.lax.fori_loop(0, reps, body, jnp.float32(0))

        _ = float(loop(X0, a))              # compile
        t0 = time.perf_counter()
        _ = float(loop(X0, a))
        dt = (time.perf_counter() - t0) / reps * 1e3
        print(f"{label}: {dt:.2f} ms/init", flush=True)
        return dt

    results = {}
    for tile in (128, 256, 512):
        H._VOTE_TILE = tile
        dirs, c1, c2 = H._pad_dirs_to_tile(
            jnp.asarray(dirs_np, jnp.float32),
            jnp.asarray(c1_np, jnp.float32), jnp.asarray(c2_np, jnp.float32))
        results[f"tile{tile}"] = time_variant(
            f"baseline _vote_state_tiles tile={tile}",
            lambda X, c1_, c2_: H._vote_state_tiles(
                X, c1_, c2_, d, dx, num_x, valid, num_x_static),
            Xs, c1, c2)
    H._VOTE_TILE = 128

    pad = (-B) % 256
    c1p = np.concatenate([c1_np, np.repeat(c1_np[:1], pad, 0)]).astype(np.float32)
    c2p = np.concatenate([c2_np, np.repeat(c2_np[:1], pad, 0)]).astype(np.float32)
    c1j, c2j = jnp.asarray(c1p), jnp.asarray(c2p)
    T = len(c1p) // 256

    packed = packed_init_fn(H, jax, jnp, d, dx, num_x, valid, T)
    results["packed64"] = time_variant(
        "2-dir lane packing (NX'=64)", packed, Xs, c1j, c2j)

    # correctness: shrink the cloud so the dynamic num_x fits 64, then the
    # packed state must equal the baseline state direction-for-direction
    Xs2 = Xs * 0.7
    p2min, p2max = H._masked_minmax(Xs2, valid)
    d2 = jnp.sqrt(jnp.maximum(((p2max - p2min) ** 2).sum(), 0.0))
    num_x2 = jnp.maximum(jnp.floor(d2 / dx + 0.5).astype(jnp.int32), 1)
    print("correctness num_x:", int(num_x2), "(must be <= 64)",
          file=sys.stderr)
    dirs, c1, c2 = H._pad_dirs_to_tile(
        jnp.asarray(dirs_np, jnp.float32),
        jnp.asarray(c1_np, jnp.float32), jnp.asarray(c2_np, jnp.float32))
    b0, k0, u0 = jax.jit(lambda X: H._vote_state_tiles(
        X, c1, c2, d2, dx, num_x2, valid, num_x_static))(Xs2)
    packed2 = packed_init_fn(H, jax, jnp, d2, dx, num_x2, valid, T)
    b1, k1, u1 = jax.jit(lambda X: packed2(X, c1j, c2j))(Xs2)
    b0, b1 = np.asarray(b0)[:B], np.asarray(b1)[:B]
    k0, k1 = np.asarray(k0)[:B], np.asarray(k1)[:B]
    u0, u1 = np.asarray(u0)[:B], np.asarray(u1)[:B]
    same_best = bool((b0 == b1).all())
    # keys use different bases (NX_static vs 64): compare decoded (xi, yi)
    same_key = bool(((k0 // num_x_static == k1 // NXP)
                     & (k0 % num_x_static == k1 % NXP)).all())
    same_ub = bool((u0 == u1).all())
    print(f"packed correctness: best={same_best} key={same_key} ub={same_ub}")
    print("results_ms:", {k: round(v, 2) for k, v in results.items()})


if __name__ == "__main__":
    main()
