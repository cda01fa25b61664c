"""Perf experiment: Pallas int8 lazy-voting INIT for granularity 6.

PERF.md pins the g6 lazy init (`ops.hough._vote_state_tiles`) at 8.8 ms —
~80% of the padded bf16-MXU peak for the one-hot-matmul formulation — and
records XLA's int8 einsum as NOT hitting the MXU double-rate path.  This
experiment hand-forces that path: a Pallas kernel that

  * computes the per-direction bins IN KERNEL with the exact `_vote_bins`
    f32 expression (same values, same association order — bit-identity vs
    the XLA path is asserted on-device, since the lazy decrements
    (`_removed_cell_keys`) must agree with the init binning exactly);
  * builds the (128, N) int8 one-hots in VMEM and contracts them with an
    NT-form `dot_general` at the int8 MXU rate (v5e: 394 int8 TOPS vs
    197 bf16 TFLOPS — the padded-MXU ideal halves from ~7.0 to ~3.5 ms);
  * reduces to (best, key, ub) per direction inside the kernel, so the
    (B, NX, NX) histogram NEVER exists in HBM (the lazy-voting invariant).

Counts are exact either way: 0/1 operands, int32 accumulation, values
<= N = 2048.  A bf16 in-kernel variant is measured too, to separate the
int8-rate win from fusion/traffic effects.

Run bare (owns the TPU; no kill timeout): python tools/exp_g6_pallas.py
"""

import functools
import sys
import time

import numpy as np

_ST = 128        # directions per grid step
_NXS = 79        # num_x_static at granularity 6
_BIG = np.int32(2 ** 30)


def make_kernel(jax, jnp, pl, pltpu, nxs, n_static, acc_dtype, nn_form=False):
    oh_dtype = jnp.int8 if acc_dtype == jnp.int32 else jnp.bfloat16

    def kernel_nn(xs_ref, c1_ref, c2_ref, scal_ref, out_ref,
                  xi_ref, yi_ref):
        """NN-form: per direction the y bin row (1, N) is reshaped to a
        column (N, 1) and the y one-hot built directly in (N, 128)
        orientation, so the dot is a plain NN (128,N)@(N,128) — no NT
        dimension numbers (which cost a per-direction (N,128) transpose
        in the first variant)."""
        d = scal_ref[0, 0]
        dx = scal_ref[0, 1]
        num_x = scal_ref[0, 2].astype(jnp.int32)

        x0 = xs_ref[0:1, :]
        x1 = xs_ref[1:2, :]
        x2 = xs_ref[2:3, :]
        act = xs_ref[3:4, :] > 0.5

        xp = (c1_ref[:, 0:1] * x0 + c1_ref[:, 1:2] * x1) + c1_ref[:, 2:3] * x2
        yp = (c2_ref[:, 0:1] * x0 + c2_ref[:, 1:2] * x1) + c2_ref[:, 2:3] * x2
        half = d / 2.0
        xi = jnp.clip(jnp.floor((xp + half) / dx).astype(jnp.int32),
                      0, num_x - 1)
        yi = jnp.clip(jnp.floor((yp + half) / dx).astype(jnp.int32),
                      0, num_x - 1)
        xi_ref[:, :] = jnp.where(act, xi, jnp.int32(128))
        yi_ref[:, :] = yi

        n = xs_ref.shape[1]
        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        oh_iota = jax.lax.broadcasted_iota(jnp.int32, (128, n), 0)
        ohn_iota = jax.lax.broadcasted_iota(jnp.int32, (n, 128), 1)
        row_i = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
        col_i = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
        cell_valid = (row_i < nxs) & (col_i < nxs)
        flat = row_i * nxs + col_i

        def body(j, _):
            xj = xi_ref[pl.ds(j, 1), :]                      # (1, N)
            yjt = yi_ref[pl.ds(j, 1), :].reshape(n, 1)       # (N, 1)
            x1h = (oh_iota == xj).astype(oh_dtype)           # (128, N)
            y1h = (ohn_iota == yjt).astype(oh_dtype)         # (N, 128)
            votes = jax.lax.dot_general(
                x1h, y1h, (((1,), (0,)), ((), ())),
                preferred_element_type=acc_dtype)            # (128, 128)
            votes = votes.astype(jnp.int32) if acc_dtype != jnp.int32 \
                else votes
            vm = jnp.where(cell_valid, votes, -1)
            best = jnp.max(vm)
            key = jnp.min(jnp.where(cell_valid & (votes == best), flat,
                                    _BIG))
            ub = jnp.max(jnp.where(cell_valid & (flat != key), votes, -1))
            row = jnp.where(lane_iota == 0, best.astype(jnp.float32),
                  jnp.where(lane_iota == 1, key.astype(jnp.float32),
                  jnp.where(lane_iota == 2, ub.astype(jnp.float32), 0.0)))
            out_ref[pl.ds(j, 1), :] = row
            return 0

        jax.lax.fori_loop(0, c1_ref.shape[0], body, 0)

    if nn_form:
        return kernel_nn

    def kernel(xs_ref, c1_ref, c2_ref, scal_ref, out_ref, xi_ref, yi_ref):
        d = scal_ref[0, 0]
        dx = scal_ref[0, 1]
        num_x = scal_ref[0, 2].astype(jnp.int32)

        x0 = xs_ref[0:1, :]
        x1 = xs_ref[1:2, :]
        x2 = xs_ref[2:3, :]
        act = xs_ref[3:4, :] > 0.5

        # exact _vote_bins expression: f32, fixed association order
        xp = (c1_ref[:, 0:1] * x0 + c1_ref[:, 1:2] * x1) + c1_ref[:, 2:3] * x2
        yp = (c2_ref[:, 0:1] * x0 + c2_ref[:, 1:2] * x1) + c2_ref[:, 2:3] * x2
        half = d / 2.0
        xi = jnp.clip(jnp.floor((xp + half) / dx).astype(jnp.int32),
                      0, num_x - 1)
        yi = jnp.clip(jnp.floor((yp + half) / dx).astype(jnp.int32),
                      0, num_x - 1)
        # inactive -> out-of-range sentinel (one-hot row all-zero)
        xi_ref[:, :] = jnp.where(act, xi, jnp.int32(128))
        yi_ref[:, :] = yi

        n = xs_ref.shape[1]
        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        oh_iota = jax.lax.broadcasted_iota(jnp.int32, (128, n), 0)
        row_i = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
        col_i = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
        cell_valid = (row_i < nxs) & (col_i < nxs)
        flat = row_i * nxs + col_i

        def body(j, _):
            xj = xi_ref[pl.ds(j, 1), :]                      # (1, N)
            yj = yi_ref[pl.ds(j, 1), :]
            x1h = (oh_iota == xj).astype(oh_dtype)           # (128, N)
            y1h = (oh_iota == yj).astype(oh_dtype)
            votes = jax.lax.dot_general(
                x1h, y1h, (((1,), (1,)), ((), ())),
                preferred_element_type=acc_dtype)            # (128, 128)
            votes = votes.astype(jnp.int32) if acc_dtype != jnp.int32 \
                else votes
            vm = jnp.where(cell_valid, votes, -1)
            best = jnp.max(vm)
            key = jnp.min(jnp.where(cell_valid & (votes == best), flat,
                                    _BIG))
            ub = jnp.max(jnp.where(cell_valid & (flat != key), votes, -1))
            row = jnp.where(lane_iota == 0, best.astype(jnp.float32),
                  jnp.where(lane_iota == 1, key.astype(jnp.float32),
                  jnp.where(lane_iota == 2, ub.astype(jnp.float32), 0.0)))
            out_ref[pl.ds(j, 1), :] = row
            return 0

        jax.lax.fori_loop(0, c1_ref.shape[0], body, 0)

    return kernel


def make_state_fn(jax, jnp, pl, pltpu, n_static, acc_dtype, interpret=False,
                  nn_form=False):
    kernel = make_kernel(jax, jnp, pl, pltpu, _NXS, n_static, acc_dtype,
                         nn_form=nn_form)

    @jax.jit
    def state(xs4, c1, c2, scal):
        B = c1.shape[0]
        n = xs4.shape[1]
        out = pl.pallas_call(
            kernel,
            grid=(B // _ST,),
            in_specs=[
                pl.BlockSpec((8, n), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((_ST, 3), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((_ST, 3), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 4), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((_ST, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, 128), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((_ST, n), jnp.int32),
                pltpu.VMEM((_ST, n), jnp.int32),
            ],
            interpret=interpret,
        )(xs4, c1, c2, scal)
        return out[:, 0], out[:, 1].astype(jnp.int32), out[:, 2]

    return state


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

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
    assert cfg.num_x_max == _NXS, cfg.num_x_max

    poses = trajectory_poses(WP_TESTS, hz=4.0, velocity=0.25)
    frames = simulate_trajectory(OBS_TESTS_SCENE, poses[:8],
                                 TofSpec(noise_frac=0.002), seed=0)
    raw = np.full((cfg.shapes.max_raw_points, 3), np.nan, np.float32)
    raw[: len(frames[4].points)] = frames[4].points
    rawj = jnp.asarray(raw)

    filtered, fvalid, _ = jax.jit(lambda r: preprocess(r, cfg))(rawj)

    dirs_np, c1_np, c2_np = hough_space(cfg.granularity)
    B = len(dirs_np)
    dx = jnp.float32(cfg.opt_dx)

    pts, valid = filtered, fvalid
    p_min, p_max = H._masked_minmax(pts, valid)
    diag = p_max - p_min
    d = jnp.sqrt(jnp.maximum((diag * diag).sum(), 0.0))
    shift = (p_min + p_max) / 2.0
    Xs = jnp.where(valid[:, None], pts - shift, 0.0)
    num_x = jnp.maximum(jnp.floor(d / dx + 0.5).astype(jnp.int32), 1)
    N = Xs.shape[0]
    print(f"B={B} N={N} num_x={int(num_x)}", file=sys.stderr)

    dirs, c1, c2 = H._pad_dirs_to_tile(
        jnp.asarray(dirs_np, jnp.float32),
        jnp.asarray(c1_np, jnp.float32), jnp.asarray(c2_np, jnp.float32))
    Bp = c1.shape[0]

    # kernel inputs
    xs4 = jnp.zeros((8, N), jnp.float32)
    xs4 = xs4.at[0:3, :].set(Xs.T).at[3, :].set(valid.astype(jnp.float32))
    scal = jnp.stack([d, dx, num_x.astype(jnp.float32),
                      jnp.float32(0)]).reshape(1, 4)

    # ---- correctness: bit-identity vs the XLA lazy init, full B ----
    b0, k0, u0 = jax.jit(lambda X: H._vote_state_tiles(
        X, c1, c2, d, dx, num_x, valid, _NXS))(Xs)
    b0, k0, u0 = np.asarray(b0), np.asarray(k0), np.asarray(u0)

    results = {}
    eps = jnp.float32(1e-20)
    reps = 64

    def time_variant(label, fn, args):
        @jax.jit
        def loop(xs4_, rest):
            def body(i, acc):
                b, k, u = fn(xs4_ + acc * eps, *rest)
                return (acc + b.sum() * eps + u.sum() * eps
                        + k.sum().astype(jnp.float32) * eps)
            return jax.lax.fori_loop(0, reps, body, jnp.float32(0))

        _ = float(loop(args[0], args[1:]))      # compile
        t0 = time.perf_counter()
        _ = float(loop(args[0], args[1:]))
        dt = (time.perf_counter() - t0) / reps * 1e3
        print(f"{label}: {dt:.2f} ms/init", flush=True)
        return dt

    import os
    variants = (("int8", jnp.int32, False),
                ("bf16", jnp.float32, False),
                ("int8-nn", jnp.int32, True),
                ("bf16-nn", jnp.float32, True))
    if os.environ.get("EXP_NN_ONLY"):   # skip re-measuring known-slow NT forms
        variants = variants[2:]
    for name, acc, nn in variants:
        try:
            fn = make_state_fn(jax, jnp, pl, pltpu, N, acc, nn_form=nn)
            b1, k1, u1 = jax.jit(lambda a: fn(a, c1, c2, scal))(xs4)
            b1, k1, u1 = np.asarray(b1), np.asarray(k1), np.asarray(u1)
            ok = (bool((b0 == b1).all()) and bool((k0 == k1).all())
                  and bool((u0 == u1).all()))
            nb = int((b0 != b1).sum())
            nk = int((k0 != k1).sum())
            nu = int((u0 != u1).sum())
            print(f"pallas-{name} exact={ok} (diff best/key/ub: "
                  f"{nb}/{nk}/{nu} of {Bp})", flush=True)
            if ok:
                results[name] = time_variant(
                    f"pallas-{name}",
                    lambda a, c1_, c2_, s_: fn(a, c1_, c2_, s_),
                    (xs4, c1, c2, scal))
        except Exception as e:  # Mosaic may reject int8 dots
            print(f"pallas-{name} FAILED: {type(e).__name__}: "
                  f"{str(e)[:500]}", flush=True)

    results["baseline"] = time_variant(
        "baseline _vote_state_tiles",
        lambda X, c1_, c2_: H._vote_state_tiles(
            X, c1_, c2_, d, dx, num_x, valid, _NXS),
        (Xs, c1, c2))

    print("results_ms:", {k: round(v, 2) for k, v in results.items()})


if __name__ == "__main__":
    main()
