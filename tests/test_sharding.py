"""Multi-device sharding on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pointcloud_segmentation_tpu.config import default_config, StaticShapes
from pointcloud_segmentation_tpu.parallel import (
    make_mesh, make_multichip_step, make_batched_extract)
from pointcloud_segmentation_tpu.pipeline import make_process_frame, init_world
from pointcloud_segmentation_tpu.io.scene import OBS_TESTS_SCENE, WP_TESTS, trajectory_poses
from pointcloud_segmentation_tpu.io.simulator import simulate_trajectory, TofSpec

CFG = default_config(
    granularity=1,
    shapes=StaticShapes(max_raw_points=1024, max_points=512,
                        max_world_segments=16),
)


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def make_frames(n, cfg=CFG):
    poses = trajectory_poses(WP_TESTS, hz=1.0, velocity=0.4)[:n]
    frames = simulate_trajectory(
        OBS_TESTS_SCENE, poses, TofSpec(width=32, height=32, noise_frac=0.002),
        seed=5)
    clouds = np.full((n, cfg.shapes.max_raw_points, 3), np.nan, np.float32)
    poss = np.zeros((n, 3), np.float32)
    quats = np.zeros((n, 4), np.float32)
    for i, fr in enumerate(frames):
        k = min(len(fr.points), cfg.shapes.max_raw_points)
        clouds[i, :k] = fr.points[:k]
        poss[i] = fr.position
        quats[i] = fr.quat_wxyz
    return frames, clouds, poss, quats


def run_single_device(frames, cfg=CFG):
    step = make_process_frame(cfg)
    st = init_world(cfg)
    for fr in frames:
        raw = np.full((cfg.shapes.max_raw_points, 3), np.nan, np.float32)
        k = min(len(fr.points), cfg.shapes.max_raw_points)
        raw[:k] = fr.points[:k]
        st, _ = step(st, jnp.asarray(raw), jnp.asarray(fr.position, jnp.float32),
                     jnp.asarray(fr.quat_wxyz, jnp.float32))
    return st


@pytest.mark.parametrize("n_batch,n_dir", [(4, 2), (8, 1), (2, 4)])
def test_multichip_step_matches_single_device(n_batch, n_dir):
    mesh = make_mesh(n_batch=n_batch, n_dir=n_dir)
    frames, clouds, poss, quats = make_frames(8)
    step = make_multichip_step(CFG, mesh)
    st = init_world(CFG)
    st, nlines, statuses = step(st, jnp.asarray(clouds), jnp.asarray(poss),
                                jnp.asarray(quats))
    ref = run_single_device(frames)
    assert int(st.count) == int(ref.count)
    n = int(ref.count)
    np.testing.assert_allclose(np.asarray(st.a)[:n], np.asarray(ref.a)[:n],
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(st.b)[:n], np.asarray(ref.b)[:n],
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(st.t_min)[:n], np.asarray(ref.t_min)[:n],
                               atol=1e-4)
    # intersection sentinel topology identical
    mj = (np.asarray(st.inter)[:n, :n] != -1).all(-1)
    mr = (np.asarray(ref.inter)[:n, :n] != -1).all(-1)
    np.testing.assert_array_equal(mj, mr)


def test_batched_extract_runs_sharded():
    mesh = make_mesh(n_batch=4, n_dir=2)
    frames, clouds, poss, quats = make_frames(4)
    run = make_batched_extract(CFG, mesh)
    segs, nlines, statuses = run(jnp.asarray(clouds), jnp.asarray(poss),
                                 jnp.asarray(quats))
    assert segs.a.shape[0] == 4
    assert np.asarray(statuses).shape == (4,)
    # at least one frame extracted something
    assert np.asarray(segs.valid).any()


def test_dir_sharding_parity_with_unsharded():
    # same frames, dir-sharded vs plain mesh: identical segments
    frames, clouds, poss, quats = make_frames(4)
    m1 = make_mesh(n_batch=4, n_dir=1)
    m2 = make_mesh(n_batch=2, n_dir=4)
    r1 = make_batched_extract(CFG, m1)(jnp.asarray(clouds), jnp.asarray(poss),
                                       jnp.asarray(quats))
    # pad to batch multiple of 2 is fine (4 % 2 == 0)
    r2 = make_batched_extract(CFG, m2)(jnp.asarray(clouds), jnp.asarray(poss),
                                       jnp.asarray(quats))
    v1, v2 = np.asarray(r1[0].valid), np.asarray(r2[0].valid)
    np.testing.assert_array_equal(v1, v2)
    np.testing.assert_allclose(np.asarray(r1[0].a)[v1], np.asarray(r2[0].a)[v2],
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(r1[0].b)[v1], np.asarray(r2[0].b)[v2],
                               atol=1e-5)


def test_tp_process_frame_matches_single_device():
    """Direction-TP single-frame pipeline == plain pipeline, incl. world map."""
    from pointcloud_segmentation_tpu.parallel.sharding import make_tp_process_frame

    mesh = make_mesh(n_batch=1, n_dir=8)
    frames, clouds, poss, quats = make_frames(4)
    step_tp = make_tp_process_frame(CFG, mesh)
    st = init_world(CFG)
    for i in range(4):
        st, out = step_tp(st, jnp.asarray(clouds[i]), jnp.asarray(poss[i]),
                          jnp.asarray(quats[i]))
    ref = run_single_device(frames)
    assert int(st.count) == int(ref.count)
    n = int(ref.count)
    np.testing.assert_allclose(np.asarray(st.a)[:n], np.asarray(ref.a)[:n],
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(st.b)[:n], np.asarray(ref.b)[:n],
                               atol=1e-5)


def test_dir_sharding_lazy_voting_parity():
    """Lazy (accumulator-free) voting under direction sharding: the suspect
    bound reduces with pmax across the dir axis — results must match the
    unsharded carry extraction exactly."""
    frames, clouds, poss, quats = make_frames(4)
    cfg_lazy = CFG.replace(voting="lazy")
    m1 = make_mesh(n_batch=4, n_dir=1)
    m2 = make_mesh(n_batch=2, n_dir=4)
    r1 = make_batched_extract(CFG.replace(voting="carry"), m1)(
        jnp.asarray(clouds), jnp.asarray(poss), jnp.asarray(quats))
    r2 = make_batched_extract(cfg_lazy, m2)(
        jnp.asarray(clouds), jnp.asarray(poss), jnp.asarray(quats))
    v1, v2 = np.asarray(r1[0].valid), np.asarray(r2[0].valid)
    np.testing.assert_array_equal(v1, v2)
    np.testing.assert_allclose(np.asarray(r1[0].a)[v1], np.asarray(r2[0].a)[v2],
                               atol=1e-5)
    np.testing.assert_array_equal(np.asarray(r1[0].points_size)[v1],
                                  np.asarray(r2[0].points_size)[v2])


def test_dir_sharding_lazy_voting_parity_g6_full_table():
    """The dir-sharded lazy path at the REAL granularity-6 table (20,481
    directions, the reference's shipped config — hough.h:192's
    num_directions[6]): per-shard suspect tiers (s_tier/s_cap engage only
    when B/shard exceeds them), direction-tile padding, and the cross-shard
    M_lb pmax (ops/hough.py) are all exercised at production size — every
    earlier sharding test ran granularity 1 (21 directions), which engages
    none of them.  Results must equal the unsharded carry extraction."""
    # floor_trim_height=0: the default 0.3 floor cut invalidates every
    # accepted line of this low trajectory at g6 (probe-verified), which
    # would let the parity assert pass vacuously on empty masks
    cfg6 = default_config(
        granularity=6, floor_trim_height=0.0,
        shapes=StaticShapes(max_raw_points=1024, max_points=512,
                            max_world_segments=16))
    frames, clouds, poss, quats = make_frames(2, cfg6)
    m1 = make_mesh(n_batch=2, n_dir=1)
    m2 = make_mesh(n_batch=2, n_dir=4)
    r1 = make_batched_extract(cfg6.replace(voting="carry"), m1)(
        jnp.asarray(clouds), jnp.asarray(poss), jnp.asarray(quats))
    r2 = make_batched_extract(cfg6.replace(voting="lazy"), m2)(
        jnp.asarray(clouds), jnp.asarray(poss), jnp.asarray(quats))
    v1, v2 = np.asarray(r1[0].valid), np.asarray(r2[0].valid)
    assert v1.any(), "scene must extract at least one line at g6"
    np.testing.assert_array_equal(v1, v2)
    np.testing.assert_allclose(np.asarray(r1[0].a)[v1],
                               np.asarray(r2[0].a)[v2], atol=1e-5)
    np.testing.assert_allclose(np.asarray(r1[0].b)[v1],
                               np.asarray(r2[0].b)[v2], atol=1e-5)
    np.testing.assert_array_equal(np.asarray(r1[0].points_size)[v1],
                                  np.asarray(r2[0].points_size)[v2])
    np.testing.assert_array_equal(np.asarray(r1[1]), np.asarray(r2[1]))


def test_global_argmax_winner_no_int32_overflow():
    """Cross-shard winner decode must be exact where a flat
    b*cells+cell int32 key would wrap negative (B_total*num_x^2 > 2^31,
    e.g. granularity 6 with min radius <= ~0.012 m)."""
    from functools import partial

    from jax import shard_map
    from jax.sharding import Mesh, PartitionSpec as P

    from pointcloud_segmentation_tpu.ops.hough import _global_argmax_winner

    devs = np.array(jax.devices()[:8])
    mesh = Mesh(devs, ("dir",))
    # Per-shard winners: counts tie at 7.0 on shards 2, 5, 6; global
    # direction indices and cells are in the overflow regime (the old flat
    # key for shard 5 would be 19000*106276 + 99000 = 2.02e9 < 2^31 but
    # shard 6's 20100*106276 = 2.14e9 > 2^31 wraps negative and would
    # steal the argmax from shard 5's smaller direction).
    M = jnp.array([1.0, 3.0, 7.0, 2.0, 0.0, 7.0, 7.0, 4.0], jnp.float32)
    b_idx = jnp.array([100, 3000, 20400, 9000, 11000, 19000, 20100, 15000],
                      jnp.int32)
    cell = jnp.array([5, 17, 106275, 40, 8, 99000, 1, 106000], jnp.int32)

    @partial(shard_map, mesh=mesh, in_specs=(P("dir"), P("dir"), P("dir")),
             out_specs=(P(), P(), P()))
    def run(m, b, c):
        return _global_argmax_winner(m[0], b[0], c[0], "dir")

    Mg, bg, cg = jax.jit(run)(M, b_idx, cell)
    assert float(Mg) == 7.0
    assert int(bg) == 19000      # smallest direction among the tied shards
    assert int(cg) == 99000      # the cell of THAT shard, not a wrapped key


def test_tp_process_frame_f64_parity_exact():
    """The f64 parity contract extends to sharded paths: _padded_dir_tables
    must keep direction vectors in the pipeline compute dtype (truncating
    them to f32 survived extract_lines' astype round-trip and silently
    voided f64 parity on every multichip path)."""
    from pointcloud_segmentation_tpu.parallel.sharding import (
        make_tp_process_frame, _padded_dir_tables)

    cfg = default_config(
        granularity=1, compute_dtype="float64",
        shapes=StaticShapes(max_raw_points=1024, max_points=512,
                            max_world_segments=16))
    with jax.enable_x64(True):
        dirs, _, _ = _padded_dir_tables(cfg, 8)
        assert dirs.dtype == jnp.float64
        mesh = make_mesh(n_batch=1, n_dir=8)
        frames, clouds, poss, quats = make_frames(4, cfg)
        step_tp = make_tp_process_frame(cfg, mesh)
        st = init_world(cfg)
        # clouds are fed as FLOAT32 on purpose: the sharded step must cast
        # to the pipeline compute dtype itself, exactly like
        # pipeline.process_frame — an uncast f32 cloud silently downgraded
        # the whole sharded run to f32 while claiming f64 parity
        for i in range(4):
            st, _ = step_tp(st, jnp.asarray(clouds[i], jnp.float32),
                            jnp.asarray(poss[i], jnp.float64),
                            jnp.asarray(quats[i], jnp.float64))
        step1 = make_process_frame(cfg)
        ref = init_world(cfg)
        for i in range(4):
            ref, _ = step1(ref, jnp.asarray(clouds[i], jnp.float32),
                           jnp.asarray(poss[i], jnp.float64),
                           jnp.asarray(quats[i], jnp.float64))
    assert int(st.count) == int(ref.count)
    n = int(ref.count)
    assert n >= 1
    # the sharded collectives are masked psums over disjoint shards —
    # bit-exact vs the single-chip path, no tolerance needed
    np.testing.assert_array_equal(np.asarray(st.a)[:n], np.asarray(ref.a)[:n])
    np.testing.assert_array_equal(np.asarray(st.b)[:n], np.asarray(ref.b)[:n])
    np.testing.assert_array_equal(np.asarray(st.radius)[:n],
                                  np.asarray(ref.radius)[:n])


def test_make_mesh_rejects_nonpositive_dir():
    with pytest.raises(ValueError, match="n_dir"):
        make_mesh(n_dir=0)


def test_sharded_paths_apply_surface_offset_correction():
    """cfg.surface_offset_correction (E-OFFSET) must not be silently
    ignored on the sharded paths — they mirror pipeline.process_frame,
    which applies it between extraction and the world transform."""
    cfg = CFG.replace(surface_offset_correction=True)
    frames, clouds, poss, quats = make_frames(4)
    mesh = make_mesh(n_batch=4, n_dir=1)
    step = make_multichip_step(cfg, mesh)
    st = init_world(cfg)
    st, _, _ = step(st, jnp.asarray(clouds), jnp.asarray(poss),
                    jnp.asarray(quats))
    step1 = make_process_frame(cfg)
    ref = init_world(cfg)
    for i in range(4):
        ref, _ = step1(ref, jnp.asarray(clouds[i]), jnp.asarray(poss[i]),
                       jnp.asarray(quats[i]))
    assert int(st.count) == int(ref.count)
    n = int(ref.count)
    assert n >= 1
    np.testing.assert_allclose(np.asarray(st.a)[:n], np.asarray(ref.a)[:n],
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(st.radius)[:n],
                               np.asarray(ref.radius)[:n], atol=1e-5)
