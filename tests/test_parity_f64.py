"""f64 parity mode: the device pipeline vs the numpy oracle at <= 1e-4.

BASELINE.json's north star demands bit-faithful (<=1e-4) segments vs the
reference.  The oracle is the executable spec; the perf-default f32 device
path is tested at looser tolerances (test_hough_jax.py, test_golden.py).
This module runs the SAME device pipeline with compute_dtype='float64'
(f32-by-spec stages — vote binning, cell decode, scatter eigensolves —
stay f32, matching the oracle's deliberate precision mix, reference
h:129 MatrixXf) and asserts <= 1e-4 end to end.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pointcloud_segmentation_tpu import oracle
from pointcloud_segmentation_tpu.config import default_config, StaticShapes
from pointcloud_segmentation_tpu.io.scene import (
    OBS_TESTS_SCENE, WP_TESTS, trajectory_poses)
from pointcloud_segmentation_tpu.io.simulator import simulate_trajectory, TofSpec

TOL = 1e-4

CFG = default_config(
    granularity=2, compute_dtype="float64",
    shapes=StaticShapes(max_raw_points=4096, max_points=2048,
                        max_world_segments=32),
)


def _pad(pts, n, dtype):
    out = np.full((n, 3), np.nan, dtype)
    out[: len(pts)] = pts
    return out


def _world_rows(state):
    n = int(np.asarray(state.count))
    return {
        "a": np.asarray(state.a)[:n],
        "b": np.asarray(state.b)[:n],
        "t_min": np.asarray(state.t_min)[:n],
        "t_max": np.asarray(state.t_max)[:n],
        "radius": np.asarray(state.radius)[:n],
        "points_size": np.asarray(state.points_size)[:n],
        "pca_coeff": np.asarray(state.pca_coeff)[:n],
        "n": n,
    }


def test_f64_end_to_end_parity_obs_scene():
    """Full replay of the 7-beam benchmark scene: world segments,
    per-frame nlines, and intersections agree with the oracle <= 1e-4."""

    poses = trajectory_poses(WP_TESTS, hz=1.5, velocity=0.3)
    frames = simulate_trajectory(OBS_TESTS_SCENE, poses,
                                 TofSpec(noise_frac=0.002), seed=0)

    wm = oracle.WorldMap(CFG)
    ref_nlines = []
    for f in frames:
        res = oracle.process_frame(wm, f.points, f.position, f.quat_wxyz, CFG)
        ref_nlines.append(res.nblines)

    with jax.enable_x64(True):
        from pointcloud_segmentation_tpu.pipeline import (
            process_frame, init_world)

        step = jax.jit(lambda s, r, p, q: process_frame(s, r, p, q, CFG))
        state = init_world(CFG)
        jax_nlines = []
        for f in frames:
            raw = jnp.asarray(
                _pad(f.points, CFG.shapes.max_raw_points, np.float64))
            state, out = step(state, raw,
                              jnp.asarray(f.position, jnp.float64),
                              jnp.asarray(f.quat_wxyz, jnp.float64))
            jax_nlines.append(int(out.nlines))
        assert state.a.dtype == jnp.float64
        rows = _world_rows(state)
        jax_inter = np.asarray(state.inter)

    assert jax_nlines == ref_nlines
    assert rows["n"] == len(wm.segments)
    for k, rs in enumerate(wm.segments):
        p1r, p2r = rs.endpoints()
        p1j = rows["t_min"][k] * rows["b"][k] + rows["a"][k]
        p2j = rows["t_max"][k] * rows["b"][k] + rows["a"][k]
        assert np.linalg.norm(p1j - p1r) <= TOL, f"seg {k} endpoint 1"
        assert np.linalg.norm(p2j - p2r) <= TOL, f"seg {k} endpoint 2"
        assert rows["radius"][k] == rs.radius
        assert rows["points_size"][k] == rs.points_size
        assert abs(rows["pca_coeff"][k] - rs.pca_coeff) <= TOL

    ref_rows = wm.intersections_rows()
    got_rows = []
    for i in range(rows["n"]):
        for j in range(i):
            t1, t2 = jax_inter[i, j]
            if t1 != -1.0 and t2 != -1.0:
                got_rows.append((i, float(t1), j, float(t2)))
    assert len(got_rows) == len(ref_rows)
    for (gi, gt1, gj, gt2), (ri, rt1, rj, rt2) in zip(got_rows, ref_rows):
        assert (gi, gj) == (ri, rj)
        assert abs(gt1 - rt1) <= TOL
        assert abs(gt2 - rt2) <= TOL


@pytest.mark.parametrize("seed", range(3))
def test_f64_hough_parity_random_scenes(seed):
    """Standalone extraction on random multi-line scenes at <= 1e-4."""
    from pointcloud_segmentation_tpu.ops.hough import extract_lines

    rng = np.random.default_rng(seed + 77)
    clouds = []
    for i in range(int(rng.integers(1, 4))):
        a = rng.uniform([-0.3, -0.8, 0.2], [0.8, 0.8, 1.5])
        b = rng.normal(size=3)
        b /= np.linalg.norm(b)
        t = np.linspace(0, 1.4, int(rng.integers(150, 300)))
        clouds.append(a + t[:, None] * b + rng.normal(0, 0.005, (len(t), 3)))
    pts = np.concatenate(clouds)

    cfg = CFG.replace(opt_nlines=6)
    ref_segs, ref_nlines, ref_status = oracle.hough3dlines(pts, cfg)

    with jax.enable_x64(True):
        padded = np.zeros((cfg.shapes.max_points, 3), np.float64)
        padded[: len(pts)] = pts
        valid = np.zeros(cfg.shapes.max_points, bool)
        valid[: len(pts)] = True
        res = jax.jit(lambda p, v: extract_lines(p, v, cfg))(
            jnp.asarray(padded, jnp.float64), jnp.asarray(valid))
        v = np.asarray(res.segments.valid)
        ja = np.asarray(res.segments.a)[v]
        jb = np.asarray(res.segments.b)[v]
        jt0 = np.asarray(res.segments.t_min)[v]
        jt1 = np.asarray(res.segments.t_max)[v]
        jps = np.asarray(res.segments.points_size)[v]
        jpc = np.asarray(res.segments.pca_coeff)[v]
        nl = int(res.nlines)
        st = int(res.status)

    assert st == ref_status
    assert nl == ref_nlines
    assert int(v.sum()) == len(ref_segs)
    for k, rs in enumerate(ref_segs):
        p1r, p2r = rs.endpoints()
        p1j = jt0[k] * jb[k] + ja[k]
        p2j = jt1[k] * jb[k] + ja[k]
        assert np.linalg.norm(p1j - p1r) <= TOL, f"seg {k}: {np.linalg.norm(p1j - p1r)}"
        assert np.linalg.norm(p2j - p2r) <= TOL
        assert jps[k] == rs.points_size
        assert abs(jpc[k] - rs.pca_coeff) <= TOL


def test_f64_end_to_end_parity_shipped_g6_lazy():
    """<=1e-4 parity ON THE SHIPPED CONFIG: granularity 6 (the reference's
    config_pc_seg/config.yaml:22) resolves voting to the LAZY path
    (ops/hough._vote_state_tiles + tiered _vstate_update re-exam), which the
    g2 end-to-end test never touches (g2 resolves to "carry").  Full replay
    on a 32x32 ToF (small frame budget — g6 is 20,481 directions on the CPU
    test platform) through pipeline.process_frame in f64 vs the oracle."""
    cfg = default_config(
        granularity=6, compute_dtype="float64",
        shapes=StaticShapes(max_raw_points=2048, max_points=1024,
                            max_world_segments=32))
    assert cfg.voting_mode == "lazy"

    poses = trajectory_poses(WP_TESTS, hz=1.0, velocity=0.4)[:4]
    frames = simulate_trajectory(OBS_TESTS_SCENE, poses,
                                 TofSpec(width=32, height=32,
                                         noise_frac=0.002), seed=3)

    wm = oracle.WorldMap(cfg)
    ref_nlines = []
    for f in frames:
        res = oracle.process_frame(wm, f.points, f.position, f.quat_wxyz, cfg)
        ref_nlines.append(res.nblines)

    with jax.enable_x64(True):
        from pointcloud_segmentation_tpu.pipeline import (
            process_frame, init_world)

        step = jax.jit(lambda s, r, p, q: process_frame(s, r, p, q, cfg))
        state = init_world(cfg)
        jax_nlines = []
        for f in frames:
            raw = jnp.asarray(
                _pad(f.points, cfg.shapes.max_raw_points, np.float64))
            state, out = step(state, raw,
                              jnp.asarray(f.position, jnp.float64),
                              jnp.asarray(f.quat_wxyz, jnp.float64))
            jax_nlines.append(int(out.nlines))
        rows = _world_rows(state)

    assert jax_nlines == ref_nlines
    assert rows["n"] == len(wm.segments) >= 3
    for k, rs in enumerate(wm.segments):
        p1r, p2r = rs.endpoints()
        p1j = rows["t_min"][k] * rows["b"][k] + rows["a"][k]
        p2j = rows["t_max"][k] * rows["b"][k] + rows["a"][k]
        assert np.linalg.norm(p1j - p1r) <= TOL, f"seg {k} endpoint 1"
        assert np.linalg.norm(p2j - p2r) <= TOL, f"seg {k} endpoint 2"
        assert rows["radius"][k] == rs.radius
        assert rows["points_size"][k] == rs.points_size
        assert abs(rows["pca_coeff"][k] - rs.pca_coeff) <= TOL


@pytest.mark.parametrize("seed", range(3))
def test_f64_lazy_equals_carry(seed):
    """The lazy voting state must stay bit-equivalent to the carried
    accumulator in f64 parity mode too (the f32 fuzz lives in
    test_voting_lazy.py; this pins the parity-mode dtype mix — f64 cloud,
    f32-by-spec bins — through both _vstate implementations)."""
    from pointcloud_segmentation_tpu.ops.hough import extract_lines

    rng = np.random.default_rng(seed + 4200)
    cfg = default_config(
        granularity=int(rng.integers(1, 5)),
        opt_nlines=6, opt_minvotes=int(rng.integers(6, 16)),
        min_pca_coeff=float(rng.uniform(0.5, 0.95)),
        compute_dtype="float64",
        shapes=StaticShapes(max_raw_points=2048, max_points=1024))
    clouds = []
    for i in range(int(rng.integers(1, 4))):
        a = rng.uniform([-0.3, -0.8, 0.2], [0.8, 0.8, 1.5])
        b = rng.normal(size=3)
        b /= np.linalg.norm(b)
        t = np.linspace(0, 1.3, int(rng.integers(100, 250)))
        clouds.append(a + t[:, None] * b + rng.normal(0, 0.005, (len(t), 3)))
    pts = np.concatenate(clouds)
    with jax.enable_x64(True):
        padded = np.zeros((cfg.shapes.max_points, 3), np.float64)
        padded[: len(pts)] = pts
        valid = np.zeros(cfg.shapes.max_points, bool)
        valid[: len(pts)] = True
        pj, vj = jnp.asarray(padded, jnp.float64), jnp.asarray(valid)
        rl = jax.jit(lambda p, v: extract_lines(
            p, v, cfg.replace(voting="lazy")))(pj, vj)
        rc = jax.jit(lambda p, v: extract_lines(
            p, v, cfg.replace(voting="carry")))(pj, vj)
        assert rl.segments.a.dtype == jnp.float64
        assert int(rl.nlines) == int(rc.nlines)
        assert int(rl.status) == int(rc.status)
        np.testing.assert_array_equal(np.asarray(rl.segments.valid),
                                      np.asarray(rc.segments.valid))
        np.testing.assert_array_equal(np.asarray(rl.segments.points_size),
                                      np.asarray(rc.segments.points_size))
        np.testing.assert_array_equal(np.asarray(rl.segments.a),
                                      np.asarray(rc.segments.a))


def test_f32_default_unchanged():
    """The perf default stays f32: no x64, f32 state and outputs."""
    cfg = CFG.replace(compute_dtype="float32")
    from pointcloud_segmentation_tpu.pipeline import process_frame, init_world

    state = init_world(cfg)
    assert state.a.dtype == jnp.float32
    raw = jnp.asarray(np.random.default_rng(0)
                      .uniform(0, 1, (cfg.shapes.max_raw_points, 3)),
                      jnp.float32)
    state, out = jax.jit(lambda s, r: process_frame(
        s, r, jnp.zeros(3), jnp.asarray([1.0, 0, 0, 0]), cfg))(state, raw)
    assert out.segments.a.dtype == jnp.float32


def test_adversarial_random_config_f64_matches_oracle():
    """Soak-derived regression (tools/parity_soak.py seed 2023): an
    adversarial random config — parallel 0.03 m beams a few cm apart,
    inlier window 0.026 m, noise 0.002 — flips f32 acceptance gates vs the
    oracle (different accepted-candidate sets, 5 vs 7 world segments).  In
    f64 parity mode the SAME replay must match the oracle's world map and
    intersection topology exactly; this pins the divergence as a
    characterized f32 boundary effect, not a logic difference."""
    import importlib.util
    import os as _os
    import sys as _sys

    tools = _os.path.join(_os.path.dirname(__file__), "..", "tools")
    spec = importlib.util.spec_from_file_location(
        "parity_soak", _os.path.join(tools, "parity_soak.py"))
    ps = importlib.util.module_from_spec(spec)
    _sys.modules["parity_soak"] = ps
    spec.loader.exec_module(ps)
    ps.F64 = True
    with jax.enable_x64(True):
        errs, klass = ps.run_pair(2023)
    assert not errs, f"f64 mismatch ({klass}): {errs}"
