"""JAX world-map fusion/intersections vs the numpy oracle, and the full
jit'd process_frame vs the oracle's per-frame loop."""

import numpy as np
import jax.numpy as jnp
import pytest

from pointcloud_segmentation_tpu import oracle
from pointcloud_segmentation_tpu.config import default_config, StaticShapes
from pointcloud_segmentation_tpu.ops.hough import empty_segments, SegmentBatch
from pointcloud_segmentation_tpu.worldmap import init_world, world_step
from pointcloud_segmentation_tpu.pipeline import make_process_frame, init_world as pinit
from pointcloud_segmentation_tpu.io.scene import OBS_TESTS_SCENE, WP_TESTS, trajectory_poses
from pointcloud_segmentation_tpu.io.simulator import simulate_trajectory, TofSpec

CFG = default_config(
    granularity=2,
    shapes=StaticShapes(max_raw_points=4096, max_points=2048,
                        max_world_segments=32),
)


def batch_from_oracle(segs, cfg=CFG, N=64):
    """Pack oracle Segment objects into a SegmentBatch."""
    L = cfg.max_lines
    sb = empty_segments(L, N)
    arrs = {k: np.asarray(getattr(sb, k)).copy() for k in sb._fields}
    for i, s in enumerate(segs):
        arrs["a"][i] = s.a
        arrs["b"][i] = s.b
        arrs["t_min"][i] = s.t_min
        arrs["t_max"][i] = s.t_max
        arrs["radius"][i] = s.radius
        arrs["points_size"][i] = s.points_size
        arrs["pca_coeff"][i] = s.pca_coeff
        arrs["pca_eigenvalues"][i] = s.pca_eigenvalues
        arrs["valid"][i] = True
    return SegmentBatch(**{k: jnp.asarray(v) for k, v in arrs.items()})


def _mk_seg(a, b, t_min, t_max, radius=0.05, n=50, pca=0.999):
    a = np.asarray(a, dtype=float)
    b = np.asarray(b, dtype=float)
    t = np.linspace(t_min, t_max, n)
    pts = a[None] + t[:, None] * b[None]
    return oracle.Segment(a=a, b=b, t_min=t_min, t_max=t_max, radius=radius,
                          points=pts, points_size=n, pca_coeff=pca,
                          pca_eigenvalues=np.array([1.0, 1e-3, 1e-3]))


def compare_states(wm: oracle.WorldMap, ws, atol=1e-4):
    v = np.asarray(ws.valid)
    n = int(np.asarray(ws.count))
    assert n == len(wm.segments)
    assert v.sum() == n
    for i, s in enumerate(wm.segments):
        np.testing.assert_allclose(np.asarray(ws.a)[i], s.a, atol=atol)
        np.testing.assert_allclose(np.asarray(ws.b)[i], s.b, atol=atol)
        assert float(np.asarray(ws.t_min)[i]) == pytest.approx(s.t_min, abs=atol)
        assert float(np.asarray(ws.t_max)[i]) == pytest.approx(s.t_max, abs=atol)
        assert float(np.asarray(ws.radius)[i]) == pytest.approx(s.radius)
        assert int(np.asarray(ws.points_size)[i]) == s.points_size
        assert float(np.asarray(ws.pca_coeff)[i]) == pytest.approx(s.pca_coeff, abs=1e-4)
    # intersections
    inter_j = np.asarray(ws.inter)[:n, :n]
    inter_o = wm.inter
    mask_j = (inter_j != -1.0).all(-1)
    mask_o = (inter_o != -1.0).all(-1)
    np.testing.assert_array_equal(mask_j, mask_o)
    np.testing.assert_allclose(inter_j[mask_j], inter_o[mask_o], atol=5e-3)


def run_frames(frames_of_segs, cfg=CFG):
    wm = oracle.WorldMap(cfg)
    ws = init_world(cfg)
    for segs in frames_of_segs:
        wm.step([s.copy() for s in segs])
        ws, _slots = world_step(ws, batch_from_oracle(segs, cfg), cfg)
    return wm, ws


def test_first_frame_append_and_intersections():
    s1 = _mk_seg([0, 0, 1], [1, 0, 0], -1.0, 1.0)
    s2 = _mk_seg([0, 0, 1], [0, 1, 0], -1.0, 1.0)
    wm, ws = run_frames([[s1, s2]])
    compare_states(wm, ws)
    assert len(wm.intersections_rows()) == 1


def test_fusion_matches_oracle():
    s1 = _mk_seg([0, 0, 1], [1, 0, 0], -1.0, 1.0)
    s1b = _mk_seg([0.1, 0.004, 1.0], [1, 0, 0], -0.9, 1.1, n=70)
    wm, ws = run_frames([[s1], [s1b]])
    compare_states(wm, ws)
    assert len(wm.segments) == 1


def test_mixed_sequence_matches_oracle(rng):
    # several frames of randomized segments around 3 base lines
    bases = [
        (np.array([0, 0, 1.0]), np.array([1.0, 0, 0])),
        (np.array([0, 0, 1.0]), np.array([0, 1.0, 0])),
        (np.array([0.5, 0.5, 0.5]), np.array([0, 0, 1.0])),
    ]
    frames = []
    for f in range(4):
        segs = []
        for (a0, b0) in bases:
            if rng.random() < 0.8:
                da = a0 + rng.normal(0, 0.003, 3)
                segs.append(_mk_seg(da, b0, -1.0 + 0.1 * f, 1.0,
                                    n=int(rng.integers(30, 80))))
        frames.append(segs)
    wm, ws = run_frames(frames)
    compare_states(wm, ws, atol=1e-3)


def test_empty_frames_noop():
    s1 = _mk_seg([0, 0, 1], [1, 0, 0], -1.0, 1.0)
    wm, ws = run_frames([[s1], [], []])
    compare_states(wm, ws)


def test_fuse_frame_vectorized_matches_sequential(rng):
    """The vectorized last-writer-wins fusion must be bit-identical to the
    literal sequential loop, including slot collisions, capacity overflow,
    and invalid frame segments."""
    from pointcloud_segmentation_tpu.worldmap import (
        fuse_frame, fuse_frame_sequential)

    cfg = default_config(
        granularity=2,
        shapes=StaticShapes(max_raw_points=4096, max_points=2048,
                            max_world_segments=6))  # tiny: forces overflow
    for trial in range(20):
        ws = init_world(cfg)
        # pre-populate the world with a few random segments
        n0 = int(rng.integers(0, 5))
        frames = []
        seed_segs = []
        for _ in range(n0):
            a = rng.normal(0, 0.5, 3)
            b = rng.normal(0, 1, 3)
            b /= max(np.linalg.norm(b), 1e-6)
            seed_segs.append(_mk_seg(a, b, -1.0, 1.0))
        if seed_segs:
            ws, _ = world_step(ws, batch_from_oracle(seed_segs, cfg), cfg)

        # frame: mix of near-duplicates (collisions), new lines (appends,
        # some past capacity), and invalid rows
        segs = []
        for _ in range(int(rng.integers(1, 8))):
            if seed_segs and rng.random() < 0.5:
                base = seed_segs[int(rng.integers(0, len(seed_segs)))]
                segs.append(_mk_seg(base.a + rng.normal(0, 0.002, 3), base.b,
                                    -1.0 + rng.random() * 0.1, 1.0,
                                    n=int(rng.integers(20, 90))))
            else:
                a = rng.normal(0, 0.5, 3)
                b = rng.normal(0, 1, 3)
                b /= max(np.linalg.norm(b), 1e-6)
                segs.append(_mk_seg(a, b, -1.0, 1.0))
        batch = batch_from_oracle(segs, cfg)
        if rng.random() < 0.5:  # poke some invalid rows in the middle
            v = np.asarray(batch.valid).copy()
            i = int(rng.integers(0, len(segs)))
            v[i] = False
            batch = batch._replace(valid=jnp.asarray(v))

        out_v = fuse_frame(ws, batch, cfg)
        out_s = fuse_frame_sequential(ws, batch, cfg)
        for field, (xv, xs) in enumerate(zip(out_v, out_s)):
            if isinstance(xv, dict):
                for key in xv:
                    np.testing.assert_array_equal(
                        np.asarray(xv[key]), np.asarray(xs[key]),
                        err_msg=f"trial {trial} field {key}")
            else:
                np.testing.assert_array_equal(
                    np.asarray(xv), np.asarray(xs),
                    err_msg=f"trial {trial} output #{field}")


def test_full_process_frame_matches_oracle_end_to_end():
    """The flagship parity test: jit'd process_frame vs oracle on a real
    simulated trajectory over the 7-beam benchmark scene."""
    cfg = CFG
    poses = trajectory_poses(WP_TESTS, hz=1.0, velocity=0.5)[:6]
    frames = simulate_trajectory(OBS_TESTS_SCENE, poses,
                                 TofSpec(noise_frac=0.001), seed=3)
    step = make_process_frame(cfg)
    ws = pinit(cfg)
    wm = oracle.WorldMap(cfg)
    for fr in frames:
        raw = np.full((cfg.shapes.max_raw_points, 3), np.nan, np.float32)
        raw[: len(fr.points)] = fr.points
        ws, out = step(ws, jnp.asarray(raw), jnp.asarray(fr.position, jnp.float32),
                       jnp.asarray(fr.quat_wxyz, jnp.float32))
        res = oracle.process_frame(wm, fr.points, fr.position, fr.quat_wxyz, cfg)
        assert int(out.status) == res.status
        assert int(out.nlines) == res.nblines

    # same world map (counts + geometry within float32 tolerance)
    n_j, n_o = int(np.asarray(ws.count)), len(wm.segments)
    assert n_j == n_o
    for i, s in enumerate(wm.segments):
        bj = np.asarray(ws.b)[i]
        br = s.b
        cosang = abs(bj @ br) / (np.linalg.norm(bj) * np.linalg.norm(br))
        assert cosang > 1 - 5e-5, f"segment {i} direction mismatch"
        # endpoints within a few mm
        p1j = np.asarray(ws.t_min)[i] * bj + np.asarray(ws.a)[i]
        p2j = np.asarray(ws.t_max)[i] * bj + np.asarray(ws.a)[i]
        p1o, p2o = s.endpoints()
        d = min(np.linalg.norm(p1j - p1o) + np.linalg.norm(p2j - p2o),
                np.linalg.norm(p1j - p2o) + np.linalg.norm(p2j - p1o))
        assert d < 2e-2, f"segment {i} endpoints differ by {d}"
    # same intersection topology
    inter_j = np.asarray(ws.inter)[:n_j, :n_j]
    mask_j = (inter_j != -1.0).all(-1)
    mask_o = (wm.inter != -1.0).all(-1)
    np.testing.assert_array_equal(mask_j, mask_o)
