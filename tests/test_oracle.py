"""Property tests for the faithful numpy oracle."""

import numpy as np
import pytest

from pointcloud_segmentation_tpu import geometry
from pointcloud_segmentation_tpu.config import default_config
from pointcloud_segmentation_tpu.io.scene import Cylinder, OBS_TESTS_SCENE
from pointcloud_segmentation_tpu.io.simulator import cylinder_surface_cloud
from pointcloud_segmentation_tpu import oracle


CFG = default_config(granularity=2, path_to_output=".")


def line_cloud(a, b, n=200, radius=0.0, jitter=0.02, seed=0, t_span=(0.0, 1.5)):
    """Points densely sampling a thin tube around the line a + t*b."""
    rng = np.random.default_rng(seed)
    b = np.asarray(b, dtype=float)
    b = b / np.linalg.norm(b)
    t = np.linspace(t_span[0], t_span[1], n)
    pts = np.asarray(a)[None, :] + t[:, None] * b[None, :]
    if jitter > 0:
        pts = pts + rng.normal(0, jitter, pts.shape)
    return pts


# ---------------------------------------------------------------- preproc

def test_passthrough_window():
    pts = np.array([
        [0.5, 0.0, 0.0],     # keep
        [-0.1, 0.0, 0.0],    # x < 0
        [1.6, 0.0, 0.0],     # x > 1.5
        [0.5, -1.6, 0.0],    # y < -1.5
        [0.5, 0.0, 1.51],    # z > 1.5
        [np.nan, 0.0, 0.0],  # NaN dropped
        [1.5, 1.5, -1.5],    # boundary inclusive
    ])
    out = oracle.passthrough_filter(pts, 3.0)
    assert out.shape == (2, 3)
    np.testing.assert_allclose(out[0], [0.5, 0, 0])
    np.testing.assert_allclose(out[1], [1.5, 1.5, -1.5])


def test_voxel_grid_centroid_and_order():
    leaf = 0.1
    pts = np.array([
        [0.51, 0.0, 0.0],   # voxel (5,0,0)
        [0.59, 0.0, 0.0],   # voxel (5,0,0) -> centroid 0.55
        [0.31, 0.0, 0.0],   # voxel (3,0,0)
        [0.31, 0.0, 0.11],  # voxel (3,0,1) — higher z sorts later
    ])
    out = oracle.voxel_grid(pts, leaf)
    assert out.shape == (3, 3)
    # order: lexicographic (z, y, x)
    np.testing.assert_allclose(out[0], [0.31, 0.0, 0.0])
    np.testing.assert_allclose(out[1], [0.55, 0.0, 0.0])
    np.testing.assert_allclose(out[2], [0.31, 0.0, 0.11])


def test_voxel_grid_negative_coords():
    leaf = 0.1
    pts = np.array([[-0.05, 0.0, 0.0], [-0.15, 0.0, 0.0]])
    out = oracle.voxel_grid(pts, leaf)  # floor(-0.5)=-1, floor(-1.5)=-2: distinct
    assert out.shape == (2, 3)


# ---------------------------------------------------------------- LSQ / PCA

def test_orthogonal_lsq_recovers_line():
    a_true = np.array([0.3, -0.2, 1.0])
    b_true = np.array([1.0, 2.0, -0.5])
    b_true = b_true / np.linalg.norm(b_true)
    pts = line_cloud(a_true, b_true, n=300, jitter=0.001, seed=1)
    rc, a, b = oracle.orthogonal_lsq(pts)
    assert rc > 0
    # direction matches up to sign
    assert abs(abs(b @ b_true) - 1.0) < 1e-4
    # anchor lies on the true line (within jitter)
    d = geometry.point_line_distance(a_true, b_true, a)
    assert d < 0.01


def test_pca_coeff_elongated_vs_blob(rng):
    line = line_cloud([0, 0, 0], [1, 0.2, 0.1], n=200, jitter=0.01)
    blob = rng.normal(size=(200, 3))
    e_line = oracle.seg_pca_eigenvalues(line)
    e_blob = oracle.seg_pca_eigenvalues(blob)
    assert e_line[0] / e_line.sum() > 0.99
    assert e_blob[0] / e_blob.sum() < 0.6
    # descending order
    assert e_line[0] >= e_line[1] >= e_line[2]


# ---------------------------------------------------------------- hough

def test_hough_single_line():
    cfg = CFG
    a = np.array([0.4, -0.3, 0.2])
    b = np.array([0.2, 1.0, 0.3])
    b /= np.linalg.norm(b)
    pts = line_cloud(a, b, n=250, jitter=0.004, seed=2)
    segs, nlines, status = oracle.hough3dlines(pts, cfg.replace(radius_sizes=(0.05,)))
    assert status == 0
    assert nlines >= 1
    assert len(segs) >= 1
    s = segs[0]
    # recovered direction parallel to truth
    assert abs(abs(s.b @ b) - 1.0) < 1e-3
    # endpoints near the sampled span
    p1, p2 = s.endpoints()
    length = np.linalg.norm(p2 - p1)
    assert 1.2 < length < 1.8
    # canonical sign: first nonzero component positive
    nz = s.b[np.abs(s.b) > 1e-12][0]
    assert nz > 0


def test_hough_two_lines():
    cfg = CFG.replace(opt_nlines=5)
    p1 = line_cloud([0.2, 0.0, 0.5], [1, 0, 0], n=220, jitter=0.004, seed=3)
    p2 = line_cloud([0.1, -0.5, 1.2], [0, 1, 0.2], n=220, jitter=0.004, seed=4)
    pts = np.concatenate([p1, p2])
    segs, nlines, status = oracle.hough3dlines(pts, cfg)
    assert status == 0
    assert len(segs) >= 2
    dirs = np.array([s.b for s in segs[:2]])
    # the two dominant lines have distinct directions
    assert abs(dirs[0] @ dirs[1]) < 0.7


def test_hough_degenerate_inputs():
    cfg = CFG
    # identical points -> status 1 (d == 0, h:202)
    same = np.tile(np.array([[0.3, 0.2, 0.1]]), (10, 1))
    segs, nlines, status = oracle.hough3dlines(same, cfg)
    assert status == 1 and not segs
    # all-NaN -> status 1
    nans = np.full((8, 3), np.nan)
    segs, nlines, status = oracle.hough3dlines(nans, cfg)
    assert status == 1
    # tiny extent (opt_dx >= d) -> STATUS_DX_TOO_LARGE (h:209)
    tiny = np.array([[0.0, 0.0, 0.0], [0.001, 0.0, 0.0]])
    segs, nlines, status = oracle.hough3dlines(tiny, cfg)
    assert status == oracle.pipeline.STATUS_DX_TOO_LARGE


def test_hough_pca_gate_rejects_blob(rng):
    cfg = CFG.replace(min_pca_coeff=0.995)
    blob = rng.normal(0, 0.05, size=(300, 3)) + np.array([0.5, 0, 1.0])
    segs, nlines, status = oracle.hough3dlines(blob, cfg)
    # a round blob must not produce high-quality line segments
    assert len(segs) == 0


def test_hough_minvotes_gate():
    cfg = CFG.replace(opt_minvotes=1000)
    pts = line_cloud([0, 0, 0], [1, 0, 0], n=100, jitter=0.003)
    segs, nlines, status = oracle.hough3dlines(pts, cfg)
    assert len(segs) == 0 and nlines == 0


# ---------------------------------------------------------------- transform & cutoff

def test_drone_to_world_roundtrip(rng):
    seg = oracle.Segment(
        a=np.array([1.0, 0.0, 0.0]), b=np.array([0.0, 1.0, 0.0]),
        t_min=-1.0, t_max=1.0, radius=0.05,
        points=rng.normal(size=(5, 3)), points_size=5, pca_coeff=0.999,
        pca_eigenvalues=np.array([1.0, 0.01, 0.01]))
    pts0 = seg.points.copy()
    pos = np.array([0.5, -0.2, 1.0])
    yaw = 0.7
    quat = np.array([np.cos(yaw / 2), 0, 0, np.sin(yaw / 2)])
    oracle.drone_to_world([seg], pos, quat)
    R = np.array(geometry.quat_to_rot(*quat))
    np.testing.assert_allclose(seg.a, R @ [1, 0, 0] + pos, atol=1e-12)
    np.testing.assert_allclose(seg.b, R @ [0, 1, 0], atol=1e-12)
    np.testing.assert_allclose(seg.points, pts0 @ R.T + pos, atol=1e-12)
    # direction norm preserved
    assert np.linalg.norm(seg.b) == pytest.approx(1.0)


def test_height_cutoff():
    mk = lambda z1, z2: oracle.Segment(
        a=np.array([0.0, 0.0, z1]), b=np.array([0.0, 0.0, (z2 - z1)]),
        t_min=0.0, t_max=1.0, radius=0.05, points=np.zeros((1, 3)),
        points_size=1, pca_coeff=1.0, pca_eigenvalues=np.ones(3))
    # keep if EITHER endpoint above floor (node.cpp:464)
    segs = [mk(0.0, 0.1), mk(0.0, 0.5), mk(0.5, 0.0)]
    out = oracle.height_cutoff(segs, 0.3)
    assert len(out) == 2


# ---------------------------------------------------------------- fusion & intersections

def _mk_seg(a, b, t_min, t_max, radius=0.05, n=50, pca=0.999):
    a = np.asarray(a, dtype=float)
    b = np.asarray(b, dtype=float)
    t = np.linspace(t_min, t_max, n)
    pts = a[None] + t[:, None] * b[None]
    return oracle.Segment(a=a, b=b, t_min=t_min, t_max=t_max, radius=radius,
                          points=pts, points_size=n, pca_coeff=pca,
                          pca_eigenvalues=np.array([1.0, 1e-3, 1e-3]))


def test_similarity_fuses_collinear():
    cfg = CFG
    w = _mk_seg([0, 0, 1], [1, 0, 0], 0.0, 1.0)
    d = _mk_seg([0.5, 0.01, 1.0], [1, 0, 0], 0.0, 1.0)  # overlapping, offset 1cm
    similar, fused = oracle.check_similarity(d, w, cfg)
    assert similar
    # fused span covers both
    assert fused.t_max - fused.t_min >= 1.0
    assert fused.points_size == 100
    # pca blend between the two
    assert 0 < fused.pca_coeff <= 1


def test_similarity_rejects_distant_or_different_radius():
    cfg = CFG
    w = _mk_seg([0, 0, 1], [1, 0, 0], 0.0, 1.0)
    far = _mk_seg([0, 1.0, 1], [1, 0, 0], 0.0, 1.0)
    assert not oracle.check_similarity(far, w, cfg)[0]
    other_r = _mk_seg([0.5, 0.0, 1.0], [1, 0, 0], 0.0, 1.0, radius=0.1)
    assert not oracle.check_similarity(other_r, w, cfg)[0]
    # non-overlapping collinear spans do not fuse (node.cpp:642-643)
    disjoint = _mk_seg([5.0, 0.0, 1.0], [1, 0, 0], 0.0, 1.0)
    assert not oracle.check_similarity(disjoint, w, cfg)[0]


def test_connections_crossing_and_parallel():
    cfg = CFG
    s1 = _mk_seg([0, 0, 1], [1, 0, 0], -1.0, 1.0)
    s2 = _mk_seg([0, 0, 1], [0, 1, 0], -1.0, 1.0)  # crosses s1 at (0,0,1)
    ok, sol = oracle.check_connections(s1, s2, cfg)
    assert ok
    # intersection point via t on s1: a + (t_min + sol0) * b
    p = s1.a + (s1.t_min + sol[0]) * s1.b + 0  # absolute t convention
    # reference stores t_min + sol as the absolute parameter
    pt = s1.a + (s1.t_min + sol[0]) * s1.b
    np.testing.assert_allclose(pt, [0, 0, 1], atol=1e-9)
    # parallel lines rejected
    s3 = _mk_seg([0, 0.005, 1], [1, 0, 0], -1.0, 1.0)
    assert not oracle.check_connections(s1, s3, cfg)[0]
    # crossing but out of range
    s4 = _mk_seg([5, 0, 1], [0, 1, 0], -1.0, 1.0)
    assert not oracle.check_connections(s1, s4, cfg)[0]


def test_worldmap_fusion_and_intersections():
    cfg = CFG
    wm = oracle.WorldMap(cfg)
    s1 = _mk_seg([0, 0, 1], [1, 0, 0], -1.0, 1.0)
    s2 = _mk_seg([0, 0, 1], [0, 1, 0], -1.0, 1.0)
    wm.step([s1, s2])
    assert len(wm.segments) == 2
    rows = wm.intersections_rows()  # D-NEWIDX: first frame computes them
    assert len(rows) == 1
    i, t1, j, t2 = rows[0]
    assert (i, j) == (1, 0)

    # re-observing s1 fuses instead of appending
    s1b = _mk_seg([0.1, 0.005, 1.0], [1, 0, 0], -0.9, 1.1)
    wm.step([s1b])
    assert len(wm.segments) == 2

    # a genuinely new segment appends
    s3 = _mk_seg([0, 0, 2.0], [0, 1, 0], -1.0, 1.0)
    wm.step([s3])
    assert len(wm.segments) == 3


def test_worldmap_stale_intersections_persist():
    cfg = CFG
    wm = oracle.WorldMap(cfg)
    s1 = _mk_seg([0, 0, 1], [1, 0, 0], -1.0, 1.0)
    s2 = _mk_seg([0, 0, 1], [0, 1, 0], -1.0, 1.0)
    wm.step([s1, s2])
    assert len(wm.intersections_rows()) == 1
    # a later frame touching nothing keeps the stale entry
    wm.step([])
    assert len(wm.intersections_rows()) == 1


# ---------------------------------------------------------------- end-to-end

def test_process_frame_synthetic_beam():
    cfg = CFG.replace(opt_minvotes=8)
    # one beam crossing the sensor window, drone at origin looking +x
    beam = Cylinder(center=(0.8, 0.0, 1.2), axis=(0.0, 1.0, 0.0), radius=0.05, height=2.0)
    pts = cylinder_surface_cloud(beam, 3000, seed=5)
    # to drone frame: drone at (0,0,1.0) identity orientation -> subtract
    pos = np.array([0.0, 0.0, 1.0])
    quat = np.array([1.0, 0.0, 0.0, 0.0])
    pts_drone = pts - pos
    wm = oracle.WorldMap(cfg)
    res = oracle.process_frame(wm, pts_drone, pos, quat, cfg)
    assert res.status == 0
    assert len(wm.segments) >= 1
    s = wm.segments[0]
    # direction parallel to the beam axis (world frame)
    assert abs(abs(s.b @ np.array(beam.axis)) / np.linalg.norm(s.b) - 1.0) < 5e-3
    # midpoint close to the beam segment
    p1, p2 = s.endpoints()
    mid = (p1 + p2) / 2
    d = geometry.point_line_distance(np.array(beam.center), np.array(beam.axis), mid)
    assert d < 0.1
