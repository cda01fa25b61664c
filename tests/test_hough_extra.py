"""Extra Hough coverage: multi-radius configs, unbounded opt_nlines,
radius gating, capacity bounds — parity with the oracle throughout."""

import numpy as np
import jax.numpy as jnp
import pytest

from pointcloud_segmentation_tpu import oracle
from pointcloud_segmentation_tpu.config import default_config, StaticShapes
from pointcloud_segmentation_tpu.ops.hough import extract_lines_jit
from pointcloud_segmentation_tpu.io.scene import Cylinder
from pointcloud_segmentation_tpu.io.simulator import cylinder_surface_cloud


def pad(pts, n):
    out = np.zeros((n, 3), np.float32)
    out[: len(pts)] = pts
    valid = np.zeros(n, bool)
    valid[: len(pts)] = True
    return out, valid


def run_both(pts, cfg):
    ref_segs, ref_nlines, ref_status = oracle.hough3dlines(
        np.asarray(pts, np.float64), cfg)
    padded, valid = pad(pts, cfg.shapes.max_points)
    res = extract_lines_jit(jnp.asarray(padded), jnp.asarray(valid), cfg)
    return (ref_segs, ref_nlines, ref_status), res


def tube(radius, center, axis, n=1200, seed=0, noise=0.002):
    cyl = Cylinder(center=tuple(center), axis=tuple(axis), radius=radius,
                   height=1.6)
    return cylinder_surface_cloud(cyl, n, seed=seed, noise=noise).astype(np.float32)


def test_single_radius_per_run_and_multi_radius_quirk():
    """The reference supports one effective radius per run (report §6.3
    limitation) — reproduced.  A 0.1 m tube passes with radius_sizes=(0.1,);
    with (0.1, 0.05) the leaf shrinks to the smaller radius and the
    `max_radius` gate quirk (hough_3d_lines.h:298-307) rejects everything
    that snaps below max(radius_sizes)."""
    # single radius 0.1: detected
    cfg1 = default_config(
        granularity=2, opt_minvotes=10, min_pca_coeff=0.9,
        radius_sizes=(0.1,),
        shapes=StaticShapes(max_raw_points=2048, max_points=2048))
    pts = tube(0.1, [0.6, 0.0, 1.0], [0, 1, 0], seed=2)
    (ref_segs, _, _), res = run_both(pts, cfg1)
    v = np.asarray(res.segments.valid)
    assert len(ref_segs) >= 1 and v.sum() == len(ref_segs)
    assert ref_segs[0].radius == pytest.approx(0.1)
    assert float(np.asarray(res.segments.radius)[v][0]) == pytest.approx(0.1)

    # multi radius (0.1, 0.05): the same tube is rejected — both backends
    cfg2 = cfg1.replace(radius_sizes=(0.1, 0.05))
    (ref_segs, _, _), res = run_both(pts, cfg2)
    assert len(ref_segs) == 0
    assert not np.asarray(res.segments.valid).any()


def test_fat_tube_decomposes_into_surface_strips():
    """A tube much thicker than dx is (faithfully) decomposed into thin
    tangent strips along its surface, each snapping to the catalogue radius;
    the strips parallel the tube axis.  Parity with the oracle throughout."""
    cfg = default_config(
        granularity=2, opt_minvotes=10, min_pca_coeff=0.5,
        radius_sizes=(0.05,),
        shapes=StaticShapes(max_raw_points=2048, max_points=2048))
    pts = tube(0.3, [0.7, 0.0, 1.0], [0, 1, 0], seed=3)
    (ref_segs, ref_nlines, _), res = run_both(pts, cfg)
    v = np.asarray(res.segments.valid)
    assert v.sum() == len(ref_segs) and len(ref_segs) >= 2
    assert int(res.nlines) == ref_nlines
    axis = np.array([0.0, 1.0, 0.0])
    for b in np.asarray(res.segments.b)[v]:
        assert abs(b @ axis) / np.linalg.norm(b) > 0.99


def test_opt_nlines_zero_unbounded():
    # opt_nlines == 0: loop until points exhausted (bounded by max_iters)
    cfg = default_config(
        granularity=2, opt_nlines=0, opt_minvotes=10, min_pca_coeff=0.9,
        shapes=StaticShapes(max_raw_points=2048, max_points=1024, max_iters=12))
    rng = np.random.default_rng(4)
    t = np.linspace(0, 1.4, 300)
    pts = np.concatenate([
        np.array([0.2, -0.4, 0.6]) + t[:, None] * np.array([1.0, 0, 0])
        + rng.normal(0, 0.004, (300, 3)),
        np.array([0.1, 0.3, 1.1]) + t[:, None] * np.array([0, 1.0, 0.2]) / np.linalg.norm([0, 1.0, 0.2])
        + rng.normal(0, 0.004, (300, 3)),
    ]).astype(np.float32)
    (ref_segs, ref_nlines, _), res = run_both(pts, cfg)
    assert int(res.nlines) == ref_nlines
    assert int(np.asarray(res.segments.valid).sum()) == len(ref_segs)
    assert ref_nlines >= 2


def test_segment_capacity_respected():
    cfg = default_config(
        granularity=1, opt_nlines=3, opt_minvotes=8, min_pca_coeff=0.5,
        shapes=StaticShapes(max_raw_points=2048, max_points=1024))
    rng = np.random.default_rng(5)
    clouds = []
    for i in range(5):
        t = np.linspace(0, 1.2, 150)
        a = rng.uniform([-0.3, -0.8, 0.3], [0.8, 0.8, 1.5])
        b = rng.normal(size=3)
        b /= np.linalg.norm(b)
        clouds.append(a + t[:, None] * b + rng.normal(0, 0.004, (150, 3)))
    pts = np.concatenate(clouds).astype(np.float32)
    (ref_segs, ref_nlines, _), res = run_both(pts, cfg)
    assert ref_nlines <= 3
    assert int(np.asarray(res.segments.valid).sum()) <= 3
    assert int(res.nlines) == ref_nlines


def test_small_point_capacity_regression():
    """max_points < _SUB_CHUNK must compile and run (the multichip dryrun
    uses tiny shapes; regression for the compacted-subtract slice bound)."""
    cfg = default_config(
        granularity=1, opt_minvotes=5, min_pca_coeff=0.9,
        shapes=StaticShapes(max_raw_points=256, max_points=128))
    rng = np.random.default_rng(0)
    t = np.linspace(0, 1.2, 100)
    pts = (np.array([0.3, -0.4, 0.6]) + t[:, None] * np.array([0.0, 1.0, 0.2])
           + rng.normal(0, 0.004, (100, 3))).astype(np.float32)
    (ref_segs, ref_nlines, _), res = run_both(pts, cfg)
    assert int(res.nlines) == ref_nlines
    assert int(np.asarray(res.segments.valid).sum()) == len(ref_segs)


def test_granularity_zero_antipodal_dirs():
    """g=0 keeps the raw 12 icosahedron vertices (antipodal pairs included,
    matching the published count table) — extraction still works."""
    cfg = default_config(
        granularity=0, opt_minvotes=8, min_pca_coeff=0.9,
        shapes=StaticShapes(max_raw_points=1024, max_points=512))
    rng = np.random.default_rng(1)
    t = np.linspace(0, 1.4, 250)
    # align with an icosahedron vertex direction for a clean g0 catch
    from pointcloud_segmentation_tpu.sphere import directions
    b0 = directions(0)[3]
    pts = (np.array([0.4, 0.0, 0.8]) + t[:, None] * b0
           + rng.normal(0, 0.004, (250, 3))).astype(np.float32)
    (ref_segs, ref_nlines, _), res = run_both(pts, cfg)
    assert int(res.nlines) == ref_nlines
    assert int(np.asarray(res.segments.valid).sum()) == len(ref_segs)
    assert len(ref_segs) >= 1


def test_delta_histogram_exact_at_large_num_x():
    """Hough::subtract delta vs full-histogram difference, bit-exact at
    num_x > 256 (regression: a bf16 value-compaction matmul corrupted bins
    >= 256 — ADVICE r1)."""
    from pointcloud_segmentation_tpu.ops.hough import (
        _vote_bins, _vote_histogram, _vote_histogram_delta)
    from pointcloud_segmentation_tpu.sphere import hough_space

    rng = np.random.default_rng(7)
    N, NX = 512, 300
    dirs, c1, c2 = hough_space(1)                       # 21 directions
    c1 = jnp.asarray(c1, jnp.float32)
    c2 = jnp.asarray(c2, jnp.float32)
    d = jnp.float32(3.0)
    dx = jnp.float32(3.0 / NX)                          # bins span [0, 300)
    Xs = jnp.asarray(rng.uniform(-1.5, 1.5, (N, 3)), jnp.float32)
    xi, yi = _vote_bins(Xs, c1, c2, d, dx, NX)
    assert int(jnp.max(xi)) > 256, "test must exercise bins beyond bf16 ints"

    active = jnp.asarray(rng.random(N) < 0.9)
    removed = active & jnp.asarray(rng.random(N) < 0.3)
    n_rem = removed.sum().astype(jnp.int32)
    full = _vote_histogram(Xs, c1, c2, d, dx, NX, active, NX)
    remaining = _vote_histogram(Xs, c1, c2, d, dx, NX, active & ~removed, NX)
    delta = _vote_histogram_delta(Xs, c1, c2, d, dx, NX, removed, n_rem,
                                  N, NX)
    np.testing.assert_array_equal(np.asarray(full - delta),
                                  np.asarray(remaining))


def test_small_radius_num_x_gt_256_parity():
    """End-to-end parity with the oracle at radius_sizes=(0.015,), where
    num_x_max = 261 > 256: two beams force the incremental subtract to run
    with large bin indices (regression for the bf16 compaction bug)."""
    cfg = default_config(
        granularity=2, opt_minvotes=12, min_pca_coeff=0.9, opt_nlines=5,
        radius_sizes=(0.015,),
        shapes=StaticShapes(max_raw_points=4096, max_points=2048))
    assert cfg.num_x_max > 256
    rng = np.random.default_rng(11)
    clouds = []
    for i, (a, b) in enumerate([
            ([0.2, -0.6, 0.3], [0.1, 1.0, 0.2]),
            ([0.8, 0.5, 1.1], [1.0, -0.2, 0.1])]):
        t = np.linspace(0, 1.3, 400)
        b = np.asarray(b) / np.linalg.norm(b)
        clouds.append(np.asarray(a) + t[:, None] * b
                      + rng.normal(0, 0.003, (400, 3)))
    pts = np.concatenate(clouds).astype(np.float32)
    (ref_segs, ref_nlines, _), res = run_both(pts, cfg)
    assert int(res.nlines) == ref_nlines
    assert int(np.asarray(res.segments.valid).sum()) == len(ref_segs)
    assert len(ref_segs) >= 2


def test_opt_nlines_above_max_iters_not_truncated():
    """opt_nlines > shapes.max_iters must not be silently capped at
    max_iters (ADVICE r1): a scene with more lines than max_iters extracts
    up to opt_nlines, matching the oracle."""
    cfg = default_config(
        granularity=1, opt_minvotes=8, min_pca_coeff=0.8, opt_nlines=6,
        shapes=StaticShapes(max_raw_points=4096, max_points=2048,
                            max_iters=3))
    rng = np.random.default_rng(5)
    clouds = []
    for i in range(5):
        a = rng.uniform([-0.4, -0.8, 0.2], [0.8, 0.8, 1.4])
        b = rng.normal(size=3)
        b /= np.linalg.norm(b)
        t = np.linspace(0, 1.2, 200)
        clouds.append(a + t[:, None] * b + rng.normal(0, 0.004, (200, 3)))
    pts = np.concatenate(clouds).astype(np.float32)
    (ref_segs, ref_nlines, _), res = run_both(pts, cfg)
    assert int(res.nlines) == ref_nlines
    assert int(np.asarray(res.segments.valid).sum()) == len(ref_segs)
    assert ref_nlines > 3  # the truncated bound would have stopped at 3


def test_large_sensor_sort_gap_path():
    """max_points > _GAP_RANK_MAX_N switches the gap check to the sort
    formulation (the O(N²) rank matrix would need 3 x 64M cells at 8k
    points) — oracle parity must hold through the switch."""
    from pointcloud_segmentation_tpu.ops import hough as H

    cfg = default_config(
        granularity=2, opt_nlines=4, opt_minvotes=12, min_pca_coeff=0.9,
        shapes=StaticShapes(max_raw_points=16384, max_points=8192))
    assert cfg.shapes.max_points > H._GAP_RANK_MAX_N
    rng = np.random.default_rng(21)
    clouds = []
    for a, b in (([0.2, -0.6, 0.3], [0.1, 1.0, 0.2]),
                 ([0.9, 0.5, 1.1], [1.0, -0.2, 0.1])):
        t = np.linspace(0, 1.3, 500)
        b = np.asarray(b) / np.linalg.norm(b)
        clouds.append(np.asarray(a) + t[:, None] * b
                      + rng.normal(0, 0.003, (500, 3)))
    pts = np.concatenate(clouds).astype(np.float32)
    (ref_segs, ref_nlines, _), res = run_both(pts, cfg)
    assert int(res.nlines) == ref_nlines
    assert int(np.asarray(res.segments.valid).sum()) == len(ref_segs)
    assert len(ref_segs) == 2
