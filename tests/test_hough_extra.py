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
