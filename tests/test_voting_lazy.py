"""Lazy (accumulator-free) voting vs the oracle and vs carry mode.

The "lazy" strategy carries only (best count, best cell, other-cells bound)
per direction — O(B) state, the (B, NX, NX) histogram never exists in HBM —
and must be bit-equivalent to the exact carried accumulator: same winning
cells, same extraction sequence, same segments.  These tests run the same
scenes through both modes and the oracle.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from pointcloud_segmentation_tpu import oracle
from pointcloud_segmentation_tpu.config import default_config, StaticShapes
from pointcloud_segmentation_tpu.ops.hough import extract_lines_jit

BASE = default_config(
    granularity=2,
    shapes=StaticShapes(max_raw_points=2048, max_points=1024),
)


def pad(pts, n):
    out = np.zeros((n, 3), np.float32)
    out[: len(pts)] = pts
    valid = np.zeros(n, bool)
    valid[: len(pts)] = True
    return out, valid


def line_cloud(rng, a, b, n=200, jitter=0.004, t_span=1.4):
    b = np.asarray(b, float)
    b /= np.linalg.norm(b)
    t = np.linspace(0, t_span, n)
    pts = np.asarray(a)[None] + t[:, None] * b[None]
    return (pts + rng.normal(0, jitter, pts.shape)).astype(np.float32)


def segs_tuple(res):
    v = np.asarray(res.segments.valid)
    return (int(res.nlines), int(res.status), int(v.sum()),
            np.asarray(res.segments.a)[v], np.asarray(res.segments.b)[v],
            np.asarray(res.segments.t_min)[v],
            np.asarray(res.segments.points_size)[v])


def test_voting_mode_auto_selection():
    assert default_config(granularity=4).voting_mode == "carry"
    assert default_config(granularity=6).voting_mode == "lazy"
    assert default_config(granularity=4,
                          radius_sizes=(0.015,)).voting_mode == "lazy"
    assert default_config(granularity=6, voting="carry").voting_mode == "carry"


@pytest.mark.parametrize("seed", range(6))
def test_lazy_equals_carry_random_scenes(seed):
    """Same scenes, bit-identical extraction in both modes (the winning
    cells and tie-breaks must agree, so everything downstream agrees)."""
    rng = np.random.default_rng(seed + 200)
    clouds = []
    for i in range(int(rng.integers(1, 5))):
        a = rng.uniform([-0.3, -0.8, 0.2], [0.8, 0.8, 1.5])
        clouds.append(line_cloud(rng, a, rng.normal(size=3),
                                 n=int(rng.integers(100, 250))))
    pts = np.concatenate(clouds)
    padded, valid = pad(pts, BASE.shapes.max_points)
    pj, vj = jnp.asarray(padded), jnp.asarray(valid)

    r_carry = extract_lines_jit(pj, vj, BASE.replace(voting="carry", opt_nlines=6))
    r_lazy = extract_lines_jit(pj, vj, BASE.replace(voting="lazy", opt_nlines=6))
    c, l = segs_tuple(r_carry), segs_tuple(r_lazy)
    assert c[0] == l[0] and c[1] == l[1] and c[2] == l[2]
    for x, y in zip(c[3:], l[3:]):
        np.testing.assert_array_equal(x, y)


@pytest.mark.parametrize("seed", range(3))
def test_lazy_oracle_parity(seed):
    """Lazy mode against the executable spec directly."""
    rng = np.random.default_rng(seed + 300)
    clouds = []
    for i in range(int(rng.integers(2, 4))):
        a = rng.uniform([-0.3, -0.8, 0.2], [0.8, 0.8, 1.5])
        clouds.append(line_cloud(rng, a, rng.normal(size=3),
                                 n=int(rng.integers(120, 260))))
    pts = np.concatenate(clouds)
    cfg = BASE.replace(voting="lazy", opt_nlines=6)
    ref_segs, ref_nlines, ref_status = oracle.hough3dlines(
        np.asarray(pts, np.float64), cfg)
    padded, valid = pad(pts, cfg.shapes.max_points)
    res = extract_lines_jit(jnp.asarray(padded), jnp.asarray(valid), cfg)
    assert int(res.status) == ref_status
    assert int(res.nlines) == ref_nlines
    v = np.asarray(res.segments.valid)
    assert int(v.sum()) == len(ref_segs)
    ps = np.asarray(res.segments.points_size)[v]
    for k, rs in enumerate(ref_segs):
        assert ps[k] == rs.points_size


def test_lazy_spill_branch():
    """A single fat line removing > _SUB_CHUNK points in one round forces
    the exact-rebuild branch; a second line must still extract correctly."""
    rng = np.random.default_rng(9)
    cfg = default_config(
        granularity=2, opt_nlines=4, opt_minvotes=12, min_pca_coeff=0.9,
        voting="lazy",
        shapes=StaticShapes(max_raw_points=2048, max_points=1024))
    big = line_cloud(rng, [0.2, -0.6, 0.3], [0.1, 1.0, 0.2], n=700,
                     jitter=0.003)
    small = line_cloud(rng, [0.9, 0.5, 1.1], [1.0, -0.2, 0.1], n=150,
                       jitter=0.003)
    pts = np.concatenate([big, small])
    ref_segs, ref_nlines, _ = oracle.hough3dlines(
        np.asarray(pts, np.float64), cfg)
    padded, valid = pad(pts, cfg.shapes.max_points)
    res = extract_lines_jit(jnp.asarray(padded), jnp.asarray(valid), cfg)
    assert int(res.nlines) == ref_nlines
    assert int(np.asarray(res.segments.valid).sum()) == len(ref_segs)
    assert len(ref_segs) >= 2


def test_lazy_ties_and_duplicates():
    """Grid-aligned points creating many equal-count cells: the lazy
    tie-break (suspects re-examined on equality) must match the oracle."""
    cfg = default_config(
        granularity=1, opt_nlines=6, opt_minvotes=4, min_pca_coeff=0.5,
        voting="lazy",
        shapes=StaticShapes(max_raw_points=512, max_points=256))
    # two identical-count parallel lines -> argmax tie between cells
    t = np.linspace(0, 1.0, 40)
    l1 = np.stack([t, np.zeros_like(t), np.zeros_like(t)], 1)
    l2 = np.stack([t, np.full_like(t, 0.4), np.zeros_like(t)], 1)
    pts = np.concatenate([l1, l2]).astype(np.float32) + np.array(
        [0.1, 0.1, 0.5], np.float32)
    ref_segs, ref_nlines, ref_status = oracle.hough3dlines(
        np.asarray(pts, np.float64), cfg)
    padded, valid = pad(pts, cfg.shapes.max_points)
    res = extract_lines_jit(jnp.asarray(padded), jnp.asarray(valid), cfg)
    r_carry = extract_lines_jit(jnp.asarray(padded), jnp.asarray(valid),
                                cfg.replace(voting="carry"))
    assert int(res.nlines) == ref_nlines == int(r_carry.nlines)
    assert int(res.status) == ref_status
    np.testing.assert_array_equal(np.asarray(res.segments.a),
                                  np.asarray(r_carry.segments.a))


def test_lazy_suspect_overflow_fallback(monkeypatch):
    """Shrink the suspect capacity so busy rounds overflow into the
    exact-full-rebuild branch — parity with carry mode must survive."""
    from pointcloud_segmentation_tpu.ops import hough as H

    monkeypatch.setattr(H, "_SUSPECT_CAP", 128)
    cfg = default_config(
        granularity=4, opt_nlines=8, opt_minvotes=10, min_pca_coeff=0.8,
        shapes=StaticShapes(max_raw_points=4096, max_points=2048))
    rng = np.random.default_rng(31)
    clouds = []
    for i in range(6):
        a = rng.uniform([-0.4, -0.8, 0.2], [0.9, 0.8, 1.4])
        b = rng.normal(size=3)
        b /= np.linalg.norm(b)
        t = np.linspace(0, 1.2, 220)
        clouds.append(a + t[:, None] * b + rng.normal(0, 0.004, (220, 3)))
    pts = np.concatenate(clouds).astype(np.float32)
    padded, valid = pad(pts, cfg.shapes.max_points)
    pj, vj = jnp.asarray(padded), jnp.asarray(valid)
    # extract_lines_jit caches on cfg; call extract_lines via fresh jit so
    # the monkeypatched capacity is traced in
    import jax
    from pointcloud_segmentation_tpu.ops.hough import extract_lines

    r_lazy = jax.jit(lambda p, v: extract_lines(
        p, v, cfg.replace(voting="lazy")))(pj, vj)
    r_carry = jax.jit(lambda p, v: extract_lines(
        p, v, cfg.replace(voting="carry")))(pj, vj)
    assert int(r_lazy.nlines) == int(r_carry.nlines)
    np.testing.assert_array_equal(np.asarray(r_lazy.segments.valid),
                                  np.asarray(r_carry.segments.valid))
    np.testing.assert_array_equal(np.asarray(r_lazy.segments.points_size),
                                  np.asarray(r_carry.segments.points_size))


def test_lazy_g6_shipped_direction_table():
    """Granularity 6 — the reference's SHIPPED direction count (20481,
    config_pc_seg/config.yaml:22) — through lazy, carry, and the oracle.
    radius 0.1 keeps the bin count small enough for the carry accumulator
    on the CPU test platform; the direction table is the real g6 sphere,
    so the tiered suspect exam (s_tier < s_cap) is exercised at scale."""
    rng = np.random.default_rng(77)
    cfg = default_config(
        granularity=6, opt_nlines=4, opt_minvotes=10, min_pca_coeff=0.9,
        radius_sizes=(0.1,),
        shapes=StaticShapes(max_raw_points=1024, max_points=512))
    pts = np.concatenate([
        line_cloud(rng, [0.2, -0.6, 0.4], [0.2, 1.0, 0.1], n=180,
                   jitter=0.006),
        line_cloud(rng, [0.9, 0.4, 0.3], [0.0, -0.3, 1.0], n=140,
                   jitter=0.006),
    ])
    ref_segs, ref_nlines, ref_status = oracle.hough3dlines(
        np.asarray(pts, np.float64), cfg)
    padded, valid = pad(pts, cfg.shapes.max_points)
    pj, vj = jnp.asarray(padded), jnp.asarray(valid)
    rl = extract_lines_jit(pj, vj, cfg.replace(voting="lazy"))
    rc = extract_lines_jit(pj, vj, cfg.replace(voting="carry"))
    assert int(rl.nlines) == int(rc.nlines) == ref_nlines
    assert int(rl.status) == int(rc.status) == ref_status
    v = np.asarray(rl.segments.valid)
    assert int(v.sum()) == len(ref_segs) >= 2
    np.testing.assert_array_equal(np.asarray(rl.segments.points_size),
                                  np.asarray(rc.segments.points_size))
    np.testing.assert_array_equal(np.asarray(rl.segments.a),
                                  np.asarray(rc.segments.a))
    ps = np.asarray(rl.segments.points_size)[v]
    for k, rs in enumerate(ref_segs):
        assert ps[k] == rs.points_size


@pytest.mark.parametrize("seed", range(10))
def test_lazy_carry_fuzz_configs(seed):
    """Fuzz: random scenes x random configs — lazy and carry must produce
    identical extraction results (nlines, status, segment identities)."""
    rng = np.random.default_rng(seed + 1000)
    g = int(rng.integers(0, 5))
    cfg = default_config(
        granularity=g,
        opt_nlines=int(rng.integers(0, 8)),
        opt_minvotes=int(rng.integers(4, 20)),
        min_pca_coeff=float(rng.uniform(0.4, 0.99)),
        rad_2_leaf_ratio=float(rng.choice([1.0, 1.5, 2.0])),
        radius_sizes=[(0.05,), (0.1,), (0.05, 0.1)][int(rng.integers(0, 3))],
        shapes=StaticShapes(max_raw_points=2048, max_points=1024,
                            max_iters=10))
    n_lines = int(rng.integers(0, 4))
    clouds = [rng.normal(0, 0.2, (int(rng.integers(5, 60)), 3)) + [0.5, 0, 1]]
    for i in range(n_lines):
        a = rng.uniform([-0.4, -0.8, 0.2], [0.9, 0.8, 1.4])
        clouds.append(line_cloud(rng, a, rng.normal(size=3),
                                 n=int(rng.integers(40, 220)),
                                 jitter=float(rng.uniform(0.002, 0.01))))
    pts = np.concatenate(clouds).astype(np.float32)
    # sprinkle hostile values
    if rng.random() < 0.5:
        pts[rng.integers(0, len(pts), 5)] = np.nan
    if rng.random() < 0.3:
        pts[rng.integers(0, len(pts), 3)] = np.inf
    padded, valid = pad(pts, cfg.shapes.max_points)
    pj, vj = jnp.asarray(padded), jnp.asarray(valid)
    rc = extract_lines_jit(pj, vj, cfg.replace(voting="carry"))
    rl = extract_lines_jit(pj, vj, cfg.replace(voting="lazy"))
    assert int(rc.nlines) == int(rl.nlines)
    assert int(rc.status) == int(rl.status)
    np.testing.assert_array_equal(np.asarray(rc.segments.valid),
                                  np.asarray(rl.segments.valid))
    np.testing.assert_array_equal(np.asarray(rc.segments.points_size),
                                  np.asarray(rl.segments.points_size))
    np.testing.assert_array_equal(np.asarray(rc.segments.a),
                                  np.asarray(rl.segments.a))
