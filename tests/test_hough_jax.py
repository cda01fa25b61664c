"""JAX iterative Hough extraction vs the numpy oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

from pointcloud_segmentation_tpu import oracle
from pointcloud_segmentation_tpu.config import default_config, StaticShapes
from pointcloud_segmentation_tpu.ops.hough import extract_lines_jit

CFG = default_config(
    granularity=2,
    shapes=StaticShapes(max_raw_points=2048, max_points=1024),
)


def pad(pts, n):
    out = np.zeros((n, 3), np.float32)
    out[: len(pts)] = pts
    valid = np.zeros(n, bool)
    valid[: len(pts)] = True
    return out, valid


def line_cloud(a, b, n=200, jitter=0.004, seed=0, t_span=(0.0, 1.5)):
    rng = np.random.default_rng(seed)
    b = np.asarray(b, float)
    b = b / np.linalg.norm(b)
    t = np.linspace(*t_span, n)
    pts = np.asarray(a)[None] + t[:, None] * b[None]
    return (pts + rng.normal(0, jitter, pts.shape)).astype(np.float32)


def run_both(pts, cfg=CFG):
    ref_segs, ref_nlines, ref_status = oracle.hough3dlines(
        np.asarray(pts, np.float64), cfg)
    padded, valid = pad(pts, cfg.shapes.max_points)
    res = extract_lines_jit(jnp.asarray(padded), jnp.asarray(valid), cfg)
    return (ref_segs, ref_nlines, ref_status), res


def jax_segs(res):
    v = np.asarray(res.segments.valid)
    return {
        "a": np.asarray(res.segments.a)[v],
        "b": np.asarray(res.segments.b)[v],
        "t_min": np.asarray(res.segments.t_min)[v],
        "t_max": np.asarray(res.segments.t_max)[v],
        "radius": np.asarray(res.segments.radius)[v],
        "points_size": np.asarray(res.segments.points_size)[v],
        "pca_coeff": np.asarray(res.segments.pca_coeff)[v],
        "n": int(v.sum()),
    }


def assert_segment_parity(ref_segs, js, atol_dir=2e-3, atol_pt=5e-3):
    assert js["n"] == len(ref_segs)
    for k, rs in enumerate(ref_segs):
        bj = js["b"][k] / np.linalg.norm(js["b"][k])
        br = rs.b / np.linalg.norm(rs.b)
        assert abs(abs(bj @ br) - 1.0) < atol_dir, f"direction mismatch seg {k}"
        # endpoints as sets (sign canonicalization makes order deterministic,
        # but compare both orders to be robust)
        p1r, p2r = rs.endpoints()
        p1j = js["t_min"][k] * js["b"][k] + js["a"][k]
        p2j = js["t_max"][k] * js["b"][k] + js["a"][k]
        e1 = np.linalg.norm(p1j - p1r) + np.linalg.norm(p2j - p2r)
        e2 = np.linalg.norm(p1j - p2r) + np.linalg.norm(p2j - p1r)
        assert min(e1, e2) < atol_pt, f"endpoint mismatch seg {k}: {min(e1,e2)}"
        assert js["radius"][k] == pytest.approx(rs.radius)
        assert js["points_size"][k] == rs.points_size
        assert js["pca_coeff"][k] == pytest.approx(rs.pca_coeff, abs=1e-4)


def test_single_line_parity():
    pts = line_cloud([0.4, -0.3, 0.2], [0.2, 1.0, 0.3], n=250, seed=2)
    (ref_segs, ref_nlines, ref_status), res = run_both(pts)
    assert ref_status == 0 and int(res.status) == 0
    assert int(res.nlines) == ref_nlines
    assert_segment_parity(ref_segs, jax_segs(res))


def test_two_lines_parity():
    cfg = CFG.replace(opt_nlines=5)
    pts = np.concatenate([
        line_cloud([0.2, 0.0, 0.5], [1, 0, 0], n=220, seed=3),
        line_cloud([0.1, -0.5, 1.2], [0, 1, 0.2], n=220, seed=4),
    ])
    (ref_segs, ref_nlines, ref_status), res = run_both(pts, cfg)
    assert int(res.nlines) == ref_nlines
    assert_segment_parity(ref_segs, jax_segs(res))


@pytest.mark.parametrize("seed", range(5))
def test_random_scenes_parity(seed):
    rng = np.random.default_rng(seed + 50)
    n_lines = rng.integers(1, 4)
    clouds = []
    for i in range(n_lines):
        a = rng.uniform([-0.3, -0.8, 0.2], [0.8, 0.8, 1.5])
        b = rng.normal(size=3)
        clouds.append(line_cloud(a, b, n=int(rng.integers(120, 260)),
                                 jitter=0.005, seed=seed * 10 + i))
    pts = np.concatenate(clouds)
    cfg = CFG.replace(opt_nlines=6)
    (ref_segs, ref_nlines, ref_status), res = run_both(pts, cfg)
    assert int(res.status) == ref_status
    assert int(res.nlines) == ref_nlines
    assert_segment_parity(ref_segs, jax_segs(res), atol_dir=5e-3, atol_pt=2e-2)


def test_degenerate_parity():
    cfg = CFG
    # identical points
    same = np.tile(np.array([[0.3, 0.2, 0.1]], np.float32), (10, 1))
    (_, _, ref_status), res = run_both(same, cfg)
    assert ref_status == 1 and int(res.status) == 1
    # empty
    padded, valid = pad(np.zeros((0, 3), np.float32), cfg.shapes.max_points)
    res = extract_lines_jit(jnp.asarray(padded), jnp.asarray(valid), cfg)
    assert int(res.status) == 1 and int(res.nlines) == 0
    # two nearly-coincident points: dx >= d -> STATUS_DX_TOO_LARGE
    tiny = np.array([[0, 0, 0], [0.001, 0, 0]], np.float32)
    (_, _, ref_status), res = run_both(tiny, cfg)
    assert ref_status == 2 and int(res.status) == 2


def test_minvotes_gate_parity():
    cfg = CFG.replace(opt_minvotes=1000)
    pts = line_cloud([0, 0, 0], [1, 0, 0], n=100)
    (ref_segs, ref_nlines, _), res = run_both(pts, cfg)
    assert len(ref_segs) == 0 and jax_segs(res)["n"] == 0
    assert ref_nlines == 0 and int(res.nlines) == 0


def test_blob_rejected_parity(rng):
    cfg = CFG
    blob = rng.normal(0, 0.05, size=(300, 3)).astype(np.float32) + np.array(
        [0.5, 0, 1.0], np.float32)
    (ref_segs, _, _), res = run_both(blob, cfg)
    assert len(ref_segs) == 0
    assert jax_segs(res)["n"] == 0


def test_point_mask_matches_points_size():
    pts = line_cloud([0.4, -0.3, 0.2], [0.2, 1.0, 0.3], n=250, seed=2)
    _, res = run_both(pts)
    v = np.asarray(res.segments.valid)
    pm = np.asarray(res.segments.point_mask)[v]
    ps = np.asarray(res.segments.points_size)[v]
    assert (pm.sum(axis=1) == ps).all()
