"""JAX preprocessing vs the numpy oracle (PCL semantics)."""

import numpy as np
import jax.numpy as jnp

from pointcloud_segmentation_tpu import oracle
from pointcloud_segmentation_tpu.config import default_config
from pointcloud_segmentation_tpu.ops.preproc import preprocess, window_mask

CFG = default_config(shapes=default_config().shapes)


def pad_to(pts, n):
    out = np.full((n, 3), np.nan, np.float32)
    out[: len(pts)] = pts
    return out


def run_both(pts_raw, cfg=CFG):
    # oracle
    ref = oracle.cloud_filtering(np.asarray(pts_raw, np.float64), cfg)
    # jax
    padded = pad_to(np.asarray(pts_raw, np.float32), cfg.shapes.max_raw_points)
    out, valid, count = preprocess(jnp.asarray(padded), cfg)
    out = np.asarray(out)[np.asarray(valid)]
    return ref, out, int(count)


def test_matches_oracle_random(rng):
    pts = rng.uniform([-0.5, -2.0, -2.0], [2.0, 2.0, 2.0], size=(2000, 3))
    ref, out, count = run_both(pts)
    assert count == len(ref)
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_matches_oracle_with_nans(rng):
    pts = rng.uniform([0.0, -1.0, -1.0], [1.4, 1.0, 1.0], size=(500, 3))
    pts[::7] = np.nan
    pts[3] = [np.inf, 0, 0]
    ref, out, count = run_both(pts)
    assert count == len(ref)
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_ordering_is_pcl_order(rng):
    # output must be ordered by (z, y, x) voxel index like PCL
    pts = rng.uniform([0.0, -1.0, -1.0], [1.4, 1.0, 1.0], size=(800, 3))
    ref, out, count = run_both(pts)
    # same order, not just same set
    np.testing.assert_allclose(out, ref, atol=1e-5)
    leaf = CFG.leaf_size
    ijk = np.floor(out / leaf).astype(int)
    keys = list(map(tuple, ijk[:, ::-1]))  # (z, y, x)
    assert keys == sorted(keys)


def test_window_bounds():
    pts = np.array([
        [0.5, 0.0, 0.0],
        [-0.1, 0.0, 0.0],
        [2.0, 0.0, 0.0],
        [0.5, 2.0, 0.0],
        [0.5, 0.0, -2.0],
    ], np.float32)
    m = np.asarray(window_mask(jnp.asarray(pts), 3.0))
    assert m.tolist() == [True, False, False, False, False]


def test_empty_input():
    padded = np.full((CFG.shapes.max_raw_points, 3), np.nan, np.float32)
    out, valid, count = preprocess(jnp.asarray(padded), CFG)
    assert int(count) == 0
    assert not np.asarray(valid).any()


def test_single_voxel_centroid():
    pts = np.array([[0.501, 0.011, 0.011], [0.52, 0.012, 0.012]], np.float32)
    ref, out, count = run_both(pts)
    assert count == 1
    np.testing.assert_allclose(out[0], pts.mean(0), atol=1e-5)
