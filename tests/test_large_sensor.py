"""Large-sensor (128x128 ToF) scaling path.

The reference's sensor is a 64x64 RangeFinder (starling.proto:598-606).
The rebuild supports larger sensors through static capacity knobs
(StaticShapes); above 4096 post-voxel points the extraction's gap check
switches from the O(N^2) rank matrix to the sort formulation
(ops/hough.py _GAP_RANK_MAX_N).  These tests run a real 128x128 frame
through both backends and pin the sort/rank-matrix equivalence at the
switchover.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from pointcloud_segmentation_tpu import oracle
from pointcloud_segmentation_tpu.config import default_config, StaticShapes
from pointcloud_segmentation_tpu.io.scene import OBS_TESTS_SCENE, yaw_to_quat_wxyz
from pointcloud_segmentation_tpu.io.simulator import render_depth, TofSpec
from pointcloud_segmentation_tpu.ops.hough import extract_lines
from pointcloud_segmentation_tpu.ops.preproc import preprocess


CFG = default_config(
    granularity=2,
    shapes=StaticShapes(max_raw_points=16384, max_points=4096,
                        max_world_segments=32))


def _frame_128():
    pos = np.array([1.0, 0.0, 1.2])
    quat = yaw_to_quat_wxyz(3.14)
    pts = render_depth(pos, quat, OBS_TESTS_SCENE,
                       TofSpec(width=128, height=128, noise_frac=0.002),
                       rng=np.random.default_rng(3))
    return pts.astype(np.float32)


def test_128_frame_oracle_parity():
    """One 128x128 frame, preproc + extraction, jax vs oracle — the larger
    static caps must not change any semantics."""
    pts = _frame_128()
    assert len(pts) > 2100  # 4x the rays of a 64x64 frame see more returns

    filt = oracle.passthrough_filter(pts.astype(np.float64), CFG.window_size)
    vox = oracle.voxel_grid(filt, CFG.leaf_size)
    ref_segs, ref_nlines, ref_status = oracle.hough3dlines(vox, CFG)

    raw = np.full((CFG.shapes.max_raw_points, 3), np.nan, np.float32)
    raw[: len(pts)] = pts
    f, v, _ = preprocess(jnp.asarray(raw), CFG)
    assert int(np.asarray(v).sum()) == len(vox)
    res = extract_lines(f, v, CFG)
    assert int(res.status) == ref_status
    assert int(res.nlines) == ref_nlines
    valid = np.asarray(res.segments.valid)
    assert int(valid.sum()) == len(ref_segs) >= 1
    ps = np.asarray(res.segments.points_size)[valid]
    for k, rs in enumerate(ref_segs):
        assert ps[k] == rs.points_size


@pytest.mark.parametrize("n_pad", [4096, 4224])
def test_gap_check_sort_equals_rank_matrix(n_pad):
    """The same cloud padded to N <= 4096 (rank-matrix gap check) and to
    N > 4096 (sort gap check) must extract identically — the two gap
    formulations are interchangeable at the switchover boundary."""
    rng = np.random.default_rng(5)
    t = np.linspace(0, 1.3, 300)
    b = np.array([0.3, 1.0, 0.15])
    b /= np.linalg.norm(b)
    pts = (np.array([0.4, -0.5, 0.6]) + t[:, None] * b
           + rng.normal(0, 0.004, (300, 3))).astype(np.float32)
    # inject one genuine gap that must trip the gate identically
    keep = (t < 0.5) | (t > 0.78)
    pts = pts[keep]
    cfg = CFG.replace(shapes=StaticShapes(max_raw_points=2 * n_pad,
                                          max_points=n_pad,
                                          max_world_segments=32))
    padded = np.zeros((n_pad, 3), np.float32)
    padded[: len(pts)] = pts
    valid = np.zeros(n_pad, bool)
    valid[: len(pts)] = True
    res = extract_lines(jnp.asarray(padded), jnp.asarray(valid), cfg)
    ref_segs, ref_nlines, ref_status = oracle.hough3dlines(
        pts.astype(np.float64), cfg)
    assert int(res.nlines) == ref_nlines
    assert int(res.status) == ref_status
    assert int(np.asarray(res.segments.valid).sum()) == len(ref_segs)
