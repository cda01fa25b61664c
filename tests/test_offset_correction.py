"""E-OFFSET surface-offset correction (opt-in accuracy extension).

The reference report §6.3 documents a constant radial ground-truth offset:
ToF returns lie on the beam SURFACE facing the sensor, so every fitted axis
is biased toward the sensor by ~one beam radius.  The correction shifts each
accepted axis by its matched radius along the sensor->line perpendicular
(drone frame, pre-fusion).  Off by default (reference behavior).
"""

import numpy as np
import pytest

from pointcloud_segmentation_tpu.config import default_config, StaticShapes
from pointcloud_segmentation_tpu.eval import match_report
from pointcloud_segmentation_tpu.io.scene import (
    OBS_TESTS_SCENE, WP_TESTS, scene_truth, trajectory_poses)
from pointcloud_segmentation_tpu.io.simulator import simulate_trajectory, TofSpec


def test_oracle_unit_shift():
    from pointcloud_segmentation_tpu.oracle import Segment, surface_offset_correction

    # vertical line at x=1 (sensor at origin): axis must move AWAY from the
    # sensor by exactly radius, perpendicular to b
    s = Segment(a=np.array([1.0, 0.0, 0.3]), b=np.array([0.0, 0.0, 1.0]),
                t_min=-0.5, t_max=0.5, radius=0.05,
                points=np.zeros((0, 3)), points_size=4,
                pca_coeff=1.0, pca_eigenvalues=np.zeros(3))
    surface_offset_correction([s])
    np.testing.assert_allclose(s.a, [1.05, 0.0, 0.3], atol=1e-12)

    # a with a component along b: only the perpendicular part shifts
    s2 = Segment(a=np.array([1.0, 0.0, 0.7]), b=np.array([0.0, 0.0, 1.0]),
                 t_min=-0.5, t_max=0.5, radius=0.1,
                 points=np.zeros((0, 3)), points_size=4,
                 pca_coeff=1.0, pca_eigenvalues=np.zeros(3))
    surface_offset_correction([s2])
    np.testing.assert_allclose(s2.a, [1.1, 0.0, 0.7], atol=1e-12)

    # degenerate: line through the origin is untouched
    s3 = Segment(a=np.array([0.0, 0.0, 0.0]), b=np.array([0.0, 0.0, 1.0]),
                 t_min=-0.5, t_max=0.5, radius=0.05,
                 points=np.zeros((0, 3)), points_size=4,
                 pca_coeff=1.0, pca_eigenvalues=np.zeros(3))
    surface_offset_correction([s3])
    np.testing.assert_allclose(s3.a, [0.0, 0.0, 0.0], atol=1e-12)


def test_jax_unit_shift_matches_oracle():
    import jax.numpy as jnp

    from pointcloud_segmentation_tpu.ops.hough import SegmentBatch
    from pointcloud_segmentation_tpu.pipeline import surface_offset_correction

    a = jnp.array([[1.0, 0.0, 0.3], [0.0, 0.0, 0.0], [0.0, 2.0, 0.7]])
    b = jnp.array([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0], [1.0, 0.0, 0.0]])
    segs = SegmentBatch(
        a=a, b=b,
        t_min=jnp.zeros(3), t_max=jnp.ones(3),
        radius=jnp.array([0.05, 0.05, 0.1]),
        points_size=jnp.full((3,), 4, jnp.int32),
        pca_coeff=jnp.ones(3), pca_eigenvalues=jnp.zeros((3, 3)),
        point_mask=jnp.zeros((3, 8), bool),
        valid=jnp.array([True, True, True]))
    out = surface_offset_correction(segs)
    # row 3: the sensor->line perpendicular is (0, 2, 0.7)/|.| — the shift
    # has a z component because the beam sits above the sensor
    u = np.array([0.0, 2.0, 0.7]) / np.linalg.norm([0.0, 2.0, 0.7])
    np.testing.assert_allclose(
        np.asarray(out.a),
        [[1.05, 0.0, 0.3], [0.0, 0.0, 0.0],
         np.array([0.0, 2.0, 0.7]) + 0.1 * u], atol=1e-6)
    # invalid rows keep their axis
    segs2 = segs._replace(valid=jnp.array([False, True, True]))
    out2 = surface_offset_correction(segs2)
    np.testing.assert_allclose(np.asarray(out2.a)[0], [1.0, 0.0, 0.3],
                               atol=1e-12)


@pytest.mark.parametrize("backend", ["jax", "oracle"])
def test_end_to_end_distance_error_reduced(backend):
    """With the correction on, the mean midpoint distance error on the
    7-beam benchmark drops well below the ~radius-sized bias."""
    shapes = StaticShapes(max_raw_points=4096, max_points=2048,
                          max_world_segments=32)
    poses = trajectory_poses(WP_TESTS, hz=2.0, velocity=0.25)
    frames = simulate_trajectory(
        OBS_TESTS_SCENE, poses, TofSpec(width=48, height=48,
                                        noise_frac=0.002), seed=3)
    truth = scene_truth(OBS_TESTS_SCENE)

    def run(corr):
        from pointcloud_segmentation_tpu.runtime import SegmentationEngine

        cfg = default_config(granularity=3, shapes=shapes,
                             surface_offset_correction=corr)
        eng = SegmentationEngine(cfg, backend=backend)
        eng.run_replay(frames)
        proc = [dict(s, endpoints=[s["t_min"], s["t_max"]])
                for s in eng.world_segments()]
        return match_report(truth, proc)

    base = run(False)
    corr = run(True)
    assert corr["n_truth_matched"] >= base["n_truth_matched"] >= 6
    # the uncorrected bias is ~the beam radius (0.05 m); corrected runs
    # should cut the mean midpoint error by at least ~2x
    assert base["mean_distance_error"] > 0.03
    assert corr["mean_distance_error"] < base["mean_distance_error"] * 0.6
    # the RADIAL component is what the correction targets: it should
    # collapse well below the uncorrected ~radius-sized bias
    assert base["mean_radial_error"] > 0.025
    assert corr["mean_radial_error"] < base["mean_radial_error"] * 0.5
