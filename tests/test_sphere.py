import numpy as np
import pytest

from pointcloud_segmentation_tpu.config import NUM_DIRECTIONS
from pointcloud_segmentation_tpu import sphere


@pytest.mark.parametrize("g", range(7))
def test_direction_counts(g):
    # reference count table: hough_3d_lines.h:192
    d = sphere.directions(g)
    assert d.shape == (NUM_DIRECTIONS[g], 3)


@pytest.mark.parametrize("g", [0, 1, 2, 3, 4])
def test_directions_unit_and_unique(g):
    d = sphere.directions(g)
    np.testing.assert_allclose(np.linalg.norm(d, axis=1), 1.0, atol=1e-12)
    # no duplicate directions
    assert len(np.unique(np.round(d, 9), axis=0)) == len(d)


@pytest.mark.parametrize("g", [1, 2, 3])
def test_hemisphere_no_antipodal_pairs(g):
    d = sphere.directions(g)
    # for g >= 1 no two directions may be antipodal
    dots = d @ d.T
    assert dots.min() > -1.0 + 1e-9


@pytest.mark.parametrize("g", [0, 2, 4])
def test_plane_bases_orthonormal(g):
    b = sphere.directions(g)
    c1, c2 = sphere.plane_bases(g)
    np.testing.assert_allclose((c1 * b).sum(1), 0.0, atol=1e-12)
    np.testing.assert_allclose((c2 * b).sum(1), 0.0, atol=1e-12)
    np.testing.assert_allclose((c1 * c2).sum(1), 0.0, atol=1e-12)
    np.testing.assert_allclose(np.linalg.norm(c1, axis=1), 1.0, atol=1e-12)
    np.testing.assert_allclose(np.linalg.norm(c2, axis=1), 1.0, atol=1e-12)


def test_coverage_max_angle_shrinks():
    # finer granularity covers the sphere more densely
    def max_gap(g):
        d = sphere.directions(g)
        # for a random set of unit vectors, angle to the closest direction
        rng = np.random.default_rng(0)
        v = rng.normal(size=(500, 3))
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        cos = np.abs(v @ d.T).max(axis=1)  # mod antipodality
        return np.arccos(np.clip(cos, -1, 1)).max()

    assert max_gap(2) < max_gap(1) < max_gap(0) + 1e-9


def test_anchor_reconstruction():
    # a point's (x', y') cell decodes to an anchor whose line passes near it
    b, c1, c2 = sphere.hough_space(2)
    rng = np.random.default_rng(3)
    p = rng.normal(size=3)
    j = 17
    xp, yp = p @ c1[j], p @ c2[j]
    a = xp * c1[j] + yp * c2[j]
    # p - a must be parallel to b[j]
    resid = (p - a) - ((p - a) @ b[j]) * b[j]
    np.testing.assert_allclose(resid, 0.0, atol=1e-12)
