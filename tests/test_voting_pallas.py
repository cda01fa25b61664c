"""Pallas fused vote-histogram kernel vs the XLA reference formulation.

Runs in interpreter mode on CPU (the real lowering is exercised on TPU by
bench.py / the driver's compile check).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from pointcloud_segmentation_tpu.ops.voting_pallas import vote_histogram_pallas


def _hist_ref(xi, yi, active, NX):
    B, N = xi.shape
    out = np.zeros((B, NX, NX), np.float32)
    for b in range(B):
        for n in range(N):
            if active[n]:
                out[b, xi[b, n], yi[b, n]] += 1
    return out


@pytest.mark.parametrize("seed,B,N,NX", [(0, 32, 256, 79), (1, 128, 512, 40)])
def test_pallas_matches_xla(seed, B, N, NX):
    rng = np.random.default_rng(seed)
    xi = rng.integers(0, NX, size=(B, N)).astype(np.int32)
    yi = rng.integers(0, NX, size=(B, N)).astype(np.int32)
    active = rng.random(N) < 0.7

    ref = _hist_ref(xi, yi, active, NX)
    xi_m = np.where(active[None, :], xi, NX).astype(np.int32)
    out = np.asarray(vote_histogram_pallas(jnp.asarray(xi_m), jnp.asarray(yi),
                                           NX, interpret=True))
    np.testing.assert_array_equal(out, ref)


def test_pallas_counts_exact():
    # tiny hand-checked case
    xi = np.array([[0, 0, 1, 2, 2, 2]], np.int32)
    yi = np.array([[1, 1, 0, 2, 2, 1]], np.int32)
    xi = np.repeat(xi, 8, axis=0)
    yi = np.repeat(yi, 8, axis=0)
    out = np.asarray(vote_histogram_pallas(jnp.asarray(xi), jnp.asarray(yi),
                                           4, interpret=True))
    assert out.shape == (8, 4, 4)
    assert out[0, 0, 1] == 2
    assert out[0, 1, 0] == 1
    assert out[0, 2, 2] == 2
    assert out[0, 2, 1] == 1
    assert out[0].sum() == 6
