"""Core line/segment geometry shared by the oracle and the JAX pipeline.

Pure arithmetic (no library-specific calls beyond operators and ufuncs shared
by numpy and jax.numpy), so every function works on both numpy arrays and
traced JAX values, scalars or batched.

Mirrors the reference's segment math:
  * point-on-line projection   (hough_3d_lines.h:78-85  ``find_proj``)
  * projection parameter t     (hough_3d_lines.h:41-68  ``find_t``: the
    reference computes t from the x components only, t = (p.x - a.x) / b.x,
    and fails when b.x == 0 — semantics preserved by callers)
  * quaternion -> rotation     (node.cpp:432 ``toRotationMatrix``)
  * segment endpoints          (p = t * b + a, e.g. node.cpp:461-462)
"""

from __future__ import annotations


def dot3(u, v):
    """Row-wise 3-vector dot product; works on (..., 3) arrays."""
    return (u * v).sum(-1)


def norm3(u):
    return dot3(u, u) ** 0.5


def find_proj(a, b, p):
    """Orthogonal projection of p onto the line a + t*b (b need not be unit).

    Reference: hough_3d_lines.h:78-85.
    """
    d = p - a
    bb = dot3(b, b)
    t = dot3(d, b) / bb
    if hasattr(t, "ndim") and getattr(t, "ndim", 0) > 0:
        t = t[..., None]
    return a + t * b


def find_t_x(a, b, p_proj):
    """Projection parameter via x components only (reference find_t, h:48).

    Valid only when the projection lies on the line; division by b.x == 0
    produces inf/nan, which callers must treat as the reference's failure
    path (hough_3d_lines.h:43-45 returns an error).
    """
    return (p_proj[..., 0] - a[..., 0]) / b[..., 0]


def point_line_distance(a, b_unit, p):
    """Distance from p to the line a + t*b for UNIT direction b.

    Matches PointCloud::pointsCloseToLine's metric (SURVEY.md §2.3).
    """
    d = p - a
    along = dot3(d, b_unit)
    if hasattr(along, "ndim") and getattr(along, "ndim", 0) > 0:
        along = along[..., None]
    perp = d - along * b_unit
    return norm3(perp)


def segment_endpoints(a, b, t_min, t_max):
    """(p1, p2) = (t_min*b + a, t_max*b + a)  (node.cpp:461-462)."""
    if hasattr(t_min, "ndim") and getattr(t_min, "ndim", 0) > 0:
        t_min = t_min[..., None]
        t_max = t_max[..., None]
    return t_min * b + a, t_max * b + a


def quat_to_rot(qw, qx, qy, qz):
    """Rotation matrix from a quaternion (w, x, y, z), Eigen convention.

    Matches Eigen::Quaterniond::toRotationMatrix (node.cpp:432).  The
    quaternion is assumed normalized (TF poses are).  Returns a 3x3 nested
    tuple usable to build either a numpy or jnp array by the caller.
    """
    xx, yy, zz = qx * qx, qy * qy, qz * qz
    xy, xz, yz = qx * qy, qx * qz, qy * qz
    wx, wy, wz = qw * qx, qw * qy, qw * qz
    return (
        (1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)),
        (2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)),
        (2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)),
    )


def canonicalize_direction(b, eps=0.0):
    """Flip b so its first nonzero component (x, then y, then z) is positive.

    DEVIATION D-SIGN (documented in README): the reference leaves the LSQ
    eigenvector sign arbitrary (whatever Eigen returns).  Both our oracle and
    the JAX pipeline canonicalize the sign so outputs are deterministic and
    cross-implementation comparable.  Geometry is unaffected (t ranges flip
    with b).  Works on a single (3,) vector in numpy or JAX.
    """
    x, y, z = b[..., 0], b[..., 1], b[..., 2]
    sign = _sign_nonzero(x, _sign_nonzero(y, _sign_nonzero(z, 1.0, eps), eps), eps)
    if hasattr(sign, "ndim") and getattr(sign, "ndim", 0) > 0:
        sign = sign[..., None]
    return b * sign


def _sign_nonzero(v, fallback, eps):
    # Implemented with operators only so it traces under JAX.
    pos = v > eps
    neg = v < -eps
    return pos * 1.0 + neg * (-1.0) + (1 - pos - neg) * fallback
