"""Persistent world-map state: segment fusion + pairwise intersections (JAX).

XLA-native rebuild of the reference's `world_segments` /
`intersection_matrix` state and segFiltering pass (node.cpp:479-667): a
fixed-capacity structure-of-arrays with a validity mask replaces the growing
std::vector; the triangular tuple matrix becomes an (S, S, 2) array with the
same (-1, -1) sentinel.

Semantics mirrored from the reference (and the numpy oracle, which is the
executable spec — oracle/pipeline.py):
  * new segments are matched against the *frame-start* world set; a later
    match overwrites an earlier fusion into the same slot (node.cpp:491-510);
  * fusion = projection similarity + weighted blend (node.cpp:596-667) with
    deviations D-WEIGHT / D-FUSE;
  * intersections are recomputed only for pairs touching a modified or newly
    appended segment (D-NEWIDX fixes the reference's index bookkeeping), and
    stale entries persist until overwritten (node.cpp:531-534).

The per-frame fusion is order-dependent (first-match-wins with in-frame
mutation), so it runs as a sequential ``lax.fori_loop`` over the frame's few
segments; each step's candidate matching *is* vectorized over all world
slots.  Intersections are one batched (S, S) 3x3 solve.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .config import PipelineConfig
from .ops.hough import SegmentBatch


class WorldState(NamedTuple):
    """World segment store + intersection matrix (node.cpp:136-138)."""

    a: jnp.ndarray               # (S, 3)
    b: jnp.ndarray               # (S, 3)  (NOT necessarily unit after fusion)
    t_min: jnp.ndarray           # (S,)
    t_max: jnp.ndarray           # (S,)
    radius: jnp.ndarray          # (S,)
    points_size: jnp.ndarray     # (S,) int32
    pca_coeff: jnp.ndarray       # (S,)
    pca_eigenvalues: jnp.ndarray  # (S, 3)
    valid: jnp.ndarray           # (S,) bool
    count: jnp.ndarray           # int32
    inter: jnp.ndarray           # (S, S, 2), sentinel (-1, -1)

    @property
    def capacity(self) -> int:
        return self.a.shape[0]


def init_world(cfg: PipelineConfig, dtype=None) -> WorldState:
    if dtype is None:
        dtype = jnp.float64 if cfg.compute_dtype == "float64" else jnp.float32
    S = cfg.shapes.max_world_segments
    return WorldState(
        a=jnp.zeros((S, 3), dtype), b=jnp.zeros((S, 3), dtype),
        t_min=jnp.zeros((S,), dtype), t_max=jnp.zeros((S,), dtype),
        radius=jnp.zeros((S,), dtype),
        points_size=jnp.zeros((S,), jnp.int32),
        pca_coeff=jnp.zeros((S,), dtype),
        pca_eigenvalues=jnp.zeros((S, 3), dtype),
        valid=jnp.zeros((S,), bool), count=jnp.int32(0),
        inter=jnp.full((S, S, 2), -1.0, dtype))


def _endpoints(a, b, t_min, t_max):
    return t_min[..., None] * b + a, t_max[..., None] * b + a


def _proj_onto(a, b, p):
    """Project p (broadcastable) onto line(s) a + t*b; safe for b == 0."""
    bb = jnp.maximum((b * b).sum(-1), 1e-30)
    t = ((p - a) * b).sum(-1) / bb
    return a + t[..., None] * b


def _similarity_one(cfg: PipelineConfig, d, w):
    """Vectorized checkSimilarity of one drone segment against all world
    slots (node.cpp:596-667).  `d` is a dict of scalars/(3,) vectors; `w` a
    dict of (S,)/(S,3) arrays.  Returns (sim (S,), fused dict of (S,...))."""
    w_p1, w_p2 = _endpoints(w["a"], w["b"], w["t_min"], w["t_max"])
    d_p1 = d["t_min"] * d["b"] + d["a"]
    d_p2 = d["t_max"] * d["b"] + d["a"]

    proj1 = _proj_onto(w["a"], w["b"], d_p1[None, :])
    proj2 = _proj_onto(w["a"], w["b"], d_p2[None, :])

    eps = d["radius"] + w["radius"] + 2.0 * (2.0 * cfg.diag_voxel)
    dist1 = jnp.sqrt(jnp.maximum(((proj1 - d_p1) ** 2).sum(-1), 0.0))
    dist2 = jnp.sqrt(jnp.maximum(((proj2 - d_p2) ** 2).sum(-1), 0.0))
    cond1 = (dist1 < eps) & (dist2 < eps) & (d["radius"] == w["radius"])

    # D-WEIGHT: real-valued ratio
    ft = w["pca_coeff"].dtype
    wt = d["points_size"].astype(ft) / jnp.maximum(
        (w["points_size"] + d["points_size"]).astype(ft), 1.0)
    wt = jnp.maximum(jnp.asarray(cfg.min_weight, ft), wt)
    denom = w["pca_coeff"] * (1.0 - wt) + d["pca_coeff"] * wt
    coeff = (d["pca_coeff"] * wt) / jnp.where(denom != 0, denom, 1.0)

    new_a = proj1 + coeff[:, None] * (d_p1[None, :] - proj1)
    new_b = (proj2 - proj1) + coeff[:, None] * (
        (d_p2[None, :] - proj2) - (d_p1[None, :] - proj1))

    # t of the 4 endpoint projections on the candidate line, x-division quirk
    def t_of(p):
        pp = _proj_onto(new_a, new_b, p)
        bx = new_b[:, 0]
        return (pp[:, 0] - new_a[:, 0]) / jnp.where(bx != 0, bx, jnp.nan)

    t1, t2 = t_of(d_p1[None, :]), t_of(d_p2[None, :])
    t3, t4 = t_of(w_p1), t_of(w_p2)
    finite = (jnp.isfinite(t1) & jnp.isfinite(t2)
              & jnp.isfinite(t3) & jnp.isfinite(t4))
    no_overlap = (jnp.minimum(t1, t2) > jnp.maximum(t3, t4)) | (
        jnp.maximum(t1, t2) < jnp.minimum(t3, t4))
    sim = cond1 & finite & ~no_overlap

    ts = jnp.stack([t1, t2, t3, t4], axis=-1)
    fused = {
        "a": new_a,
        "b": new_b,
        "t_min": jnp.where(finite, ts.min(-1), 0.0),
        "t_max": jnp.where(finite, ts.max(-1), 0.0),
        "radius": jnp.broadcast_to(d["radius"], sim.shape),
        # D-FUSE: blend against the world segment's fields
        "points_size": w["points_size"] + d["points_size"],
        "pca_coeff": w["pca_coeff"] * (1.0 - wt) + d["pca_coeff"] * wt,
        "pca_eigenvalues": (w["pca_eigenvalues"] * (1.0 - wt[:, None])
                            + d["pca_eigenvalues"][None, :] * wt[:, None]),
    }
    return sim, fused


_FUSE_KEYS = ("a", "b", "t_min", "t_max", "radius", "points_size",
              "pca_coeff", "pca_eigenvalues")


def fuse_frame(state: WorldState, segs: SegmentBatch, cfg: PipelineConfig):
    """Sequential first-match-wins fusion of a frame's segments.

    Returns (new_state_fields dict, modified (S,) bool, new_flags (S,) bool).
    """
    S = state.capacity
    L = segs.capacity

    old = {k: getattr(state, k) for k in _FUSE_KEYS}
    old_valid = state.valid

    new = dict(old)
    carry = (new, state.count, jnp.zeros(S, bool), jnp.zeros(S, bool),
             jnp.full((L,), -1, jnp.int32))

    def body(i, carry):
        new, count, modified, new_flags, slots = carry
        d = {
            "a": segs.a[i], "b": segs.b[i], "t_min": segs.t_min[i],
            "t_max": segs.t_max[i], "radius": segs.radius[i],
            "points_size": segs.points_size[i],
            "pca_coeff": segs.pca_coeff[i],
            "pca_eigenvalues": segs.pca_eigenvalues[i],
        }
        dvalid = segs.valid[i]
        sim, fused = _similarity_one(cfg, d, old)   # match vs frame-start world
        sim = sim & old_valid
        found = sim.any() & dvalid
        j = jnp.argmax(sim).astype(jnp.int32)

        # fuse in place at j
        def write_fused(arr, val):
            return jnp.where(found, arr.at[j].set(val[j]), arr)

        # or append at `count`
        can_append = dvalid & ~found & (count < S)
        k = jnp.minimum(count, S - 1)

        def write_new(arr, val):
            return jnp.where(can_append, arr.at[k].set(val), arr)

        upd = {}
        for key in _FUSE_KEYS:
            arr = write_fused(new[key], fused[key])
            arr = write_new(arr, d[key])
            upd[key] = arr
        modified = modified.at[j].set(modified[j] | found)
        new_flags = new_flags.at[k].set(new_flags[k] | can_append)
        slot = jnp.where(found, j, jnp.where(can_append, k, -1))
        slots = slots.at[i].set(slot)
        count = count + can_append.astype(jnp.int32)
        return (upd, count, modified, new_flags, slots)

    # Unrolled: L is small (opt_nlines, <= ~24) and each step is tiny, so
    # unrolling lets XLA fuse across steps instead of paying per-iteration
    # loop overhead.
    for i in range(L):
        carry = body(i, carry)
    new, count, modified, new_flags, slots = carry
    valid = old_valid | new_flags
    return new, count, valid, modified, new_flags, slots


def _solve3_cramer(A, b, enabled):
    """Batched 3x3 solve via Cramer's rule (pure vector ops — the batched LU
    path unrolls poorly on TPU).  Disabled entries yield NaN, which the
    caller's isfinite gate treats as 'no connection' (the oracle's singular-
    solve path behaves the same)."""
    c0, c1, c2 = A[..., 0], A[..., 1], A[..., 2]          # matrix columns
    cx12 = jnp.cross(c1, c2)
    det = (c0 * cx12).sum(-1)
    ok = enabled & (det != 0.0)
    inv = jnp.where(ok, 1.0, jnp.nan) / jnp.where(det != 0.0, det, 1.0)
    x0 = (b * cx12).sum(-1) * inv
    x1 = (b * jnp.cross(c2, c0)).sum(-1) * inv
    x2 = (b * jnp.cross(c0, c1)).sum(-1) * inv
    return jnp.stack([x0, x1, x2], axis=-1)


def update_intersections(state_fields: dict, valid, inter_old, touched,
                         cfg: PipelineConfig):
    """Batched checkConnections over touched pairs (node.cpp:519-537, 554-584).

    Pair (i, j), j < i: seg_i plays `drone_seg`, seg_j plays `world_seg`.
    """
    a, b = state_fields["a"], state_fields["b"]
    t_min, t_max = state_fields["t_min"], state_fields["t_max"]
    radius = state_fields["radius"]
    S = a.shape[0]

    p1 = t_min[:, None] * b + a                     # (S, 3)
    cross = jnp.cross(jnp.broadcast_to(b[None, :, :], (S, S, 3)),
                      jnp.broadcast_to(b[:, None, :], (S, S, 3)))  # b_j x b_i
    cn = jnp.sqrt(jnp.maximum((cross * cross).sum(-1), 0.0))
    parallel = cn < 1e-2
    nhat = cross / jnp.maximum(cn, 1e-30)[..., None]

    i_idx = jax.lax.broadcasted_iota(jnp.int32, (S, S), 0)
    j_idx = jax.lax.broadcasted_iota(jnp.int32, (S, S), 1)
    pair = (j_idx < i_idx) & valid[:, None] & valid[None, :] & (
        touched[:, None] | touched[None, :]) & ~parallel

    bi = jnp.broadcast_to(b[:, None, :], (S, S, 3))
    bj = jnp.broadcast_to(b[None, :, :], (S, S, 3))
    LHS = jnp.stack([bi, -bj, nhat], axis=-1)        # columns (node.cpp:568)
    RHS = p1[None, :, :] - p1[:, None, :]            # p1_j - p1_i

    sol = _solve3_cramer(LHS, RHS, pair)
    dist = jnp.abs(sol[..., 2])

    tmin_i, tmax_i = t_min[:, None], t_max[:, None]
    tmin_j, tmax_j = t_min[None, :], t_max[None, :]
    eps = 2.0 * cfg.diag_voxel + radius[:, None] + radius[None, :]
    in_i = (sol[..., 0] + tmin_i >= tmin_i) & (sol[..., 0] + tmin_i <= tmax_i)
    in_j = (sol[..., 1] + tmin_j >= tmin_j) & (sol[..., 1] + tmin_j <= tmax_j)
    conn = pair & in_i & in_j & (dist < eps) & jnp.isfinite(sol).all(-1)

    vals = jnp.stack([tmin_i + sol[..., 0], tmin_j + sol[..., 1]], axis=-1)
    # write only on connection; stale entries persist (node.cpp:531-534)
    return jnp.where(conn[..., None], vals, inter_old)


def world_step(state: WorldState, segs: SegmentBatch,
               cfg: PipelineConfig) -> tuple[WorldState, jnp.ndarray]:
    """One segFiltering pass: fuse the frame's segments, refresh intersections.

    Returns (state, slots) where slots (L,) gives each frame segment's world
    slot (-1 = dropped), for host-side visualization bookkeeping.
    """
    fields, count, valid, modified, new_flags, slots = fuse_frame(state, segs, cfg)
    touched = modified | new_flags
    inter = update_intersections(fields, valid, state.inter, touched, cfg)
    return WorldState(valid=valid, count=count, inter=inter, **fields), slots
