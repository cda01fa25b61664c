"""Randomized end-to-end parity soak: oracle vs device pipeline.

Runs full replays over randomly generated scenes with randomly drawn
configurations on BOTH backends and compares the resulting world maps
(segment count, matched endpoints, radii, intersection topology).  Any
mismatch prints a self-contained repro line.  Run on CPU:

    JAX_PLATFORMS=cpu python tools/parity_soak.py [n_iters] [start_seed]

This is a soak harness, not a CI test (tests/test_robustness.py and the
per-layer parity tests cover fixed seeds); use it to hunt for rare
inlier-boundary / tie-break disagreements across the config space.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
try:  # the container's sitecustomize registers a remote-TPU backend; drop it
    import jax._src.xla_bridge as xb

    xb.backends()  # force registry init
except Exception:
    pass

import numpy as np


def random_cfg(rng):
    from pointcloud_segmentation_tpu.config import StaticShapes, default_config

    nrad = rng.integers(1, 3)
    radii = sorted(rng.choice([0.03, 0.05, 0.08, 0.1], size=nrad,
                              replace=False).tolist())
    return default_config(
        granularity=int(rng.integers(1, 4)),
        opt_minvotes=int(rng.integers(6, 16)),
        opt_nlines=int(rng.choice([0, 4, 10])),
        min_pca_coeff=float(rng.choice([0.9, 0.95, 0.995])),
        rad_2_leaf_ratio=float(rng.choice([1.5, 2.0])),
        floor_trim_height=float(rng.choice([0.0, 0.3])),
        radius_sizes=tuple(radii),
        surface_offset_correction=bool(rng.integers(0, 2)),
        shapes=StaticShapes(max_raw_points=2048, max_points=1024,
                            max_world_segments=32),
    )


def run_pair(seed: int) -> list:
    from pointcloud_segmentation_tpu.io.scene import simple_scene, scene_truth
    from pointcloud_segmentation_tpu.io.simulator import (TofSpec,
                                                          simulate_trajectory)
    from pointcloud_segmentation_tpu.runtime import SegmentationEngine

    rng = np.random.default_rng(seed)
    cfg = random_cfg(rng)
    scene = simple_scene(n_beams=int(rng.integers(2, 6)),
                         radius=cfg.radius_sizes[0], seed=seed)
    n = int(rng.integers(4, 10))
    poses = [(float(i), np.array([0.0, 0.0, 0.5 + 0.15 * i]),
              np.array([1.0, 0.0, 0.0, 0.0])) for i in range(n)]
    frames = simulate_trajectory(
        scene, poses,
        TofSpec(width=32, height=32, noise_frac=float(rng.choice([0.0, 0.002]))),
        seed=seed + 1)

    outs = {}
    for backend in ("oracle", "jax"):
        eng = SegmentationEngine(cfg, backend=backend)
        eng.run_replay(frames)
        outs[backend] = (eng.world_segments(), eng.intersections_rows())

    errs = []
    so, sj = outs["oracle"][0], outs["jax"][0]
    if len(so) != len(sj):
        errs.append(f"segment count {len(so)} vs {len(sj)}")
    for i, (a, b) in enumerate(zip(so, sj)):
        for k in ("t_min", "t_max", "radius"):
            if abs(a[k] - b[k]) > 5e-2:
                errs.append(f"seg{i}.{k}: {a[k]:.6g} vs {b[k]:.6g}")
        pa1 = np.asarray(a["a"]) + a["t_min"] * np.asarray(a["b"])
        pb1 = np.asarray(b["a"]) + b["t_min"] * np.asarray(b["b"])
        pa2 = np.asarray(a["a"]) + a["t_max"] * np.asarray(a["b"])
        pb2 = np.asarray(b["a"]) + b["t_max"] * np.asarray(b["b"])
        d = max(np.linalg.norm(pa1 - pb1), np.linalg.norm(pa2 - pb2))
        dr = max(np.linalg.norm(pa1 - pb2), np.linalg.norm(pa2 - pb1))
        if min(d, dr) > 5e-2:
            errs.append(f"seg{i} endpoints drift {min(d, dr):.4g}")
    io_, ij = set((r[0], r[2]) for r in outs["oracle"][1]), \
        set((r[0], r[2]) for r in outs["jax"][1])
    if io_ != ij:
        errs.append(f"intersection topology {sorted(io_)} vs {sorted(ij)}")
    return errs


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    s0 = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    bad = 0
    for seed in range(s0, s0 + n):
        try:
            errs = run_pair(seed)
        except Exception as e:  # a crash on either backend is also a finding
            errs = [f"EXCEPTION {type(e).__name__}: {e}"]
        if errs:
            bad += 1
            print(f"SEED {seed} MISMATCH: " + "; ".join(errs), flush=True)
        else:
            print(f"seed {seed} ok", flush=True)
    print(f"done: {bad}/{n} mismatching seeds", flush=True)
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
