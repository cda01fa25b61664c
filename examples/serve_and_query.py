"""Serving-mode demo: engine behind TCP, client streams frames + queries.

Run (two terminals, or let this script do both in one process):

    python examples/serve_and_query.py

Starts a server on an ephemeral port, streams a simulated 7-beam-scene
flight through it at sensor rate, polls the world map mid-flight, then
finalizes (CSV flush) — the deployable analog of the reference's ROS loop
(pointcloud_segmentation_node.cpp:64-67) without a ROS stack.
"""

import tempfile
import time

from pointcloud_segmentation_tpu.config import default_config
from pointcloud_segmentation_tpu.io.scene import (OBS_TESTS_SCENE, WP_TESTS,
                                                  trajectory_poses)
from pointcloud_segmentation_tpu.io.simulator import TofSpec, simulate_trajectory
from pointcloud_segmentation_tpu.runtime import (SegmentationClient,
                                                 SegmentationEngine,
                                                 SegmentationServer)


def main():
    outdir = tempfile.mkdtemp(prefix="pcs_served_")
    cfg = default_config(granularity=4, path_to_output=outdir)
    server = SegmentationServer(SegmentationEngine(cfg), outdir=outdir).start()
    print(f"serving on {server.host}:{server.port}; outputs -> {outdir}")

    frames = simulate_trajectory(
        OBS_TESTS_SCENE, trajectory_poses(WP_TESTS, hz=3.0, velocity=0.2),
        TofSpec(noise_frac=0.002), seed=0)
    client = SegmentationClient(server.host, server.port, timeout=300.0)
    for i, fr in enumerate(frames):
        client.send_frame(fr.t, fr.position, fr.quat_wxyz, fr.points)
        time.sleep(1 / 30)                      # sensor pacing
        if i % 30 == 29:
            snap = client.query()
            print(f"  t={fr.t:6.2f}  processed={snap['frames_processed']:3d} "
                  f"dropped={snap['frames_dropped']:3d} "
                  f"world={len(snap['world_segments'])}")

    # drain, then flush
    while True:
        snap = client.query()
        done = (snap["frames_processed"] + snap["frames_dropped"]
                + snap["frames_skipped_no_pose"])
        if done >= len(frames):
            break
        time.sleep(0.2)
    out = client.finalize()
    print(f"final: {len(snap['world_segments'])} world segments, "
          f"{len(snap['intersections'])} intersections")
    for k, v in out["outputs"].items():
        print(f"  {k}: {v}")
    client.close()
    server.stop()


if __name__ == "__main__":
    main()
