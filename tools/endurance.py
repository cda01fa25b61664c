"""Endurance soak: sustained streaming through the production runtime.

The streaming benchmarks (bench.py `bench_streaming`) measure ~40-120 s
windows; this tool runs the SAME production path — native C++ feeder ->
latest-wins mailbox -> consumer thread -> jit'd step -> async flusher —
continuously for minutes to hours (ONE stream, like a deployed mapping
node over a whole flight) and samples throughput, drop fraction, host
RSS, and world-map size every ~30 s.  Throughput must hold steady (no
compile storms, no queue leaks, no degradation as the world map
saturates its fixed capacity) and host memory must stay flat.

This tool's first run caught a real one: restarting the engine's
worker/flusher threads per chunk leaked ~8 MB/restart (CPU) and
~65 MB/chunk (TPU relay) of glibc arena high-water — fixed by the
package-wide M_ARENA_MAX cap (pointcloud_segmentation_tpu/_malloc.py).

Run bare on the TPU (owns the chip; no kill timeout):

    python tools/endurance.py [minutes=10] [rate_hz=30] [granularity=4] \
        [journal_reset_every=engine-default]

Prints one line per sample window and a final JSON summary; exit 1 if
the trailing-5-window median throughput fell >15% below the run median
(sustained degradation — transient relay-outage windows are counted
separately as ``outage_windows`` and attributed host-side: each window
carries the slowest single step dispatch and flusher read, and the
summary carries the engine's per-reset phase timings) or the RSS-minima
floor keeps rising in the steady region (leak heuristic).

The leak heuristic must see past the journal-reset SAWTOOTH: between
resets the relay client legitimately retains ~55 KB/frame of replay
journal, so RSS ramps by roughly ``cadence * 0.055 MB`` and snaps back
at each reset.  Windows before the first reset therefore sit on an
un-reclaimed ramp that is NOT a leak baseline — the judgment starts at
the first window past one full cadence and compares minima per half
from there (window point samples additionally swing with XLA scratch
buffers; minima are the stable floor).
"""

import json
import math
import os
import sys
import tempfile
import threading
import time


# The engine marks a flusher head read in flight longer than this as
# WEDGED (relay park, host-side weather).  judge_windows excludes such
# windows from the degradation tail, and tools/record_artifacts.py's
# endurance acceptance gate counts them — ONE constant so the judge and
# the gate can't silently diverge.
WEDGE_READ_MS = 3000.0

# A flusher read (completed, or in flight at window close — the engine's
# pop_stall_max reports both) longer than this marks a LONG-park window.
# Informational: the summary counts such windows so an artifact states
# how much of its run was spent inside multi-minute relay parks; the
# leak verdict itself keys off the reset cadence (journal_resets_cum),
# not off this threshold.  Set above the ~1.5 s busy-queue read, the 3 s
# wedge threshold, and the short end of the 10-357 s post-reset park
# range, so only the multi-minute parks that meaningfully defer the
# cadence are counted.
LONG_PARK_MS = 60_000.0


def _floor_halves(seg):
    """(min RSS of first half, min RSS of last half, rises?) for a
    window segment — THE floor comparison, used by the strict verdict,
    the per-segment honored check, and the summary annotation alike so
    the three can't silently diverge."""
    h = max(len(seg) // 2, 1)
    lo_first = min(c["rss_mb"] for c in seg[:h]) if seg else 0.0
    lo_last = min(c["rss_mb"] for c in seg[h:]) if seg[h:] else lo_first
    return lo_first, lo_last, lo_last > 1.25 * lo_first


def rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) / 1024.0
    return float("nan")


def judge_windows(windows, cadence, rate, window_s=30.0):
    """Pure verdict over per-window samples (unit-tested: the two live
    heuristics have each mis-flagged a healthy run once — a relay-outage
    tail at 0 fed/s, and the pre-first-reset journal ramp as a leak
    baseline).  Returns the judgment fields merged into the summary.

    - Drops the final partial window, then trailing DRAIN windows (feed
      ended; a wedged tail read can hold the runner alive for minutes at
      ~0 fed/s) — shutdown latency, not stream throughput.
    - ``degraded``: trailing five-window median < 85% of the run median,
      computed over the last five windows NOT attributable to a relay
      read wedge (max_flush_read_ms > 3 s — the engine's own wedge
      threshold).  Sustained decay means compile storms or queue leaks;
      a relay outage is host-side weather, already counted in
      ``outage_windows``, and a 357 s wedge (the measured maximum) can
      span >5 trailing windows, so merely taking the literal last five
      would flag a healthy run.
    - ``leaked``: RSS window-MINIMA floor rising across halves of the
      STEADY region.  Minima, because point samples swing with XLA
      scratch buffers; steady region starts after one full journal-reset
      cadence of PROCESSED frames — the engine's reset counter ticks on
      processed, not fed (engine._maybe_journal_reset), so on a
      saturating feed (drops by latest-wins design) counting fed would
      start the judgment while the journal is still on its pre-first-reset
      ramp — because the relay journal legitimately ramps ~55 KB/frame
      until the first reset reclaims it (the sawtooth's rising edge —
      measured: diag6 at cadence 4096 flagged a healthy ~550 MB plateau
      against its 302 MB warmup floor).
    """
    full = windows[:-1] if len(windows) > 1 else list(windows)
    while len(full) > 1 and full[-1]["fed_in_window"] < rate * window_s * 0.05:
        full = full[:-1]
    rates_seen = sorted(c["processed_per_sec"] for c in full)
    median = rates_seen[len(rates_seen) // 2] if rates_seen else 0.0
    last = full[-1]["processed_per_sec"] if full else 0.0
    # trailing median over non-wedged windows only (see docstring): a
    # window whose slowest flusher read crossed the engine's 3 s wedge
    # threshold is relay weather, not code decay
    unwedged = [c for c in full
                if c.get("max_flush_read_ms", 0.0) <= WEDGE_READ_MS]
    tail = sorted(c["processed_per_sec"] for c in unwedged[-5:])
    tail_median = tail[len(tail) // 2] if tail else 0.0
    degraded = (len(full) >= 6 and len(tail) >= 3
                and tail_median < 0.85 * median)
    start = 0
    if cadence:
        cum = 0
        for i, c in enumerate(full):
            # processed drives the engine's reset cadence; older window
            # dicts (pre-r4 fixtures) only recorded fed
            cum += c.get("processed_in_window", c["fed_in_window"])
            if cum >= cadence:
                start = min(i + 1, max(len(full) - 1, 0))
                break
        else:
            start = 0       # run shorter than one cadence: judge it all
    steady = full[start:] if full[start:] else full
    rss_min_first, rss_min_last, strict_rises = _floor_halves(steady)
    leaked = len(steady) >= 6 and strict_rises
    # Long relay parks (single flusher reads in flight for minutes —
    # 11-17 min observed 2026-08-20) defer the journal-reset cadence by
    # design for their whole duration, so the journal legitimately ramps
    # ~55 KB/frame the entire park and the peak sticks as glibc
    # high-water afterwards: a bounded, weather-coupled sawtooth the
    # halves heuristic misreads as a monotonic leak.  Two measured runs
    # pin the physics: (run 1) RSS 483 MB -> 3.5 GB across a 17.2-min
    # park, then FLAT at 2835 MB for 15 windows once the deferred reset
    # ran; (run 2) a second 690-s park added only ~120 MB because the
    # journal regrew INTO the retained arenas, and RSS dropped to
    # 1563 MB after the next reset — the high-water is set by the
    # longest single deferral, it does not ratchet per park.
    #
    # The principled verdict therefore judges the floor only where the
    # reset cadence was being HONORED: split the steady region into
    # contiguous segments whose windows are not reset-overdue (processed
    # frames since the last observed reset tick <= cadence * 1.5, from
    # the windows' cumulative journal_resets_cum), and flag a leak iff
    # any >= 6-window segment's minima floor rises across its halves —
    # a real engine leak rises there too, while deferral ramps and the
    # cross-park high-water steps fall in the excused overdue windows.
    # Excusing overdue windows requires the run to have DEMONSTRATED the
    # recovery it is being excused for: at least one reset tick must
    # have landed after an overdue stretch (a completed defer->recover
    # cycle).  Without that, a trailing unrecovered ramp — which is also
    # exactly what a resets-stopped-firing regression looks like — would
    # be excused into a healthy committed artifact (review finding,
    # 2026-08-21: the storm2 fixture truncated mid-park judged clean).
    # Runs without the journal_resets_cum field (pre-instrumentation),
    # with cadence 0, with no cadence-honored segment long enough to
    # judge, or with no demonstrated cycle keep the strict halves
    # verdict above: a run that never demonstrated an honored cadence
    # (or a recovery) is rejected, not excused.
    long_parks = [i for i, c in enumerate(full)
                  if c.get("max_flush_read_ms", 0.0) > LONG_PARK_MS]
    honored_segments = []
    if cadence and any(c.get("journal_resets_cum") is not None
                       for c in full):
        since, prev_cum = 0.0, None
        flags, seen_overdue, cycle_demonstrated = [], False, False
        for c in full:
            cum = c.get("journal_resets_cum")
            if (prev_cum is not None and cum is not None
                    and cum > prev_cum):
                if seen_overdue:
                    cycle_demonstrated = True
                since = 0.0
            if cum is not None:
                prev_cum = cum
            since += c.get("processed_in_window", c["fed_in_window"])
            overdue = since > cadence * 1.5
            seen_overdue = seen_overdue or overdue
            flags.append(not overdue)
        cur = []
        for i in range(start, len(full)):
            if flags[i]:
                cur.append(full[i])
            elif cur:
                honored_segments.append(cur)
                cur = []
        if cur:
            honored_segments.append(cur)
        honored_segments = [s for s in honored_segments if len(s) >= 6]
        if honored_segments and (cycle_demonstrated or not seen_overdue):
            leaked = any(_floor_halves(s)[2] for s in honored_segments)
    return {
        "median_processed_per_sec": median,
        "min_processed_per_sec": rates_seen[0] if rates_seen else 0.0,
        "max_processed_per_sec": rates_seen[-1] if rates_seen else 0.0,
        "last_processed_per_sec": last,
        "rss_mb_first_window": full[0]["rss_mb"] if full else 0.0,
        "rss_mb_last": full[-1]["rss_mb"] if full else 0.0,
        "rss_mb_min_first_half": rss_min_first,
        "rss_mb_min_last_half": rss_min_last,
        "rss_judgment_start_window": start,
        "long_park_windows": len(long_parks),
        "rss_cadence_honored_segments": [
            dict(zip(("rss_mb_min_first_half", "rss_mb_min_last_half",
                      "rises"), _floor_halves(s)), windows=len(s))
            for s in honored_segments],
        "journal_reset_cadence": cadence,
        "outage_windows": sum(
            1 for c in full if c["processed_per_sec"] < 0.5 * median),
        "degraded": degraded, "leaked": leaked,
    }


def main() -> int:
    minutes = float(sys.argv[1]) if len(sys.argv) > 1 else 10.0
    rate = float(sys.argv[2]) if len(sys.argv) > 2 else 30.0
    granularity = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    reset_every = int(sys.argv[4]) if len(sys.argv) > 4 else None

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import bench

    from pointcloud_segmentation_tpu.config import (
        default_config, StaticShapes)
    from pointcloud_segmentation_tpu.io.replay import save_frames
    from pointcloud_segmentation_tpu.runtime import relay
    from pointcloud_segmentation_tpu.runtime.engine import SegmentationEngine

    cfg = default_config(
        granularity=granularity,
        shapes=StaticShapes(max_raw_points=4096, max_points=2048,
                            max_world_segments=64))
    frames = bench.build_frames(cfg, 40)
    log_path = os.path.join(tempfile.gettempdir(), "endurance.pcsl")
    save_frames(log_path, frames)

    eng = SegmentationEngine(cfg, journal_reset_every=reset_every)
    # warm every compile outside the measured window (per-frame step +
    # the deferred flush stack pre-compiled by engine.start)
    eng.push_pose(frames[0].t, frames[0].position, frames[0].quat_wxyz)
    eng.process_frame(frames[0].t, frames[0].points)

    # ONE continuous stream for the whole soak — the deployed shape.
    loops = max(1, math.ceil(minutes * 60.0 * rate / len(frames)))
    result = {}

    def _run():
        result.update(eng.run_streaming_from_log(
            log_path, rate_hz=rate, loops=loops))

    runner = threading.Thread(target=_run, daemon=True)
    window_s = 30.0
    print(f"endurance: {minutes:.1f} min @ {rate:.0f} Hz, g{granularity}, "
          f"one stream of {loops * len(frames)} frames, "
          f"rss0={rss_mb():.0f} MB", flush=True)
    runner.start()
    windows = []
    last_proc, last_drop, last_t = (eng.frames_processed,
                                    eng.dropped_frames, time.perf_counter())
    # Stall attribution is HOST-SIDE ONLY (engine.pop_stall_max + the
    # engine's reset_log phase timings): the relay plugin's session-metric
    # exports cannot be called concurrent with an active stream — the
    # counts export returns a machine word (not a string; dereferencing
    # segfaults) and the seconds counters spin forever when another
    # thread is dispatching (measured: main thread 100% CPU, zero
    # windows).  relay.session_metrics() is for quiescent probes like
    # tools/exp_reset_cost.py.
    while runner.is_alive():
        runner.join(timeout=window_s)
        now = time.perf_counter()
        proc, drop = eng.frames_processed, eng.dropped_frames
        dt = now - last_t
        fed_delta = (proc - last_proc) + (drop - last_drop)
        stall = eng.pop_stall_max()
        windows.append({
            "processed_per_sec": round((proc - last_proc) / dt, 2),
            "processed_in_window": proc - last_proc,
            "fed_in_window": fed_delta,
            "drop_fraction": round(
                (drop - last_drop) / max(fed_delta, 1), 4),
            "rss_mb": round(rss_mb(), 1),
            # world map size via counters only: a device read here would
            # contend with the stream's own flusher for the relay
            "world_segments": None,
            "max_step_ms": stall["step_ms"],
            "max_flush_read_ms": stall["flush_read_ms"],
            # cumulative counters per window: reset/shed forensics line a
            # throughput hole or an RSS ramp up with its cause post-hoc
            "journal_resets_cum": eng.journal_resets,
            "flush_batches_shed_cum": eng.flush_batches_shed,
        })
        last_proc, last_drop, last_t = proc, drop, now
        c = windows[-1]
        print(f"window {len(windows)}: {c['processed_per_sec']:.1f} proc/s "
              f"drops={c['drop_fraction']:.1%} rss={c['rss_mb']:.0f} MB "
              f"skip={eng.frames_skipped_no_pose} "
              f"resets={eng.journal_resets} "
              f"shed={eng.flush_batches_shed} "
              f"maxstep={c['max_step_ms']:.0f}ms "
              f"maxread={c['max_flush_read_ms']:.0f}ms",
              flush=True)
    n_segs = len(eng.world_segments())

    verdict = judge_windows(windows, eng.journal_reset_every, rate, window_s)
    summary = {
        "minutes": minutes, "rate_hz": rate, "granularity": granularity,
        "windows": len(windows),
        "fed": result.get("fed"), "processed": result.get("processed"),
        "dropped": result.get("dropped"),
        **verdict,
        "drop_fraction_overall": round(
            result.get("dropped", 0) / max(result.get("fed", 1), 1), 4),
        "world_segments_final": n_segs,
        "skipped_no_pose": eng.frames_skipped_no_pose,
        "journal_resets": eng.journal_resets,
        "flush_batches_shed": eng.flush_batches_shed,
        # per-reset phase timings (drain/read/reset/upload ms) — aligns
        # with windows via at_frames; the stream is stopped here so the
        # quiescent-only relay counters are safe to snapshot too
        "reset_log": eng.reset_log,
        "relay_session_s": {k: round(v, 2) for k, v in
                            relay.session_metrics().items()
                            if isinstance(v, float)},
        # per-window samples (the committed-artifact form: one JSON carries
        # the whole soak — trend inspection without re-running)
        "windows_detail": windows,
    }
    print(json.dumps(summary), flush=True)
    return 1 if (verdict["degraded"] or verdict["leaked"]) else 0


if __name__ == "__main__":
    sys.exit(main())
