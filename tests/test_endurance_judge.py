"""Unit tests for the endurance soak's pure verdict (tools/endurance.py
judge_windows).  Both live heuristics have each mis-flagged a healthy run
once on real hardware, so their fixes are pinned here:

- a relay-outage DRAIN tail (feed ended, runner held alive by a wedged
  read at ~0 fed/s) must not count as throughput degradation;
- the pre-first-journal-reset RSS ramp (the relay client legitimately
  retains ~55 KB/frame of replay journal until the first cadenced reset
  reclaims it) must not serve as the leak baseline — diag6 at cadence
  4096 flagged a healthy ~550 MB plateau against its 302 MB warmup floor.

Mirrors the reference's whole-flight operating envelope
(/root/reference/src/pointcloud_segmentation_node.cpp:267-348): the node
must hold throughput and memory for the duration of a flight.
"""

import importlib.util
import os
import sys

RATE = 30.0
WINDOW_S = 30.0


def _load():
    tools = os.path.join(os.path.dirname(__file__), "..", "tools")
    spec = importlib.util.spec_from_file_location(
        "endurance", os.path.join(tools, "endurance.py"))
    mod = importlib.util.module_from_spec(spec)
    sys.modules["endurance"] = mod
    spec.loader.exec_module(mod)
    return mod


END = _load()


def w(rate_ps=30.0, fed=900, rss=550.0):
    return {"processed_per_sec": rate_ps, "fed_in_window": fed,
            "rss_mb": rss}


def judge(windows, cadence=4096):
    return END.judge_windows(windows, cadence, RATE, WINDOW_S)


def test_healthy_sawtooth_plateau_not_a_leak():
    # diag6's shape: warmup ramp 302->~540 over the first cadence
    # (4096 frames / 900 per window ~= 5 windows), then a flat sawtooth
    # plateau whose minima sit ~545 — far above the warmup floor.
    windows = [w(rss=302 + i * 60) for i in range(5)]
    windows += [w(rss=545 + (i % 3) * 8) for i in range(14)]
    windows.append(w(rate_ps=4.0, fed=30, rss=550))   # partial tail
    v = judge(windows)
    assert not v["leaked"], v
    assert not v["degraded"], v
    assert v["rss_judgment_start_window"] == 5, v
    assert v["rss_mb_min_first_half"] >= 540, v


def test_true_floor_rise_still_flags():
    # a genuine leak: the post-warmup minima floor keeps climbing
    windows = [w(rss=300 + i * 50) for i in range(20)]
    v = judge(windows)
    assert v["leaked"], v


def test_leak_on_unbounded_journal_without_resets():
    # cadence 0 (resets disabled): judge from window 0 — the r04 shape
    # (300 -> 3265 MB over the run) must flag
    windows = [w(rss=300 + i * 150) for i in range(20)]
    v = judge(windows, cadence=0)
    assert v["leaked"], v
    assert v["rss_judgment_start_window"] == 0, v


def test_drain_tail_windows_do_not_degrade():
    # healthy 30/s stream, then the feed ends and a wedged tail read
    # holds the runner alive for 4 windows at ~0 fed/s
    windows = [w() for _ in range(12)]
    windows += [w(rate_ps=0.1, fed=5) for _ in range(4)]
    v = judge(windows)
    assert not v["degraded"], v
    assert v["median_processed_per_sec"] == 30.0, v


def test_sustained_decay_flags():
    windows = [w() for _ in range(10)] + \
        [w(rate_ps=18.0) for _ in range(6)] + [w()]
    v = judge(windows)
    assert v["degraded"], v


def test_transient_outage_counts_but_does_not_degrade():
    windows = [w() for _ in range(8)] + [w(rate_ps=2.0)] + \
        [w() for _ in range(8)]
    v = judge(windows)
    assert not v["degraded"], v
    assert v["outage_windows"] == 1, v


def test_short_run_never_flags():
    v = judge([w(rss=300), w(rss=900), w(rss=1200)])
    assert not v["leaked"] and not v["degraded"], v


def test_steady_region_counts_processed_not_fed():
    """The engine's reset counter ticks on PROCESSED frames
    (engine._maybe_journal_reset), so on a saturating feed (~50% drops
    by latest-wins design) the first journal reset — and with it the end
    of the legitimate pre-reset RSS ramp — lands at cum(processed) ==
    cadence, roughly twice as many windows in as cum(fed).  Judging from
    the fed crossing would put the first-half minima on the ramp and
    flag a healthy run as leaked."""
    def sat(rss):
        c = w(rate_ps=15.0, fed=900, rss=rss)
        c["processed_in_window"] = 450
        return c
    # cum(fed) crosses 4096 at window 5; cum(processed) at window 10 —
    # the ramp (through window 9) must be excluded from the baseline
    windows = [sat(rss=302 + i * 30) for i in range(10)]
    windows += [sat(rss=575 + (i % 3) * 8) for i in range(14)]
    v = judge(windows)
    assert v["rss_judgment_start_window"] == 10, v
    assert not v["leaked"], v


def test_run_shorter_than_cadence_judged_whole():
    # 3 full windows * 900 fed < 4096: no window reaches the cadence,
    # so judgment starts at 0 (and the <6-window guard keeps it calm)
    windows = [w(rss=300 + i * 10) for i in range(4)]
    v = judge(windows)
    assert v["rss_judgment_start_window"] == 0, v


def test_wedge_tail_does_not_degrade():
    """A relay read wedge (measured up to 357 s) spanning the LAST
    several fed windows must read as weather (outage_windows), not
    sustained decay: the trailing median skips wedge-classified windows
    (max_flush_read_ms above the engine's 3 s threshold)."""
    windows = [w() for _ in range(10)]
    for _ in range(6):
        c = w(rate_ps=3.0)
        c["max_flush_read_ms"] = 250000.0
        windows.append(c)
    windows.append(w())   # partial tail dropped by the judge
    v = judge(windows)
    assert not v["degraded"], v
    assert v["outage_windows"] == 6, v


def test_all_tail_wedged_insufficient_signal():
    # fewer than 3 clean windows total -> no degradation verdict at all
    windows = []
    for i in range(8):
        c = w(rate_ps=3.0)
        c["max_flush_read_ms"] = 99000.0
        windows.append(c)
    windows.append(w(rate_ps=3.0))
    v = judge(windows)
    assert not v["degraded"], v


def wc(rate_ps=30.0, fed=900, rss=550.0, resets=0):
    c = w(rate_ps=rate_ps, fed=fed, rss=rss)
    c["processed_in_window"] = int(rate_ps * 30)
    c["journal_resets_cum"] = resets
    return c


def test_deferral_ramp_excused_when_honored_segments_flat():
    """A relay park defers the journal-reset cadence by design, so RSS
    legitimately ramps ~52 MB/window for the whole park and the peak
    sticks as glibc high-water (measured 2026-08-20/21: 483 MB ->
    3.5 GB -> flat 2835; a second 690-s park added only ~120 MB — arena
    reuse — and the next reset dropped RSS to 1563).  The verdict
    judges the floor only where the cadence was HONORED: flat honored
    segments before and after the ramp -> not a leak, even though the
    plain halves comparison sees 485 vs 2285."""
    # healthy cadence: a reset tick every ~5 windows keeps 'since' small
    windows = [wc(rss=485 + i, resets=1 + i // 5) for i in range(10)]
    # park: resets stall at 2, floor ramps for 20 windows
    windows += [wc(rss=500 + i * 52, resets=2) for i in range(20)]
    parked = wc(rss=1600, resets=2)
    parked["max_flush_read_ms"] = 650441.0     # seen on completion
    windows.append(parked)
    # recovery: resets resume, floor flat at the new high-water
    windows += [wc(rss=2285 + (i % 3), resets=3 + i // 5)
                for i in range(10)]
    windows.append(wc(rate_ps=4.0, fed=30, rss=2285, resets=5))
    v = judge(windows)
    assert v["long_park_windows"] == 1, v
    assert len(v["rss_cadence_honored_segments"]) >= 2, v
    assert not v["leaked"], v


def test_real_leak_rises_inside_honored_segments_too():
    # a REAL engine leak climbs everywhere, including while the reset
    # cadence is being honored — the per-segment floor check catches it
    windows = [wc(rss=480 + i * 60, resets=1 + i // 5) for i in range(20)]
    v = judge(windows)
    assert v["leaked"], v


def test_never_honored_cadence_keeps_strict_verdict():
    # resets never tick (broken reset machinery or a run-length park):
    # no honored segment exists, so the strict halves verdict stands
    # and a rising floor is flagged -> reject, rerun
    windows = [wc(rss=500 + i * 52, resets=1) for i in range(25)]
    v = judge(windows)
    assert v["rss_cadence_honored_segments"] == [], v
    assert v["leaked"], v


def test_pre_instrumentation_summary_keeps_strict_verdict():
    """The 2026-08-20 run predates the per-window journal_resets_cum
    field (committed fixture): without it the deferral ramp cannot be
    attributed, so the strict halves verdict stands (leaked -> the
    recorder rejects and reruns on the instrumented engine).  Its
    throughput judgment is unaffected: a perfect 30.0/s median through
    a 17.2-min park."""
    import json
    fx = os.path.join(os.path.dirname(__file__), "fixtures",
                      "endurance_r05_storm_windows.json")
    d = json.load(open(fx))
    v = END.judge_windows(d["windows_detail"], d["journal_reset_cadence"],
                          RATE, WINDOW_S)
    assert not v["degraded"], v
    assert v["median_processed_per_sec"] > 29.5, v
    assert v["leaked"], v          # honest: cannot excuse what it can't see


def test_real_storm_run2_fixture_judged_healthy():
    """The actual 2026-08-21 run (committed fixture, post idle-path-cap
    fix): 30 min at 30 Hz through a ~27 ms/frame chip storm with 650-s
    and 690-s relay parks.  4 journal resets, 2648 batches shed, median
    29.97/s; the cadence-honored segments' floors are flat (485->492,
    2284->2289) while every ramp sits in wedge-deferred windows.
    Verdict: healthy."""
    import json
    fx = os.path.join(os.path.dirname(__file__), "fixtures",
                      "endurance_r05_storm2_windows.json")
    d = json.load(open(fx))
    v = END.judge_windows(d["windows_detail"], d["journal_reset_cadence"],
                          RATE, WINDOW_S)
    assert v["long_park_windows"] == 4, v
    assert not v["degraded"], v
    assert not v["leaked"], v
    assert v["median_processed_per_sec"] > 29.5, v
    assert len(v["rss_cadence_honored_segments"]) >= 1, v


def test_truncated_mid_park_run_not_excused():
    """Review counterexample (2026-08-21): the storm2 fixture truncated
    at window 30 ends INSIDE the 650-s park — resets frozen, RSS ramping
    monotonically to the end, no recovery demonstrated.  That is also
    exactly what a resets-stopped-firing regression looks like, so the
    excuse must not apply: strict verdict -> leaked."""
    import json
    fx = os.path.join(os.path.dirname(__file__), "fixtures",
                      "endurance_r05_storm2_windows.json")
    d = json.load(open(fx))
    v = END.judge_windows(d["windows_detail"][:30],
                          d["journal_reset_cadence"], RATE, WINDOW_S)
    assert v["leaked"], v


def test_resets_stop_after_early_tick_not_excused():
    # one early reset tick, then resets stop and the floor ramps to the
    # end: no defer->recover cycle was demonstrated, so the trailing
    # ramp is judged strictly -> leaked
    windows = [wc(rss=400, resets=1) for _ in range(3)]
    windows += [wc(rss=400, resets=2) for _ in range(3)]     # early tick
    windows += [wc(rss=450 + i * 40, resets=2) for i in range(15)]
    v = judge(windows)
    assert v["leaked"], v


def test_committed_endurance_artifact_passes_current_judge():
    """ENDURANCE_r05.json (the committed artifact) must stay healthy
    under the judge as it evolves: its run demonstrated a full
    defer->recover cycle (ramp w11-17 -> reset tick w18 -> flat floor
    1146-1149), so the trailing deferred ramp is excused and every
    cadence-honored segment is flat."""
    import json
    fx = os.path.join(os.path.dirname(__file__), "..",
                      "ENDURANCE_r05.json")
    s = json.load(open(fx))
    v = END.judge_windows(s["windows_detail"], s["journal_reset_cadence"],
                          s["rate_hz"], WINDOW_S)
    assert not v["degraded"], v
    assert not v["leaked"], v
    assert v["median_processed_per_sec"] >= 29.9, v
    assert len(v["rss_cadence_honored_segments"]) >= 1, v
    assert all(not seg["rises"]
               for seg in v["rss_cadence_honored_segments"]), v
