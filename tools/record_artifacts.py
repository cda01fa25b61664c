"""Quiet-window artifact recorder for the round-4 evidence asks.

The shared testbed chip's service rate swings 6.5 <-> ~27 ms/frame with
neighbor load and storms persist 40+ min (tools/chip_weather.py;
CLAUDE.md), so the two recording jobs this round needs — the
``BENCH_CONFIG=all`` bench_details refresh and the 30-min endurance
soak — cannot just be launched: they must WAIT for a quiet window, and
each result must be accepted only if the run itself stayed quiet (the
bench rows self-report device time for exactly this purpose).

    python tools/record_artifacts.py [--bench] [--endurance] \
        [--minutes 30] [--cadence N] [--quiet-ms 9.5] [--force]

``--force`` skips the quiet-window wait: one probe is taken for the
``recorder_weather`` annotation and the stage runs immediately.  This is
the storm-outlasts-the-round fallback — a committed endurance artifact
that SAYS it was recorded on a ~27 ms stormy chip beats no artifact
(chip storms have been observed to persist 3+ h, CLAUDE.md).  The bench
stage's own quiet-acceptance gate still applies under --force, so a
forced bench attempt on a stormy chip will record and reject; use
--force for the endurance stage.

``--cadence`` defaults to the engine's own journal-reset default (4096 —
the deployed configuration is what the artifact must evidence); pass a
smaller value only for a deliberate reset-machinery stress run, and say
so when committing the artifact.

Runs unattended: probes chip weather every ~8 min; when quiet, runs the
next stage as a subprocess (plain python -> axon TPU; NEVER killed or
timed out — a killed TPU process leaves a stale claim).  Bench results
land in /tmp first and are copied into the repo only if the run's own
node_loop device time confirms the window stayed quiet.  The endurance
summary is accepted only on exit 0 (its own verdict logic judges
degradation and leaks) AND a quiet-enough run: the accepted JSON carries
a ``recorder_weather`` block (pre/post chip probes + wedge-window stats)
and a wedge-dominated run (unwedged-window fraction < 0.6) is rejected.
Everything is logged to stdout; the caller commits.
"""

import argparse
import json
import os
import re
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))   # for `from endurance import ...`
PROBE_PERIOD_S = 8 * 60
MAX_ATTEMPTS = 8


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def probe_ms():
    """One chip-weather probe; returns device ms/frame (or None).  A None
    probe logs the subprocess's tail so an unattended run's dead-probe
    window is diagnosable after the fact."""
    p = subprocess.run([sys.executable, "tools/chip_weather.py"],
                       cwd=REPO, capture_output=True, text=True)
    m = re.search(r"device_ms_per_frame=([0-9.]+)", p.stdout + p.stderr)
    if m is None:
        tail = ((p.stdout or "") + (p.stderr or "")).strip()[-300:]
        log(f"probe produced no number (rc={p.returncode}); tail: {tail!r}")
    return float(m.group(1)) if m else None


def wait_quiet(quiet_ms, max_failed_probes=6):
    failed = 0
    while True:
        ms = probe_ms()
        log(f"weather probe: {ms} ms/frame (quiet < {quiet_ms})")
        if ms is not None and ms < quiet_ms:
            return ms
        # a probe that returns no number at all (stale TPU claim, relay
        # down) must not spin the unattended recorder forever
        failed = failed + 1 if ms is None else 0
        if failed >= max_failed_probes:
            raise RuntimeError(
                f"{max_failed_probes} consecutive weather probes failed "
                f"(no device_ms_per_frame in output) — TPU unreachable?")
        time.sleep(PROBE_PERIOD_S)


def run_bench(quiet_ms):
    """BENCH_CONFIG=all into /tmp; adopt only if the run stayed quiet."""
    tmp = "/tmp/bench_details_try.json"
    env = dict(os.environ, BENCH_CONFIG="all", BENCH_DETAILS=tmp)
    log("bench: starting BENCH_CONFIG=all (this holds the TPU ~15-25 min)")
    p = subprocess.run([sys.executable, "bench.py"], cwd=REPO, env=env,
                       capture_output=True, text=True)
    sys.stdout.write(p.stdout[-4000:])
    sys.stderr.write(p.stderr[-2000:])
    if p.returncode != 0 or not os.path.exists(tmp):
        log(f"bench: FAILED rc={p.returncode}")
        return False
    det = json.load(open(tmp))
    dev = det.get("node_loop", {}).get("device_ms_per_frame")
    if dev is None or dev > quiet_ms:
        log(f"bench: run went stormy mid-window (node_loop device "
            f"{dev} ms) — rejecting this attempt")
        shutil.copy(tmp, f"/tmp/bench_details_stormy_{int(time.time())}.json")
        return False
    shutil.copy(tmp, os.path.join(REPO, "bench_details.json"))
    log(f"bench: ACCEPTED (node_loop device {dev:.2f} ms) -> "
        f"bench_details.json")
    return True


def judge_endurance(summary, pre_probe_ms, post_ms, quiet_ms,
                    wedge_read_ms):
    """Pure acceptance judgment for a finished endurance summary.

    Annotates ``summary`` with the ``recorder_weather`` block (pre/post
    chip probes + wedge-window stats derived from the run's own windows)
    and returns ``(accept, summary)`` where ``accept`` is False iff the
    run was wedge-dominated (unwedged-window fraction < 0.6).  Kept pure
    (no IO, no probes) so the acceptance gate is unit-testable — the
    same discipline as tools/endurance.py's ``judge_windows``.
    """
    wins = summary.get("windows_detail", [])
    wedged = sum(1 for w in wins
                 if w.get("max_flush_read_ms", 0.0) > wedge_read_ms)
    frac_ok = 1.0 - wedged / max(len(wins), 1)
    summary["recorder_weather"] = {
        "pre_probe_device_ms": pre_probe_ms,
        "post_probe_device_ms": post_ms,
        "quiet_ms_threshold": quiet_ms,
        "post_probe_quiet": bool(post_ms is not None
                                 and post_ms < quiet_ms),
        "windows": len(wins),
        "wedge_windows": wedged,
        "unwedged_window_fraction": round(frac_ok, 3),
    }
    return frac_ok >= 0.6, summary


def run_endurance(minutes, cadence, quiet_ms, pre_probe_ms, out_name):
    """Production soak; accept on exit 0 AND a quiet-enough run.

    The bench stage self-gates on its own node_loop device time; this
    stage previously accepted on exit 0 alone, so a storm-spanning run
    could pass with the judge's wedge-excluded-window heuristics doing
    all the work.  The accepted artifact now carries a
    ``recorder_weather`` block — the recorder's own pre/post chip-weather
    probes plus wedge-window stats computed from the run's windows — and
    the stage REJECTS a run whose unwedged-window fraction is below 0.6
    (the same self-reporting discipline the bench rows have).
    """
    out = os.path.join(REPO, out_name)
    log(f"endurance: starting {minutes} min @ 30 Hz g4 cadence "
        f"{cadence if cadence is not None else 'engine-default'}")
    cmd = [sys.executable, "tools/endurance.py", str(minutes), "30", "4"]
    if cadence is not None:
        cmd.append(str(cadence))
    p = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True)
    sys.stdout.write(p.stdout[-8000:])
    sys.stderr.write(p.stderr[-2000:])
    lines = [ln for ln in p.stdout.splitlines() if ln.startswith("{")]
    if p.returncode != 0 or not lines:
        log(f"endurance: FAILED rc={p.returncode}")
        if lines:
            with open(f"/tmp/endurance_failed_{int(time.time())}.json",
                      "w") as f:
                f.write(lines[-1] + "\n")
        return False
    from endurance import WEDGE_READ_MS

    summary = json.loads(lines[-1])
    post_ms = probe_ms()
    accept, summary = judge_endurance(summary, pre_probe_ms, post_ms,
                                      quiet_ms, WEDGE_READ_MS)
    if not accept:
        rw = summary["recorder_weather"]
        log(f"endurance: run was wedge-dominated "
            f"({rw['wedge_windows']}/{rw['windows']} windows parked "
            f">3 s) — rejecting")
        with open(f"/tmp/endurance_wedged_{int(time.time())}.json",
                  "w") as f:
            json.dump(summary, f)
        return False
    frac_ok = summary["recorder_weather"]["unwedged_window_fraction"]
    with open(out, "w") as f:
        json.dump(summary, f)
        f.write("\n")
    log(f"endurance: ACCEPTED (unwedged {frac_ok:.0%}, post-probe "
        f"{post_ms} ms) -> {out}")
    return True


def parse_args(args):
    """Pure CLI parsing; returns an options dict (unit-tested).  Built on
    argparse in strict mode (``allow_abbrev=False``): an unknown or
    typo'd flag, a missing value, or a flag swallowed as another flag's
    value all exit with usage instead of silently starting a default
    full run (which immediately dials the TPU)."""
    p = argparse.ArgumentParser(
        prog="record_artifacts", allow_abbrev=False,
        description="Quiet-window artifact recorder (see module docstring)")
    p.add_argument("--bench", action="store_true",
                   help="refresh bench_details.json (BENCH_CONFIG=all)")
    p.add_argument("--endurance", action="store_true",
                   help="run the endurance soak")
    p.add_argument("--force", action="store_true",
                   help="skip the quiet-window wait (storm fallback; "
                        "meant for --endurance — the bench stage's own "
                        "quiet gate still rejects stormy runs)")
    p.add_argument("--minutes", type=float, default=30.0)
    p.add_argument("--cadence", type=int, default=None)
    p.add_argument("--quiet-ms", type=float, default=9.5, dest="quiet_ms")
    p.add_argument("--out", default="ENDURANCE_r05.json", dest="out_name")
    ns = p.parse_args(args)
    both = not (ns.bench or ns.endurance)
    return {
        "do_bench": ns.bench or both,
        "do_end": ns.endurance or both,
        "minutes": ns.minutes,
        "cadence": ns.cadence,
        "quiet_ms": ns.quiet_ms,
        "out_name": ns.out_name,
        "force": ns.force,
    }


def main():
    o = parse_args(sys.argv[1:])
    minutes, cadence, quiet_ms = o["minutes"], o["cadence"], o["quiet_ms"]
    out_name, force = o["out_name"], o["force"]

    stages = ([("bench", lambda pre: run_bench(quiet_ms))]
              if o["do_bench"] else []) \
        + ([("endurance", lambda pre: run_endurance(
            minutes, cadence, quiet_ms, pre, out_name))]
           if o["do_end"] else [])
    # Under --force, retrying a rejected stage under the same storm cannot
    # succeed for bench (its own quiet gate re-rejects), so cap attempts;
    # and a given-up stage must not abort the ones after it — the
    # endurance stage is the very artifact --force exists to salvage.
    attempts_cap = 2 if force else MAX_ATTEMPTS
    failed = []
    for name, fn in stages:
        for attempt in range(1, attempts_cap + 1):
            if force:
                pre_ms = probe_ms()
                log(f"{name}: --force — running now (probe {pre_ms} "
                    f"ms/frame, quiet < {quiet_ms})")
            else:
                pre_ms = wait_quiet(quiet_ms)
            log(f"{name}: attempt {attempt}/{attempts_cap}")
            if fn(pre_ms):
                break
            time.sleep(PROBE_PERIOD_S)
        else:
            log(f"{name}: gave up after {attempts_cap} attempts — "
                f"continuing to remaining stages")
            failed.append(name)
    if failed:
        log(f"stages NOT recorded: {failed}")
        return 1
    log("all stages recorded")
    return 0


if __name__ == "__main__":
    sys.exit(main())
