"""Unit tests for the artifact recorder's pure parts
(tools/record_artifacts.py): the endurance acceptance judgment
(``judge_endurance`` — weather annotation + wedge-domination gate, the
round-4 verdict's ask #5) and CLI parsing (``parse_args`` — a typo'd
flag must not silently start a default full run that dials the TPU;
that exact accident cost one stale-claim window this round).

The recorder itself is an unattended TPU-holding harness (see its
docstring) and is exercised only on real hardware; everything
judgment-shaped in it is kept pure and pinned here, the same discipline
as tools/endurance.py's ``judge_windows`` (tests/test_endurance_judge.py).
"""

import importlib.util
import os
import sys

import pytest

WEDGE_READ_MS = 3000.0


def _load():
    tools = os.path.join(os.path.dirname(__file__), "..", "tools")
    spec = importlib.util.spec_from_file_location(
        "record_artifacts", os.path.join(tools, "record_artifacts.py"))
    mod = importlib.util.module_from_spec(spec)
    sys.modules["record_artifacts"] = mod
    spec.loader.exec_module(mod)
    return mod


ra = _load()


def _summary(read_ms_per_window):
    return {
        "minutes": 30,
        "windows_detail": [{"max_flush_read_ms": ms}
                           for ms in read_ms_per_window],
    }


class TestJudgeEndurance:
    def test_quiet_run_accepted_and_annotated(self):
        accept, s = ra.judge_endurance(
            _summary([12.0, 40.0, 8.0, 15.0]), pre_probe_ms=7.1,
            post_ms=6.9, quiet_ms=9.5, wedge_read_ms=WEDGE_READ_MS)
        assert accept
        rw = s["recorder_weather"]
        assert rw["pre_probe_device_ms"] == 7.1
        assert rw["post_probe_device_ms"] == 6.9
        assert rw["post_probe_quiet"] is True
        assert rw["windows"] == 4 and rw["wedge_windows"] == 0
        assert rw["unwedged_window_fraction"] == 1.0

    def test_wedge_dominated_run_rejected(self):
        # 3 of 4 windows parked past the 3 s wedge threshold -> 0.25 < 0.6
        accept, s = ra.judge_endurance(
            _summary([5000.0, 9000.0, 12.0, 3500.0]), pre_probe_ms=7.0,
            post_ms=7.0, quiet_ms=9.5, wedge_read_ms=WEDGE_READ_MS)
        assert not accept
        rw = s["recorder_weather"]
        assert rw["wedge_windows"] == 3
        assert rw["unwedged_window_fraction"] == 0.25

    def test_minority_wedges_tolerated(self):
        # 1 of 4 wedged (0.75 >= 0.6): real relays park reads 10 s-17 min
        # (CLAUDE.md) and the soak's verdict already excludes those windows.
        accept, _ = ra.judge_endurance(
            _summary([4000.0, 12.0, 9.0, 14.0]), pre_probe_ms=7.0,
            post_ms=7.0, quiet_ms=9.5, wedge_read_ms=WEDGE_READ_MS)
        assert accept

    def test_stormy_probes_annotated_but_not_rejecting(self):
        # The wedge gate judges the RUN; storm-level service rates are
        # annotated honestly (post_probe_quiet False) without rejecting —
        # this is what makes the --force fallback artifact meaningful.
        accept, s = ra.judge_endurance(
            _summary([20.0, 25.0]), pre_probe_ms=27.0, post_ms=26.9,
            quiet_ms=9.5, wedge_read_ms=WEDGE_READ_MS)
        assert accept
        rw = s["recorder_weather"]
        assert rw["post_probe_quiet"] is False
        assert rw["pre_probe_device_ms"] == 27.0

    def test_failed_post_probe_is_none_not_quiet(self):
        accept, s = ra.judge_endurance(
            _summary([10.0]), pre_probe_ms=7.0, post_ms=None,
            quiet_ms=9.5, wedge_read_ms=WEDGE_READ_MS)
        assert accept
        rw = s["recorder_weather"]
        assert rw["post_probe_device_ms"] is None
        assert rw["post_probe_quiet"] is False

    def test_empty_windows_accepts_without_division_error(self):
        accept, s = ra.judge_endurance(
            _summary([]), pre_probe_ms=7.0, post_ms=7.0, quiet_ms=9.5,
            wedge_read_ms=WEDGE_READ_MS)
        assert accept
        assert s["recorder_weather"]["windows"] == 0


class TestParseArgs:
    def test_defaults_run_both_stages(self):
        o = ra.parse_args([])
        assert o["do_bench"] and o["do_end"] and not o["force"]
        assert o["minutes"] == 30.0 and o["quiet_ms"] == 9.5
        assert o["cadence"] is None
        assert o["out_name"] == "ENDURANCE_r05.json"

    def test_stage_selection(self):
        assert not ra.parse_args(["--bench"])["do_end"]
        assert not ra.parse_args(["--endurance"])["do_bench"]
        both = ra.parse_args(["--bench", "--endurance"])
        assert both["do_bench"] and both["do_end"]

    def test_valued_flags(self):
        o = ra.parse_args(["--endurance", "--minutes", "150", "--cadence",
                           "512", "--quiet-ms", "8.0", "--out",
                           "ENDURANCE_long.json", "--force"])
        assert o["minutes"] == 150.0 and o["cadence"] == 512
        assert o["quiet_ms"] == 8.0
        assert o["out_name"] == "ENDURANCE_long.json"
        assert o["force"]

    def test_unknown_flag_refused(self):
        # `--help` (or any typo) must NOT fall through to the default
        # both-stages run: the first thing that run does is probe the TPU.
        with pytest.raises(SystemExit):
            ra.parse_args(["--help"])
        with pytest.raises(SystemExit):
            ra.parse_args(["--benhc"])

    def test_missing_value_refused(self):
        # A valued flag with the value forgotten must exit with usage,
        # not crash later with a bare IndexError.
        with pytest.raises(SystemExit):
            ra.parse_args(["--endurance", "--minutes"])

    def test_flag_swallowed_as_value_refused(self):
        # `--out --endurance` must NOT silently set out_name to the
        # literal string "--endurance" and flip the stage selection —
        # that misparse still dials the TPU and writes a repo file
        # named like a flag.
        with pytest.raises(SystemExit):
            ra.parse_args(["--out", "--endurance"])
        with pytest.raises(SystemExit):
            ra.parse_args(["--minutes", "--force"])

    def test_no_abbreviation(self):
        # Prefix matching would let `--ben` quietly select the bench
        # stage; strict mode refuses it.
        with pytest.raises(SystemExit):
            ra.parse_args(["--ben"])
