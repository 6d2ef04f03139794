"""The canary-normalized bench instrument (r14, VERDICT r13 item 1).

``tools/normalize_bench.py`` + ``tools/pin_bench_calibration.py`` are
now the PRIMARY driver-adjudication instrument — a math bug here flags
phantom regressions or hides real ones — so the math is pinned like
any operator: canary_mult is the median canary inflation, a shaped
session normalizes to itself, bands follow the documented
0.85·min / 1.15·max(sessions, slow samples) rule with PER-SAMPLE
excludes, and the verdict classes (non-canary OVER / UNDER-never-fails
/ canary-by-sessions) count exactly as documented.

Pure-python: no SparkSession, loads the tools by path.
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys

import pytest

TOOLS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")


def _load(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(TOOLS, f"{name}.py")
    )
    mod = importlib.util.module_from_spec(spec)
    sys.path.insert(0, TOOLS)
    try:
        spec.loader.exec_module(mod)
    finally:
        sys.path.pop(0)
    return mod


NB = _load("normalize_bench")


def _cal(canaries, medians):
    return {"canaries": canaries, "session_median": medians}


class TestCanaryMult:
    def test_median_of_inflations_odd(self):
        cal = _cal(["a", "b", "c"], {"a": 1.0, "b": 2.0, "c": 4.0})
        q = {"a": 1.5, "b": 2.0, "c": 8.0}  # inflations 1.5, 1.0, 2.0
        assert NB.canary_mult(q, cal) == 1.5

    def test_median_of_inflations_even(self):
        cal = _cal(["a", "b"], {"a": 1.0, "b": 1.0})
        q = {"a": 1.0, "b": 2.0}
        assert NB.canary_mult(q, cal) == pytest.approx(1.5)

    def test_missing_canaries_are_skipped(self):
        cal = _cal(["a", "b", "zzz"], {"a": 1.0, "b": 1.0, "zzz": 1.0})
        q = {"a": 2.0, "b": 2.0}
        assert NB.canary_mult(q, cal) == 2.0

    def test_no_canaries_is_fatal(self):
        cal = _cal(["x"], {"x": 1.0})
        with pytest.raises(SystemExit):
            NB.canary_mult({"a": 1.0}, cal)

    def test_session_normalizes_to_itself(self):
        """A run whose canaries all sit AT their pinned medians has
        mult exactly 1 — the defining fixed point."""
        med = {f"c{i}": 0.1 * (i + 1) for i in range(12)}
        cal = _cal(sorted(med), dict(med))
        assert NB.canary_mult(dict(med), cal) == 1.0

    def test_uniform_slowdown_divides_out(self):
        """A 2x-everything run normalizes every entry back to its
        quiet-box value — the mode the instrument was built for."""
        med = {"a": 1.0, "b": 2.0, "c": 3.0}
        cal = _cal(["a", "b", "c"], dict(med))
        q = {k: 2 * v for k, v in med.items()}
        q["heavy"] = 20.0
        m = NB.canary_mult(q, cal)
        assert m == 2.0
        assert q["heavy"] / m == 10.0


class TestLoadQueries:
    def test_driver_bench_json(self, tmp_path):
        p = tmp_path / "BENCH_rX.json"
        p.write_text(json.dumps({"parsed": {"queries": {"a": 1.0}}}))
        assert NB.load_queries(str(p)) == {"a": 1.0}

    def test_bare_json_line(self, tmp_path):
        p = tmp_path / "out.log"
        p.write_text("noise\n" + json.dumps({"queries": {"a": 2.0}}) + "\n")
        assert NB.load_queries(str(p)) == {"a": 2.0}

    def test_no_json_is_fatal(self, tmp_path):
        p = tmp_path / "empty.log"
        p.write_text("nothing here\n")
        with pytest.raises(SystemExit):
            NB.load_queries(str(p))


def _write_session(tmp_path, name, queries):
    p = tmp_path / name
    p.write_text(json.dumps({"queries": queries}) + "\n")
    return str(p)


def _run_pin(tmp_path, monkeypatch, cal, argv):
    """Run pin_bench_calibration.main() against a sandboxed CAL_PATH."""
    PIN = _load("pin_bench_calibration")
    cal_path = tmp_path / "cal.json"
    cal_path.write_text(json.dumps(cal))
    monkeypatch.setattr(PIN, "CAL_PATH", str(cal_path))
    monkeypatch.setattr(sys, "argv", ["pin"] + argv)
    PIN.main()
    return json.loads(cal_path.read_text())


class TestPinBands:
    CANARIES = ["c1", "c2", "c3"]

    def _sessions(self, tmp_path):
        # three sessions; session 3 runs uniformly 2x slow (mult 2),
        # so its normalized readings equal the quiet sessions'
        base = {"c1": 1.0, "c2": 2.0, "c3": 3.0, "heavy": 10.0}
        s1 = _write_session(tmp_path, "s1.log", base)
        s2 = _write_session(
            tmp_path, "s2.log", {k: v * 1.1 for k, v in base.items()}
        )
        s3 = _write_session(
            tmp_path, "s3.log", {k: v * 2.0 for k, v in base.items()}
        )
        return [s1, s2, s3]

    def test_band_rule(self, tmp_path, monkeypatch):
        logs = self._sessions(tmp_path)
        out = _run_pin(
            tmp_path,
            monkeypatch,
            {"canaries": self.CANARIES},
            logs,
        )
        lo, hi = out["bands_normalized"]["heavy"]
        # medians are pinned from the sessions themselves, so every
        # session normalizes heavy to the MEDIAN session's value
        # (11.0): s1 mult 1/1.1, s2 mult 1, s3 mult 2/1.1
        assert lo == pytest.approx(0.85 * 11.0, abs=0.01)
        assert hi == pytest.approx(1.15 * 11.0, abs=0.01)
        # medians pinned per entry over the RAW sessions
        assert out["session_median"]["heavy"] == pytest.approx(11.0)

    def test_slow_sample_raises_top_only(self, tmp_path, monkeypatch):
        logs = self._sessions(tmp_path)
        slow = _write_session(
            tmp_path,
            "driver.log",
            # canaries at pinned medians (mult 1), heavy 2x: an
            # entry-specific residual the top must absorb next round
            {"c1": 1.1, "c2": 2.2, "c3": 3.3, "heavy": 22.0},
        )
        base = _run_pin(
            tmp_path, monkeypatch, {"canaries": self.CANARIES}, logs
        )
        out = _run_pin(
            tmp_path,
            monkeypatch,
            {"canaries": self.CANARIES},
            logs + ["--slow-sample", slow],
        )
        lo, hi = out["bands_normalized"]["heavy"]
        assert lo == base["bands_normalized"]["heavy"][0]  # bottom unchanged
        assert hi == pytest.approx(1.15 * 22.0, abs=0.01)

    def test_per_sample_exclude(self, tmp_path, monkeypatch):
        """--exclude after a --slow-sample drops only that sample's
        entries: the excluded entry's top stays sessions-only while the
        same sample still folds its other entries."""
        logs = self._sessions(tmp_path)
        slow = _write_session(
            tmp_path,
            "driver.log",
            {"c1": 1.1, "c2": 2.2, "c3": 3.3, "heavy": 22.0, "other": 99.0},
        )
        sessions_with_other = [
            _write_session(
                tmp_path,
                f"so{i}.log",
                dict(json.loads(open(p).read())["queries"], other=5.0),
            )
            for i, p in enumerate(logs)
        ]
        out = _run_pin(
            tmp_path,
            monkeypatch,
            {"canaries": self.CANARIES},
            sessions_with_other
            + ["--slow-sample", slow, "--exclude", "heavy"],
        )
        # heavy: excluded from the slow fold -> sessions-only top
        # (11.0 = the median session's normalized reading)
        assert out["bands_normalized"]["heavy"][1] == pytest.approx(
            1.15 * 11.0, abs=0.01
        )
        # other: same sample still folds -> top from the slow reading
        assert out["bands_normalized"]["other"][1] == pytest.approx(
            1.15 * 99.0, abs=0.1
        )

    def test_needs_three_sessions(self, tmp_path, monkeypatch):
        logs = self._sessions(tmp_path)[:2]
        with pytest.raises(SystemExit):
            _run_pin(
                tmp_path, monkeypatch, {"canaries": self.CANARIES}, logs
            )


class TestShippedCalibration:
    """The calibration actually shipped must be internally coherent."""

    def setup_method(self):
        with open(os.path.join(TOOLS, "bench_calibration.json")) as fh:
            self.cal = json.load(fh)

    def test_canaries_have_medians_and_bands(self):
        for c in self.cal["canaries"]:
            assert c in self.cal["session_median"], c
            assert c in self.cal["bands_normalized"], c

    def test_bands_well_formed(self):
        for k, (lo, hi) in self.cal["bands_normalized"].items():
            assert 0 < lo < hi, k

    def test_every_recorded_r14_session_reads_clean(self):
        """The shipped pin's defining property: zero non-canary OVER
        across every r14 shaped session (the only OVER anywhere is the
        r13 driver's pre-fix q54 — checked in its own assertion)."""
        runs_dir = os.path.join(TOOLS, "driver_shape_runs")
        sessions = sorted(
            f
            for f in os.listdir(runs_dir)
            if f.startswith("session_") and f.endswith("_r14.stdout.log")
        )
        assert len(sessions) >= 8
        for s in sessions:
            q = NB.load_queries(os.path.join(runs_dir, s))
            mult = NB.canary_mult(q, self.cal)
            overs = [
                k
                for k, v in q.items()
                if k in self.cal["bands_normalized"]
                and k not in self.cal["canaries"]
                and v / mult > self.cal["bands_normalized"][k][1]
            ]
            assert overs == [], (s, overs)

    def test_r13_driver_flags_exactly_prefix_q54(self):
        p = os.path.join(
            os.path.dirname(TOOLS), "BENCH_r13.json"
        )
        q = NB.load_queries(p)
        mult = NB.canary_mult(q, self.cal)
        overs = sorted(
            k
            for k, v in q.items()
            if k in self.cal["bands_normalized"]
            and k not in self.cal["canaries"]
            and v / mult > self.cal["bands_normalized"][k][1]
        )
        assert overs == ["q54_embedding_near_dedup"]
