"""scripts/bench_summary.py — the throughput single-source-of-truth
renderer (VERDICT r4 item 7).

Docs quote this script's derivation of benchmarks/bench_history.jsonl;
these tests pin the parts that keep it honest: contended rows (lock-flagged
or denylisted) never enter the headline, and the headline is the median of
the most recent K clean TPU rows.
"""

import importlib.util
import json
import os
import sys

_spec = importlib.util.spec_from_file_location(
    "bench_summary",
    os.path.join(os.path.dirname(__file__), "..", "scripts",
                 "bench_summary.py"))
bench_summary = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(bench_summary)


def _row(value, ts, backend="tpu", lock=None):
    r = {"metric": "m", "value": value, "unit": "u", "vs_baseline": 100.0,
         "ts": ts, "backend": backend}
    if lock is not None:
        r["chip_lock"] = lock
    return r


class TestIsContended:
    def test_clean_locked_row(self):
        assert not bench_summary.is_contended(_row(4.2, 10, lock={
            "acquired": True, "waited_s": 0.0, "contended": False}))

    def test_lock_contended_flag(self):
        assert bench_summary.is_contended(_row(3.4, 10, lock={
            "acquired": True, "waited_s": 60.0, "contended": True}))

    def test_lock_timeout_unacquired(self):
        assert bench_summary.is_contended(_row(3.4, 10, lock={
            "acquired": False, "waited_s": 2700.0, "contended": True}))

    def test_pre_lock_row_defaults_clean(self):
        assert not bench_summary.is_contended(_row(4.2, 10))

    def test_known_contended_denylist(self):
        """The round-4 driver bench that fired mid-campaign (3.452
        steps/s) is excluded by timestamp."""
        ts = next(iter(bench_summary.KNOWN_CONTENDED_TS))
        assert bench_summary.is_contended(_row(3.452, ts))


class TestHeadline:
    def test_median_of_recent_clean_rows(self):
        rows = [_row(4.0, 1), _row(4.2, 2), _row(4.1, 3), _row(4.3, 4)]
        h = bench_summary.headline(rows, k=3)
        assert h["steps_per_sec"] == 4.2  # median of {4.2, 4.1, 4.3}
        assert h["n"] == 3

    def test_contended_and_cpu_rows_excluded(self):
        ts = next(iter(bench_summary.KNOWN_CONTENDED_TS))
        rows = [_row(4.2, 1), _row(4.2, 2),
                _row(3.4, ts),                      # denylisted
                _row(3.0, ts + 10, lock={"acquired": True, "waited_s": 9,
                                         "contended": True}),  # lock-flagged
                _row(9.9, ts + 20, backend="cpu")]  # wrong backend
        h = bench_summary.headline(rows, k=3)
        assert h["steps_per_sec"] == 4.2
        assert h["n"] == 2

    def test_no_rows_returns_none(self):
        assert bench_summary.headline([_row(1.0, 1, backend="cpu")]) is None

    def test_real_history_has_clean_headline(self):
        """The shipped history must always yield a clean headline ≥ the
        4.17 round-3 floor — a regression here means someone polluted
        the history or broke the derivation docs point at."""
        rows = bench_summary.load_rows()
        h = bench_summary.headline(rows)
        assert h is not None
        assert h["steps_per_sec"] >= 4.1
