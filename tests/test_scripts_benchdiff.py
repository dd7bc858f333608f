"""Tests for scripts/bench_diff.py weather-normalized advisory view
(ADVICE r10: the factor must be the median over NON-regressed shared
queries — otherwise a broad code regression inflates the "host factor"
and the advisory view misreports it as weather — and even-length lists
must use a true median, not the upper-middle element)."""

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts import bench_diff  # noqa: E402


def _run(tmp_path, old, new, capsys):
    op, np_ = tmp_path / "old.json", tmp_path / "new.json"
    op.write_text(json.dumps({"queries": old}))
    np_.write_text(json.dumps({"queries": new}))
    rc = bench_diff.main([str(op), str(np_)])
    return rc, capsys.readouterr().out


def test_broad_code_regression_not_absorbed_as_weather(tmp_path, capsys):
    # 6 of 10 queries regress 3x (code-shaped); the 4 steady ones define
    # the host factor (~1.0). Pre-fix, the median over ALL shared ratios
    # landed inside the regressed mass (3.0) and normalization erased
    # every flag; post-fix all 6 survive.
    old = {f"q{i}": 2.0 for i in range(10)}
    new = {f"q{i}": 6.0 for i in range(6)}
    new.update({f"q{i}": 2.02 for i in range(6, 10)})
    rc, out = _run(tmp_path, old, new, capsys)
    assert rc == 1
    assert "6 flags survive normalization" in out
    assert out.count("CODE-SHAPED") == 6


def test_uniform_host_slowdown_is_weather(tmp_path, capsys):
    # Everything 1.5x slower uniformly: raw flags fire (exit code 1 by
    # contract) but the advisory view attributes all of it to weather.
    old = {f"q{i}": 2.0 for i in range(9)}
    new = {f"q{i}": 3.0 for i in range(9)}
    rc, out = _run(tmp_path, old, new, capsys)
    assert rc == 1  # exit code stays on the raw flags
    assert "0 flags survive normalization" in out


def test_even_count_uses_true_median(tmp_path, capsys):
    # Two non-regressed entries with ratios 1.04 and 1.16 (both under
    # the 1.2 threshold): true median is 1.10. The pre-fix upper-middle
    # pick would print 1.16; assert on the printed factor.
    old = {"a": 10.0, "b": 10.0, "r": 10.0}
    new = {"a": 10.4, "b": 11.6, "r": 23.0}
    rc, out = _run(tmp_path, old, new, capsys)
    assert rc == 1
    assert "weather factor (median ratio): 1.10x" in out


def test_all_regressed_falls_back_to_min_ratio(tmp_path, capsys):
    # Degenerate case: every shared query tripped the raw flag (host
    # 2.5x slower AND one lane regressed further). The fallback must
    # anchor on the SMALLEST ratio — a full-set median would land
    # inside the regressed mass and erase the real flag.
    old = {"a": 2.0, "b": 2.0}
    new = {"a": 5.0, "b": 6.4}
    rc, out = _run(tmp_path, old, new, capsys)
    assert rc == 1
    assert "weather factor (median ratio): 2.50x" in out
    assert "1 flags survive normalization" in out
    assert "CODE-SHAPED 1.28x  b" in out


if __name__ == "__main__":
    raise SystemExit(pytest.main([__file__, "-q"]))
