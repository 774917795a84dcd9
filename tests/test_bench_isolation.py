"""Behavioral pins for bench.py's isolated-metric child machinery.

The driver's BENCH record depends on every isolated child getting enough
wall-clock to finish a warm-cache run: round 4 saw a cold headline
recompile (~400 s after a tunnel restart) drain the parent budget so the
final child was spawned with a 240 s remainder and SIGKILLed
mid-measurement. These tests pin the 330 s child-budget floor and the
matching kill-timer so a refactor can't quietly reintroduce starvation.
"""

import json
import subprocess
import threading

import bench


class _FakeProc:
    def __init__(self, lines):
        self.stdout = iter(lines)

    def wait(self):
        return 0

    def kill(self):  # pragma: no cover - never hit with instant lines
        raise AssertionError("fake child should not be killed")


def _run_with_fakes(monkeypatch, budget_left, lines=("",),
                    name="some_metric"):
    captured = {}

    def fake_popen(cmd, stdout=None, stderr=None, env=None, text=None):
        captured["env"] = env
        return _FakeProc(list(lines))

    real_timer = threading.Timer

    def fake_timer(interval, fn):
        captured["timeout"] = interval
        return real_timer(interval, fn)

    monkeypatch.setattr(subprocess, "Popen", fake_popen)
    monkeypatch.setattr(threading, "Timer", fake_timer)
    bench._run_isolated(name, budget_left)
    return captured


def test_flagship_child_budget_floored_at_330s(monkeypatch):
    # A starved remainder (e.g. 240 s left after a cold recompile) must
    # not pass through to the FLAGSHIP child: it needs ~280 s warm.
    cap = _run_with_fakes(
        monkeypatch, budget_left=50.0, name=bench._FLOOR_METRIC
    )
    assert float(cap["env"]["SAID_BENCH_BUDGET_S"]) == 330.0
    # the kill timer must match the floored budget, not the remainder
    assert cap["timeout"] == 330.0 + 120.0


def test_cold_world_scales_flagship_floor_and_timer(monkeypatch):
    # After a tunnel restart every cache key changes, so the flagship
    # child faces a ~750 s cold chain compile — the warm-world 330 s
    # floor (and 900 s kill cap) would guarantee a rc=-9 kill. Once a
    # headline-class compile proves the world cold, both must scale.
    before = list(bench._COLD_WORLD)
    bench._COLD_WORLD[:] = [599.0]
    try:
        cap = _run_with_fakes(
            monkeypatch, budget_left=50.0, name=bench._FLOOR_METRIC
        )
        assert float(cap["env"]["SAID_BENCH_BUDGET_S"]) == 1150.0
        assert cap["timeout"] == min(1150.0 + 120.0, 1400.0)
    finally:
        bench._COLD_WORLD[:] = before


def test_non_flagship_child_is_not_floored(monkeypatch, capsys):
    # Other risky children never get the floor: flooring each would let
    # a nearly-exhausted run overshoot its budget by ~450 s per child.
    # A workable remainder passes through unchanged ...
    cap = _run_with_fakes(monkeypatch, budget_left=200.0)
    assert float(cap["env"]["SAID_BENCH_BUDGET_S"]) == 200.0
    capsys.readouterr()
    # ... and a remainder below child-startup cost skips with an
    # explicit line instead of spawning a doomed child.
    before = list(bench._SKIPS)
    try:
        bench._run_isolated("some_metric", 30.0)
        out = capsys.readouterr().out
        assert "time_budget" in out and "some_metric" in out
    finally:
        bench._SKIPS[:] = before


def test_child_budget_passes_through_when_ample(monkeypatch):
    cap = _run_with_fakes(monkeypatch, budget_left=500.0)
    assert float(cap["env"]["SAID_BENCH_BUDGET_S"]) == 500.0
    assert cap["timeout"] == 500.0 + 120.0


def test_child_env_marks_child_and_skips_probe(monkeypatch):
    cap = _run_with_fakes(monkeypatch, budget_left=400.0)
    assert cap["env"]["SAID_BENCH_CHILD"] == "1"
    assert cap["env"]["SAID_BENCH_SKIP_PROBE"] == "1"
    assert "SAID_BENCH_FORCE_ISOLATE" not in cap["env"]


def test_child_skip_lines_reach_the_run_summary(monkeypatch, capsys):
    # A metric that fails INSIDE a child is caught by the child's own
    # metric loop, which prints the skip line and exits rc=0 — the
    # parent must fold that skip into _SKIPS or bench_run_summary
    # claims all-green after an isolated metric silently failed.
    before = list(bench._SKIPS)
    line = json.dumps(
        {"metric": "parity_mae_vs_torch", "skipped": "error: boom"}
    )
    try:
        _run_with_fakes(monkeypatch, budget_left=400.0, lines=[line + "\n"])
        assert "parity_mae_vs_torch" in bench._SKIPS
        assert line in capsys.readouterr().out
    finally:
        bench._SKIPS[:] = before


def test_worst_child_rc_semantics():
    # zero only when every child exited clean; positive codes must not
    # be masked by a clean sibling; signal kills surface by magnitude
    assert bench._worst_rc([]) == 0
    assert bench._worst_rc([0, 0]) == 0
    assert bench._worst_rc([0, 1]) == 1
    assert bench._worst_rc([-9, 0]) == -9
    assert bench._worst_rc([-9, 1]) == -9


def test_child_value_lines_reach_the_closing_reemit(monkeypatch, capsys):
    # Value lines streamed from a child are recorded in _VALUE_LINES so
    # the closing headline re-emit (driver 'parsed' field protection)
    # can see them.
    before = list(bench._VALUE_LINES)
    line = json.dumps(
        {"metric": "rtf_1000step_b1_360s", "value": 4.7, "unit": "x_realtime"}
    )
    try:
        _run_with_fakes(monkeypatch, budget_left=400.0, lines=[line + "\n"])
        assert line in bench._VALUE_LINES
        assert line in capsys.readouterr().out
    finally:
        bench._VALUE_LINES[:] = before
