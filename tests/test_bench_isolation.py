"""Behavioral pins for bench.py's isolated-metric child machinery.

The driver's BENCH record depends on every isolated child getting enough
wall-clock to finish a warm-cache run: round 4 saw a cold headline
recompile (~400 s after a tunnel restart) drain the parent budget so the
final child was spawned with a 240 s remainder and SIGKILLed
mid-measurement; later in round 5 a FIXED kill timer SIGKILLed the
flagship child mid-cold-compile (and mid-remote-compile kills take the
tunnel down). These tests pin the 330 s child-budget floor and the
probe-before-kill soft/hard deadline scheme so a refactor can't quietly
reintroduce either failure mode.
"""

import json
import subprocess

import bench


class _FakeProc:
    def __init__(self, lines):
        self.stdout = iter(lines)

    def wait(self, timeout=None):
        return 0

    def kill(self):  # pragma: no cover - never hit with instant lines
        raise AssertionError("fake child should not be killed")


def _run_with_fakes(monkeypatch, budget_left, lines=("",),
                    name="some_metric"):
    captured = {}

    def fake_popen(cmd, stdout=None, stderr=None, env=None, text=None):
        captured["env"] = env
        return _FakeProc(list(lines))

    monkeypatch.setattr(subprocess, "Popen", fake_popen)
    bench._run_isolated(name, budget_left)
    return captured


def test_flagship_child_budget_floored_at_330s(monkeypatch):
    # A starved remainder (e.g. 240 s left after a cold recompile) must
    # not pass through to the FLAGSHIP child: it needs ~280 s warm.
    cap = _run_with_fakes(
        monkeypatch, budget_left=50.0, name=bench._FLOOR_METRIC
    )
    assert float(cap["env"]["SAID_BENCH_BUDGET_S"]) == 330.0
    # the soft deadline must match the floored budget, not the remainder
    assert bench._child_deadlines(bench._FLOOR_METRIC, 330.0)[0] == 450.0


def test_cold_world_scales_flagship_floor_and_deadlines(monkeypatch):
    # After a tunnel restart every cache key changes, so the flagship
    # child faces a 750 s (idle host) to 1400+ s (loaded host) cold
    # chain compile — the warm-world 330 s floor and 900 s-class
    # deadlines would guarantee a rc=-9 kill. Once a headline-class
    # compile proves the world cold, floor and deadlines must scale.
    before = list(bench._COLD_WORLD)
    bench._COLD_WORLD[:] = [599.0]
    try:
        cap = _run_with_fakes(
            monkeypatch, budget_left=50.0, name=bench._FLOOR_METRIC
        )
        assert float(cap["env"]["SAID_BENCH_BUDGET_S"]) == 1150.0
        soft, hard = bench._child_deadlines(bench._FLOOR_METRIC, 1150.0)
        assert soft == min(1150.0 + 120.0, 1400.0)
        # the hard cap must clear the worst measured cold compile
        # (1414 s headline under host load, round 5) with margin
        assert hard >= 3600.0
    finally:
        bench._COLD_WORLD[:] = before


def test_soft_deadline_never_kills_outright():
    # Round-5 post-mortem: a fixed kill timer SIGKILLed the flagship
    # child at 1270 s while its cold compile was still progressing,
    # losing the metric AND (mid-remote-compile kill) the tunnel. The
    # deadline scheme must always leave probe-then-extend headroom
    # between soft and hard.
    for name in ("some_metric", bench._FLOOR_METRIC):
        for budget in (100.0, 500.0, 2000.0):
            soft, hard = bench._child_deadlines(name, budget)
            assert hard >= soft + 600.0


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
    assert bench._child_deadlines("some_metric", 500.0)[0] == 500.0 + 120.0


class _HungProc:
    """A child that never exits until killed."""

    def __init__(self):
        self.stdout = iter(())
        self.killed = False

    def wait(self, timeout=None):
        if self.killed:
            return -9
        raise subprocess.TimeoutExpired("child", timeout)

    def kill(self):
        self.killed = True


def _run_hung(monkeypatch, probe_answers):
    proc = _HungProc()
    monkeypatch.setattr(subprocess, "Popen", lambda *a, **k: proc)
    answers = list(probe_answers)
    probes = []

    def fake_probe(wait_s):
        probes.append(wait_s)
        return answers.pop(0) if answers else False

    monkeypatch.setattr(bench, "_probe_backend", fake_probe)
    before = (list(bench._CHILD_RCS), list(bench._SKIPS),
              list(bench._BACKEND_DEAD))
    try:
        bench._run_isolated("some_metric", 100.0)
        return proc, probes, list(bench._SKIPS), list(bench._BACKEND_DEAD)
    finally:
        bench._CHILD_RCS[:] = before[0]
        bench._SKIPS[:] = before[1]
        bench._BACKEND_DEAD[:] = before[2]


def test_hung_child_killed_when_backend_dead(monkeypatch, capsys):
    # Soft deadline expires, the backend probe FAILS -> the child is
    # hung on a dead tunnel: kill it, emit the skip, and flag the dead
    # backend so the parent never touches the device in-process.
    proc, probes, skips, dead = _run_hung(monkeypatch, probe_answers=[])
    assert proc.killed
    assert "some_metric" in skips
    assert dead  # post-kill health check failed -> device metrics gated
    assert len(probes) >= 2  # deadline probe + post-kill health check
    capsys.readouterr()


def test_hung_child_extended_while_backend_healthy(monkeypatch, capsys):
    # Round-5 post-mortem pin: while the backend answers, an
    # over-deadline child is presumed mid-compile and must NOT be
    # killed — the deadline extends (to the hard cap) instead.
    proc, probes, skips, dead = _run_hung(
        monkeypatch, probe_answers=[True, False]
    )
    assert proc.killed  # killed only on the SECOND expiry (probe dead)
    captured = capsys.readouterr()
    assert len(probes) >= 3  # extend probe, kill probe, health check
    assert "deadline extended" in captured.err


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
