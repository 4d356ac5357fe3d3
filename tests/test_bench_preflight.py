"""bench.py _wait_for_backend: the outage preflight must retry until
the probe subprocess succeeds and give up (returning False, not
raising) past the deadline."""

import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench


def test_preflight_returns_on_healthy(monkeypatch):
    calls = []

    def fake_run(*a, **k):
        calls.append(a)
        return subprocess.CompletedProcess(a, 0)

    monkeypatch.setattr(subprocess, "run", fake_run)
    assert bench._wait_for_backend(deadline_s=10) is True
    assert len(calls) == 1


def test_preflight_retries_then_recovers(monkeypatch):
    state = {"n": 0}

    def fake_run(cmd, timeout=None, **k):
        state["n"] += 1
        if state["n"] < 3:
            raise subprocess.TimeoutExpired(cmd, timeout)
        return subprocess.CompletedProcess(cmd, 0)

    monkeypatch.setattr(subprocess, "run", fake_run)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    assert bench._wait_for_backend(deadline_s=1e9) is True
    assert state["n"] == 3


def test_preflight_gives_up_past_deadline(monkeypatch):
    def fake_run(cmd, timeout=None, **k):
        raise subprocess.TimeoutExpired(cmd, timeout)

    t = {"now": 0.0}
    monkeypatch.setattr(subprocess, "run", fake_run)
    monkeypatch.setattr(bench.time, "time", lambda: t["now"])

    def advance(s):
        t["now"] += s

    monkeypatch.setattr(bench.time, "sleep", advance)
    assert bench._wait_for_backend(deadline_s=100) is False
