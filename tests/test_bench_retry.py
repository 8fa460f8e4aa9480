"""bench.py outage resilience: a transient tunnel blip must not null a
round's number (VERDICT r3 item 9).  The retry loop re-attempts
backend-unavailable failures and the one-JSON-line contract holds on
both the success-after-retry and the outage-outlasts-retries paths."""

import importlib.util
import json
import os
import sys

import pytest

_BENCH_PATH = os.path.join(os.path.dirname(__file__), "..", "bench.py")
_spec = importlib.util.spec_from_file_location("bench_module", _BENCH_PATH)
bench = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(bench)


@pytest.fixture(autouse=True)
def _fast_retry(monkeypatch):
    monkeypatch.setenv("BENCH_RETRY_ATTEMPTS", "3")
    monkeypatch.setenv("BENCH_RETRY_DELAY_S", "0")
    # tests must never touch the real backend (and never hang): pretend
    # the probe subprocess said "up" unless a test overrides it
    monkeypatch.setattr(bench, "_probe_backend", lambda t: True)


def test_hung_backend_probe_emits_error_json(monkeypatch, capsys):
    """2026-08-18 outage mode: jax.devices() HANGS instead of raising.
    The subprocess probe must convert that into the error JSON instead
    of hanging the driver forever."""
    monkeypatch.setattr(bench, "_probe_backend", lambda t: False)
    called = []
    monkeypatch.setattr(bench, "main", lambda: called.append(1))
    with pytest.raises(SystemExit):
        bench._run_with_retry()
    assert not called  # main never ran — the probe gated it
    rec = json.loads(capsys.readouterr().out.strip())
    assert rec["value"] is None
    assert "probe timed out" in rec["detail"]["error"]


def test_outage_emits_one_error_json_after_bounded_retries(
        monkeypatch, capsys):
    calls = []

    def down():
        calls.append(1)
        raise RuntimeError(
            "Unable to initialize backend 'axon': UNAVAILABLE: tunnel")

    monkeypatch.setattr(bench, "main", down)
    with pytest.raises(SystemExit) as exc:
        bench._run_with_retry()
    assert exc.value.code == 1
    assert len(calls) == 3
    out_lines = capsys.readouterr().out.strip().splitlines()
    assert len(out_lines) == 1  # ONE JSON line, even on outage
    rec = json.loads(out_lines[0])
    assert rec["metric"] == "nv12_4k_clahe_fps_per_chip"
    assert rec["value"] is None
    assert rec["detail"]["attempts"] == 3


def test_transient_blip_recovers_without_error_json(monkeypatch, capsys):
    state = {"n": 0}

    def flaky():
        state["n"] += 1
        if state["n"] < 3:
            raise RuntimeError("UNAVAILABLE: transient")
        print(json.dumps({"metric": "nv12_4k_clahe_fps_per_chip",
                          "value": 695.0, "unit": "fps",
                          "vs_baseline": 11.58}))

    monkeypatch.setattr(bench, "main", flaky)
    bench._run_with_retry()  # must not raise
    out_lines = capsys.readouterr().out.strip().splitlines()
    assert len(out_lines) == 1
    assert json.loads(out_lines[0])["value"] == 695.0


def test_non_backend_errors_propagate(monkeypatch):
    def broken():
        raise RuntimeError("shape mismatch")

    monkeypatch.setattr(bench, "main", broken)
    with pytest.raises(RuntimeError, match="shape mismatch"):
        bench._run_with_retry()
