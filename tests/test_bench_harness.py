"""Hermetic tests for bench.py's driver-attested LLM extras plumbing.

bench.py is the one script the round driver runs unattended on the real
chip; a regression in its child-output parsing or failure isolation
costs the round's official numbers.  These tests stub subprocess.run so
no device is touched.
"""

import json
import subprocess
import sys
import types

import pytest

sys.path.insert(0, ".")
import bench  # noqa: E402  (repo-root module)


class _Proc:
    def __init__(self, rc, stdout="", stderr=""):
        self.returncode = rc
        self.stdout = stdout
        self.stderr = stderr


def test_extras_parse_child_json(monkeypatch):
    row = {"case": "decode_b8", "value": 3.5, "unit": "ms/step",
           "tok_per_s": 2900.0, "pct_of_floor": 61.0}

    def fake_run(cmd, **kw):
        assert "--llm-child" in cmd
        return _Proc(0, stdout="noise\n" + json.dumps(row) + "\n")

    monkeypatch.setattr(subprocess, "run", fake_run)
    extras = bench._collect_llm_extras(weather_clean=True)
    for case, prefix, _ in bench.LLM_EXTRAS:
        assert extras[f"{prefix}_ms_per_step"] == 3.5
        assert extras[f"{prefix}_tok_s"] == 2900.0
        assert extras[f"{prefix}_pct_of_floor"] == 61.0


def test_extras_case_names_exist():
    """Every LLM_EXTRAS case must resolve in scripts/bench_llm.py — a
    renamed case would otherwise only fail mid-capture on the chip."""
    import os.path as _osp
    import sys as _sys

    repo = _osp.dirname(_osp.dirname(_osp.abspath(__file__)))
    _sys.path.insert(0, _osp.join(repo, "scripts"))
    from bench_llm import CASES

    for case, _, _ in bench.LLM_EXTRAS:
        assert case in CASES, case


def test_extras_parse_reconcile_row(monkeypatch):
    """The reconciliation pair (VERDICT r4 #1) lands BOTH interleaved b1
    readings on the official line."""
    row = {"case": "reconcile_7b_b1", "value": 10.06,
           "unit": "ms/step (decode_7b_int8 leg, median of 3 interleaved)",
           "kv8_ms_per_step": 10.76, "kv8_over_plain_pct": 7.0,
           "weather_ms": 27.5}

    def fake_run(cmd, **kw):
        return _Proc(0, stdout=json.dumps(row))

    monkeypatch.setattr(subprocess, "run", fake_run)
    monkeypatch.setattr(
        bench, "LLM_EXTRAS", (("reconcile_7b_b1", "x", 60),)
    )
    extras = bench._collect_llm_extras(weather_clean=True)
    assert extras["x_ms_per_step"] == 10.06
    assert extras["x_kv8_ms_per_step"] == 10.76
    assert extras["x_kv8_over_plain_pct"] == 7.0
    assert extras["x_weather_ms"] == 27.5


def test_extras_parse_composed_spec_step_row(monkeypatch):
    """The composed spec-anticipation-step row is ms/step-shaped but
    carries speedup/acceptance — it must NOT be parsed as a tok/s row."""
    row = {"case": "anticipation_step_7b_spec_self32_k4", "value": 140.0,
           "unit": "ms/step (4 gens, shared ctx, speculative; median of 5)",
           "plain_ms_per_step": 190.0, "speedup_vs_plain": 1.36,
           "acceptance_rate": 0.98, "k": 4}

    def fake_run(cmd, **kw):
        return _Proc(0, stdout=json.dumps(row))

    monkeypatch.setattr(subprocess, "run", fake_run)
    monkeypatch.setattr(
        bench, "LLM_EXTRAS",
        (("anticipation_step_7b_spec_self32_k4", "cs", 60),),
    )
    extras = bench._collect_llm_extras(weather_clean=True)
    assert extras == {
        "cs_ms_per_step": 140.0,
        "cs_plain_ms_per_step": 190.0,
        "cs_speedup_vs_plain": 1.36,
        "cs_acceptance": 0.98,
    }


def test_extras_parse_spec_decode_row(monkeypatch):
    """Speculative-decode rows carry their own in-child baseline: the
    attested keys are tok/s + speedup_vs_plain + acceptance, not the
    serving-burst or ms/step shapes."""
    row = {"case": "spec_decode_7b_oracle_k4", "value": 310.0,
           "unit": "tok/s (b1 greedy)", "ms_per_token": 3.2,
           "baseline_tok_s": 96.0, "speedup_vs_plain": 3.23,
           "acceptance_rate": 1.0, "rounds": 33.0, "k": 4}

    def fake_run(cmd, **kw):
        return _Proc(0, stdout=json.dumps(row))

    monkeypatch.setattr(subprocess, "run", fake_run)
    monkeypatch.setattr(
        bench, "LLM_EXTRAS", (("spec_decode_7b_oracle_k4", "sp", 60),)
    )
    extras = bench._collect_llm_extras(weather_clean=True)
    assert extras == {
        "sp_tok_s": 310.0,
        "sp_speedup_vs_plain": 3.23,
        "sp_acceptance": 1.0,
    }


def test_extras_failure_drops_keys_never_raises(monkeypatch):
    calls = []

    def fake_run(cmd, **kw):
        calls.append(cmd)
        return _Proc(1, stderr="boom\nRESOURCE_EXHAUSTED\n")

    monkeypatch.setattr(subprocess, "run", fake_run)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    extras = bench._collect_llm_extras(weather_clean=True)
    assert extras == {}
    # each case retried exactly once (HBM-free backoff)
    assert len(calls) == 2 * len(bench.LLM_EXTRAS)


def test_extras_retry_succeeds_second_attempt(monkeypatch):
    row = {"case": "decode_7b_b1_int8", "value": 10.7, "unit": "ms/step"}
    state = {"n": 0}

    def fake_run(cmd, **kw):
        state["n"] += 1
        if state["n"] == 1:
            return _Proc(1, stderr="RESOURCE_EXHAUSTED")
        return _Proc(0, stdout=json.dumps(row))

    monkeypatch.setattr(subprocess, "run", fake_run)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    monkeypatch.setattr(bench, "LLM_EXTRAS", (("decode_7b_int8", "x", 60),))
    extras = bench._collect_llm_extras(weather_clean=True)
    assert extras == {"x_ms_per_step": 10.7}
    assert state["n"] == 2


def test_extras_timeout_is_contained(monkeypatch):
    def fake_run(cmd, **kw):
        raise subprocess.TimeoutExpired(cmd, kw.get("timeout", 0))

    monkeypatch.setattr(subprocess, "run", fake_run)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    assert bench._collect_llm_extras(weather_clean=True) == {}


def test_extras_skipped_on_bad_weather_and_env(monkeypatch):
    def fail_run(cmd, **kw):  # must never be called
        raise AssertionError("child launched despite skip condition")

    monkeypatch.setattr(subprocess, "run", fail_run)
    assert bench._collect_llm_extras(weather_clean=False) == {}
    monkeypatch.setenv("PREGO_BENCH_LLM", "0")
    assert bench._collect_llm_extras(weather_clean=True) == {}


def test_extras_global_budget_skips_remaining(monkeypatch):
    row = {"case": "decode_b8", "value": 3.5, "unit": "ms/step"}
    calls = []

    def fake_run(cmd, **kw):
        calls.append(cmd)
        return _Proc(0, stdout=json.dumps(row))

    monkeypatch.setattr(subprocess, "run", fake_run)
    # budget too small for even the first case's timeout -> nothing runs
    monkeypatch.setenv("PREGO_BENCH_LLM_BUDGET", "1")
    assert bench._collect_llm_extras(weather_clean=True) == {}
    assert calls == []
