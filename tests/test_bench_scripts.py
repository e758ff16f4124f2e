"""Smoke tests for the bench entry points' CPU (--tiny) paths.

The real measurements run on-chip via the queue scripts; these guard the
scripts' import/arg/JSON surfaces from bit-rot (a broken case name or
output schema would otherwise only surface mid-queue on the chip).
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args):
    proc = subprocess.run(
        [sys.executable] + args,
        cwd=REPO,
        env={**os.environ, "PREGO_PLATFORM": "cpu"},
        stdout=subprocess.PIPE,
        stderr=subprocess.PIPE,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-800:]
    rows = [json.loads(l) for l in proc.stdout.splitlines() if l.startswith("{")]
    assert rows, proc.stdout
    return rows


def test_bench_llm_tiny_decode_case():
    (row,) = _run(["scripts/bench_llm.py", "--case", "decode_b1", "--tiny"])
    assert row["case"] == "decode_b1" and row["value"] > 0


def test_bench_llm_tiny_skip_cases_keep_names():
    (row,) = _run(["scripts/bench_llm.py", "--case", "decode_13b_int8", "--tiny"])
    assert row == {"case": "decode_13b_b1_int8", "skipped": "tiny"}


def test_bench_llm_tiny_spec_decode_smoke():
    """The speculative-decoding bench's --tiny leg actually EXERCISES the
    oracle spec loop (greedy-equality asserted inside the case)."""
    (row,) = _run(
        ["scripts/bench_llm.py", "--case", "spec_decode_7b_oracle_k8", "--tiny"]
    )
    assert row["case"] == "spec_decode_7b_oracle_k8" and row["smoke"] == "ok"


def test_bench_train_tiny_both_backends():
    rows = _run(["scripts/bench_train.py", "--tiny", "--reps", "1"])
    cases = {r["case"] for r in rows}
    assert cases == {"train_step_b4_scan", "train_step_b4_pallas_train"}
    assert all(r["frames_per_s"] > 0 for r in rows)


def test_ab_attention_inproc_tiny():
    proc = subprocess.run(
        [sys.executable, "scripts/ab_attention_inproc.py",
         "--dim", "128", "--layers", "2", "--heads", "8", "--batch", "8",
         "--gen", "4", "--rounds", "1", "--max_seq", "32",
         "--quantize", "--kv_quant"],
        cwd=REPO,
        env={**os.environ, "PREGO_PLATFORM": "cpu"},
        stdout=subprocess.PIPE,
        stderr=subprocess.PIPE,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-800:]
    out = proc.stdout
    # all three dispatch variants must compile, time, and agree greedily
    for name in ("perhead", "fold", "flat8"):
        assert f"[{name}" in out, out
    assert "identical across ['perhead', 'fold', 'flat8']: True" in out, out


def test_bench_llm_tiny_serving_cases():
    (cb,) = _run(["scripts/bench_llm.py", "--case", "serving_cb_7b", "--tiny"])
    (st,) = _run(["scripts/bench_llm.py", "--case", "serving_static_7b", "--tiny"])
    assert cb["case"] == "serving_cb_7b_s8" and cb["value"] > 0
    assert 0 < cb["slot_utilization"] <= 1
    assert st["case"] == "serving_static_7b_s8" and st["value"] > 0


def test_bench_llm_tiny_ctx_workload_exercises_prefix_sharing():
    """The PREGO-shaped burst must actually hit the prefix cache even at
    smoke scale (the 80-token tiny contexts clear the 64-token chunk)."""
    (cb,) = _run(["scripts/bench_llm.py", "--case", "serving_cb_7b_ctx", "--tiny"])
    assert cb["case"] == "serving_cb_7b_s8_ctx"
    assert cb["prefix_hits"] > 0
    assert cb["prefix_tokens_reused"] > 0
    (st,) = _run(
        ["scripts/bench_llm.py", "--case", "serving_static_7b_ctx", "--tiny"]
    )
    assert st["value"] > 0


def test_sweep_q8_nblock_tiny():
    rows = _run(["scripts/sweep_q8_nblock.py", "--tiny"])
    projs = {r["proj"] for r in rows if "proj" in r}
    assert projs == {"wqkv", "w2"}
    assert all(r["ms"] > 0 for r in rows if "proj" in r)
    assert any("summary_n_block" in r for r in rows)


def test_ab_flat_verdicts_tiny():
    """Hermetic CPU run of the flat-vs-perhead VERDICT A/B harness: the
    kernels are TPU-only, so the two variants must be identical here —
    validating the plumbing, not the flip rate (that's the chip run)."""
    (row,) = _run(
        ["scripts/ab_flat_verdicts.py", "--tiny", "--videos", "3"]
    )
    assert row["case"] == "ab_flat_verdicts_tiny"
    assert row["steps"] > 0
    assert row["verdict_flips"] == 0
    assert row["set_mismatch_steps"] == 0


def test_ab_sampled_verdicts_tiny():
    """Hermetic CPU run of the sampled-mode spec/CB VERDICT A/B harness
    (VERDICT r4 #5): validates the plumbing — four child legs, noise-floor
    calibration, pairwise flip accounting (rates are the chip run's job)."""
    proc = subprocess.run(
        [sys.executable, "scripts/ab_sampled_verdicts.py", "--tiny",
         "--videos", "2"],
        cwd=REPO,
        env={**os.environ, "PREGO_PLATFORM": "cpu"},
        stdout=subprocess.PIPE,
        stderr=subprocess.PIPE,
        text=True,
        timeout=1200,  # four driver child processes
    )
    assert proc.returncode == 0, proc.stderr[-800:]
    (row,) = [
        json.loads(l) for l in proc.stdout.splitlines() if l.startswith("{")
    ]
    assert row["case"] == "ab_sampled_verdicts_tiny"
    assert row["steps"] > 0
    for k in ("noise_floor_flips", "spec_flips", "cb_flips",
              "metrics_base", "metrics_spec", "metrics_cb"):
        assert k in row
