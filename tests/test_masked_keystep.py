"""Masked-keystep experiment (AssemblyTextDataset BERT rebuild,
assembly_text.py:104-160): collate parity, masked-text format, hermetic
histogram oracle, metric loop."""

import numpy as np
import pytest

from prego_tpu.anticipation.masked_keystep import (
    HistogramMaskedLM,
    build_masked_texts,
    run_masked_keystep_experiment,
    sample_history_batch,
)

SEQS = [
    ["attach-base-chassis", "attach-cabin-cabin", "attach-roof-cabin", "attach-wheel-chassis"],
    ["attach-base-chassis", "attach-cabin-cabin", "attach-roof-cabin", "attach-wheel-chassis"],
    ["attach-base-chassis", "attach-roof-cabin", "attach-cabin-cabin", "attach-wheel-chassis"],
]


def test_sample_history_batch_collate_parity():
    rng = np.random.default_rng(0)
    for _ in range(20):
        batch = sample_history_batch(SEQS, rng)
        n = len(batch["hist"][0])
        # one shared cut; 1 <= n < min_len - 1 (assembly_text.py:105-107)
        assert all(len(h) == n for h in batch["hist"])
        assert 1 <= n < min(len(s) for s in SEQS) - 1
        for h, g, s in zip(batch["hist"], batch["gt"], SEQS):
            assert h == s[:n] and g == s[n]


def test_masked_text_format():
    texts = build_masked_texts([["a-b-c", "d-e-f"]])
    assert texts == ["a-b-c d-e-f [MASK] [MASK] [MASK]"]


def test_histogram_oracle_learns_transitions():
    lm = HistogramMaskedLM(SEQS)
    out = lm(build_masked_texts([["attach-base-chassis", "attach-cabin-cabin"]]))
    # 'attach-cabin-cabin' is followed by roof twice, wheel once
    assert out == ["attach-roof-cabin"]
    # unseen history falls back to the most frequent keystep
    assert lm(["zzz [MASK]"]) == [lm._default]


def test_experiment_metrics_deterministic_and_sane():
    m = run_masked_keystep_experiment(SEQS, SEQS, rounds=4, seed=1)
    assert m["samples"] == 4 * len(SEQS)
    # the histogram oracle must beat chance on its own training procedures
    assert m["exact_accuracy"] >= 0.5
    assert m["fuzzy_accuracy"] >= m["exact_accuracy"]
    # deterministic
    assert m == run_masked_keystep_experiment(SEQS, SEQS, rounds=4, seed=1)


def test_keystep_texts_strip_spaces(tmp_path):
    """assembly_text.py:49-55: spaces removed inside fields before joining."""
    import csv

    from prego_tpu.data.mistake_labels import MistakeLabelDataset

    with open(tmp_path / "assembly_x_x_user1-a01_nusar_001.csv", "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["verb", "this", "that", "label"])
        w.writeheader()
        w.writerow({"verb": "attach", "this": "water tank", "that": "chassis", "label": "correct"})
    ds = MistakeLabelDataset(str(tmp_path))
    assert ds.keystep_texts() == [["attach-watertank-chassis"]]
