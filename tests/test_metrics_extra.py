"""cAP and per-stage AP (metrics.py:10-22,64-130 parity)."""

import numpy as np

from prego_tpu.metrics import (
    calibrated_average_precision_score,
    perstage_average_precision,
)


def test_cap_balanced_equals_hand_value():
    # 2 pos, 2 neg, perfectly ranked: ratio=1
    y_true = np.array([1, 1, 0, 0])
    y_score = np.array([0.9, 0.8, 0.2, 0.1])
    cap = calibrated_average_precision_score(y_true, y_score)
    assert abs(cap - 1.0) < 1e-9

    # worst ranking: positives last
    y_score_bad = np.array([0.1, 0.2, 0.8, 0.9])
    cap_bad = calibrated_average_precision_score(y_true, y_score_bad)
    assert cap_bad < cap


def test_perstage_structure(rng):
    T, K = 300, 3
    gt = np.zeros((T, K))
    # one long action of class 1 so every decile has frames
    gt[:, 0] = 1
    gt[100:200, 0] = 0
    gt[100:200, 1] = 1
    scores = rng.uniform(0, 1, (T, K))
    res = perstage_average_precision(scores, gt, ["bg", "c1", "c2"], metrics="AP")
    stages = [k for k in res if "%" in k]
    assert len(stages) == 10
    for s in stages:
        assert "mean_AP" in res[s]
