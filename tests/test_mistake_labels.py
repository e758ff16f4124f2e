"""Mistake-label CSV datasets + frequentist Markov baseline
(reference: src/data/{assemblyLabelDataset.py,dataset_utils.py,
frequentist_baseline.py})."""

import csv
import os.path as osp

import numpy as np
import pytest

from prego_tpu.anticipation.frequentist import (
    build_transition_matrix,
    evaluate_frequentist,
)
from prego_tpu.data.mistake_labels import (
    SAMPLE_DIM,
    MistakeLabelDataset,
    parts_to_onehot,
    verb_to_onehot,
)


def write_csv(path, rows):
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["verb", "this", "that", "label"])
        w.writeheader()
        for r in rows:
            w.writerow(r)


STEPS = [
    {"verb": "attach", "this": "base", "that": "chassis", "label": "correct"},
    {"verb": "attach", "this": "cabin", "that": "cabin", "label": "correct"},
    {"verb": "attach", "this": "roof", "that": "cabin", "label": "correct"},
    {"verb": "attach", "this": "wheel", "that": "chassis", "label": "correct"},
]


@pytest.fixture
def csv_dir(tmp_path):
    # two identical correct procedures
    for i in range(2):
        write_csv(
            tmp_path / f"assembly_x_x_user{i}-a01_nusar_00{i}.csv", STEPS
        )
    # one mistake procedure: swaps steps 2/3 (wrong order) and labels them
    wrong = [STEPS[0], dict(STEPS[2], label="mistake"), dict(STEPS[1], label="correction"), STEPS[3]]
    write_csv(tmp_path / "assembly_x_x_user9-a01_nusar_009.csv", wrong)
    return str(tmp_path)


def test_onehot_quirks():
    assert verb_to_onehot("attach")[0] == 1
    oh = parts_to_onehot("cabin", "cabin")
    assert oh.max() == 2 and (oh > 0).sum() == 1  # this==that -> single slot = 2
    oh2 = parts_to_onehot("base", "chassis")
    assert oh2.max() == 1 and (oh2 > 0).sum() == 2
    assert SAMPLE_DIM == 67  # frequentist_baseline.py sample_len


def test_dataset_splits_and_metadata(csv_dir):
    all_ds = MistakeLabelDataset(csv_dir, "all")
    correct = MistakeLabelDataset(csv_dir, "correct")
    mistake = MistakeLabelDataset(csv_dir, "mistake")
    assert len(all_ds) == 3 and len(correct) == 2 and len(mistake) == 1
    sample = correct[0]
    assert sample["oh_sample"].shape == (4, SAMPLE_DIM)
    assert sample["oh_label"].shape == (4, 3)
    user, toy, idx, is_correct = sample["metadata"]
    assert (user, toy, is_correct) == ("user0", "a01", 1)
    assert sample["keysteps"][0] == "attach-base-chassis"
    assert mistake[0]["metadata"][3] == 0


def test_frequentist_detects_wrong_order(csv_dir):
    correct = MistakeLabelDataset(csv_dir, "correct")
    mistake = MistakeLabelDataset(csv_dir, "mistake")
    m = evaluate_frequentist(correct, mistake)
    # step 1 follows the trained chain -> TP; the swapped pair has
    # zero-probability transitions with non-correct gt labels -> 2x TN;
    # step 4 is truly correct but follows the corrupted chain, so its
    # transition is untrained -> FN (inherent to the first-order baseline)
    assert m["tp"] == 1 and m["tn"] == 2 and m["fp"] == 0 and m["fn"] == 1
    assert m["accuracy"] == 0.75


def test_transition_matrix_rows_normalized(csv_dir):
    correct = MistakeLabelDataset(csv_dir, "correct")
    mistake = MistakeLabelDataset(csv_dir, "mistake")
    A, index, thr = build_transition_matrix(
        [p.oh_sample for p in correct.procedures],
        [p.oh_sample for p in mistake.procedures],
    )
    sums = A.sum(axis=1)
    # every row is a distribution or the uniform-threshold fallback
    assert np.all((np.isclose(sums, 1.0)) | (np.isclose(sums, thr * A.shape[1])))
    assert thr == 1.0 / A.shape[0]
