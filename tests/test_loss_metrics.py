import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as TF

from prego_tpu.metrics import get_metrics, perframe_average_precision
from prego_tpu.train.loss import l2_normalize, last_frame_mlce


def test_mlce_matches_torch(rng):
    """Loss oracle: -sum(F.normalize(target) * log_softmax(logits)) mean (loss.py:23-34)."""
    B, K = 5, 11
    logits = rng.normal(0, 2, (B, K)).astype(np.float32)
    target = np.zeros((B, K), np.float32)
    target[np.arange(B), rng.integers(0, K, B)] = 1.0

    ours = float(last_frame_mlce(jnp.asarray(logits), jnp.asarray(target)))
    t_logits, t_target = torch.tensor(logits), torch.tensor(target)
    theirs = torch.mean(
        torch.sum(-TF.normalize(t_target) * TF.log_softmax(t_logits, dim=-1), dim=1)
    ).item()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5)


def test_mlce_multilabel_target(rng):
    """L2 (not L1) normalization is the reference behavior — multi-hot target."""
    logits = rng.normal(0, 1, (2, 6)).astype(np.float32)
    target = np.array([[1, 1, 0, 0, 0, 0], [0, 0, 0, 0, 0, 1]], np.float32)
    ours = float(last_frame_mlce(jnp.asarray(logits), jnp.asarray(target)))
    theirs = torch.mean(
        torch.sum(
            -TF.normalize(torch.tensor(target))
            * TF.log_softmax(torch.tensor(logits), dim=-1),
            dim=1,
        )
    ).item()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5)


def test_mlce_valid_mask(rng):
    logits = rng.normal(0, 1, (4, 5)).astype(np.float32)
    target = np.eye(5, dtype=np.float32)[[0, 1, 2, 3]]
    valid = np.array([1, 1, 0, 0], np.float32)
    masked = float(
        last_frame_mlce(jnp.asarray(logits), jnp.asarray(target), jnp.asarray(valid))
    )
    unmasked = float(last_frame_mlce(jnp.asarray(logits[:2]), jnp.asarray(target[:2])))
    np.testing.assert_allclose(masked, unmasked, rtol=1e-6)


def test_l2_normalize_zero_row():
    out = np.asarray(l2_normalize(jnp.zeros((1, 4))))
    assert np.all(out == 0)  # eps guard, matches F.normalize on zero rows


def test_get_metrics_micro_fixture():
    """Hand-computed one-class fixture (llama_meta.py:14-58 semantics)."""
    gts = {"v1": [1, 2, 3], "v2": [4, 5]}
    preds = {
        # v1: steps 1,2 matched (correct->tn), last step 3 matched -> mistake missed (fn)
        "v1": [{1}, {2}, {3}],
        # v2: step 4 unmatched (fp), last step 5 unmatched -> mistake caught (tp)
        "v2": [{9}, {9}],
    }
    m = get_metrics(preds, gts)
    assert (m["tp"], m["fp"], m["fn"], m["tn"]) == (1, 1, 1, 2)
    assert m["accuracy"] == 3 / 5
    assert m["precision"] == 0.5 and m["recall"] == 0.5 and m["f1"] == 0.5
    assert m["ratio"] == 3 / 5  # matched 3 of 5 steps overall


def test_perframe_ap_background_ignored(rng):
    T, K = 60, 4
    gt = np.zeros((T, K))
    labels = rng.integers(0, K, T)
    gt[np.arange(T), labels] = 1
    scores = rng.uniform(0, 1, (T, K))
    res = perframe_average_precision(scores, gt, [f"c{i}" for i in range(K)])
    assert "c0" not in res["per_class_AP"]  # background skipped
    assert set(res["per_class_AP"]) <= {"c1", "c2", "c3"}
    # parity with sklearn directly
    from sklearn.metrics import average_precision_score

    for i in range(1, K):
        if np.any(gt[:, i]):
            np.testing.assert_allclose(
                res["per_class_AP"][f"c{i}"],
                average_precision_score(gt[:, i], scores[:, i]),
            )
