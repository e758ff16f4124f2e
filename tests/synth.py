"""Synthetic Assembly-shaped dataset fixtures (SURVEY.md §4 test strategy)."""

from __future__ import annotations

import json
import os
import os.path as osp

import numpy as np


def make_synth_dataset(
    root: str,
    num_train: int = 3,
    num_test: int = 2,
    num_classes: int = 7,
    rgb_dim: int = 2048,
    flow_dim: int = 2048,
    min_len: int = 150,
    max_len: int = 400,
    rgb_type: str = "rgb_anet_resnet50",
    annotation_type: str = "target_perframe",
    seed: int = 0,
):
    """Write tiny .npy features in the reference's on-disk layout.

    Targets are segment-structured one-hot so a GRU can actually learn them;
    rgb features are class-conditional gaussians.
    """
    rng = np.random.default_rng(seed)
    data_root = osp.join(root, "SYNTH")
    os.makedirs(osp.join(data_root, rgb_type), exist_ok=True)
    os.makedirs(osp.join(data_root, annotation_type), exist_ok=True)
    os.makedirs(osp.join(data_root, "rgb_as_flow", rgb_type), exist_ok=True)

    class_means = rng.normal(0, 1, (num_classes, rgb_dim)).astype(np.float32)
    train_vids = [f"synth_train_{i:02d}" for i in range(num_train)]
    test_vids = [f"synth_test_{i:02d}" for i in range(num_test)]

    for vid in train_vids + test_vids:
        T = int(rng.integers(min_len, max_len + 1))
        labels = np.zeros(T, np.int64)
        t = 0
        while t < T:
            seg = int(rng.integers(20, 60))
            labels[t : t + seg] = int(rng.integers(0, num_classes))
            t += seg
        onehot = np.zeros((T, num_classes), np.float32)
        onehot[np.arange(T), labels] = 1.0
        rgb = class_means[labels] + 0.3 * rng.normal(0, 1, (T, rgb_dim)).astype(np.float32)
        np.save(osp.join(data_root, annotation_type, vid + ".npy"), onehot)
        np.save(osp.join(data_root, rgb_type, vid + ".npy"), rgb.astype(np.float32))
        # rgb_as_flow shape-probe file (content irrelevant — zeroed on load)
        np.save(
            osp.join(data_root, "rgb_as_flow", rgb_type, vid + ".npy"),
            np.zeros((T, flow_dim), np.float32),
        )

    video_list = {
        "SYNTH": {
            "class_index": [f"class_{i}" for i in range(num_classes)],
            "train_session_set": train_vids,
            "test_session_set": test_vids,
        }
    }
    vl_path = osp.join(root, "video_list.json")
    with open(vl_path, "w") as f:
        json.dump(video_list, f)
    return data_root, vl_path, train_vids, test_vids
