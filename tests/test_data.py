import numpy as np
import pytest

from prego_tpu.data import (
    FeatureStore,
    WindowSampler,
    load_dataset_info,
    load_feature_store,
    pack_eval_batch,
)
from tests.synth import make_synth_dataset


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth")
    return make_synth_dataset(str(root), num_train=3, num_test=2, num_classes=7)


def test_load_train_store_zero_prefix(synth):
    data_root, vl_path, train_vids, _ = synth
    info = load_dataset_info(vl_path, "SYNTH")
    store = load_feature_store(
        data_root, info.train_session_set, "rgb_anet_resnet50", "flow_anet_resnet50",
        "target_perframe", info.num_classes, training=True, window_size=16,
    )
    assert store.vids == train_vids
    assert store.flow_is_zero
    for vid in store.vids:
        # window_size-1 zero rows prepended (dataset.py:53-55,77-82)
        assert np.all(store.rgb[vid][:15] == 0)
        assert np.all(store.target[vid][:15] == 0)
        assert np.all(store.flow[vid] == 0)  # zeroed flow quirk (dataset.py:63-69)


def test_missing_video_dropped(synth):
    data_root, vl_path, train_vids, _ = synth
    info = load_dataset_info(vl_path, "SYNTH")
    vids = list(info.train_session_set) + ["nonexistent_video"]
    store = load_feature_store(
        data_root, vids, "rgb_anet_resnet50", "flow_anet_resnet50",
        "target_perframe", info.num_classes, training=False, window_size=16,
    )
    assert store.removed == 1
    assert "nonexistent_video" not in store.vids


def test_window_counts_match_reference_formula(synth):
    data_root, vl_path, _, _ = synth
    info = load_dataset_info(vl_path, "SYNTH")
    W, S = 16, 4
    store = load_feature_store(
        data_root, info.train_session_set, "rgb_anet_resnet50", "flow_anet_resnet50",
        "target_perframe", info.num_classes, training=True, window_size=W,
    )
    sampler = WindowSampler(store, W, S)
    rng = np.random.default_rng(3)
    sampler.resample(rng)
    # oracle: zip(range(seed, T, stride), range(seed+W, T+1, stride)) count
    rng2 = np.random.default_rng(3)
    expected = 0
    for vid in store.vids:
        T = store.length(vid)
        seed = int(rng2.integers(0, S))
        expected += len(range(seed + W, T + 1, S))
    assert len(sampler) == expected


def test_batch_shapes_and_padding(synth):
    data_root, vl_path, _, _ = synth
    info = load_dataset_info(vl_path, "SYNTH")
    store = load_feature_store(
        data_root, info.train_session_set, "rgb_anet_resnet50", "flow_anet_resnet50",
        "target_perframe", info.num_classes, training=True, window_size=16,
    )
    sampler = WindowSampler(store, 16, 4)
    sampler.resample(np.random.default_rng(0))
    B = 8
    batches = list(sampler.iter_batches(B, shuffle=False))
    total_valid = sum(int(b.valid.sum()) for b in batches)
    assert total_valid == len(sampler)
    for b in batches:
        assert b.rgb.shape == (B, 16, store.rgb_dim)
        assert b.target.shape == (B, 16, store.num_classes)
    # padding rows are zero-valid
    last = batches[-1]
    n_pad = B - int(last.valid.sum())
    if n_pad:
        assert np.all(last.rgb[-n_pad:] == 0)


def test_pack_eval_batch(synth):
    data_root, vl_path, _, test_vids = synth
    info = load_dataset_info(vl_path, "SYNTH")
    store = load_feature_store(
        data_root, info.test_session_set, "rgb_anet_resnet50", "flow_anet_resnet50",
        "target_perframe", info.num_classes, training=False, window_size=16,
    )
    rgb, flow, tgt, lengths, vids = pack_eval_batch(store)
    assert vids == test_vids
    assert rgb.shape[0] == len(test_vids)
    assert rgb.shape[1] == lengths.max()
    for i, v in enumerate(vids):
        t = lengths[i]
        np.testing.assert_array_equal(rgb[i, :t], store.rgb[v])
        assert np.all(rgb[i, t:] == 0)
