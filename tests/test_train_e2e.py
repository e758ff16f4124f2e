"""End-to-end recognition slice: train a few epochs on synthetic data,
eval improves over the untrained model, prediction JSON schema matches the
reference export (eval.py:50-65)."""

import json

import jax
import numpy as np
import pytest

from prego_tpu.core import RecognitionConfig
from prego_tpu.data import WindowSampler, load_dataset_info, load_feature_store
from prego_tpu.models.miniroad import MiniROAD
from prego_tpu.train import (
    Evaluator,
    build_optimizer,
    make_train_step,
    train_one_epoch,
)
from tests.synth import make_synth_dataset

CFG_DICT = {
    "rgb_type": "rgb_kinetics_bninception",
    "flow_type": "flow_anet_resnet50",
    "embedding_dim": 64,
    "hidden_dim": 48,
    "num_layers": 1,
    "num_classes": 7,
    "dropout": 0.1,
    "window_size": 16,
    "stride": 4,
    "batch_size": 8,
    "lr": 3e-3,
    "weight_decay": 0.05,
    "optimizer": "AdamW",
    "metric": "AP",
}


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth_e2e")
    return make_synth_dataset(
        str(root), num_train=3, num_test=2, num_classes=7, rgb_dim=1024,
        min_len=120, max_len=200, seed=1, rgb_type="rgb_kinetics_bninception",
    )


def test_train_improves_and_exports(synth, tmp_path):
    data_root, vl_path, _, _ = synth
    cfg = RecognitionConfig.from_dict(CFG_DICT)
    info = load_dataset_info(vl_path, "SYNTH")

    common = dict(
        rgb_type=cfg.rgb_type, flow_type=cfg.flow_type,
        annotation_type="target_perframe", num_classes=info.num_classes,
        window_size=cfg.window_size,
    )
    # synthetic rgb is 1024-dim to keep the test fast
    import prego_tpu.data.features as feats

    train_store = load_feature_store(data_root, info.train_session_set, training=True, **common)
    test_store = load_feature_store(data_root, info.test_session_set, training=False, **common)
    assert train_store.flow_is_zero and test_store.flow_is_zero

    model = MiniROAD(cfg)
    key = jax.random.PRNGKey(0)
    params = model.init(key)
    optimizer = build_optimizer(cfg)
    opt_state = optimizer.init(params)
    train_step = make_train_step(model, optimizer, flow_is_zero=True)
    evaluator = Evaluator(cfg, info.class_index)

    mAP0, _ = evaluator(model, params, test_store, chunk_size=64)

    sampler = WindowSampler(train_store, cfg.window_size, cfg.stride)
    rng = jax.random.PRNGKey(1)
    np_rng = np.random.default_rng(2)
    for epoch in range(1, 4):
        sampler.resample(np_rng)  # per-epoch re-windowing (main.py:100)
        params, opt_state, rng, loss = train_one_epoch(
            sampler, model, train_step, params, opt_state, rng,
            cfg.batch_size, epoch, np_rng=np_rng,
        )

    export = tmp_path / "out.json"
    mAP1, result = evaluator(model, params, test_store, export_json=str(export), chunk_size=64)
    assert mAP1 > mAP0, (mAP0, mAP1)
    assert mAP1 > 0.5

    # exported schema: {vid: {pred: [int], gt: [int]}} with full video length
    out = json.loads(export.read_text())
    assert set(out) == set(test_store.vids)
    for vid, v in out.items():
        assert len(v["pred"]) == test_store.length(vid)
        assert len(v["gt"]) == test_store.length(vid)
        assert all(isinstance(x, int) for x in v["pred"][:5])


def test_chunked_eval_matches_unchunked(synth):
    data_root, vl_path, _, _ = synth
    cfg = RecognitionConfig.from_dict(CFG_DICT)
    info = load_dataset_info(vl_path, "SYNTH")
    store = load_feature_store(
        data_root, info.test_session_set, rgb_type=cfg.rgb_type, flow_type=cfg.flow_type,
        annotation_type="target_perframe", num_classes=info.num_classes,
        training=False, window_size=cfg.window_size,
    )
    model = MiniROAD(cfg)
    params = model.init(jax.random.PRNGKey(5))

    from prego_tpu.data import pack_eval_batch
    from prego_tpu.train import streaming_scores

    rgb, flow, tgt, lengths, vids = pack_eval_batch(store)
    s_small = streaming_scores(model, params, rgb, flow, True, chunk_size=37)
    s_big = streaming_scores(model, params, rgb, flow, True, chunk_size=4096)
    np.testing.assert_allclose(s_small, s_big, rtol=1e-4, atol=1e-5)
