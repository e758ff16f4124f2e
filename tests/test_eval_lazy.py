"""Lazy/group-batched evaluation equals the dense padded-batch path."""

import jax
import numpy as np
import pytest

from prego_tpu.core import RecognitionConfig
from prego_tpu.data import load_dataset_info, load_feature_store, pack_eval_batch
from prego_tpu.models.miniroad import MiniROAD
from prego_tpu.train import Evaluator, streaming_scores
from prego_tpu.train.evaluator import streaming_scores_lazy
from tests.synth import make_synth_dataset

CFG = RecognitionConfig.from_dict(
    {
        "rgb_type": "rgb_kinetics_bninception",
        "flow_type": "flow_anet_resnet50",
        "embedding_dim": 48,
        "hidden_dim": 32,
        "num_layers": 1,
        "num_classes": 6,
        "dropout": 0.0,
        "metric": "AP",
        "data_name": "SYNTH",
    }
)


@pytest.fixture(scope="module")
def store(tmp_path_factory):
    root = tmp_path_factory.mktemp("lazy")
    data_root, vl_path, _, _ = make_synth_dataset(
        str(root), num_train=1, num_test=5, num_classes=6, rgb_dim=1024,
        min_len=80, max_len=300, seed=3, rgb_type="rgb_kinetics_bninception",
    )
    info = load_dataset_info(vl_path, "SYNTH")
    return load_feature_store(
        data_root, info.test_session_set, CFG.rgb_type, CFG.flow_type,
        "target_perframe", 6, training=False, window_size=16,
    )


def test_lazy_equals_dense(store):
    model = MiniROAD(CFG)
    params = model.init(jax.random.PRNGKey(0))
    rgb, flow, tgt, lengths, vids = pack_eval_batch(store)
    dense = streaming_scores(model, params, rgb, flow, True, chunk_size=96)
    lazy = streaming_scores_lazy(model, params, store, list(vids), chunk_size=96)
    for i, v in enumerate(vids):
        np.testing.assert_allclose(
            lazy[i], dense[i, : int(lengths[i])], rtol=1e-5, atol=1e-6
        )


def test_video_batch_invariance(store):
    model = MiniROAD(CFG)
    params = model.init(jax.random.PRNGKey(1))
    ev = Evaluator(CFG, [f"c{i}" for i in range(6)])
    mAP_small, r_small = ev(model, params, store, chunk_size=128, video_batch=2)
    mAP_big, r_big = ev(model, params, store, chunk_size=128, video_batch=64)
    assert mAP_small == pytest.approx(mAP_big, abs=1e-9)
    assert r_small["output"] == r_big["output"]
