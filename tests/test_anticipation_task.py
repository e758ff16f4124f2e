"""ANTICIPATION task surface: MiniROADA model, anticipation loss/windows/
trainer/evaluator (reference: rnn.py:73-137, loss.py:40-79,
dataset.py:138-249, eval.py:87-161)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as TF

from prego_tpu.core import RecognitionConfig
from prego_tpu.data import load_dataset_info, load_feature_store
from prego_tpu.data.windowing import AnticipationWindowSampler
from prego_tpu.models.miniroad_a import MiniROADA
from prego_tpu.train.evaluator import AntEvaluator
from prego_tpu.train.loss import anticipation_mlce
from prego_tpu.train.trainer import (
    ant_train_one_epoch,
    build_optimizer,
    make_ant_train_step,
)
from tests.synth import make_synth_dataset

CFG = RecognitionConfig.from_dict(
    {
        "rgb_type": "rgb_kinetics_bninception",
        "flow_type": "flow_anet_resnet50",
        "embedding_dim": 64,
        "hidden_dim": 48,
        "num_layers": 1,
        "num_classes": 7,
        "dropout": 0.1,
        "anticipation_length": 3,
        "window_size": 16,
        "stride": 4,
        "batch_size": 8,
        "lr": 3e-3,
        "weight_decay": 0.05,
        "optimizer": "AdamW",
        "metric": "AP",
    }
)


def test_mroada_shapes_and_softmax():
    model = MiniROADA(CFG)
    params = model.init(jax.random.PRNGKey(0))
    B, T = 2, 12
    rng = np.random.default_rng(0)
    rgb = jnp.asarray(rng.normal(0, 1, (B, T, model.rgb_dim)).astype(np.float32))
    flow = jnp.zeros((B, T, model.flow_dim), jnp.float32)
    scores, ant_scores = model.forward_full(params, rgb, flow, flow_is_zero=True)
    assert scores.shape == (B, T, 7)
    assert ant_scores.shape == (B, T, 3, 7)
    np.testing.assert_allclose(np.asarray(jnp.sum(scores, -1)), 1.0, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(jnp.sum(ant_scores, -1)), 1.0, rtol=1e-5)


def test_ant_loss_matches_torch(rng):
    B, L, K = 4, 3, 7
    logits = rng.normal(0, 1, (B, L, K)).astype(np.float32)
    target = np.zeros((B, L, K), np.float32)
    for b in range(B):
        for l in range(L):
            target[b, l, rng.integers(0, K)] = 1.0
    ours = float(anticipation_mlce(jnp.asarray(logits), jnp.asarray(target)))
    t_logits = torch.tensor(logits).view(-1, K)
    t_target = torch.tensor(target).view(-1, K)
    theirs = torch.sum(
        torch.sum(-TF.normalize(t_target) * TF.log_softmax(t_logits, -1), dim=1)
    ).item()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5)


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = tmp_path_factory.mktemp("ant")
    return make_synth_dataset(
        str(root), num_train=2, num_test=2, num_classes=7, rgb_dim=1024,
        min_len=100, max_len=160, seed=7, rgb_type="rgb_kinetics_bninception",
    )


def test_ant_windows_respect_horizon(synth):
    data_root, vl_path, _, _ = synth
    info = load_dataset_info(vl_path, "SYNTH")
    store = load_feature_store(
        data_root, info.train_session_set, CFG.rgb_type, CFG.flow_type,
        "target_perframe", 7, training=True, window_size=16,
    )
    sampler = AnticipationWindowSampler(store, 16, 4, anticipation_length=3)
    sampler.resample(np.random.default_rng(0))
    for vi, start in sampler.windows:
        T = store.length(store.vids[vi])
        assert start + 16 < T - 3  # end strictly below T - L (reference range)
    batch = next(sampler.iter_batches(8, shuffle=False))
    assert batch.ant_target.shape == (8, 3, 7)
    # ant target rows are the frames right after the window
    j = 0
    vid, end = batch.vids[j], int(batch.ends[j])
    np.testing.assert_array_equal(
        batch.ant_target[j], store.target[vid][end : end + 3]
    )


def test_ant_train_and_eval(synth):
    data_root, vl_path, _, _ = synth
    info = load_dataset_info(vl_path, "SYNTH")
    common = dict(
        rgb_type=CFG.rgb_type, flow_type=CFG.flow_type,
        annotation_type="target_perframe", num_classes=7, window_size=16,
    )
    train_store = load_feature_store(data_root, info.train_session_set, training=True, **common)
    test_store = load_feature_store(data_root, info.test_session_set, training=False, **common)

    model = MiniROADA(CFG)
    params = model.init(jax.random.PRNGKey(0))
    optimizer = build_optimizer(CFG)
    opt_state = optimizer.init(params)
    step = make_ant_train_step(model, optimizer, flow_is_zero=True)
    evaluator = AntEvaluator(CFG, info.class_index)

    mant0, _ = evaluator(model, params, test_store)

    sampler = AnticipationWindowSampler(train_store, 16, 4, anticipation_length=3)
    rng = jax.random.PRNGKey(1)
    np_rng = np.random.default_rng(2)
    for epoch in range(1, 3):
        sampler.resample(np_rng)
        params, opt_state, rng, loss = ant_train_one_epoch(
            sampler, model, step, params, opt_state, rng, 8, epoch, np_rng=np_rng
        )
    mant1, result = evaluator(model, params, test_store)
    assert np.isfinite(loss)
    assert mant1 > mant0
    assert "anticipation_1" in result and "anticipation_3" in result
