"""Transformer (ViT-encoder) recognizer: shapes, causality, training."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from prego_tpu.core import RecognitionConfig
from prego_tpu.models.transformer import TransformerRecognizer

CFG = RecognitionConfig.from_dict(
    {
        "model": "Transformer",
        "rgb_type": "rgb_kinetics_bninception",
        "flow_type": "flow_kinetics_bninception",
        "embedding_dim": 64,
        "hidden_dim": 128,
        "num_layers": 2,
        "num_classes": 6,
        "dropout": 0.1,
        "window_size": 16,
        "patch_dim": 2,
        "num_heads": 4,
    }
)


@pytest.fixture(scope="module")
def model_and_params():
    m = TransformerRecognizer(CFG)
    return m, m.init(jax.random.PRNGKey(0))


def test_train_forward_shape(model_and_params, rng):
    m, params = model_and_params
    B, W = 3, 16
    rgb = jnp.asarray(rng.normal(0, 1, (B, W, m.rgb_dim)).astype(np.float32))
    flow = jnp.zeros((B, W, m.flow_dim))
    logits = m.forward_train(params, rgb, flow, jax.random.PRNGKey(1), flow_is_zero=True)
    assert logits.shape == (B, 6)


def test_full_eval_causal_and_matches_windows(model_and_params, rng):
    m, params = model_and_params
    B, T = 2, 40
    rgb = rng.normal(0, 1, (B, T, m.rgb_dim)).astype(np.float32)
    flow = np.zeros((B, T, m.flow_dim), np.float32)

    scores = m.forward_full(
        params, jnp.asarray(rgb), jnp.asarray(flow), flow_is_zero=True, frame_chunk=16
    )
    assert scores.shape == (B, T, 6)
    np.testing.assert_allclose(np.asarray(scores.sum(-1)), 1.0, rtol=1e-5)

    # frame t must equal the forward on its own zero-padded window
    W = m.window_size
    for t in (0, 7, 25, 39):
        pad = np.concatenate([np.zeros((B, W - 1, m.rgb_dim + m.flow_dim), np.float32),
                              np.concatenate([rgb, flow], -1)], axis=1)
        win = pad[:, t : t + W]
        ref = m._window_logits(params, jnp.asarray(win), False, None)
        ref = np.asarray(jax.nn.softmax(ref, -1))
        np.testing.assert_allclose(np.asarray(scores[:, t]), ref, rtol=1e-4, atol=1e-5)

    # causality: perturbing future frames must not change frame t's score
    rgb2 = rgb.copy()
    rgb2[:, 30:] += 5.0
    scores2 = m.forward_full(
        params, jnp.asarray(rgb2), jnp.asarray(flow), flow_is_zero=True, frame_chunk=16
    )
    np.testing.assert_allclose(
        np.asarray(scores[:, :30]), np.asarray(scores2[:, :30]), rtol=1e-4, atol=1e-5
    )
    assert not np.allclose(np.asarray(scores[:, 35]), np.asarray(scores2[:, 35]))


def test_transformer_trains(model_and_params, rng):
    from prego_tpu.train import build_optimizer, make_train_step

    m, params = model_and_params
    cfg = RecognitionConfig.from_dict({**CFG.to_dict(), "lr": 1e-3, "weight_decay": 0.05,
                                       "optimizer": "AdamW"})
    opt = build_optimizer(cfg)
    opt_state = opt.init(params)
    step = make_train_step(m, opt, flow_is_zero=True)
    B, W = 8, 16
    rgb = jnp.asarray(rng.normal(0, 1, (B, W, m.rgb_dim)).astype(np.float32))
    flow = jnp.zeros((B, W, m.flow_dim))
    tgt = jnp.zeros((B, 6)).at[:, 2].set(1.0)
    valid = jnp.ones((B,))
    losses = []
    p, o = params, opt_state
    for i in range(12):
        p, o, loss = step(p, o, rgb, flow, tgt, valid, jax.random.fold_in(jax.random.PRNGKey(3), i))
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.5  # fits the constant target quickly
