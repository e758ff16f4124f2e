"""Transformer (ViT-encoder) recognizer: torch-oracle numerics parity with
the reference ViTEnc (step_recognition/model/transformer_models/ViT.py:25-160,
Transformer.py:1-82, Attention.py:7-41), plus shapes, causality, training."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

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


# -------- torch oracle: independent restatement of the ViTEnc math --------
#
# Published architecture at its only functional setting (patch_dim=1; see
# the deviation note in prego_tpu/models/transformer.py): per-frame Linear
# embed, CLS token appended at the END, learned positional embeddings,
# depth x [x + drop(attn(LN(x))), x + mlp(LN(x))] with bias-free qkv and
# exact-erf GELU, final LayerNorm, classifier on token 0 (the first frame).


def _torch_vit_forward(params, x, num_heads):
    """x: (B, T, C) float32 -> (B, K) logits. Eval mode (no dropout)."""
    t = lambda a: torch.tensor(np.asarray(a, np.float32))
    lin = lambda h, p: h @ t(p["w"]) + t(p["b"])
    ln = lambda h, p: torch.nn.functional.layer_norm(
        h, h.shape[-1:], t(p["scale"]), t(p["bias"]), eps=1e-5
    )

    x = lin(torch.tensor(x), params["embed"])  # (B, T, E)
    B, T, E = x.shape
    cls = t(params["cls_token"]).expand(B, -1, -1)
    x = torch.cat([x, cls], dim=1)  # CLS LAST (ViT.py:131)
    x = x + t(params["pos"])[None]
    N = T + 1
    H = num_heads
    hd = E // H
    for blk in params["blocks"]:
        y = ln(x, blk["ln1"])
        qkv = (y @ t(blk["qkv"]["w"])).reshape(B, N, 3, H, hd).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = torch.softmax((q @ k.transpose(-2, -1)) * hd**-0.5, dim=-1)
        o = (attn @ v).transpose(1, 2).reshape(B, N, E)
        x = x + lin(o, blk["proj"])
        y = ln(x, blk["ln2"])
        x = x + lin(torch.nn.functional.gelu(lin(y, blk["mlp_in"])), blk["mlp_out"])
    x = ln(x, params["ln_f"])
    return lin(x[:, 0], params["head"])  # token 0 = first frame (ViT.py:138)


def test_vitenc_oracle_parity(rng):
    cfg = RecognitionConfig.from_dict(
        {**CFG.to_dict(), "patch_dim": 1, "window_size": 12}
    )
    m = TransformerRecognizer(cfg)
    params = m.init(jax.random.PRNGKey(7))
    B, T = 4, 12
    rgb = rng.normal(0, 1, (B, T, m.rgb_dim)).astype(np.float32)
    flow = rng.normal(0, 1, (B, T, m.flow_dim)).astype(np.float32)

    ours = np.asarray(
        m._window_logits(
            params, jnp.concatenate([jnp.asarray(rgb), jnp.asarray(flow)], -1), False, None
        )
    )
    theirs = _torch_vit_forward(params, np.concatenate([rgb, flow], -1), m.num_heads)
    np.testing.assert_allclose(ours, theirs.numpy(), rtol=2e-4, atol=2e-5)


def test_vitenc_readout_is_first_frame_token(rng):
    """The reference reads x[:, 0] with the CLS token appended at the END —
    so zeroing the FIRST frame (with a single identity-ish layer) must move
    the logits more than zeroing the last frame does not; concretely, the
    readout token must be position 0, not the CLS position."""
    cfg = RecognitionConfig.from_dict(
        {**CFG.to_dict(), "patch_dim": 1, "window_size": 8, "dropout": 0.0,
         "num_layers": 0}
    )
    m = TransformerRecognizer(cfg)
    params = m.init(jax.random.PRNGKey(1))
    B, T = 2, 8
    x = rng.normal(0, 1, (B, T, m.input_dim)).astype(np.float32)
    base = np.asarray(m._window_logits(params, jnp.asarray(x), False, None))
    # with zero encoder depth, logits = head(ln_f(embed(frame0) + pos0)):
    # changing any OTHER frame cannot move them
    x2 = x.copy()
    x2[:, 1:] += 3.0
    same = np.asarray(m._window_logits(params, jnp.asarray(x2), False, None))
    np.testing.assert_allclose(base, same, rtol=1e-6)
    x3 = x.copy()
    x3[:, 0] += 3.0
    moved = np.asarray(m._window_logits(params, jnp.asarray(x3), False, None))
    assert not np.allclose(base, moved)


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
