"""MiniROAD forward parity vs an inline torch oracle of MROAD (rnn.py:18-71)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from prego_tpu.core import RecognitionConfig
from prego_tpu.models.miniroad import MiniROAD

CFG = RecognitionConfig.from_dict(
    {
        "rgb_type": "rgb_kinetics_bninception",  # 1024-dim, keeps the test fast
        "flow_type": "flow_kinetics_bninception",
        "embedding_dim": 64,
        "hidden_dim": 48,
        "num_layers": 1,
        "num_classes": 9,
        "dropout": 0.2,
    }
)


class TorchOracle(torch.nn.Module):
    """Independent re-statement of the published MROAD architecture."""

    def __init__(self, model: MiniROAD, params):
        super().__init__()
        p = lambda a: torch.tensor(np.asarray(a))
        self.lin = torch.nn.Linear(model.input_dim, model.embedding_dim)
        self.ln = torch.nn.LayerNorm(model.embedding_dim)
        self.gru = torch.nn.GRU(model.embedding_dim, model.hidden_dim, 1, batch_first=True)
        self.cls = torch.nn.Linear(model.hidden_dim, model.num_classes)
        with torch.no_grad():
            self.lin.weight.copy_(p(params["embed"]["w"]).T)
            self.lin.bias.copy_(p(params["embed"]["b"]))
            self.ln.weight.copy_(p(params["ln"]["scale"]))
            self.ln.bias.copy_(p(params["ln"]["bias"]))
            g = params["gru"][0]
            self.gru.weight_ih_l0.copy_(p(g["w_ih"]).T)
            self.gru.bias_ih_l0.copy_(p(g["b_ih"]))
            self.gru.weight_hh_l0.copy_(p(g["w_hh"]).T)
            self.gru.bias_hh_l0.copy_(p(g["b_hh"]))
            self.cls.weight.copy_(p(params["cls"]["w"]).T)
            self.cls.bias.copy_(p(params["cls"]["b"]))

    def forward(self, rgb, flow, softmax):
        x = torch.cat((rgb, flow), 2)
        x = torch.relu(self.ln(self.lin(x)))
        h0 = torch.zeros(1, x.shape[0], self.gru.hidden_size)
        ht, _ = self.gru(x, h0)
        logits = self.cls(torch.relu(ht))
        return torch.softmax(logits, dim=-1) if softmax else logits


@pytest.fixture(scope="module")
def model_and_params():
    model = MiniROAD(CFG)
    params = model.init(jax.random.PRNGKey(7))
    return model, params


def test_forward_full_matches_torch(model_and_params, rng):
    model, params = model_and_params
    B, T = 2, 30
    rgb = rng.normal(0, 1, (B, T, model.rgb_dim)).astype(np.float32)
    flow = rng.normal(0, 1, (B, T, model.flow_dim)).astype(np.float32)

    ours = model.forward_full(params, jnp.asarray(rgb), jnp.asarray(flow), softmax=True)
    oracle = TorchOracle(model, params)
    with torch.no_grad():
        theirs = oracle(torch.tensor(rgb), torch.tensor(flow), softmax=True)
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), rtol=1e-4, atol=1e-5)


def test_flow_zero_fast_path(model_and_params, rng):
    model, params = model_and_params
    B, T = 2, 12
    rgb = rng.normal(0, 1, (B, T, model.rgb_dim)).astype(np.float32)
    zero_flow = np.zeros((B, T, model.flow_dim), np.float32)

    fast = model.forward_full(params, jnp.asarray(rgb), jnp.asarray(zero_flow), flow_is_zero=True)
    slow = model.forward_full(params, jnp.asarray(rgb), jnp.asarray(zero_flow), flow_is_zero=False)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(slow), rtol=1e-5, atol=1e-6)


def test_forward_step_matches_full(model_and_params, rng):
    model, params = model_and_params
    B, T = 2, 15
    rgb = rng.normal(0, 1, (B, T, model.rgb_dim)).astype(np.float32)
    flow = rng.normal(0, 1, (B, T, model.flow_dim)).astype(np.float32)

    full = np.asarray(model.forward_full(params, jnp.asarray(rgb), jnp.asarray(flow)))
    hidden = model.init_hidden(B)
    steps = []
    for t in range(T):
        s, hidden = model.forward_step(
            params, jnp.asarray(rgb[:, t]), jnp.asarray(flow[:, t]), hidden
        )
        steps.append(np.asarray(s))
    np.testing.assert_allclose(np.stack(steps, axis=1), full, rtol=1e-4, atol=1e-5)


def test_train_logits_equal_eval_last_frame(model_and_params, rng):
    model, params = model_and_params
    B, T = 3, 10
    rgb = rng.normal(0, 1, (B, T, model.rgb_dim)).astype(np.float32)
    flow = rng.normal(0, 1, (B, T, model.flow_dim)).astype(np.float32)

    # dropout off (eval-mode math) when comparing: use a model with p=0
    cfg0 = RecognitionConfig.from_dict({**CFG.to_dict(), "dropout": 0.0})
    model0 = MiniROAD(cfg0)
    logits_train = model0.forward_train(
        params, jnp.asarray(rgb), jnp.asarray(flow), jax.random.PRNGKey(0)
    )
    logits_full = model0.forward_full(params, jnp.asarray(rgb), jnp.asarray(flow), softmax=False)
    np.testing.assert_allclose(
        np.asarray(logits_train), np.asarray(logits_full)[:, -1], rtol=1e-5, atol=1e-6
    )
