"""GRU numerics vs torch.nn.GRU (the reference's cuDNN recurrence oracle)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from prego_tpu.ops.gru import gru_scan, init_gru_params


def _to_torch_gru(params, input_dim, hidden_dim):
    gru = torch.nn.GRU(input_dim, hidden_dim, 1, batch_first=True)
    with torch.no_grad():
        gru.weight_ih_l0.copy_(torch.tensor(np.asarray(params["w_ih"]).T))
        gru.bias_ih_l0.copy_(torch.tensor(np.asarray(params["b_ih"])))
        gru.weight_hh_l0.copy_(torch.tensor(np.asarray(params["w_hh"]).T))
        gru.bias_hh_l0.copy_(torch.tensor(np.asarray(params["b_hh"])))
    return gru


def test_gru_matches_torch(rng):
    B, T, E, H = 3, 17, 32, 24
    key = jax.random.PRNGKey(0)
    params = init_gru_params(key, E, H)
    x = rng.normal(0, 1, (B, T, E)).astype(np.float32)
    h0 = np.zeros((B, H), np.float32)

    hs, hT = gru_scan(jnp.asarray(x), jnp.asarray(h0), params)

    gru = _to_torch_gru(params, E, H)
    with torch.no_grad():
        t_hs, t_hT = gru(torch.tensor(x), torch.tensor(h0)[None])

    np.testing.assert_allclose(np.asarray(hs), t_hs.numpy(), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(hT), t_hT[0].numpy(), rtol=1e-5, atol=1e-5)


def test_gru_nonzero_h0_and_unroll(rng):
    B, T, E, H = 2, 13, 16, 8
    params = init_gru_params(jax.random.PRNGKey(1), E, H)
    x = rng.normal(0, 1, (B, T, E)).astype(np.float32)
    h0 = rng.normal(0, 1, (B, H)).astype(np.float32)

    hs1, _ = gru_scan(jnp.asarray(x), jnp.asarray(h0), params, unroll=1)
    hs4, _ = gru_scan(jnp.asarray(x), jnp.asarray(h0), params, unroll=4)
    np.testing.assert_allclose(np.asarray(hs1), np.asarray(hs4), rtol=1e-6, atol=1e-6)

    gru = _to_torch_gru(params, E, H)
    with torch.no_grad():
        t_hs, _ = gru(torch.tensor(x), torch.tensor(h0)[None])
    np.testing.assert_allclose(np.asarray(hs1), t_hs.numpy(), rtol=1e-5, atol=1e-5)


def test_gru_chunked_carry_equals_full(rng):
    """Chunked streaming with carried state == one full scan (eval memory plan)."""
    B, T, E, H = 2, 40, 16, 8
    params = init_gru_params(jax.random.PRNGKey(2), E, H)
    x = rng.normal(0, 1, (B, T, E)).astype(np.float32)
    h = jnp.zeros((B, H))
    outs = []
    for t0 in range(0, T, 7):
        hs, h = gru_scan(jnp.asarray(x[:, t0 : t0 + 7]), h, params)
        outs.append(np.asarray(hs))
    full, _ = gru_scan(jnp.asarray(x), jnp.zeros((B, H)), params)
    np.testing.assert_allclose(
        np.concatenate(outs, axis=1), np.asarray(full), rtol=1e-5, atol=1e-5
    )
