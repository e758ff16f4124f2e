"""Pallas fused GRU vs the lax.scan reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from prego_tpu.ops.gru import gru_scan, init_gru_params
from prego_tpu.ops.gru_pallas import gru_pallas


@pytest.mark.parametrize("T", [16, 24])
def test_pallas_matches_scan(rng, T):
    B, E, H = 8, 32, 16
    params = init_gru_params(jax.random.PRNGKey(0), E, H)
    x = rng.normal(0, 1, (B, T, E)).astype(np.float32)
    h0 = jnp.zeros((B, H))

    ref_hs, ref_hT = gru_scan(jnp.asarray(x), h0, params)
    hs, hT = gru_pallas(jnp.asarray(x), h0, params, time_block=8, interpret=True)

    np.testing.assert_allclose(np.asarray(hs), np.asarray(ref_hs), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(hT), np.asarray(ref_hT), rtol=1e-5, atol=1e-5)


def test_pallas_pads_ragged_T(rng):
    B, E, H, T = 4, 16, 8, 13  # not a multiple of time_block
    params = init_gru_params(jax.random.PRNGKey(1), E, H)
    x = rng.normal(0, 1, (B, T, E)).astype(np.float32)
    h0 = jnp.zeros((B, H))

    ref_hs, ref_hT = gru_scan(jnp.asarray(x), h0, params)
    hs, hT = gru_pallas(jnp.asarray(x), h0, params, time_block=8, interpret=True)
    np.testing.assert_allclose(np.asarray(hs), np.asarray(ref_hs), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(hT), np.asarray(ref_hT), rtol=1e-5, atol=1e-5)


def test_pallas_carried_state_chunks(rng):
    """Chunked streaming with carried state — the evaluator's usage."""
    B, E, H, T = 4, 16, 8, 32
    params = init_gru_params(jax.random.PRNGKey(2), E, H)
    x = rng.normal(0, 1, (B, T, E)).astype(np.float32)

    ref_hs, _ = gru_scan(jnp.asarray(x), jnp.zeros((B, H)), params)
    h = jnp.zeros((B, H))
    outs = []
    for t0 in range(0, T, 16):
        hs, h = gru_pallas(jnp.asarray(x[:, t0 : t0 + 16]), h, params, time_block=8, interpret=True)
        outs.append(np.asarray(hs))
    np.testing.assert_allclose(
        np.concatenate(outs, axis=1), np.asarray(ref_hs), rtol=1e-5, atol=1e-5
    )
