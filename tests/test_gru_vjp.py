"""Custom-VJP fused GRU gradients vs jax.grad of the lax.scan reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from prego_tpu.ops.gru import gru_scan, init_gru_params
from prego_tpu.ops.gru_pallas_vjp import gru_trainable


@pytest.fixture(scope="module")
def setup(rng=np.random.default_rng(0)):
    B, T, E, H = 4, 16, 24, 16
    params = init_gru_params(jax.random.PRNGKey(0), E, H)
    x = rng.normal(0, 1, (B, T, E)).astype(np.float32)
    h0 = rng.normal(0, 0.5, (B, H)).astype(np.float32)
    return jnp.asarray(x), jnp.asarray(h0), params


def _loss_scan(x, h0, params, w):
    hs, hT = gru_scan(x, h0, params)
    return jnp.sum(hs * w) + 2.0 * jnp.sum(hT**2)


def _loss_pallas(x, h0, params, w):
    hs, hT = gru_trainable(x, h0, params, 8, 64, True, None)  # interpret mode
    return jnp.sum(hs * w) + 2.0 * jnp.sum(hT**2)


def test_forward_matches(setup):
    x, h0, params = setup
    hs_ref, hT_ref = gru_scan(x, h0, params)
    hs, hT = gru_trainable(x, h0, params, 8, 64, True, None)
    np.testing.assert_allclose(np.asarray(hs), np.asarray(hs_ref), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(hT), np.asarray(hT_ref), rtol=1e-5, atol=1e-5)


def test_gradients_match_scan_autodiff(setup, rng):
    x, h0, params = setup
    w = jnp.asarray(rng.normal(0, 1, (x.shape[0], x.shape[1], h0.shape[1])).astype(np.float32))

    ref_grads = jax.grad(_loss_scan, argnums=(0, 1, 2))(x, h0, params, w)
    got_grads = jax.grad(_loss_pallas, argnums=(0, 1, 2))(x, h0, params, w)

    for ref, got, name in [
        (ref_grads[0], got_grads[0], "dx"),
        (ref_grads[1], got_grads[1], "dh0"),
    ]:
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4, err_msg=name
        )
    for k in ("w_ih", "b_ih", "w_hh", "b_hh"):
        np.testing.assert_allclose(
            np.asarray(got_grads[2][k]), np.asarray(ref_grads[2][k]),
            rtol=3e-4, atol=3e-4, err_msg=k,
        )


def test_last_frame_loss_gradients(setup):
    """The NONUNIFORM training loss shape: gradient only at the last frame."""
    x, h0, params = setup

    def loss_scan(params):
        hs, _ = gru_scan(x, h0, params)
        return jnp.sum(jax.nn.log_softmax(hs[:, -1]) ** 2)

    def loss_pallas(params):
        hs, _ = gru_trainable(x, h0, params, 8, 64, True, None)
        return jnp.sum(jax.nn.log_softmax(hs[:, -1]) ** 2)

    ref = jax.grad(loss_scan)(params)
    got = jax.grad(loss_pallas)(params)
    for k in ref:
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(ref[k]), rtol=3e-4, atol=3e-4, err_msg=k
        )
