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


def test_fit_batch_block_divides_batch():
    """ADVICE r2: the H>=1024 VMEM clamp must still return a divisor of B
    (B=24 previously raised ValueError because min(block,16)=16 ∤ 24)."""
    from prego_tpu.ops.gru_pallas_vjp import _fit_batch_block

    assert _fit_batch_block(64, 24, 1024) == 12
    assert _fit_batch_block(64, 40, 1024) == 10
    assert _fit_batch_block(64, 56, 1024) == 14
    assert _fit_batch_block(64, 16, 1024) == 16
    assert _fit_batch_block(64, 128, 1024) == 16
    assert _fit_batch_block(64, 24, 512) == 24  # no VMEM clamp below H=1024
    assert _fit_batch_block(64, 7, 1024) == 7
    assert _fit_batch_block(64, 1, 2048) == 1


def test_odd_batch_runs_at_large_hidden():
    """End-to-end: a non-multiple-of-16 batch at H>=1024 must compile and
    match the scan reference (interpret mode; exercises the divisor fix)."""
    B, T, E, H = 24, 8, 32, 1024
    rng = np.random.default_rng(3)
    params = init_gru_params(jax.random.PRNGKey(3), E, H)
    x = jnp.asarray(rng.normal(0, 1, (B, T, E)).astype(np.float32))
    h0 = jnp.asarray(rng.normal(0, 0.5, (B, H)).astype(np.float32))
    hs_ref, hT_ref = gru_scan(x, h0, params)
    hs, hT = gru_trainable(x, h0, params, 8, 64, True, None)
    np.testing.assert_allclose(np.asarray(hs), np.asarray(hs_ref), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(hT), np.asarray(hT_ref), rtol=2e-4, atol=2e-4)
