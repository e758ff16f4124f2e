"""Fused SwiGLU FFN kernel vs the three-op XLA reference (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from prego_tpu.ops.fused_ffn import fused_ffn, fused_ffn_block, fused_ffn_reference


@pytest.mark.parametrize("M,D,F,fb", [
    (8, 256, 512, 128),    # decode-shaped: F tiles
    (8, 256, 384, 512),    # F smaller than wanted block -> halving path
    (1, 128, 256, 128),    # batch 1
    (16, 128, 250, 512),   # F with no 128-multiple divisor -> single tile
])
def test_fused_ffn_matches_reference(M, D, F, fb):
    rng = np.random.default_rng(M + F)
    x = jnp.asarray(rng.normal(0, 1, (M, D)).astype(np.float32))
    w13 = jnp.asarray(rng.normal(0, 0.05, (D, 2 * F)).astype(np.float32))
    w2 = jnp.asarray(rng.normal(0, 0.05, (F, D)).astype(np.float32))
    got = fused_ffn(x, w13, w2, f_block=fb, interpret=True)
    want = fused_ffn_reference(x, w13, w2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("M,D,F,fb", [
    (8, 256, 512, 128),
    (1, 128, 256, 128),
    (4, 256, 384, 512),
])
def test_fused_ffn_block_matches_unfused_sublayer(M, D, F, fb):
    """The norm-prologue + residual-epilogue kernel must reproduce the
    exact unfused sub-layer sequence h + ffn(rms_norm(h))."""
    from prego_tpu.models.llama.model import rms_norm

    eps = 1e-5
    rng = np.random.default_rng(M * 7 + F)
    h = jnp.asarray(rng.normal(0, 1, (M, D)).astype(np.float32))
    nw = jnp.asarray(rng.normal(1, 0.1, (D,)).astype(np.float32))
    w13 = jnp.asarray(rng.normal(0, 0.05, (D, 2 * F)).astype(np.float32))
    w2 = jnp.asarray(rng.normal(0, 0.05, (F, D)).astype(np.float32))

    got = fused_ffn_block(h, nw, w13, w2, eps, f_block=fb, interpret=True)
    xn = rms_norm(h, nw, eps)
    want = h + fused_ffn_reference(xn, w13, w2).astype(h.dtype)
    assert got.dtype == h.dtype
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("M,D,F,fb", [
    (8, 256, 512, 128),
    (1, 128, 256, 128),
])
def test_fused_ffn_block_q8_matches_unfused_int8_path(M, D, F, fb):
    """The int8 fused sub-layer must reproduce the unfused sequence:
    rms_norm -> int8_matmul(w13) -> silu*up -> int8_matmul(w2) -> +h,
    with the same dequant convention (cast-then-post-scale)."""
    from prego_tpu.models.llama.model import rms_norm
    from prego_tpu.ops.fused_ffn import fused_ffn_block_q8
    from prego_tpu.ops.quant import int8_matmul_reference, quantize_weight

    eps = 1e-5
    rng = np.random.default_rng(M * 13 + F)
    h = jnp.asarray(rng.normal(0, 1, (M, D)).astype(np.float32))
    nw = jnp.asarray(rng.normal(1, 0.1, (D,)).astype(np.float32))
    w13 = jnp.asarray(rng.normal(0, 0.05, (D, 2 * F)).astype(np.float32))
    w2 = jnp.asarray(rng.normal(0, 0.05, (F, D)).astype(np.float32))
    w13q, w13s = quantize_weight(w13)
    w2q, w2s = quantize_weight(w2)

    got = fused_ffn_block_q8(
        h, nw, w13q, w13s, w2q, w2s, eps, f_block=fb, interpret=True
    )
    xn = rms_norm(h, nw, eps)
    g13 = int8_matmul_reference(xn, w13q, w13s)
    gate, up = g13[..., :F], g13[..., F:]
    act = (jax.nn.silu(gate) * up).astype(xn.dtype)
    want = h + int8_matmul_reference(act, w2q, w2s).astype(h.dtype)
    assert got.dtype == h.dtype
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-3, atol=2e-3)


def test_ffn_sublayer_dispatch_matches_legacy():
    """model._ffn_sublayer (CPU: XLA fallback path) equals the legacy
    two-op sequence for both fused and unfused param layouts."""
    from prego_tpu.models.llama import init_params, tiny_test_config
    from prego_tpu.models.llama.model import (
        _feed_forward, _ffn_sublayer, fuse_projections, rms_norm,
    )

    cfg = tiny_test_config()
    raw = init_params(cfg, jax.random.PRNGKey(5), dtype=jnp.float32)
    h = jnp.asarray(
        np.random.default_rng(1).normal(0, 1, (2, 1, cfg.dim)).astype(np.float32)
    )
    for params in (raw, fuse_projections(raw)):
        layer = params["layers"][0]
        want = h + _feed_forward(
            layer["feed_forward"], rms_norm(h, layer["ffn_norm"], cfg.norm_eps)
        )
        got = _ffn_sublayer(layer, h, cfg)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)


def test_decode_equality_with_and_without_fused_ffn(monkeypatch):
    """End-to-end greedy decode must be identical with the fused-FFN path
    forced on (interpret via CPU fallback is exercised by forcing the
    supported() check; on CPU the flag keeps the XLA path, so compare
    the kernel directly at the model's FFN seam instead)."""
    from prego_tpu.models.llama import init_params, tiny_test_config
    from prego_tpu.models.llama.model import _feed_forward, fuse_projections

    cfg = tiny_test_config()
    params = fuse_projections(init_params(cfg, jax.random.PRNGKey(3), dtype=jnp.float32))
    layer = params["layers"][0]["feed_forward"]
    x = jnp.asarray(np.random.default_rng(0).normal(0, 1, (4, 1, cfg.dim)).astype(np.float32))

    ref = _feed_forward(layer, x)  # CPU: XLA path
    got = fused_ffn(
        x.reshape(4, cfg.dim), layer["w13"], layer["w2"], interpret=True
    ).reshape(4, 1, cfg.dim).astype(x.dtype)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)
