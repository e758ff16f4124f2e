"""ops/fused_dense.py — int8 projection with fused norm prologue /
residual epilogue must reproduce the unfused op sequences exactly
(same dequant convention as ops/quant.py::int8_matmul, same rms_norm
dtype walk as models/llama/model.py::rms_norm)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from prego_tpu.models.llama.model import rms_norm
from prego_tpu.ops.fused_dense import _pick_block, fused_dense_q8
from prego_tpu.ops.quant import int8_matmul_reference, quantize_weight


def _mk(M, K, N, seed):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(0, 1, (M, K)).astype(np.float32))
    w = jnp.asarray(rng.normal(0, 0.05, (K, N)).astype(np.float32))
    q, s = quantize_weight(w)
    return rng, x, q, s


@pytest.mark.parametrize("M,K,N", [(8, 256, 512), (1, 128, 384)])
def test_norm_prologue_matches_unfused(M, K, N):
    """fused(norm_weight=...) == int8_matmul(rms_norm(x)) cast to out_dtype."""
    eps = 1e-5
    rng, x, q, s = _mk(M, K, N, seed=N)
    nw = jnp.asarray(rng.normal(1, 0.1, (K,)).astype(np.float32))

    got = fused_dense_q8(
        x, q, s, norm_weight=nw, eps=eps, out_dtype=x.dtype,
        n_block=128, interpret=True,
    )
    want = int8_matmul_reference(rms_norm(x, nw, eps), q, s).astype(x.dtype)
    assert got.dtype == x.dtype
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("M,K,N", [(8, 384, 256), (1, 128, 128)])
def test_residual_epilogue_matches_unfused(M, K, N):
    """fused(residual=...) == residual + int8_matmul(x).astype(residual.dtype)."""
    rng, x, q, s = _mk(M, K, N, seed=M * 7 + N)
    res = jnp.asarray(rng.normal(0, 1, (M, N)).astype(np.float32))

    got = fused_dense_q8(x, q, s, residual=res, n_block=128, interpret=True)
    want = res + int8_matmul_reference(x, q, s).astype(res.dtype)
    assert got.dtype == res.dtype
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-3, atol=2e-3)


def test_bf16_dtype_walk_matches_unfused():
    """bf16 stream: rounding must match the unfused path bit-for-bit
    (the fused kernel replicates the exact cast order)."""
    eps = 1e-5
    rng, x, q, s = _mk(4, 256, 256, seed=3)
    x = x.astype(jnp.bfloat16)
    nw = jnp.asarray(rng.normal(1, 0.1, (256,)).astype(np.float32)).astype(
        jnp.bfloat16
    )
    res = jnp.asarray(rng.normal(0, 1, (4, 256))).astype(jnp.bfloat16)

    got_n = fused_dense_q8(
        x, q, s, norm_weight=nw, eps=eps, out_dtype=x.dtype,
        n_block=128, interpret=True,
    )
    want_n = int8_matmul_reference(rms_norm(x, nw, eps), q, s).astype(x.dtype)
    np.testing.assert_array_equal(np.asarray(got_n), np.asarray(want_n))

    got_r = fused_dense_q8(x, q, s, residual=res, n_block=128, interpret=True)
    want_r = res + int8_matmul_reference(x, q, s).astype(res.dtype)
    np.testing.assert_array_equal(np.asarray(got_r), np.asarray(want_r))


def test_exactly_one_mode_required():
    _, x, q, s = _mk(2, 128, 128, seed=0)
    with pytest.raises(AssertionError):
        fused_dense_q8(x, q, s, interpret=True)
    with pytest.raises(AssertionError):
        fused_dense_q8(
            x, q, s,
            norm_weight=jnp.ones((128,)),
            residual=jnp.zeros((2, 128)),
            interpret=True,
        )


def test_pick_block_7b_shapes():
    """The three 7B call-site shapes must tile under the VMEM rule and
    divide N (qkv 12288, wo 4096, lm-head 32000 — all with K=4096)."""
    for N in (12288, 4096, 32000):
        nb = _pick_block(N, 4096, 256)
        assert N % nb == 0
        assert 4096 * nb * 6 <= 9_000_000
        assert nb >= 128


def test_odd_n_falls_back_to_divisor():
    nb = _pick_block(320, 128, 256)
    assert 320 % nb == 0


def test_forward_dispatch_equality(monkeypatch):
    """A full int8 decode step through model.forward with the fused-dense
    gate ON (kernels in interpret mode) must equal the gated-off path:
    this covers all three dispatch sites — norm+qkv, wo+residual,
    final-norm+lm-head — in one shot."""
    import prego_tpu.models.llama.model as model_mod
    import prego_tpu.ops.fused_dense as fd
    from prego_tpu.models.llama.model import (
        LlamaConfig,
        forward,
        init_cache,
        init_params_quantized,
        precompute_rope,
    )

    cfg = LlamaConfig(
        dim=128, n_layers=2, n_heads=2, n_kv_heads=2, vocab_size=256,
        multiple_of=64, norm_eps=1e-5, max_batch_size=2, max_seq_len=32,
    )
    params = init_params_quantized(cfg, jax.random.PRNGKey(0), fused=True)
    rope = precompute_rope(cfg)
    cache = init_cache(cfg, 2, dtype=jnp.bfloat16)
    tokens = jnp.asarray([[5], [9]], jnp.int32)
    start = jnp.asarray(3, jnp.int32)

    logits_off, cache_off = forward(params, tokens, start, cache, cfg, rope)

    orig = fd.fused_dense_q8
    monkeypatch.setattr(model_mod, "_fused_dense_q8_supported", lambda: True)
    monkeypatch.setattr(
        fd, "fused_dense_q8",
        lambda *a, **k: orig(*a, **{**k, "interpret": True}),
    )
    logits_on, cache_on = forward(params, tokens, start, cache, cfg, rope)

    np.testing.assert_allclose(
        np.asarray(logits_on), np.asarray(logits_off), rtol=2e-3, atol=2e-3
    )
    for leaf_on, leaf_off in zip(
        jax.tree.leaves(cache_on), jax.tree.leaves(cache_off)
    ):
        np.testing.assert_array_equal(np.asarray(leaf_on), np.asarray(leaf_off))
