"""Weight-only int8 quantization: kernel parity and model-level accuracy."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from prego_tpu.models.llama import (
    ByteTokenizer,
    Llama,
    forward,
    init_cache,
    init_params,
    tiny_test_config,
)
from prego_tpu.models.llama.model import quantize_params
from prego_tpu.ops.quant import int8_matmul, int8_matmul_reference, quantize_weight


def test_quantize_roundtrip_error_bounded(rng):
    w = rng.normal(0, 0.05, (64, 128)).astype(np.float32)
    q, s = quantize_weight(jnp.asarray(w))
    deq = np.asarray(q, np.float32) * np.asarray(s)
    # per-channel symmetric int8: error <= scale/2 per element
    assert np.max(np.abs(deq - w) / np.asarray(s)) <= 0.5 + 1e-6


def test_int8_matmul_kernel_matches_reference(rng):
    M, K, N = 8, 128, 512
    x = jnp.asarray(rng.normal(0, 1, (M, K)).astype(np.float32)).astype(jnp.bfloat16)
    w = rng.normal(0, 0.05, (K, N)).astype(np.float32)
    q, s = quantize_weight(jnp.asarray(w))
    ref = int8_matmul_reference(x, q, s)
    got = int8_matmul(x, q, s, n_block=256, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-2, atol=2e-2)


def test_int8xint8_kernel_matches_reference(rng):
    from prego_tpu.ops.quant import (
        int8xint8_matmul,
        int8xint8_matmul_reference,
        quantize_activations,
    )

    M, K, N = 8, 128, 512
    x = jnp.asarray(rng.normal(0, 1, (M, K)).astype(np.float32))
    w = rng.normal(0, 0.05, (K, N)).astype(np.float32)
    q, s = quantize_weight(jnp.asarray(w))
    xq, xs = quantize_activations(x)
    ref = int8xint8_matmul_reference(xq, xs, q, s)
    got = int8xint8_matmul(xq, xs, q, s, n_block=256, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)
    # and the quantized product tracks the true product
    true = x @ jnp.asarray(w)
    err = np.abs(np.asarray(ref) - np.asarray(true))
    assert np.median(err / np.maximum(np.abs(np.asarray(true)), 1e-3)) < 0.05


def test_quantized_forward_close_and_greedy_mostly_agrees(rng):
    tok = ByteTokenizer()
    cfg = tiny_test_config(vocab_size=tok.n_words)
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    qparams = quantize_params(params)

    tokens = rng.integers(0, 200, (2, 12)).astype(np.int32)
    cache = init_cache(cfg, 2, dtype=jnp.float32)
    full, _ = forward(params, jnp.asarray(tokens), jnp.int32(0), cache, cfg)
    cache2 = init_cache(cfg, 2, dtype=jnp.float32)
    quant, _ = forward(qparams, jnp.asarray(tokens), jnp.int32(0), cache2, cfg)

    # logits drift stays small relative to their scale
    denom = np.maximum(np.abs(np.asarray(full)), 1.0)
    rel = np.abs(np.asarray(quant) - np.asarray(full)) / denom
    assert np.median(rel) < 0.05

    # greedy next-token prediction agrees on most positions
    agree = np.mean(
        np.argmax(np.asarray(full), -1) == np.argmax(np.asarray(quant), -1)
    )
    assert agree >= 0.7

    # generation runs end to end on quantized weights
    llama = Llama(qparams, tok, cfg)
    out = llama.generate([[5, 6, 7]], max_gen_len=5, temperature=0.0)[0][0]
    assert len(out) <= 5


def test_fused_projections_equal_unfused(rng):
    from prego_tpu.models.llama.model import fuse_projections

    tok = ByteTokenizer()
    cfg = tiny_test_config(vocab_size=tok.n_words)
    params = init_params(cfg, jax.random.PRNGKey(5), dtype=jnp.float32)
    fused = fuse_projections(params)

    tokens = rng.integers(0, 200, (2, 9)).astype(np.int32)
    c1 = init_cache(cfg, 2, dtype=jnp.float32)
    c2 = init_cache(cfg, 2, dtype=jnp.float32)
    a, _ = forward(params, jnp.asarray(tokens), jnp.int32(0), c1, cfg)
    b, _ = forward(fused, jnp.asarray(tokens), jnp.int32(0), c2, cfg)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)

    # fuse + quantize compose
    fq = quantize_params(fused)
    c3 = init_cache(cfg, 2, dtype=jnp.float32)
    q, _ = forward(fq, jnp.asarray(tokens), jnp.int32(0), c3, cfg)
    agree = np.mean(np.argmax(np.asarray(a), -1) == np.argmax(np.asarray(q), -1))
    assert agree >= 0.7


def test_lm_head_width_tiles():
    """32000-vocab lm-head: N % 512 != 0 must NOT fall back to a single
    (M, 32000) tile (scoped-VMEM OOM found by the 7B bench); the picker
    chooses a lane-aligned divisor and results stay exact."""
    import numpy as np
    from prego_tpu.ops.quant import (
        _pick_n_block, int8_matmul, int8_matmul_reference, quantize_weight,
    )

    assert _pick_n_block(32000, 512) == 256
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(0, 1, (4, 64)).astype(np.float32))
    w = jnp.asarray(rng.normal(0, 0.1, (64, 1000)).astype(np.float32))
    q, s = quantize_weight(w)  # N=1000: divisor 250 (no 128-multiple <= 512)
    got = int8_matmul(x, q, s, interpret=True)
    want = int8_matmul_reference(x, q, s)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_init_params_quantized_matches_serving_layout():
    """Fabricated direct-int8 params must be structurally identical to
    fuse_projections(quantize_params(init_params(...))) and run the same
    forward code path (tiny shapes, CPU)."""
    import numpy as np
    from prego_tpu.models.llama import ByteTokenizer, Llama, init_params, tiny_test_config
    from prego_tpu.models.llama.model import (
        fuse_projections, init_params_quantized,
    )

    tok = ByteTokenizer()
    cfg = tiny_test_config(vocab_size=tok.n_words)
    ref = quantize_params(fuse_projections(
        init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    ))
    fab = init_params_quantized(cfg, jax.random.PRNGKey(0), fused=True,
                                dtype=jnp.float32)
    assert jax.tree.structure(ref) == jax.tree.structure(fab)
    for a, b in zip(jax.tree.leaves(ref), jax.tree.leaves(fab)):
        assert a.shape == b.shape and a.dtype == b.dtype, (a.shape, b.shape)
    # effective weight magnitude matches init_params' 1/sqrt(d_in) scaling
    w13 = fab["layers"][0]["feed_forward"]["w13"]
    eff = np.asarray(w13["q"], np.float32) * np.asarray(w13["s"])
    rms = float(np.sqrt((eff ** 2).mean()))
    expect = 1.0 / np.sqrt(cfg.dim)
    assert 0.5 * expect < rms < 2.0 * expect
    # and it actually decodes through the serving path
    llama = Llama(fab, tok, cfg)
    out = llama.generate([[1, 2, 3]], max_gen_len=3, temperature=0.0)[0]
    assert len(out[0]) == 3
    # activations=True adds the int8x8 marker leaf-free
    fab8 = init_params_quantized(cfg, jax.random.PRNGKey(0), activations=True,
                                 dtype=jnp.float32)
    assert "act" in fab8["output"]
    assert len(jax.tree.leaves(fab8)) == len(jax.tree.leaves(fab))
