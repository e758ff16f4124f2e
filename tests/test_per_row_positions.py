"""Per-row cache positions in model.forward (continuous-batching support).

`start_pos` may be a (B,) vector: each batch row decodes at its own
cache offset (RoPE rows gathered per row, cache scattered per row,
causal mask per row).  Parity bars:
  - equal entries == the scalar path, exactly;
  - staggered entries == running each row alone at its own offset.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from prego_tpu.models.llama import LlamaConfig, init_params
from prego_tpu.models.llama.model import forward, init_cache, precompute_rope


def _cfg(**kw):
    base = dict(
        dim=64, n_layers=2, n_heads=4, n_kv_heads=2, vocab_size=97,
        multiple_of=32, norm_eps=1e-5, max_batch_size=4, max_seq_len=32,
    )
    base.update(kw)
    return LlamaConfig(**base)


@pytest.fixture(scope="module")
def setup():
    cfg = _cfg()
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    rope = precompute_rope(cfg)
    return cfg, params, rope


def _prefill_rows(cfg, params, rope, tokens_rows, kv_quant=False):
    """Prefill each row's prompt separately into a shared B-cache via the
    per-row path, one token at a time (worst-case exercise)."""
    B = len(tokens_rows)
    cache = init_cache(cfg, B, dtype=jnp.float32, quantized=kv_quant)
    max_len = max(len(t) for t in tokens_rows)
    logits = None
    for step in range(max_len):
        # finished rows REPLAY their last token at a clamped position —
        # an idempotent cache rewrite (same token, same offset, and a
        # row's k/v depend only on its own cache prefix)
        tok = jnp.asarray(
            [[t[min(step, len(t) - 1)]] for t in tokens_rows], jnp.int32
        )
        pos = jnp.asarray([min(step, len(t) - 1) for t in tokens_rows], jnp.int32)
        logits, cache = forward(params, tok, pos, cache, cfg, rope)
    return logits, cache


def test_equal_positions_match_scalar(setup):
    cfg, params, rope = setup
    B = 3
    cache_s = init_cache(cfg, B, dtype=jnp.float32)
    cache_v = init_cache(cfg, B, dtype=jnp.float32)
    tok0 = jnp.asarray([[5, 9, 11], [7, 3, 2], [1, 4, 8]], jnp.int32)
    # build identical caches at positions 0..2 (scalar prefill)
    logits_ref, cache_s = forward(params, tok0, 0, cache_s, cfg, rope)
    logits_pr, cache_v = forward(
        params, tok0[:, :1], jnp.zeros((B,), jnp.int32), cache_v, cfg, rope
    )
    np.testing.assert_allclose(
        np.asarray(logits_ref[:, 0]), np.asarray(logits_pr[:, 0]),
        rtol=1e-5, atol=1e-5,
    )
    # one decode step at a shared offset: vector path == scalar path
    tok = jnp.asarray([[13], [17], [19]], jnp.int32)
    ls, cs = forward(params, tok, 3, cache_s, cfg, rope)
    lv, cv = forward(params, tok, jnp.full((B,), 3, jnp.int32), cache_s, cfg, rope)
    np.testing.assert_allclose(np.asarray(ls), np.asarray(lv), rtol=1e-5, atol=1e-5)
    for a, b in zip(jax.tree.leaves(cs), jax.tree.leaves(cv)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("kv_quant", [False, True])
def test_staggered_positions_match_single_rows(setup, kv_quant):
    cfg, params, rope = setup
    rows = [[5, 9, 11, 13, 2], [7, 3], [1, 4, 8]]
    logits_b, cache_b = _prefill_rows(cfg, params, rope, rows, kv_quant)
    for b, toks in enumerate(rows):
        cache_1 = init_cache(cfg, 1, dtype=jnp.float32, quantized=kv_quant)
        l1 = None
        for i, t in enumerate(toks):
            l1, cache_1 = forward(
                params, jnp.asarray([[t]], jnp.int32),
                jnp.asarray([i], jnp.int32), cache_1, cfg, rope,
            )
        # rows that already finished keep replaying their last token at a
        # clamped position in _prefill_rows; compare at each row's end
        if len(toks) == max(len(r) for r in rows):
            np.testing.assert_allclose(
                np.asarray(logits_b[b, 0]), np.asarray(l1[0, 0]),
                rtol=2e-4, atol=2e-4,
            )
        # the cache rows written while the row was live must match
        for a, c in zip(jax.tree.leaves(cache_b), jax.tree.leaves(cache_1)):
            occ = len(toks)
            if a.ndim == 4:  # (B, KV, T, hd) values
                np.testing.assert_allclose(
                    np.asarray(a[b, :, :occ]), np.asarray(c[0, :, :occ]),
                    rtol=2e-4, atol=2e-4,
                )
            else:  # (B, KV, T) int8 scales
                np.testing.assert_allclose(
                    np.asarray(a[b, :, :occ]), np.asarray(c[0, :, :occ]),
                    rtol=2e-4, atol=2e-4,
                )


def test_per_row_decode_matches_scalar_decode_per_example(setup):
    """Three rows at DIFFERENT occupancies decode one token each; every
    row must equal the same decode done alone (B=1, scalar path)."""
    cfg, params, rope = setup
    rows = [[5, 9, 11, 13], [7, 3], [1, 4, 8]]
    _, cache_b = _prefill_rows(cfg, params, rope, rows)
    tok = jnp.asarray([[23], [29], [31]], jnp.int32)
    pos = jnp.asarray([len(r) for r in rows], jnp.int32)
    logits_b, _ = forward(params, tok, pos, cache_b, cfg, rope)
    for b, toks in enumerate(rows):
        cache_1 = init_cache(cfg, 1, dtype=jnp.float32)
        for i, t in enumerate(toks):
            _, cache_1 = forward(
                params, jnp.asarray([[t]], jnp.int32), i, cache_1, cfg, rope
            )
        l1, _ = forward(
            params, tok[b : b + 1], len(toks), cache_1, cfg, rope
        )
        np.testing.assert_allclose(
            np.asarray(logits_b[b, 0]), np.asarray(l1[0, 0]),
            rtol=2e-4, atol=2e-4,
        )
