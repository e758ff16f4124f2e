"""Sequence-parallel prefill equals single-device prefill on the 8-dev mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from prego_tpu.models.llama import forward, init_cache, init_params, tiny_test_config
from prego_tpu.parallel import make_mesh
from prego_tpu.parallel.sp import make_sp_prefill

CFG = tiny_test_config(vocab_size=96)


def test_sp_prefill_matches_single(rng):
    params = init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)
    B, S = 2, 64  # S divisible by the 8-way sp axis
    tokens = rng.integers(0, CFG.vocab_size, (B, S)).astype(np.int32)

    cache = init_cache(CFG, B, dtype=jnp.float32)
    ref_logits, ref_cache = forward(
        params, jnp.asarray(tokens), jnp.int32(0), cache, CFG
    )

    mesh = make_mesh([("sp", 8)])
    sp_prefill = make_sp_prefill(CFG, mesh)
    cache2 = init_cache(CFG, B, dtype=jnp.float32)
    sp_logits, sp_cache = sp_prefill(params, jnp.asarray(tokens), jnp.int32(0), cache2)

    np.testing.assert_allclose(
        np.asarray(sp_logits), np.asarray(ref_logits), rtol=2e-4, atol=2e-4
    )
    # cache must be usable for ordinary decode afterwards
    nxt = jnp.argmax(sp_logits[:, -1:], axis=-1).astype(jnp.int32)
    d1, _ = forward(params, nxt, jnp.int32(S), sp_cache, CFG)
    d0, _ = forward(params, nxt, jnp.int32(S), ref_cache, CFG)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d0), rtol=2e-4, atol=2e-4)


def test_sp_cache_sharding_scales_memory(rng):
    """Per-device cache bytes must shrink with sp-degree when the cache stays
    sharded (sequence: /8 on the 8-way axis; heads: /2 with 2 kv heads on a
    2-way axis), and equal the full size when replicated for decode handoff."""
    params = init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)
    B, S = 2, 64
    tokens = jnp.asarray(rng.integers(0, CFG.vocab_size, (B, S)).astype(np.int32))

    cases = [
        ("sequence", make_mesh([("sp", 8)]), 8),
        ("heads", make_mesh([("sp", 2)]), 2),  # kv_heads=2 caps the heads split
        ("replicated", make_mesh([("sp", 8)]), 1),
    ]
    ref = None
    for mode, mesh, shrink in cases:
        sp_prefill = make_sp_prefill(CFG, mesh, cache_sharding=mode)
        cache = init_cache(CFG, B, dtype=jnp.float32)
        logits, out_cache = sp_prefill(params, tokens, jnp.int32(0), cache)
        if ref is None:
            ref = np.asarray(logits)
        else:  # numerics identical across cache layouts
            np.testing.assert_allclose(np.asarray(logits), ref, rtol=2e-4, atol=2e-4)
        leaf = out_cache["k"][0]
        per_device = leaf.addressable_shards[0].data.nbytes
        assert per_device * shrink == leaf.nbytes, (mode, per_device, leaf.nbytes)


def test_sp_prefill_rejects_unknown_cache_sharding():
    import pytest

    with pytest.raises(ValueError):
        make_sp_prefill(CFG, make_mesh([("sp", 8)]), cache_sharding="diagonal")
