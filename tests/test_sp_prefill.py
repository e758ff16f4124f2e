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
