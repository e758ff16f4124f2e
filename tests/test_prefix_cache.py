"""KV prefix caching: cached decode must equal uncached decode exactly
(greedy), across prompt growth and cache invalidation."""

import jax
import jax.numpy as jnp
import numpy as np

from prego_tpu.models.llama import (
    ByteTokenizer,
    Llama,
    init_params,
    tiny_test_config,
)


def _llama(key=9):
    tok = ByteTokenizer()
    cfg = tiny_test_config(vocab_size=tok.n_words)
    params = init_params(cfg, jax.random.PRNGKey(key), dtype=jnp.float32)
    return Llama(params, tok, cfg)


def test_prefix_cached_equals_plain_greedy():
    llama = _llama()
    prefix = list(range(10, 90))  # 80 shared tokens (>= one 64-token chunk)
    prompts = [prefix + [5, 6], prefix + [5, 7]]

    plain = llama.generate(prompts, max_gen_len=5, temperature=0.0)[0]
    cached = llama.generate_with_prefix_cache(prompts, max_gen_len=5, temperature=0.0)
    assert cached == plain
    assert llama._prefix_key is not None  # cache actually engaged

    # second call with a longer history but the same context prefix: the
    # cache key is unchanged and results still match
    prompts2 = [prefix + [5, 6, 9, 11]]
    key_before = llama._prefix_key
    plain2 = llama.generate(prompts2, max_gen_len=5, temperature=0.0)[0]
    cached2 = llama.generate_with_prefix_cache(prompts2, max_gen_len=5, temperature=0.0)
    assert cached2 == plain2
    assert llama._prefix_key == key_before  # reused, not rebuilt


def test_prefix_cache_invalidation_on_new_context():
    llama = _llama(11)
    p1 = list(range(20, 100))
    p2 = list(range(120, 200))  # different context
    c1 = llama.generate_with_prefix_cache([p1 + [3]], max_gen_len=3, temperature=0.0)
    k1 = llama._prefix_key
    c2 = llama.generate_with_prefix_cache([p2 + [3]], max_gen_len=3, temperature=0.0)
    assert llama._prefix_key != k1  # rebuilt for the new context
    plain2 = llama.generate([p2 + [3]], max_gen_len=3, temperature=0.0)[0]
    assert c2 == plain2


def test_short_prefix_falls_back():
    llama = _llama(12)
    prompts = [[1, 2, 3, 4]]  # shareable prefix < one chunk
    out = llama.generate_with_prefix_cache(prompts, max_gen_len=3, temperature=0.0)
    plain = llama.generate(prompts, max_gen_len=3, temperature=0.0)[0]
    assert out == plain
    assert llama._prefix_key is None  # fallback path, no cache built


def test_text_completion_seam_with_cache():
    llama = _llama(13)
    base = "x" * 100
    r1 = llama.text_completion(
        [base + "a", base + "b"], temperature=0.0, max_gen_len=4, use_prefix_cache=True
    )
    r2 = llama.text_completion([base + "a", base + "b"], temperature=0.0, max_gen_len=4)
    assert [r["generation"] for r in r1] == [r["generation"] for r in r2]


def test_prefix_cache_with_fused_and_quantized_params():
    """Serving transforms compose with KV prefix caching (the default
    jax-llama single-chip path is fused + cached)."""
    from prego_tpu.models.llama import tiny_test_config
    from prego_tpu.models.llama.model import fuse_projections, quantize_params

    tok = ByteTokenizer()
    cfg = tiny_test_config(vocab_size=tok.n_words)
    params = init_params(cfg, jax.random.PRNGKey(31), dtype=jnp.float32)
    prefix = list(range(10, 90))
    prompts = [prefix + [5, 6], prefix + [7, 8]]

    for transform in (fuse_projections, lambda p: quantize_params(fuse_projections(p))):
        llama = Llama(transform(params), tok, cfg)
        plain = llama.generate(prompts, max_gen_len=4, temperature=0.0)[0]
        cached = llama.generate_with_prefix_cache(prompts, max_gen_len=4, temperature=0.0)
        assert cached == plain
        assert llama._prefix_key is not None
