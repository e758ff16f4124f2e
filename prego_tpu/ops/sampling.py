"""Token sampling.

Parity surface: sample_top_p (llama/generation.py:398-421): sort
descending, keep the smallest prefix whose cumulative mass exceeds top_p
(mask where cumsum - p_i > p), renormalize over the kept set, sample, map
back through the sort indices. Greedy argmax at temperature 0
(generation.py:190-194).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_top_p(probs: jax.Array, p: float, key: jax.Array) -> jax.Array:
    """probs: (B, V) f32 probabilities. Returns (B,) int32 sampled ids."""
    V = probs.shape[-1]
    probs_sort, probs_idx = jax.lax.top_k(probs, V)  # descending sort
    cumsum = jnp.cumsum(probs_sort, axis=-1)
    mask = cumsum - probs_sort > p  # same exclusive-prefix rule as reference
    probs_sort = jnp.where(mask, 0.0, probs_sort)
    probs_sort = probs_sort / jnp.sum(probs_sort, axis=-1, keepdims=True)
    sampled = jax.random.categorical(key, jnp.log(probs_sort))
    return jnp.take_along_axis(probs_idx, sampled[:, None], axis=-1)[:, 0]


def processed_probs(
    logits: jax.Array,  # (B, V) f32
    temperature: float,
    top_p: float,
) -> jax.Array:
    """The EXACT distribution sample_next_token draws from at
    temperature>0: softmax at temperature, then the reference's
    exclusive-prefix nucleus truncation, renormalized and scattered back
    to vocab order. Speculative decoding's rejection step needs this
    vector for both models — the Leviathan/Chen accept rule
    min(1, p(x)/q(x)) with residual norm(max(p-q, 0)) preserves the
    target distribution only when p and q are the actual sampling
    distributions, nucleus truncation included."""
    probs = jax.nn.softmax(logits / jnp.maximum(temperature, 1e-9), axis=-1)
    V = probs.shape[-1]
    probs_sort, probs_idx = jax.lax.top_k(probs, V)
    cumsum = jnp.cumsum(probs_sort, axis=-1)
    keep = ~(cumsum - probs_sort > top_p)
    probs_sort = jnp.where(keep, probs_sort, 0.0)
    probs_sort = probs_sort / jnp.sum(probs_sort, axis=-1, keepdims=True)
    # scatter the sorted values back to vocab coordinates
    out = jnp.zeros_like(probs)
    return jax.vmap(lambda o, idx, val: o.at[idx].set(val))(
        out, probs_idx, probs_sort
    )


def sample_next_token(
    logits: jax.Array,  # (B, V) f32
    key: jax.Array,
    temperature: float,
    top_p: float,
) -> jax.Array:
    """Temperature>0 -> nucleus sampling; ==0 -> greedy (generation.py:190-194)."""

    def sampled(_):
        probs = jax.nn.softmax(logits / jnp.maximum(temperature, 1e-9), axis=-1)
        return sample_top_p(probs, top_p, key)

    def greedy(_):
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)

    if isinstance(temperature, (int, float)):
        return sampled(None) if temperature > 0 else greedy(None)
    return jax.lax.cond(temperature > 0, sampled, greedy, None).astype(jnp.int32)
