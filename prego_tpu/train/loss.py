"""Training criterions.

Parity surface: OadLoss 'NONUNIFORM' (step_recognition/criterions/loss.py:6-37):
cross-entropy on the LAST frame of each window only, with the one-hot target
L2-normalized (torch F.normalize default: p=2, eps=1e-12) against
log-softmax logits, mean-reduced over the batch.

Here the model already returns last-frame logits (B, K); padding rows of a
partial batch are masked out of the mean (the reference instead ships a
smaller final batch — same expected gradient).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from prego_tpu.core.registry import CRITERIONS


def l2_normalize(t: jax.Array, eps: float = 1e-12) -> jax.Array:
    norm = jnp.sqrt(jnp.sum(t * t, axis=-1, keepdims=True))
    return t / jnp.maximum(norm, eps)


@CRITERIONS.register("NONUNIFORM")
def last_frame_mlce(
    logits: jax.Array, target_last: jax.Array, valid: jax.Array | None = None
) -> jax.Array:
    """logits: (B, K) last-frame logits; target_last: (B, K); valid: (B,)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    per_example = jnp.sum(-l2_normalize(target_last) * logp, axis=-1)  # (B,)
    if valid is None:
        return jnp.mean(per_example)
    return jnp.sum(per_example * valid) / jnp.maximum(jnp.sum(valid), 1.0)


@CRITERIONS.register("ANTICIPATION")
def anticipation_mlce(
    ant_logits: jax.Array,  # (B, L, K) last-frame anticipation logits
    ant_target: jax.Array,  # (B, L, K)
    valid: jax.Array | None = None,  # (B,)
) -> jax.Array:
    """OadAntLoss parity (criterions/loss.py:40-79): the same L2-normalized
    -target CE over the flattened (B*L, K) anticipation logits, SUM-reduced
    (the reference constructs OadAntLoss with reduction='sum')."""
    logp = jax.nn.log_softmax(ant_logits, axis=-1)
    per = jnp.sum(-l2_normalize(ant_target) * logp, axis=-1)  # (B, L)
    if valid is not None:
        per = per * valid[:, None]
    return jnp.sum(per)
