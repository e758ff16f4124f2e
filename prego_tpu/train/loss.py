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
