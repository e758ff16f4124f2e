"""Flash-decode attention: fused single-token GQA over the KV cache.

XLA lowers the S=1 decode attention contraction to a VPU multiply-reduce
that profiles ~5x off the K/V-read bandwidth floor (441 us/layer at
B=8, T=1024, 16 heads — see RESULTS.md). This kernel streams the
head-major (B, KV, T, hd) cache through VMEM in T blocks with an online
(streaming) softmax, the classic flash-attention recurrence specialized to
one query token:

  per block: s = q k^T (MXU), masked by the valid cache length;
  m' = max(m, max s);  alpha = exp(m - m');
  l <- l*alpha + sum exp(s - m');  acc <- acc*alpha + exp(s - m') V.

Grid is (B, T_blocks) with T innermost; the running (m, l, acc) state
lives in VMEM scratch across the sequential block walk, and the output is
normalized once at the last block. Heads are walked with a static python
loop over the untiled leading dim of each block.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _decode_kernel(
    valid_ref,  # (1, 1) SMEM int32 — number of valid cache positions
    q_ref,  # (1, KV, R, hd)
    k_ref,  # (1, KV, Tb, hd)
    v_ref,  # (1, KV, Tb, hd)
    out_ref,  # (1, KV, R, hd)
    m_ref,  # (KV, R, 128) f32 scratch — running max (lane-replicated)
    l_ref,  # (KV, R, 128) f32 scratch — running normalizer
    acc_ref,  # (KV, R, hd) f32 scratch
    *,
    kv_heads: int,
    t_block: int,
    head_dim: int,
):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, -1e30)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    valid = valid_ref[0, 0]
    scale = jax.lax.rsqrt(jnp.asarray(head_dim, jnp.float32))
    base = t * t_block

    for g in range(kv_heads):  # static walk over the untiled head dim
        q_g = q_ref[0, g]  # (R, hd)
        k_g = k_ref[0, g]  # (Tb, hd)
        s = (
            jax.lax.dot_general(
                q_g, k_g, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            * scale
        )  # (R, Tb)
        pos = base + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(pos < valid, s, -1e30)

        m_old = m_ref[g][:, :1]  # (R, 1)
        m_new = jnp.maximum(m_old, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp(m_old - m_new)  # (R, 1)
        p = jnp.exp(s - m_new)  # (R, Tb)

        l_new = l_ref[g][:, :1] * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc_ref[g] = acc_ref[g] * alpha + jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0, g], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_ref[g] = jnp.broadcast_to(m_new, m_ref[g].shape)
        l_ref[g] = jnp.broadcast_to(l_new, l_ref[g].shape)

    @pl.when(t == pl.num_programs(1) - 1)
    def _():
        for g in range(kv_heads):
            denom = jnp.maximum(l_ref[g][:, :1], 1e-30)
            out_ref[0, g] = (acc_ref[g] / denom).astype(out_ref.dtype)


def decode_attention(
    q: jax.Array,  # (B, KV, R, hd) — query for ONE token per sequence
    cache_k: jax.Array,  # (B, KV, T, hd)
    cache_v: jax.Array,  # (B, KV, T, hd)
    valid_len: jax.Array,  # scalar int32 — attend to positions < valid_len
    t_block: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """Returns (B, KV, R, hd) attention output in q's dtype."""
    B, KV, R, hd = q.shape
    T = cache_k.shape[2]
    if T % t_block != 0:
        raise ValueError(f"T={T} not a multiple of t_block={t_block}")
    n_t = T // t_block

    kernel = functools.partial(
        _decode_kernel, kv_heads=KV, t_block=t_block, head_dim=hd
    )
    valid = jnp.asarray(valid_len, jnp.int32).reshape(1, 1)
    return pl.pallas_call(
        kernel,
        grid=(B, n_t),
        in_specs=[
            pl.BlockSpec((1, 1), lambda b, t: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, KV, R, hd), lambda b, t: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, KV, t_block, hd), lambda b, t: (b, 0, t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, KV, t_block, hd), lambda b, t: (b, 0, t, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, KV, R, hd), lambda b, t: (b, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, KV, R, hd), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((KV, R, 128), jnp.float32),
            pltpu.VMEM((KV, R, 128), jnp.float32),
            pltpu.VMEM((KV, R, hd), jnp.float32),
        ],
        interpret=interpret,
    )(valid, q, cache_k, cache_v)


def decode_attention_reference(q, cache_k, cache_v, valid_len):
    """Plain-XLA reference with identical semantics (testing/fallback)."""
    hd = q.shape[-1]
    scores = jnp.einsum(
        "bgrh,bgth->bgrt", q, cache_k, preferred_element_type=jnp.float32
    ) / jnp.sqrt(jnp.asarray(hd, jnp.float32))
    T = cache_k.shape[2]
    mask = jnp.arange(T)[None, None, None, :] < valid_len
    scores = jnp.where(mask, scores, -jnp.inf)
    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    return jnp.einsum(
        "bgrt,bgth->bgrh", probs, cache_v, preferred_element_type=jnp.float32
    ).astype(q.dtype)
