"""Sequence-parallel (context-parallel) LLaMA prefill.

Long prompts are sharded along the SEQUENCE axis of the mesh: every device
embeds and projects only its token block (the MLP/projection FLOPs are
token-parallel), and XLA's SPMD partitioner inserts the collectives needed
for attention against the full KV.

The returned KV cache can be left sharded so prefill memory actually scales
with sp-degree (`cache_sharding="sequence"`: each device keeps only its
sequence block of every cache leaf; `"heads"`: kv-heads split, matching the
TP decode layout) or gathered to every device (`"replicated"`) for handoff
to an unsharded decode loop.

SURVEY.md §5 marks sequence sharding an optional extension beyond the
reference (whose max_seq_len is 2048 on one device); this provides the
scaling hook for much longer in-context prompt libraries.
"""

from __future__ import annotations

import functools
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from prego_tpu.models.llama.config import LlamaConfig
from prego_tpu.models.llama.model import Cache, Params, forward

CACHE_SHARDINGS = ("replicated", "sequence", "heads")


def make_sp_prefill(
    config: LlamaConfig,
    mesh: Mesh,
    axis: str = "sp",
    cache_sharding: str = "sequence",
):
    """Build a jitted prefill with tokens sharded (batch, seq->axis).

    Returns fn(params, tokens (B, S), start_pos, cache) -> (logits, cache);
    S must be divisible by the axis size. Cache leaves are (B, kv_heads,
    max_seq, hd); `cache_sharding` picks which dim (if any) stays sharded
    on the returned cache.
    """
    if cache_sharding not in CACHE_SHARDINGS:
        raise ValueError(f"cache_sharding must be one of {CACHE_SHARDINGS}")
    rep = NamedSharding(mesh, P())
    tok_sharding = NamedSharding(mesh, P(None, axis))
    cache_spec = {
        "replicated": P(),
        "sequence": P(None, None, axis, None),
        "heads": P(None, axis, None, None),
    }[cache_sharding]
    cache_out = NamedSharding(mesh, cache_spec)

    @functools.partial(
        jax.jit,
        static_argnames=("cfg",),
        in_shardings=(rep, tok_sharding, None, rep),
        out_shardings=(NamedSharding(mesh, P(None, axis)), cache_out),
    )
    def sp_prefill(params: Params, tokens, start_pos, cache: Cache, cfg=config):
        return forward(params, tokens, start_pos, cache, cfg)

    return sp_prefill
