"""Sequence-parallel (context-parallel) LLaMA prefill.

Long prompts are sharded along the SEQUENCE axis of the mesh: every device
embeds and projects only its token block (the MLP/projection FLOPs are
token-parallel), and XLA's SPMD partitioner inserts the collectives needed
for attention against the full KV. The returned cache is replicated so
standard decode continues unchanged.

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


def make_sp_prefill(config: LlamaConfig, mesh: Mesh, axis: str = "sp"):
    """Build a jitted prefill with tokens sharded (batch, seq->axis).

    Returns fn(params, tokens (B, S), start_pos, cache) -> (logits, cache);
    S must be divisible by the axis size.
    """
    rep = NamedSharding(mesh, P())
    tok_sharding = NamedSharding(mesh, P(None, axis))

    @functools.partial(
        jax.jit,
        static_argnames=("cfg",),
        in_shardings=(rep, tok_sharding, None, rep),
        out_shardings=(NamedSharding(mesh, P(None, axis)), rep),
    )
    def sp_prefill(params: Params, tokens, start_pos, cache: Cache, cfg=config):
        return forward(params, tokens, start_pos, cache, cfg)

    return sp_prefill
