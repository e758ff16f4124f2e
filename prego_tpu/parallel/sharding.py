"""Tensor-parallel sharding rules for the LLaMA decoder.

TPU-native replacement for fairscale's Column/RowParallelLinear +
ParallelEmbedding module classes (llama/model.py:202-235,338-346,438-449):
the SAME math runs everywhere; parallelism is expressed purely as
PartitionSpec metadata on the weight pytree, and XLA's SPMD partitioner
inserts the all-reduces over ICI (SURVEY.md §2.4).

Layout (weights stored (in, out)):
  wq/wk/wv, w1/w3 : shard OUT dim  -> P(None, 'tp')  (column-parallel)
  wo, w2          : shard IN dim   -> P('tp', None)  (row-parallel)
  tok_embeddings  : shard emb dim  -> P(None, 'tp')  (ParallelEmbedding)
  output head     : shard vocab    -> P(None, 'tp')
  norms           : replicated
  KV cache        : shard kv heads -> P(None, None, None, 'tp', None)
"""

from __future__ import annotations

from typing import Any, Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from prego_tpu.models.llama.config import LlamaConfig


def llama_param_specs(
    config: LlamaConfig, tp_axis: str = "tp",
    quantized: bool = False, fused: bool = False,
    activations: bool = False,
) -> Dict[str, Any]:
    """PartitionSpec tree matching the parameter layout.

    ``quantized=True`` matches weight-only int8 leaves ({"q": (K, N) int8,
    "s": (1, N) f32} — ops/quant.py): column-parallel projections shard
    BOTH q and the per-output-channel scales on the output dim; row-
    parallel projections shard q on the input dim and replicate s (its N
    axis is the unsharded output).

    ``activations=True`` matches the int8x8 activation-quant layout
    (structural leaf marker "act" — an empty tuple, zero pytree leaves,
    present only so the spec tree's structure matches the param tree's).
    The weight split is identical to weight-only; the runtime activation
    quantization partitions exactly under SPMD: column-parallel inputs
    are replicated (per-token amax is local), row-parallel inputs shard
    the contraction dim, where the per-token amax becomes an all-reduce
    max over tp and the int32 partial dots psum EXACTLY (integer
    accumulation is associative; rescale happens after the reduce), so
    TP output equals the single-chip act path bit-for-bit on the dot.

    ``fused=True`` matches the fused wqkv/w13 serving layout.  The specs
    are CORRECT under SPMD (every output column is independent, so a
    contiguous column split partitions the matmul fine) but NOT the
    fairscale-equivalent layout: the q|k|v / gate|up block boundaries
    cross shard boundaries, so the head-reshape slices downstream force
    XLA to reshard activations per layer.  Multi-chip serving should use
    the UNfused layout (JaxLlamaLLM does); the fused specs exist so a
    fused tree can still be laid out and verified.
    """

    def leaf(spec: P, s_spec: P):
        if not quantized:
            return spec
        out = {"q": spec, "s": s_spec}
        if activations:
            out["act"] = ()
        return out

    col = leaf(P(None, tp_axis), P(None, tp_axis))
    row = leaf(P(tp_axis, None), P())
    rep = P()
    if fused:
        attention = {"wqkv": col, "wo": row}
        feed_forward = {"w13": col, "w2": row}
    else:
        attention = {"wq": col, "wk": col, "wv": col, "wo": row}
        feed_forward = {"w1": col, "w2": row, "w3": col}
    layer = {
        "attention": attention,
        "feed_forward": feed_forward,
        "attention_norm": rep,
        "ffn_norm": rep,
    }
    return {
        "tok_embeddings": P(None, tp_axis),
        "layers": [layer for _ in range(config.n_layers)],
        "norm": rep,
        "output": leaf(P(None, tp_axis), P(None, tp_axis)),
    }


def llama_cache_specs(
    config: LlamaConfig, tp_axis: str = "tp", dp_axis: str = None,
    quantized: bool = False,
) -> Dict[str, Any]:
    """Per-layer (B, kv_heads, T, hd) cache leaves: kv heads split over tp;
    pass dp_axis to ALSO shard the batch dim for 2D dp x tp serving (weights
    replicated over dp, each dp row decoding its slice of the request
    batch — the num_samples^2 PREGO sampling batch shards cleanly).
    ``quantized`` matches int8 cache leaves ({"q","s"} — the (B, KV, T)
    scale array shards on the same batch/head axes)."""
    spec = P(dp_axis, tp_axis, None, None)
    leaf = {"q": spec, "s": P(dp_axis, tp_axis, None)} if quantized else spec
    return {
        "k": [leaf for _ in range(config.n_layers)],
        "v": [leaf for _ in range(config.n_layers)],
    }


def _compatible_spec(shape, spec: P, mesh: Mesh) -> P:
    """Drop sharding on dims the array size doesn't divide (e.g. an odd
    vocab size under the tp axis) — those dims are replicated instead."""
    fixed = []
    for i, axis in enumerate(spec):
        if axis is None:
            fixed.append(None)
            continue
        size = mesh.shape[axis] if isinstance(axis, str) else 1
        fixed.append(axis if (i < len(shape) and shape[i] % size == 0) else None)
    return P(*fixed)


def shard_params(params, specs, mesh: Mesh):
    """device_put the pytree with NamedShardings from a matching spec tree."""
    return jax.tree.map(
        lambda x, s: jax.device_put(
            x, NamedSharding(mesh, _compatible_spec(x.shape, s, mesh))
        ),
        params,
        specs,
        is_leaf=lambda x: isinstance(x, P),
    )
