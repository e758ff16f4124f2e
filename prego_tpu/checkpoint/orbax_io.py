"""Orbax checkpointing for large (LLaMA) parameter trees.

The reference loads Meta's consolidated .pth shards on every launch
(llama/generation.py:101-120). Here converted weights are persisted once in
Orbax's sharded array format and restored directly onto the device mesh
with the target NamedShardings — no host-side merge on subsequent launches.

Usage:
    save_llama_params(dir, params)
    params = load_llama_params(dir, config, mesh=mesh)   # sharded restore
    params = load_llama_params(dir, config)              # single-device
"""

from __future__ import annotations

import os.path as osp
from typing import Any, Dict

import jax
import jax.numpy as jnp

from prego_tpu.models.llama.config import LlamaConfig


def save_llama_params(path: str, params: Dict[str, Any]) -> None:
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(osp.abspath(path), params, force=True)


def _abstract_tree(params_like: Dict[str, Any], mesh=None, specs=None):
    if mesh is None:
        return jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), params_like
        )
    from jax.sharding import NamedSharding, PartitionSpec as P

    return jax.tree.map(
        lambda x, s: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=NamedSharding(mesh, s)),
        params_like,
        specs,
        is_leaf=lambda x: isinstance(x, P),
    )


def load_llama_params(
    path: str,
    config: LlamaConfig,
    mesh=None,
    dtype=jnp.bfloat16,
    quantized: bool = False,
    fused: bool = True,
    activations: bool = False,
) -> Dict[str, Any]:
    """Restore a params tree saved by save_llama_params. With a mesh, each
    array lands directly in its tensor-parallel NamedSharding.

    quantized=True restores a weight-only-int8 tree (as produced by
    ``quantize_params`` / ``fuse_projections(quantize_params(...))`` when
    fused=True) DIRECTLY into its int8+scale leaves — no bf16
    materialization, so a 7B model restores in its ~6.7 GB int8 footprint
    on a 16 GB chip where the 13.5 GB bf16 tree would not fit.  This is
    the single-chip serving startup path (the reference re-merges Meta's
    .pth shards on every launch, generation.py:101-120; here the
    quantize-once/restore-int8 flow replaces it).  Quantized restore is
    single-chip: tensor-parallel serving uses the UNfused layout
    (JaxLlamaLLM converts fresh instead of restoring the fused cache)."""
    import orbax.checkpoint as ocp

    from prego_tpu.models.llama.model import init_params, init_params_quantized
    from prego_tpu.parallel.sharding import llama_param_specs

    if quantized and mesh is not None:
        raise ValueError(
            "quantized restore is the single-chip serving layout; "
            "restore bf16 onto the mesh and quantize per-shard instead"
        )
    # shape/dtype skeleton without materializing weights
    if quantized:
        skeleton = jax.eval_shape(
            lambda: init_params_quantized(
                config, jax.random.PRNGKey(0), fused=fused,
                dtype=dtype, activations=activations,
            )
        )
    else:
        skeleton = jax.eval_shape(
            lambda: init_params(config, jax.random.PRNGKey(0), dtype=dtype)
        )
    specs = llama_param_specs(config) if mesh is not None else None
    abstract = _abstract_tree(skeleton, mesh, specs)
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(osp.abspath(path), abstract)
