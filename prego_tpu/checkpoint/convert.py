"""Checkpoint converters: Meta / HF LLaMA weights -> prego_tpu params.

Parity surface: Llama.build's shard loading (llama/generation.py:101-120) —
the reference loads ONE consolidated.XX.pth per fairscale model-parallel
rank and requires world size == number of shard files. Here all shards are
merged on host into a single logical pytree (column-parallel weights
concatenated along torch dim 0, row-parallel along dim 1, fairscale
ParallelEmbedding along the embedding dim), transposed to the (in, out)
right-multiplication layout, and THEN sharded onto the TPU mesh via
NamedSharding — TP degree is decoupled from the file layout.

The HF exporter permutes q/k projection rows for its non-interleaved
rotary convention; `_inverse_hf_permute` restores Meta's interleaved order
so our paired-rotation RoPE (models/llama/model.py apply_rope) is correct.
"""

from __future__ import annotations

import gc
from pathlib import Path
from typing import Any, Dict

import jax.numpy as jnp
import numpy as np

from prego_tpu.models.llama.config import LlamaConfig

# torch is CPU-only in the image and used purely as a .pth reader
COLUMN_PARALLEL = ("wq", "wk", "wv", "w1", "w3", "output")  # split torch dim 0
ROW_PARALLEL = ("wo", "w2")  # split torch dim 1


def _t2np(t) -> np.ndarray:
    import torch

    return t.to(torch.float32).numpy()


def convert_meta_checkpoint(
    ckpt_dir: str, config: LlamaConfig, dtype=jnp.bfloat16
) -> Dict[str, Any]:
    """Merge Meta consolidated.*.pth shards into a params pytree."""
    import torch

    paths = sorted(Path(ckpt_dir).glob("*.pth"))
    if not paths:
        raise FileNotFoundError(f"no checkpoint files found in {ckpt_dir}")
    shards = [torch.load(p, map_location="cpu", weights_only=True) for p in paths]

    def merged(key: str) -> np.ndarray:
        tensors = [s[key] for s in shards]
        leaf = key.rsplit(".", 2)[-2] if "." in key else key
        if len(tensors) == 1:
            return _t2np(tensors[0])
        if key == "tok_embeddings.weight":
            # fairscale ParallelEmbedding splits the embedding dim (dim 1)
            return np.concatenate([_t2np(t) for t in tensors], axis=1)
        if leaf in COLUMN_PARALLEL:
            return np.concatenate([_t2np(t) for t in tensors], axis=0)
        if leaf in ROW_PARALLEL:
            return np.concatenate([_t2np(t) for t in tensors], axis=1)
        return _t2np(tensors[0])  # replicated (norm weights)

    def dense(key: str) -> jnp.ndarray:
        # torch Linear stores (out, in); our layout is (in, out)
        return jnp.asarray(merged(key).T, dtype)

    params: Dict[str, Any] = {
        "tok_embeddings": jnp.asarray(merged("tok_embeddings.weight"), dtype),
        "norm": jnp.asarray(merged("norm.weight"), dtype),
        "output": dense("output.weight"),
        "layers": [],
    }
    for i in range(config.n_layers):
        pre = f"layers.{i}"
        params["layers"].append(
            {
                "attention": {
                    "wq": dense(f"{pre}.attention.wq.weight"),
                    "wk": dense(f"{pre}.attention.wk.weight"),
                    "wv": dense(f"{pre}.attention.wv.weight"),
                    "wo": dense(f"{pre}.attention.wo.weight"),
                },
                "feed_forward": {
                    "w1": dense(f"{pre}.feed_forward.w1.weight"),
                    "w2": dense(f"{pre}.feed_forward.w2.weight"),
                    "w3": dense(f"{pre}.feed_forward.w3.weight"),
                },
                "attention_norm": jnp.asarray(
                    merged(f"{pre}.attention_norm.weight"), dtype
                ),
                "ffn_norm": jnp.asarray(merged(f"{pre}.ffn_norm.weight"), dtype),
            }
        )
    del shards
    gc.collect()
    return params


def _inverse_hf_permute(w: np.ndarray, n_heads: int) -> np.ndarray:
    """Undo HF's rotary permutation. w: torch layout (out, in)."""
    out_dim, in_dim = w.shape
    return (
        w.reshape(n_heads, 2, out_dim // n_heads // 2, in_dim)
        .transpose(0, 2, 1, 3)
        .reshape(out_dim, in_dim)
    )


def convert_hf_checkpoint(
    model_dir: str, config: LlamaConfig, dtype=jnp.bfloat16
) -> Dict[str, Any]:
    """Convert a Hugging Face LLaMA export (safetensors or .bin)."""
    state = _load_hf_state_dict(model_dir)

    def dense(key: str, permute_heads: int = 0) -> jnp.ndarray:
        w = state[key]
        if permute_heads:
            w = _inverse_hf_permute(w, permute_heads)
        return jnp.asarray(w.T, dtype)

    params: Dict[str, Any] = {
        "tok_embeddings": jnp.asarray(state["model.embed_tokens.weight"], dtype),
        "norm": jnp.asarray(state["model.norm.weight"], dtype),
        "output": dense(
            "lm_head.weight"
            if "lm_head.weight" in state
            else "model.embed_tokens.weight"
        ),
        "layers": [],
    }
    for i in range(config.n_layers):
        pre = f"model.layers.{i}"
        params["layers"].append(
            {
                "attention": {
                    "wq": dense(f"{pre}.self_attn.q_proj.weight", config.n_heads),
                    "wk": dense(f"{pre}.self_attn.k_proj.weight", config.kv_heads),
                    "wv": dense(f"{pre}.self_attn.v_proj.weight"),
                    "wo": dense(f"{pre}.self_attn.o_proj.weight"),
                },
                "feed_forward": {
                    "w1": dense(f"{pre}.mlp.gate_proj.weight"),
                    "w2": dense(f"{pre}.mlp.down_proj.weight"),
                    "w3": dense(f"{pre}.mlp.up_proj.weight"),
                },
                "attention_norm": jnp.asarray(
                    state[f"{pre}.input_layernorm.weight"], dtype
                ),
                "ffn_norm": jnp.asarray(
                    state[f"{pre}.post_attention_layernorm.weight"], dtype
                ),
            }
        )
    return params


def _load_hf_state_dict(model_dir: str) -> Dict[str, np.ndarray]:
    st_files = sorted(Path(model_dir).glob("*.safetensors"))
    state: Dict[str, np.ndarray] = {}
    if st_files:
        from safetensors.numpy import load_file

        for p in st_files:
            state.update(load_file(str(p)))
        return state
    import torch

    for p in sorted(Path(model_dir).glob("pytorch_model*.bin")):
        sd = torch.load(p, map_location="cpu", weights_only=True)
        state.update({k: _t2np(v) for k, v in sd.items()})
    if not state:
        raise FileNotFoundError(f"no HF weights found in {model_dir}")
    return state
