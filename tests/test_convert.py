"""Checkpoint converters: synthetic Meta-style sharded .pth and HF exports
round-trip into params whose forward matches the source weights
(generation.py:101-120 shard-merge semantics, fairscale split axes)."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from prego_tpu.checkpoint.convert import (
    _inverse_hf_permute,
    convert_hf_checkpoint,
    convert_meta_checkpoint,
)
from prego_tpu.models.llama import forward, init_cache, init_params, tiny_test_config

CFG = tiny_test_config(vocab_size=64)


def _params_to_meta_state(params):
    """Express our pytree as a Meta-layout state dict (torch (out,in))."""
    sd = {}
    t = lambda a: torch.tensor(np.asarray(a, np.float32))
    sd["tok_embeddings.weight"] = t(params["tok_embeddings"])
    sd["norm.weight"] = t(params["norm"])
    sd["output.weight"] = t(params["output"]).T.contiguous()
    for i, layer in enumerate(params["layers"]):
        for k in ("wq", "wk", "wv", "wo"):
            sd[f"layers.{i}.attention.{k}.weight"] = t(layer["attention"][k]).T.contiguous()
        for k in ("w1", "w2", "w3"):
            sd[f"layers.{i}.feed_forward.{k}.weight"] = t(layer["feed_forward"][k]).T.contiguous()
        sd[f"layers.{i}.attention_norm.weight"] = t(layer["attention_norm"])
        sd[f"layers.{i}.ffn_norm.weight"] = t(layer["ffn_norm"])
    return sd


def _shard_meta_state(sd, n_shards):
    """Split like fairscale TP: column-parallel dim 0, row-parallel dim 1,
    embeddings dim 1, norms replicated."""
    shards = [dict() for _ in range(n_shards)]
    for key, w in sd.items():
        leaf = key.rsplit(".", 2)[-2] if "." in key else key
        if key == "tok_embeddings.weight":
            chunks = torch.chunk(w, n_shards, dim=1)
        elif leaf in ("wq", "wk", "wv", "w1", "w3", "output"):
            chunks = torch.chunk(w, n_shards, dim=0)
        elif leaf in ("wo", "w2"):
            chunks = torch.chunk(w, n_shards, dim=1)
        else:
            chunks = [w] * n_shards
        for s, c in zip(shards, chunks):
            s[key] = c.contiguous()
    return shards


@pytest.fixture(scope="module")
def source_params():
    return init_params(CFG, jax.random.PRNGKey(11), dtype=jnp.float32)


def _logits(params, tokens):
    cache = init_cache(CFG, tokens.shape[0], dtype=jnp.float32)
    out, _ = forward(params, jnp.asarray(tokens), jnp.int32(0), cache, CFG)
    return np.asarray(out)


@pytest.mark.parametrize("n_shards", [1, 2])
def test_meta_convert_roundtrip(source_params, tmp_path, rng, n_shards):
    sd = _params_to_meta_state(source_params)
    sd["rope.freqs"] = torch.zeros(4)  # present in real Meta ckpts; ignored
    for i, shard in enumerate(_shard_meta_state(sd, n_shards)):
        torch.save(shard, tmp_path / f"consolidated.{i:02d}.pth")

    converted = convert_meta_checkpoint(str(tmp_path), CFG, dtype=jnp.float32)
    tokens = rng.integers(0, CFG.vocab_size, (2, 7)).astype(np.int32)
    np.testing.assert_allclose(
        _logits(converted, tokens), _logits(source_params, tokens), rtol=1e-5, atol=1e-5
    )


def test_hf_convert_roundtrip(source_params, tmp_path, rng):
    """Build an HF-layout export (with HF's rotary permutation) and convert."""

    def hf_permute(w, n_heads):  # Meta -> HF (inverse of _inverse_hf_permute)
        out_dim, in_dim = w.shape
        return (
            w.reshape(n_heads, out_dim // n_heads // 2, 2, in_dim)
            .transpose(0, 2, 1, 3)
            .reshape(out_dim, in_dim)
        )

    sd = {}
    a = lambda x: np.asarray(x, np.float32)
    sd["model.embed_tokens.weight"] = a(source_params["tok_embeddings"])
    sd["model.norm.weight"] = a(source_params["norm"])
    sd["lm_head.weight"] = a(source_params["output"]).T
    for i, layer in enumerate(source_params["layers"]):
        pre = f"model.layers.{i}"
        sd[f"{pre}.self_attn.q_proj.weight"] = hf_permute(
            a(layer["attention"]["wq"]).T, CFG.n_heads
        )
        sd[f"{pre}.self_attn.k_proj.weight"] = hf_permute(
            a(layer["attention"]["wk"]).T, CFG.kv_heads
        )
        sd[f"{pre}.self_attn.v_proj.weight"] = a(layer["attention"]["wv"]).T
        sd[f"{pre}.self_attn.o_proj.weight"] = a(layer["attention"]["wo"]).T
        sd[f"{pre}.mlp.gate_proj.weight"] = a(layer["feed_forward"]["w1"]).T
        sd[f"{pre}.mlp.down_proj.weight"] = a(layer["feed_forward"]["w2"]).T
        sd[f"{pre}.mlp.up_proj.weight"] = a(layer["feed_forward"]["w3"]).T
        sd[f"{pre}.input_layernorm.weight"] = a(layer["attention_norm"])
        sd[f"{pre}.post_attention_layernorm.weight"] = a(layer["ffn_norm"])

    torch.save({k: torch.tensor(v) for k, v in sd.items()}, tmp_path / "pytorch_model.bin")

    converted = convert_hf_checkpoint(str(tmp_path), CFG, dtype=jnp.float32)
    tokens = rng.integers(0, CFG.vocab_size, (2, 7)).astype(np.int32)
    np.testing.assert_allclose(
        _logits(converted, tokens), _logits(source_params, tokens), rtol=1e-5, atol=1e-5
    )


def test_inverse_permute_is_inverse(rng):
    w = rng.normal(0, 1, (32, 16)).astype(np.float32)  # 4 heads, hd 8
    n_heads = 4

    def hf_permute(w, n_heads):
        out_dim, in_dim = w.shape
        return (
            w.reshape(n_heads, out_dim // n_heads // 2, 2, in_dim)
            .transpose(0, 2, 1, 3)
            .reshape(out_dim, in_dim)
        )

    np.testing.assert_array_equal(_inverse_hf_permute(hf_permute(w, n_heads), n_heads), w)


def test_jax_llama_llm_quantized_orbax_cache(source_params, tmp_path):
    """The single-chip int8 startup path end-to-end: first launch
    converts on host, fuses+quantizes, caches the SERVING layout in
    orbax; second launch restores straight into int8 leaves (no bf16
    stage) and generates identically (reference seam: Llama.build's
    per-launch shard merge, generation.py:101-120)."""
    import json as _json

    from prego_tpu.anticipation.llm import JaxLlamaLLM
    from prego_tpu.checkpoint.orbax_io import load_llama_params

    sd = _params_to_meta_state(source_params)
    torch.save(sd, tmp_path / "consolidated.00.pth")
    (tmp_path / "params.json").write_text(_json.dumps({
        "dim": CFG.dim, "n_layers": CFG.n_layers, "n_heads": CFG.n_heads,
        "n_kv_heads": CFG.n_kv_heads, "norm_eps": CFG.norm_eps,
        "vocab_size": -1, "multiple_of": CFG.multiple_of,
    }))
    cache = str(tmp_path / "orbax_q8")

    kw = dict(ckpt_dir=str(tmp_path), tokenizer_path="byte",
              max_seq_len=64, max_batch_size=2, tp=1,
              dtype=jnp.float32, quantize=True, orbax_dir=cache)
    first = JaxLlamaLLM(**kw)
    # the cache holds the serving layout: int8 restore succeeds
    restored = load_llama_params(cache, first.llama.config, dtype=jnp.float32,
                                 quantized=True)
    assert restored["layers"][0]["attention"]["wqkv"]["q"].dtype == jnp.int8

    second = JaxLlamaLLM(**kw)  # restores int8 directly
    wqkv = second.llama.params["layers"][0]["attention"]["wqkv"]
    assert wqkv["q"].dtype == jnp.int8

    out1 = first.text_completion(["abc"], max_gen_len=4, temperature=0.0)
    out2 = second.text_completion(["abc"], max_gen_len=4, temperature=0.0)
    assert out1[0]["generation"] == out2[0]["generation"]
