"""End-to-end decoder oracle: a real transformers LlamaForCausalLM with
random weights is exported, converted by convert_hf_checkpoint, and must
produce the same logits — covering the rotary permutation, GQA layout and
every converter detail against the production HF implementation."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from prego_tpu.checkpoint.convert import convert_hf_checkpoint
from prego_tpu.models.llama import LlamaConfig, forward, init_cache

transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def hf_model_dir(tmp_path_factory):
    from transformers import LlamaConfig as HFConfig, LlamaForCausalLM

    hf_cfg = HFConfig(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=176,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=128,
        rms_norm_eps=1e-5,
        rope_theta=10000.0,
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    model = LlamaForCausalLM(hf_cfg)
    model.eval()
    d = tmp_path_factory.mktemp("hf_llama")
    # save in .bin format (converter reads both bin and safetensors)
    torch.save(model.state_dict(), d / "pytorch_model.bin")
    (d / "config.json").write_text(json.dumps(hf_cfg.to_dict()))
    return str(d), model, hf_cfg


def test_converted_logits_match_transformers(hf_model_dir, rng):
    model_dir, hf_model, hf_cfg = hf_model_dir
    cfg = LlamaConfig(
        dim=hf_cfg.hidden_size,
        n_layers=hf_cfg.num_hidden_layers,
        n_heads=hf_cfg.num_attention_heads,
        n_kv_heads=hf_cfg.num_key_value_heads,
        vocab_size=hf_cfg.vocab_size,
        norm_eps=hf_cfg.rms_norm_eps,
        rope_theta=hf_cfg.rope_theta,
        max_batch_size=2,
        max_seq_len=64,
    )
    params = convert_hf_checkpoint(model_dir, cfg, dtype=jnp.float32)

    B, S = 2, 12
    tokens = rng.integers(0, hf_cfg.vocab_size, (B, S)).astype(np.int32)
    cache = init_cache(cfg, B, dtype=jnp.float32)
    ours, _ = forward(params, jnp.asarray(tokens), jnp.int32(0), cache, cfg)

    with torch.no_grad():
        theirs = hf_model(torch.tensor(tokens, dtype=torch.long)).logits

    np.testing.assert_allclose(
        np.asarray(ours), theirs.numpy(), rtol=3e-4, atol=3e-4
    )


def test_converted_incremental_decode_matches_transformers(hf_model_dir, rng):
    """KV-cached one-token decode against transformers full forward."""
    model_dir, hf_model, hf_cfg = hf_model_dir
    cfg = LlamaConfig(
        dim=hf_cfg.hidden_size, n_layers=hf_cfg.num_hidden_layers,
        n_heads=hf_cfg.num_attention_heads, n_kv_heads=hf_cfg.num_key_value_heads,
        vocab_size=hf_cfg.vocab_size, norm_eps=hf_cfg.rms_norm_eps,
        rope_theta=hf_cfg.rope_theta, max_batch_size=1, max_seq_len=64,
    )
    params = convert_hf_checkpoint(model_dir, cfg, dtype=jnp.float32)
    tokens = rng.integers(0, hf_cfg.vocab_size, (1, 9)).astype(np.int32)

    cache = init_cache(cfg, 1, dtype=jnp.float32)
    _, cache = forward(params, jnp.asarray(tokens[:, :5]), jnp.int32(0), cache, cfg)
    last = None
    for t in range(5, 9):
        last, cache = forward(
            params, jnp.asarray(tokens[:, t : t + 1]), jnp.int32(t), cache, cfg
        )

    with torch.no_grad():
        theirs = hf_model(torch.tensor(tokens, dtype=torch.long)).logits[:, -1:]
    np.testing.assert_allclose(np.asarray(last), theirs.numpy(), rtol=3e-4, atol=3e-4)
