"""Full anticipation pipeline through the TPU-native LLaMA runtime:
recognized sequences -> prompts -> batched jitted decode -> cleaning ->
set voting -> one-class metrics. Tiny random weights + byte tokenizer;
this checks plumbing and shapes, not prediction quality."""

import jax
import jax.numpy as jnp

from prego_tpu.anticipation import PromptBuilder, anticipate_sequence
from prego_tpu.models.llama import (
    ByteTokenizer,
    Llama,
    init_params,
    tiny_test_config,
)


class JaxLlamaAdapter:
    def __init__(self, llama):
        self.llama = llama

    def text_completion(self, prompts, max_gen_len=None, temperature=0.6, top_p=0.9):
        return self.llama.text_completion(
            prompts, temperature=temperature, top_p=top_p, max_gen_len=max_gen_len
        )


def test_anticipation_through_jax_llama():
    tok = ByteTokenizer()
    cfg = tiny_test_config(vocab_size=tok.n_words)
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    llm = JaxLlamaAdapter(Llama(params, tok, cfg))

    b = PromptBuilder(context="", toy="a08", type_prompt="num")
    preds, gts = anticipate_sequence(
        [3, 1, 4], b, llm, max_gen_len=4, temperature=0.6, top_p=0.9, num_samples=2
    )
    assert len(preds) == len(gts) == 3
    assert all(isinstance(p, set) and len(p) >= 1 for p in preds)

    # greedy decode: all num_samples^2 generations identical -> singleton sets
    preds0, _ = anticipate_sequence(
        [3, 1], b, llm, max_gen_len=4, temperature=0.0, num_samples=2
    )
    assert all(len(p) == 1 for p in preds0)


def test_anticipation_through_jax_llama_kv_quant_and_step_batch():
    """--kv_quant --step_batch plumbing: int8 KV cache decode through the
    full driver path, greedy output equal to the bf16-cache driver run."""
    tok = ByteTokenizer()
    cfg = tiny_test_config(vocab_size=tok.n_words)
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    b = PromptBuilder(context="", toy="a08", type_prompt="num")

    base = JaxLlamaAdapter(Llama(params, tok, cfg))
    ref_preds, _ = anticipate_sequence(
        [3, 1, 4], b, base, max_gen_len=4, temperature=0.0, num_samples=2
    )
    q8 = JaxLlamaAdapter(Llama(params, tok, cfg, kv_quant=True))
    got, _ = anticipate_sequence(
        [3, 1, 4], b, q8, max_gen_len=4, temperature=0.0, num_samples=2,
        step_batch=2,
    )
    assert got == ref_preds
