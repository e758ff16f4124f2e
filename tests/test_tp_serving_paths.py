"""Tensor-parallel certification of the round-4 serving paths
(VERDICT r4 #4): speculative decoding and the continuous-batching slot
loop each run their full jitted loops with TP-sharded weights on the
virtual 8-device CPU mesh, and their greedy outputs must EQUAL the
single-layout (unsharded) runs — the same 8-way equivalence bar the
plain decode path has (tests/test_tp.py / test_tp_quant.py).

Reference seam: fairscale's TP world wraps the ONE decode loop
(llama/generation.py:84-89,162-215); the rebuild's extra decode loops
carry the same multi-device story here.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from prego_tpu.models.llama import LlamaConfig, init_params
from prego_tpu.models.llama.generation import Llama
from prego_tpu.models.llama.speculative import SpeculativeLlama, self_draft
from prego_tpu.models.llama.tokenizer import ByteTokenizer
from prego_tpu.parallel import llama_param_specs, shard_params, tp_mesh
from prego_tpu.serving_llm import ContinuousBatcher, Request


def _cfg(**kw):
    base = dict(
        dim=64, n_layers=2, n_heads=4, n_kv_heads=2, vocab_size=258,
        multiple_of=32, norm_eps=1e-5, max_batch_size=4, max_seq_len=128,
    )
    base.update(kw)
    return LlamaConfig(**base)


@pytest.fixture(scope="module")
def layouts():
    cfg = _cfg()
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    sharded = shard_params(params, llama_param_specs(cfg), tp_mesh(8))
    return cfg, params, sharded


def test_speculative_tp_equals_single_layout(layouts):
    """Self-draft speculative generation with TP-sharded target weights
    (the draft REFERENCES the sharded arrays — layer truncation preserves
    shardings) must emit the same greedy tokens as the unsharded run."""
    cfg, params, sharded = layouts
    tok = ByteTokenizer()
    prompts = [[5, 9, 21, 3], [7, 11]]

    def run(p):
        target = Llama(p, tok, cfg)
        d_params, d_cfg = self_draft(p, cfg, 1)
        spec = SpeculativeLlama(target, d_params, d_cfg, k=3)
        return spec.generate(
            [list(x) for x in prompts], max_gen_len=12, temperature=0.0
        )

    assert run(sharded) == run(params)


def test_speculative_tp_full_depth_acceptance(layouts):
    """Full-depth self-draft under TP: the accept machinery must still
    read acceptance ~1 with sharded weights (f32 CPU: exact)."""
    cfg, params, sharded = layouts
    target = Llama(sharded, ByteTokenizer(), cfg)
    d_params, d_cfg = self_draft(sharded, cfg, cfg.n_layers)
    spec = SpeculativeLlama(target, d_params, d_cfg, k=3)
    out = spec.generate([[5, 9, 21, 3]], max_gen_len=12, temperature=0.0)
    assert out[0]
    assert spec.drafts_accepted == spec.drafts_proposed  # acceptance 1.0


def test_cb_slot_loop_tp_equals_single_layout(layouts):
    """The continuous-batching slot loop (admission scatters, piggyback
    feed, chunked decode scan) with TP-sharded weights must serve the
    same greedy tokens as the unsharded batcher, across admission waves
    and prefix sharing."""
    cfg, params, sharded = layouts
    tok = ByteTokenizer()
    rng = np.random.default_rng(11)
    ctx = rng.integers(4, 250, 70).tolist()
    reqs = [
        Request(uid=i, prompt=ctx + rng.integers(4, 250, 3 + i).tolist(),
                max_gen_len=6)
        for i in range(5)
    ]

    def run(p):
        llama = Llama(p, tok, cfg)
        cb = ContinuousBatcher(llama, slots=2, chunk=4, temperature=0.0)
        cb.register_prefix(ctx)
        done, stats = cb.serve([Request(**vars(r)) for r in reqs])
        assert stats.prefix_hits == 5
        return {c.uid: c.tokens for c in done}

    assert run(sharded) == run(params)
