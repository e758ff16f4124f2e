"""Continuous-batching serving loop parity + lifecycle tests.

Bar: greedy output of every request served through the slot loop must
EQUAL the same request generated alone through the scalar decode path
(model.forward, B=1) — regardless of admission order, slot reuse, or
which other requests shared the batch.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from prego_tpu.models.llama import LlamaConfig, init_params
from prego_tpu.models.llama.generation import Llama
from prego_tpu.models.llama.model import forward, init_cache, precompute_rope
from prego_tpu.models.llama.tokenizer import ByteTokenizer
from prego_tpu.serving_llm import ContinuousBatcher, Request


def _cfg(slots=4, **kw):
    base = dict(
        dim=64, n_layers=2, n_heads=4, n_kv_heads=4, vocab_size=258,
        multiple_of=32, norm_eps=1e-5, max_batch_size=slots, max_seq_len=128,
    )
    base.update(kw)
    return LlamaConfig(**base)


@pytest.fixture(scope="module")
def llama():
    cfg = _cfg()
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    return Llama(params, ByteTokenizer(), cfg)


def _greedy_oracle(llama, prompt, max_gen_len):
    """B=1 scalar-path greedy decode (the reference semantics)."""
    cfg = llama.config
    rope = precompute_rope(cfg)
    cache = init_cache(cfg, 1, dtype=llama.params["norm"].dtype)
    for i, t in enumerate(prompt[:-1]):
        _, cache = forward(
            llama.params, jnp.asarray([[t]], jnp.int32), i, cache, cfg, rope
        )
    tok = prompt[-1]
    out = []
    eos = llama.tokenizer.eos_id
    for i in range(max_gen_len):
        logits, cache = forward(
            llama.params, jnp.asarray([[tok]], jnp.int32),
            len(prompt) - 1 + i, cache, cfg, rope,
        )
        tok = int(jnp.argmax(logits[0, 0]))
        out.append(tok)
        if tok == eos:
            break
    return out


def test_single_request_matches_oracle(llama):
    req = Request(uid=0, prompt=[5, 9, 11, 30, 2], max_gen_len=12)
    cb = ContinuousBatcher(llama, slots=4, chunk=4, temperature=0.0)
    done, stats = cb.serve([req])
    assert len(done) == 1
    assert done[0].tokens == _greedy_oracle(llama, req.prompt, 12)
    assert stats.prefills == 1


def test_mixed_lengths_all_match_oracle(llama):
    """More requests than slots, mixed prompt/gen lengths: every output
    must match its solo-run oracle despite slot sharing and reuse."""
    rng = np.random.default_rng(3)
    reqs = [
        Request(
            uid=i,
            prompt=rng.integers(4, 250, rng.integers(1, 40)).tolist(),
            max_gen_len=int(rng.integers(1, 16)),
        )
        for i in range(10)
    ]
    cb = ContinuousBatcher(llama, slots=4, chunk=4, temperature=0.0)
    done, stats = cb.serve(reqs)
    assert sorted(c.uid for c in done) == list(range(10))
    by_uid = {c.uid: c for c in done}
    for r in reqs:
        got = by_uid[r.uid].tokens
        want = _greedy_oracle(llama, r.prompt, r.max_gen_len)
        assert got == want, (r.uid, got, want)
    assert stats.prefills == 10
    # mid-flight admission actually happened: more requests than slots
    # finished at distinct steps
    assert len({c.finished_step for c in done}) > 1


def test_outputs_independent_of_batch_composition(llama):
    """A request's tokens must not depend on WHO shares the batch: serve
    the same request alone and inside a crowd."""
    req = Request(uid=99, prompt=[7, 40, 90], max_gen_len=10)
    rng = np.random.default_rng(5)
    crowd = [
        Request(
            uid=i,
            prompt=rng.integers(4, 250, rng.integers(2, 30)).tolist(),
            max_gen_len=int(rng.integers(2, 12)),
        )
        for i in range(6)
    ]
    cb1 = ContinuousBatcher(llama, slots=4, chunk=2, temperature=0.0)
    alone, _ = cb1.serve([Request(uid=99, prompt=req.prompt, max_gen_len=10)])
    cb2 = ContinuousBatcher(llama, slots=4, chunk=2, temperature=0.0)
    crowded, _ = cb2.serve(crowd + [Request(uid=99, prompt=req.prompt, max_gen_len=10)])
    a = next(c for c in alone if c.uid == 99)
    b = next(c for c in crowded if c.uid == 99)
    assert a.tokens == b.tokens


@pytest.mark.parametrize("kv_quant", [False, True])
def test_kv_quant_loop_runs_and_matches_its_oracle(kv_quant):
    """int8-KV slot cache: the loop completes and greedy output matches
    a B=1 per-row-path run with the same quantized cache."""
    cfg = _cfg(slots=2)
    params = init_params(cfg, jax.random.PRNGKey(1), dtype=jnp.float32)
    llama = Llama(params, ByteTokenizer(), cfg, kv_quant=kv_quant)
    cb = ContinuousBatcher(llama, slots=2, chunk=4, temperature=0.0)
    reqs = [
        Request(uid=0, prompt=[5, 9, 11], max_gen_len=8),
        Request(uid=1, prompt=[100, 200], max_gen_len=6),
        Request(uid=2, prompt=[30] * 20, max_gen_len=5),
    ]
    done, _ = cb.serve(reqs)
    assert sorted(c.uid for c in done) == [0, 1, 2]
    # oracle with the same cache quantization: B=1 slot loop
    for r in reqs:
        cb1 = ContinuousBatcher(llama, slots=1, chunk=4, temperature=0.0)
        solo, _ = cb1.serve([Request(uid=r.uid, prompt=r.prompt,
                                     max_gen_len=r.max_gen_len)])
        assert next(c for c in done if c.uid == r.uid).tokens == solo[0].tokens


def test_request_too_long_rejected(llama):
    with pytest.raises(ValueError):
        ContinuousBatcher(llama, slots=2).serve(
            [Request(uid=0, prompt=[1] * 120, max_gen_len=20)]
        )


def test_utilization_stat(llama):
    reqs = [Request(uid=i, prompt=[5 + i, 9], max_gen_len=8) for i in range(4)]
    cb = ContinuousBatcher(llama, slots=4, chunk=4, temperature=0.0)
    _, stats = cb.serve(reqs)
    assert 0.0 < stats.utilization <= 1.0
    assert stats.decode_steps >= 8
