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


def test_overlap_gate_short_bursts_decode_blocking(llama):
    """The per-serve overlap gate (r5g): overlap processes emissions one
    chunk late, so a short burst pays a trailing chunk of dead-slot
    decode — on the PREGO driver's 1-chunk step bursts that DOUBLES the
    decode work (r5e: CB 1.187 s/call vs 0.960 batch).  Short bursts
    must take the blocking path even with overlap_fetch=True; long
    bursts keep overlap and still match the oracle."""
    cb = ContinuousBatcher(llama, slots=4, chunk=4, temperature=0.0,
                           overlap_fetch=True)
    req = Request(uid=0, prompt=[5, 9, 11, 30, 2], max_gen_len=4)
    done, stats = cb.serve([req])
    # one 4-token budget in one 4-step chunk: blocking processes it
    # immediately — no trailing dead chunk in the accounting
    assert stats.decode_steps == 4
    assert done[0].tokens == _greedy_oracle(llama, req.prompt, 4)[:4]
    # a long burst (3 waves x 6 chunks >= the gate) keeps overlap and
    # parity; the trailing dead chunk is the documented overlap cost
    reqs = [Request(uid=i, prompt=[4 + i, 7, 21], max_gen_len=24)
            for i in range(12)]
    done, stats = cb.serve([Request(**vars(r)) for r in reqs])
    by_uid = {c.uid: c.tokens for c in done}
    for r in reqs:
        assert by_uid[r.uid] == _greedy_oracle(llama, r.prompt, 24), r.uid


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


# ------------------------------------------------ prefix-sharing admission


@pytest.fixture(scope="module")
def llama_long():
    cfg = _cfg(slots=4, max_seq_len=512)
    params = init_params(cfg, jax.random.PRNGKey(2), dtype=jnp.float32)
    return Llama(params, ByteTokenizer(), cfg)


def test_prefix_sharing_admission_parity_and_accounting(llama_long):
    """Requests sharing a registered context: admission must reuse the
    cached prefix KV (prefill only the novel suffix) AND still match the
    solo-run greedy oracle exactly (VERDICT r3 #1a)."""
    rng = np.random.default_rng(11)
    ctx = rng.integers(4, 250, 150).tolist()
    reqs = [
        Request(
            uid=i,
            prompt=ctx + rng.integers(4, 250, 5 + i).tolist(),
            max_gen_len=6,
        )
        for i in range(6)
    ]
    cb = ContinuousBatcher(llama_long, slots=2, chunk=4, temperature=0.0)
    aligned = cb.register_prefix(ctx)
    assert aligned == 128  # 150 floor-aligned to the 64-token chunk grid
    done, stats = cb.serve(reqs)
    assert stats.prefills == 6
    assert stats.prefix_hits == 6
    assert stats.prefix_tokens_reused == 6 * aligned
    # only the novel tokens were prefilled: body minus the shared prefix
    assert stats.suffix_tokens_prefilled == sum(
        len(r.prompt) - 1 - aligned for r in reqs
    )
    by_uid = {c.uid: c for c in done}
    for r in reqs:
        want = _greedy_oracle(llama_long, r.prompt, r.max_gen_len)
        assert by_uid[r.uid].tokens == want, r.uid


def test_prefix_sharing_off_matches_on(llama_long):
    """prefix_sharing must be a pure optimization: identical greedy
    output with and without it."""
    rng = np.random.default_rng(13)
    ctx = rng.integers(4, 250, 100).tolist()
    reqs = [
        Request(uid=i, prompt=ctx + [10 + i, 20 + i], max_gen_len=5)
        for i in range(3)
    ]
    on = ContinuousBatcher(llama_long, slots=2, chunk=4, temperature=0.0)
    on.register_prefix(ctx)
    done_on, stats_on = on.serve([Request(**vars(r)) for r in reqs])
    off = ContinuousBatcher(
        llama_long, slots=2, chunk=4, temperature=0.0, prefix_sharing=False
    )
    done_off, stats_off = off.serve([Request(**vars(r)) for r in reqs])
    assert stats_on.prefix_hits == 3 and stats_off.prefix_hits == 0
    a = {c.uid: c.tokens for c in done_on}
    b = {c.uid: c.tokens for c in done_off}
    assert a == b


def test_long_suffix_admission_does_not_clobber_prefix():
    """ADVICE r4 (high): a suffix whose BUCKET overruns max_seq_len used
    to clamp the dynamic_update_slice start backward, silently overwriting
    real prefix KV with misaligned suffix KV.  Reproduces the reported
    shape (max_seq_len 256, registered prefix 64, 130-token tail: suffix
    129 buckets to 256 > 192 remaining) and requires exact greedy parity
    with the solo oracle."""
    cfg = _cfg(slots=2, max_seq_len=256)
    params = init_params(cfg, jax.random.PRNGKey(7), dtype=jnp.float32)
    llama = Llama(params, ByteTokenizer(), cfg)
    rng = np.random.default_rng(19)
    ctx = rng.integers(4, 250, 70).tolist()  # aligns to the 64-token grid
    cb = ContinuousBatcher(llama, slots=2, chunk=4, temperature=0.0)
    assert cb.register_prefix(ctx) == 64
    reqs = [
        Request(uid=i,
                prompt=ctx[:64] + rng.integers(4, 250, 130).tolist(),
                max_gen_len=8)
        for i in range(3)  # 1 row -> _admit_row; 2 sharing -> batched path
    ]
    done, stats = cb.serve(reqs)
    assert stats.prefix_hits == 3
    by_uid = {c.uid: c.tokens for c in done}
    for r in reqs:
        want = _greedy_oracle(llama, r.prompt, r.max_gen_len)
        assert by_uid[r.uid] == want, r.uid


def test_cache_reuse_across_serve_calls(llama):
    """The batcher reuses its slot cache between serve() calls; stale rows
    from the previous burst must never leak into a later request."""
    cb = ContinuousBatcher(llama, slots=2, chunk=4, temperature=0.0)
    first = [Request(uid=0, prompt=[40] * 30, max_gen_len=6)]
    cb.serve(first)
    req = Request(uid=1, prompt=[5, 9, 11], max_gen_len=8)
    done, _ = cb.serve([req])
    assert done[0].tokens == _greedy_oracle(llama, req.prompt, 8)


def test_serve_prompts_order_and_greedy_parity(llama_long):
    """serve_prompts: input-order results, eos stripped, greedy output
    equal to the drain-style generate path on the same prompts."""
    rng = np.random.default_rng(17)
    ctx = rng.integers(4, 250, 90).tolist()
    prompts = [ctx + [30 + i] for i in range(5)]
    cb = ContinuousBatcher(llama_long, slots=4, chunk=4, temperature=0.0)
    got = cb.serve_prompts(prompts, max_gen_len=6)
    want, _ = llama_long.generate(prompts, max_gen_len=6, temperature=0.0)
    assert got == want


def test_overlap_fetch_matches_blocking(llama):
    """overlap_fetch pipelines the emits fetch behind the next chunk; the
    outputs (greedy) must be identical to the blocking loop for every
    request, across admission waves and slot reuse."""
    rng = np.random.default_rng(41)
    reqs = [
        Request(
            uid=i,
            prompt=rng.integers(4, 250, rng.integers(1, 40)).tolist(),
            max_gen_len=int(rng.integers(1, 16)),
        )
        for i in range(10)
    ]
    blocking = ContinuousBatcher(llama, slots=3, chunk=4, temperature=0.0)
    a, stats_a = blocking.serve([Request(**vars(r)) for r in reqs])
    overlap = ContinuousBatcher(
        llama, slots=3, chunk=4, temperature=0.0, overlap_fetch=True
    )
    b, stats_b = overlap.serve([Request(**vars(r)) for r in reqs])
    assert {c.uid: c.tokens for c in a} == {c.uid: c.tokens for c in b}
    # every slot-step of live work is identical; overlap may add trailing
    # all-dead chunks but never loses emissions
    assert stats_a.slot_steps_live == stats_b.slot_steps_live


def test_overlap_fetch_default_is_platform_aware(llama, monkeypatch):
    """overlap_fetch=None resolves: PREGO_CB_OVERLAP env wins, else ON
    for device backends / OFF on CPU (the r4d same-window A/B/A measured
    +9.6% on the tunneled chip; locally the fetch is free and overlap
    only adds admission lag)."""
    monkeypatch.delenv("PREGO_CB_OVERLAP", raising=False)
    assert ContinuousBatcher(llama, slots=2).overlap_fetch is False  # CPU
    monkeypatch.setenv("PREGO_CB_OVERLAP", "1")
    assert ContinuousBatcher(llama, slots=2).overlap_fetch is True
    monkeypatch.setenv("PREGO_CB_OVERLAP", "0")
    assert ContinuousBatcher(llama, slots=2).overlap_fetch is False
    # explicit argument beats everything
    monkeypatch.setenv("PREGO_CB_OVERLAP", "0")
    assert ContinuousBatcher(
        llama, slots=2, overlap_fetch=True
    ).overlap_fetch is True


def test_prefix_sharing_with_kv_quant_batched_admission():
    """The 7B serving config's exact combination: int8 KV cache + prefix
    sharing + multi-slot batched admission; parity vs its own B=1 CB
    oracle (int8 cache quantization differs from the bf16 oracle)."""
    cfg = _cfg(slots=4, max_seq_len=512)
    params = init_params(cfg, jax.random.PRNGKey(5), dtype=jnp.float32)
    llama = Llama(params, ByteTokenizer(), cfg, kv_quant=True)
    rng = np.random.default_rng(3)
    ctx = rng.integers(4, 250, 150).tolist()
    reqs = [
        Request(uid=i, prompt=ctx + rng.integers(4, 250, 5 + i).tolist(),
                max_gen_len=6)
        for i in range(6)
    ]
    cb = ContinuousBatcher(llama, slots=4, chunk=4, temperature=0.0)
    cb.register_prefix(ctx)
    done, stats = cb.serve(reqs)
    assert stats.prefix_hits == 6
    by_uid = {c.uid: c.tokens for c in done}
    for r in reqs:
        solo = ContinuousBatcher(llama, slots=1, chunk=4, temperature=0.0)
        want, _ = solo.serve(
            [Request(uid=0, prompt=list(r.prompt), max_gen_len=r.max_gen_len)]
        )
        assert by_uid[r.uid] == want[0].tokens, r.uid


# ------------------------------------------------ piggyback admission


def test_piggyback_on_off_parity_and_accounting(llama_long):
    """Piggyback admission (suffix fed through the decode scan) must be a
    pure optimization: identical greedy output vs dedicated prefill, with
    the suffix-token accounting split between the two routes."""
    rng = np.random.default_rng(43)
    ctx = rng.integers(4, 250, 128).tolist()  # aligns exactly to the grid
    reqs = [
        Request(uid=i, prompt=ctx + rng.integers(4, 250, 4 + 3 * i).tolist(),
                max_gen_len=6)
        for i in range(5)
    ]
    piggy = ContinuousBatcher(llama_long, slots=2, chunk=4, temperature=0.0,
                              piggyback_max_suffix=8)
    piggy.register_prefix(ctx)
    done_p, stats_p = piggy.serve([Request(**vars(r)) for r in reqs])
    dedicated = ContinuousBatcher(
        llama_long, slots=2, chunk=4, temperature=0.0, piggyback_max_suffix=0
    )
    dedicated.register_prefix(ctx)
    done_d, stats_d = dedicated.serve([Request(**vars(r)) for r in reqs])
    assert {c.uid: c.tokens for c in done_p} == {
        c.uid: c.tokens for c in done_d
    }
    # novel feeds past the 128-token prefix: 4,7,10,13,16 tokens —
    # uid 0/1 fit the 8-token queue, uid 2-4 exceed it -> dedicated
    assert stats_p.suffix_tokens_piggybacked == 3 + 6
    assert stats_p.suffix_tokens_prefilled == 9 + 12 + 15
    assert stats_d.suffix_tokens_piggybacked == 0
    assert (
        stats_p.suffix_tokens_piggybacked + stats_p.suffix_tokens_prefilled
        == stats_d.suffix_tokens_prefilled
    )
    # both routes still reuse the cached prefix
    assert stats_p.prefix_hits == stats_d.prefix_hits == 5
    # solo-oracle parity for every request on the piggyback leg
    by_uid = {c.uid: c.tokens for c in done_p}
    for r in reqs:
        assert by_uid[r.uid] == _greedy_oracle(
            llama_long, r.prompt, r.max_gen_len
        ), r.uid


def test_piggyback_env_override(llama, monkeypatch):
    monkeypatch.setenv("PREGO_CB_PIGGYBACK", "0")
    cb = ContinuousBatcher(llama, slots=4)
    assert cb.pend_buf == 1  # clamped: the last-token feed always queues
    monkeypatch.setenv("PREGO_CB_PIGGYBACK", "23")
    assert ContinuousBatcher(llama, slots=4).pend_buf == 23
    monkeypatch.delenv("PREGO_CB_PIGGYBACK")
    # default 4: tiny suffixes only — the saturated-burst A/B/A showed
    # long piggybacked suffixes starve slot occupancy (chipq_r5a)
    assert ContinuousBatcher(llama, slots=4).pend_buf == 4
    assert ContinuousBatcher(
        llama, slots=4, piggyback_max_suffix=7
    ).pend_buf == 7


def test_piggyback_without_prefix_matches_oracle(llama):
    """Short prompts with NO cached prefix ride the scan end-to-end (zero
    admission dispatches) and must still match the solo oracle."""
    rng = np.random.default_rng(47)
    reqs = [
        Request(uid=i, prompt=rng.integers(4, 250, rng.integers(1, 15)).tolist(),
                max_gen_len=int(rng.integers(1, 10)))
        for i in range(7)
    ]
    cb = ContinuousBatcher(llama, slots=3, chunk=4, temperature=0.0,
                           piggyback_max_suffix=16)
    done, stats = cb.serve(reqs)
    assert stats.suffix_tokens_prefilled == 0  # everything piggybacked
    by_uid = {c.uid: c.tokens for c in done}
    for r in reqs:
        assert by_uid[r.uid] == _greedy_oracle(llama, r.prompt, r.max_gen_len)


def test_sampled_mode_matches_per_request_distribution(llama):
    """VERDICT r3 #6: temperature>0 through the slot loop must draw from
    the same per-step distributions as per-request generation.  Compare
    empirical first-token distributions over N seeded draws (total-
    variation distance) — the num_samples² PREGO sampling regime."""
    prompt = [5, 9, 11]
    N = 600
    # 0.25 concentrates the tiny random model's next-token distribution
    # (support ~17 at n=400) so the TV comparison has statistical power;
    # at temperature 1.0 the distribution is near-flat over ~150 tokens
    # and same-distribution sampling noise alone reads TV ~0.3
    temperature, top_p = 0.25, 0.9
    cb = ContinuousBatcher(
        llama, slots=4, chunk=2, temperature=temperature, top_p=top_p, seed=23
    )
    done, _ = cb.serve(
        [Request(uid=i, prompt=list(prompt), max_gen_len=1) for i in range(N)]
    )
    eos = llama.tokenizer.eos_id
    cb_first = [c.tokens[0] for c in done]
    outs, _ = llama.generate(
        [list(prompt)] * N, max_gen_len=1, temperature=temperature, top_p=top_p
    )
    gen_first = [t[0] if t else eos for t in outs]  # generate cuts AT eos
    assert len(cb_first) == len(gen_first) == N
    support = sorted(set(cb_first) | set(gen_first))
    assert len(support) > 1, "degenerate distribution — test is vacuous"
    import collections

    pa = collections.Counter(cb_first)
    pb = collections.Counter(gen_first)
    tv = 0.5 * sum(abs(pa[t] - pb[t]) / N for t in support)
    assert tv < 0.2, (tv, pa.most_common(5), pb.most_common(5))


def test_sampled_mode_budgets_and_retirement(llama):
    """Sampled multi-step serving: every request retires at eos or its own
    budget, never the batch's."""
    rng = np.random.default_rng(29)
    reqs = [
        Request(
            uid=i,
            prompt=rng.integers(4, 250, rng.integers(2, 20)).tolist(),
            max_gen_len=int(rng.integers(1, 10)),
        )
        for i in range(8)
    ]
    cb = ContinuousBatcher(llama, slots=3, chunk=4, temperature=0.9, top_p=0.9)
    done, _ = cb.serve(reqs)
    assert sorted(c.uid for c in done) == list(range(8))
    eos = llama.tokenizer.eos_id
    for c in done:
        budget = next(r.max_gen_len for r in reqs if r.uid == c.uid)
        assert len(c.tokens) <= budget
        if len(c.tokens) < budget:
            assert c.tokens[-1] == eos
