"""Speculative decoding invariants (models/llama/speculative.py).

The load-bearing hermetic property: greedy speculative output is
IDENTICAL to plain greedy decoding for ANY draft model — the draft only
decides how fast, never what. Sampled mode must preserve the target's
processed sampling distribution (Leviathan/Chen rejection rule), pinned
distribution-level like tests/test_serving_llm.py's CB sampled parity.
"""

import collections

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from prego_tpu.models.llama import LlamaConfig, init_params
from prego_tpu.models.llama.generation import Llama
from prego_tpu.models.llama.model import quantize_params
from prego_tpu.models.llama.speculative import SpeculativeLlama
from prego_tpu.models.llama.tokenizer import ByteTokenizer
from prego_tpu.ops.sampling import processed_probs, sample_next_token


def _cfg(**kw):
    base = dict(
        dim=64, n_layers=2, n_heads=4, n_kv_heads=4, vocab_size=258,
        multiple_of=32, norm_eps=1e-5, max_batch_size=4, max_seq_len=128,
    )
    base.update(kw)
    return LlamaConfig(**base)


@pytest.fixture(scope="module")
def target():
    cfg = _cfg()
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    return Llama(params, ByteTokenizer(), cfg)


@pytest.fixture(scope="module")
def draft():
    """A DIFFERENT random model (same vocab) — near-zero agreement with
    the target, so the rejection path is exercised hard."""
    cfg = _cfg(dim=32, n_layers=1, n_heads=2, n_kv_heads=2)
    params = init_params(cfg, jax.random.PRNGKey(7), dtype=jnp.float32)
    return params, cfg


@pytest.mark.parametrize("k", [1, 2, 4, 7])
def test_greedy_equals_plain_for_any_draft(target, draft, k):
    d_params, d_cfg = draft
    spec = SpeculativeLlama(target, d_params, d_cfg, k=k)
    for prompt in ([5, 9, 21, 3], [7], list(range(4, 40))):
        want, _ = target.generate([list(prompt)], max_gen_len=24,
                                  temperature=0.0)
        got = spec.generate([list(prompt)], max_gen_len=24, temperature=0.0)
        assert got == want, (k, prompt[:4])


@pytest.mark.parametrize("k", [2, 4])
def test_window_boundary_emits_full_budget(target, draft, k):
    """ADVICE r4 (medium): a request whose prompt + max_gen_len fills the
    context must emit exactly as many tokens as plain greedy decoding —
    the speculative loop freezes rows once pos + k + 1 > max_seq_len and
    the plain-decode tail must finish the last <= k tokens."""
    cfg = target.config
    d_params, d_cfg = draft
    spec = SpeculativeLlama(target, d_params, d_cfg, k=k)
    rng = np.random.default_rng(31)
    for plen in (cfg.max_seq_len - 44, cfg.max_seq_len - 7):
        prompt = rng.integers(4, 250, plen).tolist()
        budget = cfg.max_seq_len - plen  # fills the window exactly
        want, _ = target.generate([list(prompt)], max_gen_len=budget,
                                  temperature=0.0)
        got = spec.generate([list(prompt)], max_gen_len=budget,
                            temperature=0.0)
        assert got == want, (k, plen, len(got[0]), len(want[0]))
        # mixed-batch variant: one boundary row + one short row
        want2, _ = target.generate([list(prompt), [5, 9]],
                                   max_gen_len=budget, temperature=0.0)
        got2 = spec.generate([list(prompt), [5, 9]], max_gen_len=budget,
                             temperature=0.0)
        assert got2 == want2, (k, plen)


def test_greedy_oracle_replay_full_acceptance(target):
    """Replaying the target's own greedy continuation as the draft must
    accept everything: same tokens, ~gen/k rounds, acceptance == 1."""
    prompt = [5, 9, 21, 3]
    gen = 24
    want, _ = target.generate([list(prompt)], max_gen_len=gen, temperature=0.0)
    oracle = list(prompt) + want[0]
    spec = SpeculativeLlama(target, k=4)
    got = spec.generate([list(prompt)], max_gen_len=gen, temperature=0.0,
                        oracle_tokens=[oracle])
    assert got == want
    assert spec.rounds <= -(-gen // 4) + 1  # ceil(gen/k) (+1 eos slack)
    assert spec.drafts_accepted >= spec.rounds * 4 - 4


def test_greedy_with_quantized_kv_target(target, draft):
    """kv_quant target: spec greedy equals plain greedy on the SAME
    quantized-cache path (both run the int8-KV cache)."""
    cfg = target.config
    q_target = Llama(target.params, ByteTokenizer(), cfg, kv_quant=True)
    d_params, d_cfg = draft
    spec = SpeculativeLlama(q_target, d_params, d_cfg, k=3)
    # the draft side INHERITS int8 KV (a full-depth self-draft otherwise
    # duplicates the whole bf16 KV footprint — chipq_r5a OOM at 7B B=4)
    assert spec._draft_llama.kv_quant
    prompt = [5, 9, 21, 3, 17]
    want, _ = q_target.generate([list(prompt)], max_gen_len=16,
                                temperature=0.0)
    got = spec.generate([list(prompt)], max_gen_len=16, temperature=0.0)
    assert got == want
    # prefix-cached path: both models resume from their (now int8) LRU
    # prefix caches; greedy output must equal the plain path's
    text = ByteTokenizer().decode(prompt)
    out = spec.text_completion([text], max_gen_len=16, temperature=0.0,
                               use_prefix_cache=True)
    plain = q_target.text_completion([text], max_gen_len=16,
                                     temperature=0.0)
    assert out[0]["generation"] == plain[0]["generation"]


def test_greedy_with_int8_target(target, draft):
    """Weight-only-int8 target params (the 7B serving layout) through the
    spec loop equal the same model's plain greedy decode."""
    cfg = target.config
    qp = quantize_params(target.params)
    q_llama = Llama(qp, ByteTokenizer(), cfg)
    d_params, d_cfg = draft
    spec = SpeculativeLlama(q_llama, d_params, d_cfg, k=4)
    prompt = [5, 9, 21, 3]
    want, _ = q_llama.generate([list(prompt)], max_gen_len=16,
                               temperature=0.0)
    got = spec.generate([list(prompt)], max_gen_len=16, temperature=0.0)
    assert got == want
    # layer-truncated self-draft over the SAME int8 leaves (the
    # deployable 7B-on-one-v5e config: int8 target + shared-weight draft)
    from prego_tpu.models.llama.speculative import self_draft

    sd_params, sd_cfg = self_draft(qp, cfg, 1)
    spec_self = SpeculativeLlama(q_llama, sd_params, sd_cfg, k=4)
    # shared-tree drafts go to the jit as a STATIC layer count, never as
    # a second pytree argument (which would re-budget every weight leaf
    # — the 2 x 6.74 GB AOT refusal, chipq_r5b)
    assert spec_self._self_draft_layers == 1
    got_self = spec_self.generate(
        [list(prompt)], max_gen_len=16, temperature=0.0
    )
    assert got_self == want


def test_eos_mid_round_truncates(target, draft):
    """An eos accepted inside a speculative round must end generation
    exactly there (host cut identical to Llama.generate)."""
    # replay an oracle that IS the greedy continuation but with eos
    # spliced in — the greedy target won't match it, so instead force
    # full acceptance by replaying greedy tokens and relying on the
    # models' own eos only if emitted. Robust variant: compare against
    # plain generate on many prompts — identical cuts by the greedy-
    # equality invariant (covered above). Here: a prompt whose plain
    # greedy output happens to contain eos would be fragile with random
    # weights, so check the mechanism directly via max_gen_len=1.
    d_params, d_cfg = draft
    spec = SpeculativeLlama(target, d_params, d_cfg, k=5)
    want, _ = target.generate([[5, 9]], max_gen_len=1, temperature=0.0)
    got = spec.generate([[5, 9]], max_gen_len=1, temperature=0.0)
    assert got == want and len(got[0]) <= 1


def test_batched_rows_equal_plain(target, draft):
    """Batched spec decode: rows of DIFFERENT prompt lengths advance at
    independent per-row positions and rates, yet each row's greedy output
    equals plain batched greedy (rows decode independently under causal
    masking in both)."""
    d_params, d_cfg = draft
    spec = SpeculativeLlama(target, d_params, d_cfg, k=3)
    prompts = [[5, 9, 21], [7, 4], [30, 31, 32, 33], [11]]
    want, _ = target.generate([list(p) for p in prompts], max_gen_len=12,
                              temperature=0.0)
    got = spec.generate([list(p) for p in prompts], max_gen_len=12,
                        temperature=0.0)
    assert got == want


def test_batched_oracle_per_row_replays(target):
    """Per-row oracle replays: one row replays its true greedy
    continuation (full acceptance), the other replays garbage (zero
    acceptance) — both rows still emit exactly their plain greedy."""
    prompts = [[5, 9, 21, 3], [7, 4, 18]]
    want, _ = target.generate([list(p) for p in prompts], max_gen_len=10,
                              temperature=0.0)
    oracles = [
        prompts[0] + want[0],  # true continuation
        prompts[1] + [99] * 12,  # garbage draft
    ]
    spec = SpeculativeLlama(target, k=4)
    got = spec.generate([list(p) for p in prompts], max_gen_len=10,
                        temperature=0.0, oracle_tokens=oracles)
    assert got == want


def test_batch_overflow_chunks(target, draft):
    """Batches beyond max_batch_size split transparently (the same
    contract as Llama.generate)."""
    d_params, d_cfg = draft
    spec = SpeculativeLlama(target, d_params, d_cfg, k=2)
    prompts = [[5 + i, 9, 21] for i in range(6)]  # max_batch_size is 4
    want, _ = target.generate([list(p) for p in prompts], max_gen_len=6,
                              temperature=0.0)
    got = spec.generate([list(p) for p in prompts], max_gen_len=6,
                        temperature=0.0)
    assert got == want


def test_prefix_cached_spec_equals_prefix_cached_plain(target, draft):
    """generate_with_prefix_cache through the spec loop: greedy output
    equals the plain prefix-cached path (both resume from the SAME target
    LRU entry), the draft builds its own prefix once, and the target LRU
    is shared with the non-speculative path."""
    d_params, d_cfg = draft
    spec = SpeculativeLlama(target, d_params, d_cfg, k=3)
    base = [4 + (i % 90) for i in range(70)]  # shared 70-token context
    prompts = [base + [100, 101], base + [102], base + [103, 104, 105]]
    target.prefix_rebuilds = target.prefix_extends = 0
    target._prefix_caches.clear()
    want = target.generate_with_prefix_cache(
        [list(p) for p in prompts], max_gen_len=10, temperature=0.0
    )
    got = spec.generate_with_prefix_cache(
        [list(p) for p in prompts], max_gen_len=10, temperature=0.0
    )
    assert got == want
    assert target.prefix_rebuilds == 1  # one shared entry, both paths
    assert spec._draft_llama.prefix_rebuilds == 1
    # short prompts (no shareable prefix) fall back to the plain spec path
    short = [[5, 9], [7, 4, 2]]
    want_s = target.generate_with_prefix_cache(
        [list(p) for p in short], max_gen_len=6, temperature=0.0
    )
    got_s = spec.generate_with_prefix_cache(
        [list(p) for p in short], max_gen_len=6, temperature=0.0
    )
    assert got_s == want_s


def test_self_draft_truncated_greedy_equals_plain(target):
    """Layer-truncated self-draft (shared weight arrays): greedy output
    equals plain greedy — the ANY-draft invariant — on both the plain and
    prefix-cached paths, and the draft tree holds no new weight arrays."""
    from prego_tpu.models.llama.speculative import self_draft

    d_params, d_cfg = self_draft(target.params, target.config, 1)
    assert d_cfg.n_layers == 1
    assert d_params["layers"][0] is target.params["layers"][0]  # shared
    assert d_params["output"] is target.params["output"]
    spec = SpeculativeLlama(target, d_params, d_cfg, k=3)
    for prompt in ([5, 9, 21, 3], list(range(4, 40))):
        want, _ = target.generate([list(prompt)], max_gen_len=16,
                                  temperature=0.0)
        got = spec.generate([list(prompt)], max_gen_len=16, temperature=0.0)
        assert got == want, prompt[:4]
    base = [4 + (i % 90) for i in range(70)]
    prompts = [base + [100, 101], base + [102]]
    want = target.generate_with_prefix_cache(
        [list(p) for p in prompts], max_gen_len=8, temperature=0.0
    )
    got = spec.generate_with_prefix_cache(
        [list(p) for p in prompts], max_gen_len=8, temperature=0.0
    )
    assert got == want


def test_self_draft_full_depth_accepts_nearly_all(target):
    """n_layers == the target's full depth makes the draft the target
    itself: greedy acceptance ~1 (the real-draft-cost ceiling — the
    single-token draft path and the k-token verify forward may diverge
    only on numerical near-ties)."""
    from prego_tpu.models.llama.speculative import self_draft

    d_params, d_cfg = self_draft(
        target.params, target.config, target.config.n_layers
    )
    spec = SpeculativeLlama(target, d_params, d_cfg, k=4)
    prompt = [5, 9, 21, 3]
    want, _ = target.generate([list(prompt)], max_gen_len=24, temperature=0.0)
    got = spec.generate([list(prompt)], max_gen_len=24, temperature=0.0)
    assert got == want
    drafted = spec.rounds * 4
    assert spec.drafts_accepted >= 0.8 * (drafted - 4), (
        spec.drafts_accepted, drafted,
    )


def test_self_draft_depth_bounds(target):
    from prego_tpu.models.llama.speculative import self_draft

    for bad in (0, target.config.n_layers + 1):
        with pytest.raises(ValueError):
            self_draft(target.params, target.config, bad)


def test_sampled_preserves_target_distribution(target, draft):
    """Rejection sampling with a WRONG draft must still draw from the
    target's processed distribution (temperature + nucleus) — compare
    empirical first-token distributions, TV-distance bounded as in
    tests/test_serving_llm.py."""
    d_params, d_cfg = draft
    prompt = [5, 9, 11]
    N = 600
    temperature, top_p = 0.25, 0.9
    spec = SpeculativeLlama(target, d_params, d_cfg, k=2)
    spec_first = []
    for _ in range(N):
        out = spec.generate([list(prompt)], max_gen_len=1,
                            temperature=temperature, top_p=top_p)
        spec_first.append(out[0][0] if out[0] else target.tokenizer.eos_id)
    outs, _ = target.generate([list(prompt)] * N, max_gen_len=1,
                              temperature=temperature, top_p=top_p)
    gen_first = [t[0] if t else target.tokenizer.eos_id for t in outs]
    support = sorted(set(spec_first) | set(gen_first))
    assert len(support) > 1, "degenerate distribution — test is vacuous"
    pa = collections.Counter(spec_first)
    pb = collections.Counter(gen_first)
    tv = 0.5 * sum(abs(pa[t] - pb[t]) / N for t in support)
    assert tv < 0.2, (tv, pa.most_common(5), pb.most_common(5))


def test_sampled_self_draft_accepts_everything(target):
    """draft == target: q == p, so the accept rule min(1, p/q) fires on
    every proposal — acceptance rate must be ~1 and rounds ~gen/k."""
    spec = SpeculativeLlama(target, target.params, target.config, k=4)
    out = spec.generate([[5, 9, 21, 3]], max_gen_len=24,
                        temperature=0.7, top_p=0.9)
    assert len(out[0]) >= 1
    assert spec.drafts_accepted >= spec.rounds * 4 - 4, (
        spec.drafts_accepted, spec.rounds
    )


def test_processed_probs_matches_sampler():
    """processed_probs is the exact distribution sample_next_token draws
    from: empirical agreement on a small vocab."""
    key = jax.random.PRNGKey(3)
    logits = jax.random.normal(key, (1, 16)) * 2.0
    temperature, top_p = 0.8, 0.7
    p = np.asarray(processed_probs(logits, temperature, top_p))[0]
    assert abs(p.sum() - 1.0) < 1e-5
    draws = []
    for i in range(2000):
        t = sample_next_token(
            logits, jax.random.PRNGKey(100 + i), temperature, top_p
        )
        draws.append(int(t[0]))
    emp = np.bincount(draws, minlength=16) / len(draws)
    assert np.abs(emp - p).max() < 0.05
    # nucleus truncation visible: zero-mass tokens are never drawn
    assert all(emp[i] == 0 for i in range(16) if p[i] == 0)
