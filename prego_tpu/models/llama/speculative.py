"""Speculative decoding — draft-proposed, target-verified generation.

Beyond-reference capability (the reference decodes strictly one token per
target forward, llama/generation.py:162-215): a cheap draft model proposes
``k`` tokens, the target verifies all of them in ONE multi-token forward,
and the accepted prefix advances the sequence — so the per-token cost of
the weight-streaming-bound target drops toward 1/k weight passes at high
acceptance. Autoregressive decode on a v5e is HBM-bound (RESULTS.md: 7B
int8 b1 sits at ~77-81% of the 8.07 ms weight-streaming floor); this is
the one serving lever that beats the floor itself instead of approaching
it.

TPU-first design decisions:

* **No rollback op.** The decoder masks attention strictly by absolute
  position (model.py::_attention — queries at position q attend keys at
  k_pos <= q), and every speculative round rewrites the cache window
  [pos, pos+k) before any query can attend it. Rejected-draft KV entries
  beyond the accepted prefix are therefore unreachable garbage that the
  next round overwrites: cache "rollback" is just not advancing ``pos``.
* **One jitted while_loop.** Draft steps (a lax.scan of k single-token
  decodes, which use the fast S=1 decode kernels), the (B, k+1) target
  verify forward, acceptance, and the output scatter all live inside a
  single jit — zero host round-trips per round, same structure as
  generation.py::_generate_body.
* **Bonus token.** The verify feeds all k drafts plus the current token
  (k+1 positions), so a fully-accepted round emits k+1 tokens: the k
  drafts AND the target's own next token at position pos+k+1 — the
  standard Leviathan emission, free because the verify forward is
  weight-stream-bound and the (B, k+1)th column costs no extra pass.
  Every round emits exactly a+1 tokens (a = accepted drafts, 0..k).
* **Batched, per-row.** Every row accepts a different prefix length per
  round, so rows advance at different rates — exactly the continuous-
  batching regime: per-row cache positions/bounds (model.py::forward's
  (B,) start_pos mode) keep one static-shape program while each row
  decodes at its own offset. The PREGO anticipation step's batch of
  sampled gens rides this directly.
* **Static shapes.** k, buffer lengths and both configs are static;
  acceptance only moves traced (B,) vectors (pos, n_emitted).

Sampling correctness: greedy verification accepts a draft token iff it
equals the target argmax, so greedy speculative output is IDENTICAL to
plain greedy decoding for ANY draft (the draft only affects speed — this
is the hermetic test invariant). Temperature>0 uses the
Leviathan/Chen-style rejection rule — accept x ~ q with probability
min(1, p(x)/q(x)), on rejection resample from norm(max(p-q, 0)) — applied
to the PROCESSED distributions (temperature + the reference's nucleus
truncation, ops/sampling.py::processed_probs), which provably preserves
the target's sampling distribution.

Acceptance on fabricated (random) weights is ~0 by construction, so the
on-chip bench brackets real deployments between two measured endpoints:
an "oracle" draft (replays the target's own greedy continuation —
acceptance 1, the ceiling) and a real small-model draft (acceptance ~0
with random weights, the overhead floor). See scripts/bench_llm.py
--case spec_decode_7b_*.
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from prego_tpu.models.llama.config import LlamaConfig
from prego_tpu.models.llama.model import (
    Params,
    forward,
    init_cache,
    precompute_rope,
)
from prego_tpu.ops.sampling import processed_probs


def _cache_spare(config: LlamaConfig, k: int) -> int:
    """Spare tail region on the cache T axis for the speculative path.

    While ANY row is active the (B, k+1) verify forward runs for EVERY
    row, including rows frozen at the window boundary (pos + k + 1 >
    max_seq_len): without spare rows their k+1-wide cache write would
    clamp its start BACKWARD (dynamic_update_slice semantics) and corrupt
    real KV the plain-decode tail then attends.  With the spare region
    the frozen row's writes land past max_seq_len in positions no query
    ever attends (attention is masked by absolute position <= pos <=
    max_seq_len - 1).  256 preserves the bounded decode kernels'
    T % t_block divisibility (the flash path requires max_seq_len % 256
    == 0 anyway); the einsum path (CPU / odd shapes) needs only k + 1."""
    return 256 if config.max_seq_len % 256 == 0 else k + 1


def _pad_cache_T(cache, spare: int):
    """Zero-pad every cache leaf's T axis (axis 2 for both the KV arrays
    and the int8-scale leaves — init_cache layout) by ``spare``."""
    return jax.tree.map(
        lambda x: jnp.pad(
            x, [(0, 0), (0, 0), (0, spare)] + [(0, 0)] * (x.ndim - 3)
        ),
        cache,
    )


def _draft_scan(
    draft_params: Params,
    cur_tok: jax.Array,  # (B,) int32 — token at ``pos``, not yet fed
    pos: jax.Array,  # (B,) int32
    d_cache,
    d_rope,
    key: jax.Array,
    d_cfg: LlamaConfig,
    k: int,
    temperature: float,
    top_p: float,
) -> Tuple[jax.Array, jax.Array, object]:
    """k single-token draft decodes (per-row positions). Returns
    (drafts (B, k), q_dists (k, B, V), updated draft cache). drafts[:, i]
    proposes for position pos+i+1; q_dists[i] is the processed
    distribution it was drawn from (zeros in greedy mode — unused).

    The scan runs k+1 steps and DISCARDS the last proposal: step k feeds
    drafts[k-1] at position pos+k, writing the draft-cache key a fully-
    accepted bonus round needs (pos advances by k+1 there; without this
    write the next round's draft attends a garbage key at its pos-1 and
    acceptance collapses — caught by the full-depth self-draft test).
    One extra draft forward per round, ~1/k of the (cheap) draft cost."""

    def step(carry, i):
        tok, cache, ky = carry
        logits, cache = forward(
            draft_params, tok[:, None], pos + i, cache, d_cfg, d_rope
        )
        l = logits[:, 0]  # (B, V)
        if temperature > 0:
            ky, sub = jax.random.split(ky)
            q = processed_probs(l, temperature, top_p)
            nxt = jax.random.categorical(sub, jnp.log(q)).astype(jnp.int32)
        else:
            q = jnp.zeros_like(l)
            nxt = jnp.argmax(l, axis=-1).astype(jnp.int32)
        return (nxt, cache, ky), (nxt, q)

    (_, d_cache, _), (drafts, q_dists) = jax.lax.scan(
        step, (cur_tok, d_cache, key), jnp.arange(k + 1, dtype=jnp.int32)
    )
    return drafts[:k].T, q_dists[:k], d_cache  # (B, k), (k, B, V)


def _spec_generate_body(
    target_params: Params,
    draft_params: Optional[Params],
    prompt: jax.Array,  # (B, Pbuf) int32, pad-filled — SUFFIX coords when
    #                     resuming from cached prefixes (start_offset > 0)
    prompt_len: jax.Array,  # (B,) int32 >= 1, suffix coords
    out_budget: jax.Array,  # scalar int32 <= out_buf_len - (k+1)
    key: jax.Array,
    oracle: Optional[jax.Array],  # (B, L) int32 absolute-position replay
    config: LlamaConfig,
    draft_config: Optional[LlamaConfig],
    k: int,
    out_buf_len: int,
    temperature: float,
    top_p: float,
    eos_id: int,
    kv_quant: bool,
    self_draft_layers: int = 0,  # >0: draft_params is None and the draft
    #   is the target's first N layers, SLICED FROM target_params INSIDE
    #   the trace — passing the shared tree as a second jit argument
    #   duplicates every weight leaf in the program's argument budget
    #   (JAX does not deduplicate aliased leaves: 2 x 6.74 GB at int8 7B,
    #   observed as an 18.05 GB AOT refusal, chipq_r5b)
    t_cache=None,  # None -> fresh zeros inside the jit; else a prefix
    #                cache already holding [0, start_offset)
    d_cache=None,
    start_offset: jax.Array = None,  # scalar int32 absolute pos of prompt[:, 0]
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array]:
    """Returns (out_buf (B, out_buf_len), n_emitted (B,), rounds,
    accepted, proposed). ``accepted/proposed`` is the realized
    acceptance rate (``proposed`` counts k per ACTIVE row per round —
    rows freeze at different times, so rounds*k*B overcounts)."""
    if self_draft_layers and draft_params is None:
        draft_params = dict(target_params)
        draft_params["layers"] = list(target_params["layers"])[
            :self_draft_layers
        ]
    B = prompt.shape[0]
    if start_offset is None:
        start_offset = jnp.int32(0)
    t_rope = precompute_rope(config)
    spare = _cache_spare(config, k)
    if t_cache is None:
        t_cache = _pad_cache_T(
            init_cache(
                config, B, dtype=target_params["norm"].dtype,
                quantized=kv_quant,
            ),
            spare,
        )
    # cache-only prefill of both models (logits unneeded: the first
    # verify re-feeds each row's last prompt token). Padded-tail garbage
    # beyond each row's prompt_len is overwritten by that row's first
    # rounds before any query can attend it (see module docstring).
    _, t_cache = forward(target_params, prompt, start_offset, t_cache, config, t_rope)
    if oracle is None:
        d_rope = precompute_rope(draft_config)
        if d_cache is None:
            # the draft cache inherits the target's int8-KV setting: a
            # full-depth self-draft otherwise duplicates the whole bf16 KV
            # footprint (OOM at B=4, ctx 1500, 7B — chipq_r5a)
            d_cache = _pad_cache_T(
                init_cache(
                    draft_config, B, dtype=draft_params["norm"].dtype,
                    quantized=kv_quant,
                ),
                _cache_spare(draft_config, k),
            )
        _, d_cache = forward(
            draft_params, prompt, start_offset, d_cache, draft_config, d_rope
        )
    else:
        d_rope = None
        d_cache = jnp.zeros((), jnp.int32)  # dummy carry leaf

    pos0 = start_offset + prompt_len - 1  # (B,) absolute
    cur0 = jax.vmap(lambda row, i: row[i])(prompt, prompt_len - 1)  # (B,)
    out_buf = jnp.zeros((B, out_buf_len), jnp.int32)
    arange_k1 = jnp.arange(k + 1, dtype=jnp.int32)
    rows = jnp.arange(B)

    def active_rows(pos, n_emitted, done):
        # the verify writes keys at pos..pos+k (k drafts + bonus column);
        # rows frozen here near the window boundary are FINISHED by the
        # plain-decode tail loop below (ADVICE r4: freezing alone emitted
        # up to k-1 fewer tokens than plain decoding near the boundary)
        return (
            ~done
            & (n_emitted < out_budget)
            & (pos + k + 1 <= config.max_seq_len)
        )

    def cond(state):
        pos, _, _, _, _, n_emitted, done, _, _, _, _ = state
        return jnp.any(active_rows(pos, n_emitted, done))

    def body(state):
        (pos, cur_tok, t_cache, d_cache, out_buf, n_emitted, done, key,
         rounds, accepted, proposed) = state
        active = active_rows(pos, n_emitted, done)
        key, dkey, vkey, ckey = jax.random.split(key, 4)

        # ---- draft phase: k proposals per row for pos+1 .. pos+k ----
        if oracle is not None:
            drafts = jax.vmap(
                lambda row, p: jax.lax.dynamic_slice(row, (p + 1,), (k,))
            )(oracle, pos)  # (B, k)
            q_dists = None
        else:
            drafts, q_dists, d_cache = _draft_scan(
                draft_params, cur_tok, pos, d_cache, d_rope, dkey,
                draft_config, k, temperature, top_p,
            )

        # ---- verify: ONE (B, k+1) target forward at per-row pos ----
        # feeding cur_tok + ALL k drafts yields k+1 distributions — the
        # k acceptance checks plus the BONUS column for pos+k+1, so a
        # fully-accepted round emits k+1 tokens (see module docstring)
        fed = jnp.concatenate([cur_tok[:, None], drafts], axis=1)
        t_logits, t_cache = forward(
            target_params, fed, pos, t_cache, config, t_rope
        )  # (B, k+1, V); [:, i] is the target dist for pos+i+1

        # ---- acceptance (per row): a in 0..k drafts, emit a+1 tokens ----
        if temperature > 0:
            p_dists = processed_probs(
                t_logits.reshape(B * (k + 1), -1), temperature, top_p
            ).reshape(B, k + 1, -1)
            q_bkv = jnp.swapaxes(q_dists, 0, 1)  # (B, k, V)
            pd = jnp.take_along_axis(
                p_dists[:, :k], drafts[..., None], axis=-1
            )[..., 0]
            qd = jnp.take_along_axis(q_bkv, drafts[..., None], axis=-1)[..., 0]
            u = jax.random.uniform(vkey, (B, k))
            acc = u * qd <= pd  # accept w.p. min(1, p/q), div-free form
            a = jnp.sum(jnp.cumprod(acc.astype(jnp.int32), axis=1), axis=1)
            # correction at index a: leftover-resample norm(max(p-q, 0));
            # a == k means all drafts accepted — q is zero there (no
            # proposal for the bonus column) so resid == p: the bonus is
            # drawn straight from the target, the exact Leviathan rule
            q_pad = jnp.concatenate(
                [q_bkv, jnp.zeros_like(q_bkv[:, :1])], axis=1
            )  # (B, k+1, V)
            p_ra = p_dists[rows, a]  # (B, V)
            resid = jnp.maximum(p_ra - q_pad[rows, a], 0.0)
            rs = jnp.sum(resid, axis=-1, keepdims=True)
            resid = jnp.where(rs > 1e-9, resid / jnp.maximum(rs, 1e-30), p_ra)
            corr = jax.random.categorical(ckey, jnp.log(resid)).astype(jnp.int32)
        else:
            t_hat = jnp.argmax(t_logits, axis=-1).astype(jnp.int32)  # (B, k+1)
            match = drafts == t_hat[:, :k]
            a = jnp.sum(jnp.cumprod(match.astype(jnp.int32), axis=1), axis=1)
            corr = t_hat[rows, a]  # (B,) — the bonus token when a == k

        n_new = a + 1  # (B,) in 1..k+1
        drafts_pad = jnp.concatenate(
            [drafts, jnp.zeros_like(drafts[:, :1])], axis=1
        )  # (B, k+1); the pad column is never selected (i=k needs a>k)
        emit = jnp.where(
            arange_k1[None] < a[:, None], drafts_pad, corr[:, None]
        )

        # eos inside the round: truncate each row to include its first eos
        hit = (emit == eos_id) & (arange_k1[None] < n_new[:, None])
        eos_at = jnp.min(jnp.where(hit, arange_k1[None], k + 1), axis=1)
        got_eos = eos_at < k + 1
        n_new = jnp.where(got_eos, eos_at + 1, n_new)
        n_new = jnp.where(active, n_new, 0)  # frozen rows emit nothing

        out_buf = jax.vmap(
            lambda buf, e, off: jax.lax.dynamic_update_slice(buf, e, (off,))
        )(out_buf, emit, n_emitted)
        # rows with n_new == 0 scribble stale emit values at their own
        # n_emitted offset — beyond their final cut, never read
        cur_tok = jnp.where(active, emit[rows, jnp.maximum(n_new - 1, 0)],
                            cur_tok)
        return (
            pos + n_new, cur_tok, t_cache, d_cache, out_buf,
            n_emitted + n_new, done | (got_eos & active), key,
            rounds + 1, accepted + jnp.sum(jnp.where(active, a, 0)),
            proposed + k * jnp.sum(active.astype(jnp.int32)),
        )

    state = (
        pos0, cur0, t_cache, d_cache, out_buf,
        jnp.zeros((B,), jnp.int32), jnp.zeros((B,), bool), key,
        jnp.int32(0), jnp.int32(0), jnp.int32(0),
    )
    state = jax.lax.while_loop(cond, body, state)
    (pos, cur_tok, t_cache, _, out_buf, n_emitted, done, key, rounds,
     accepted, proposed) = state

    # ---- plain single-token tail: rows the speculative loop froze at the
    # window boundary (pos + k + 1 > max_seq_len, up to k-1 tokens short)
    # finish with ordinary decode so output is IDENTICAL to plain greedy
    # everywhere, including at the context edge (ADVICE r4).  Runs 0
    # iterations for rows that retired by budget/eos; pos stays within
    # the window by the same arithmetic as plain generate (prompt + budget
    # <= max_seq_len ==> the last fed position is <= max_seq_len - 1).
    def tail_cond(st):
        _, _, _, _, n_emitted, done, _ = st
        return jnp.any(~done & (n_emitted < out_budget))

    def tail_body(st):
        pos, cur_tok, t_cache, out_buf, n_emitted, done, key = st
        active = ~done & (n_emitted < out_budget)
        logits, t_cache = forward(
            target_params, cur_tok[:, None], pos, t_cache, config, t_rope
        )
        l = logits[:, 0]
        if temperature > 0:
            key, sub = jax.random.split(key)
            p = processed_probs(l, temperature, top_p)
            nxt = jax.random.categorical(sub, jnp.log(p)).astype(jnp.int32)
        else:
            nxt = jnp.argmax(l, axis=-1).astype(jnp.int32)
        out_buf = jax.vmap(
            lambda buf, e, off: jax.lax.dynamic_update_slice(buf, e, (off,))
        )(out_buf, nxt[:, None], n_emitted)  # inactive rows scribble past
        #                                       their final cut — never read
        n_emitted = n_emitted + active.astype(jnp.int32)
        pos = pos + active.astype(jnp.int32)
        done = done | (active & (nxt == eos_id))
        cur_tok = jnp.where(active, nxt, cur_tok)
        return pos, cur_tok, t_cache, out_buf, n_emitted, done, key

    _, _, _, out_buf, n_emitted, _, _ = jax.lax.while_loop(
        tail_cond, tail_body, (pos, cur_tok, t_cache, out_buf, n_emitted,
                               done, key)
    )
    return out_buf, n_emitted, rounds, accepted, proposed


_SPEC_STATICS = (
    "config", "draft_config", "k", "out_buf_len", "temperature", "top_p",
    "eos_id", "kv_quant", "self_draft_layers",
)

_spec_generate_jit = functools.partial(
    jax.jit, static_argnames=_SPEC_STATICS
)(_spec_generate_body)


@functools.partial(jax.jit, static_argnames=_SPEC_STATICS + ("batch",))
def _spec_from_prefix_jit(
    target_params: Params,
    draft_params: Params,
    suffix: jax.Array,  # (B, Sbuf) int32 — suffix coords
    suffix_len: jax.Array,  # (B,) int32 >= 1
    out_budget: jax.Array,
    key: jax.Array,
    t_prefix,  # B=1 target prefix cache — NOT donated (LRU entry)
    d_prefix,  # B=1 draft prefix cache — NOT donated
    start_offset: jax.Array,  # scalar int32 — absolute position of suffix[:, 0]
    config: LlamaConfig,
    draft_config: LlamaConfig,
    k: int,
    out_buf_len: int,
    temperature: float,
    top_p: float,
    eos_id: int,
    kv_quant: bool,
    batch: int = 1,
    self_draft_layers: int = 0,
):
    """Prefix-cached speculative generation: both models resume from
    their cached B=1 prefix KV (broadcast to the request batch INSIDE the
    jit — the host-side per-leaf repeat costs one dispatch per cache leaf,
    generation.py:153-177), prefill only the novel suffix, then run
    speculative rounds.  The LRU prefix caches are allocated at
    max_seq_len, so the broadcast copies also append the speculative
    spare-tail region (_cache_spare)."""
    t_cache = _pad_cache_T(
        jax.tree.map(lambda x: jnp.repeat(x, batch, axis=0), t_prefix),
        _cache_spare(config, k),
    )
    d_cache = _pad_cache_T(
        jax.tree.map(lambda x: jnp.repeat(x, batch, axis=0), d_prefix),
        _cache_spare(draft_config, k),
    )
    return _spec_generate_body(
        target_params, draft_params, suffix, suffix_len, out_budget, key,
        None, config, draft_config, k, out_buf_len, temperature, top_p,
        eos_id, kv_quant, self_draft_layers,
        t_cache=t_cache, d_cache=d_cache,
        start_offset=start_offset,
    )


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def self_draft(
    target_params: Params, config: LlamaConfig, n_layers: int
) -> Tuple[Params, LlamaConfig]:
    """Layer-truncated SELF-draft: the target's own first ``n_layers``
    blocks, with its embedding/final-norm/lm-head, as the proposal model
    (the LayerSkip / Draft-&-Verify early-exit family).

    The returned tree REFERENCES the target's arrays — zero extra HBM
    for draft weights, which is the point on a 16 GB v5e: a separate
    1B-class bf16 draft costs ~2.7 GB beside the 6.74 GB int8 7B target,
    while a self-draft costs only its (n_layers/n_layers-of-target)-
    fraction KV cache. Works for every target layout (bf16, int8
    {"q","s"}, fused wqkv/w13) because the slice preserves per-layer
    leaf structure and ``forward`` dispatches per leaf. With trained
    weights the truncated stack is a genuinely correlated proposer
    (early-exit logits); with fabricated random weights acceptance is ~0
    like any independent draft — n_layers == config.n_layers makes the
    draft the target itself (acceptance ~1, the real-draft-cost ceiling,
    vs the oracle's zero-cost ceiling)."""
    if not 1 <= n_layers <= config.n_layers:
        raise ValueError(
            f"self-draft depth {n_layers} outside [1, {config.n_layers}]"
        )
    d_params = dict(target_params)
    d_params["layers"] = list(target_params["layers"])[:n_layers]
    return d_params, dataclasses.replace(config, n_layers=n_layers)


class SpeculativeLlama:
    """Speculative wrapper around a target :class:`Llama`.

    ``draft_params``/``draft_config`` select the proposal model (same
    vocab; typically the 1B-class shape drafting for 7B/13B). Passing
    ``oracle_tokens`` to generate() instead replays known continuations
    as the draft (zero draft cost — the acceptance=1 measurement
    harness). Batched: rows decode at independent per-row positions
    (each accepts a different prefix per round), the same per-row cache
    machinery as continuous batching — the PREGO anticipation step's
    batch of sampled gens fits directly."""

    def __init__(
        self,
        target,  # Llama (generation.py) — params/config/tokenizer/kv_quant
        draft_params: Optional[Params] = None,
        draft_config: Optional[LlamaConfig] = None,
        k: int = 4,
        pad_to_multiple: int = 64,
    ):
        if draft_config is not None:
            assert draft_config.vocab_size == target.config.vocab_size, (
                "draft and target must share a vocabulary"
            )
            assert draft_config.max_seq_len >= target.config.max_seq_len, (
                "draft cache must cover the target sequence length"
            )
        self.target = target
        self.draft_params = draft_params
        self.draft_config = draft_config
        # SELF-draft detection (self_draft(): the draft tree references
        # the target's arrays): pass the draft to the jits as a STATIC
        # layer count and slice the target tree inside the trace — a
        # second pytree argument would re-budget every shared weight leaf
        # (2 x 6.74 GB at int8 7B; AOT-refused over the tunnel, chipq_r5b)
        self._self_draft_layers = 0
        if (
            draft_params is not None
            and draft_params["tok_embeddings"] is target.params["tok_embeddings"]
            and draft_params["norm"] is target.params["norm"]
            and draft_params["output"] is target.params["output"]
            and len(draft_params["layers"]) <= len(target.params["layers"])
            and all(
                d is t for d, t in
                zip(draft_params["layers"], target.params["layers"])
            )
        ):
            self._self_draft_layers = len(draft_params["layers"])
        self.k = int(k)
        self.pad_to_multiple = pad_to_multiple
        self._key = jax.random.PRNGKey(
            int(os.environ.get("PREGO_SAMPLE_SEED", "1"))
        )
        # the draft side reuses Llama's prefix-LRU machinery wholesale
        # (chunked builds, delta-extends, eviction) for its OWN cache tree
        self._draft_llama = None
        if draft_params is not None:
            from prego_tpu.models.llama.generation import Llama

            self._draft_llama = Llama(
                draft_params, target.tokenizer, draft_config,
                prefix_cache_slots=target.prefix_cache_slots,
                # the draft's prefix-LRU caches follow the target's KV
                # quantization (they broadcast into the in-jit d_cache)
                kv_quant=getattr(target, "kv_quant", False),
            )
        # observability (host-mirrored after each generate)
        self.rounds = 0
        self.drafts_accepted = 0
        self.drafts_proposed = 0  # k per ACTIVE row per round

    def generate(
        self,
        prompt_tokens: List[List[int]],
        max_gen_len: int,
        temperature: float = 0.0,
        top_p: float = 0.9,
        oracle_tokens: Optional[List[List[int]]] = None,
    ) -> List[List[int]]:
        """Generated (non-echo) tokens per prompt. ``oracle_tokens``
        (absolute-position replays, prompt included, one per row)
        requires temperature=0 and no draft."""
        cfg = self.target.config
        tok = self.target.tokenizer
        if oracle_tokens is None:
            assert self.draft_params is not None, (
                "SpeculativeLlama needs draft_params or oracle_tokens"
            )
        else:
            assert temperature == 0.0, "oracle replay is greedy-only"
            assert len(oracle_tokens) == len(prompt_tokens)
        bsz = len(prompt_tokens)
        if bsz > cfg.max_batch_size:
            out: List[List[int]] = []
            for i in range(0, bsz, cfg.max_batch_size):
                out.extend(
                    self.generate(
                        prompt_tokens[i : i + cfg.max_batch_size],
                        max_gen_len, temperature, top_p,
                        oracle_tokens[i : i + cfg.max_batch_size]
                        if oracle_tokens is not None else None,
                    )
                )
            return out

        max_p = max(len(t) for t in prompt_tokens)
        assert 1 <= max_p <= cfg.max_seq_len
        max_gen_len = min(max_gen_len, cfg.max_seq_len - max_p)
        p_buf = min(_round_up(max_p, self.pad_to_multiple), cfg.max_seq_len)
        buf = np.full((bsz, p_buf), tok.pad_id, np.int32)
        for i, t in enumerate(prompt_tokens):
            buf[i, : len(t)] = np.asarray(t, np.int32)
        out_buf_len = _round_up(max_gen_len + self.k + 1, self.pad_to_multiple)

        if oracle_tokens is not None:
            o = np.full((bsz, cfg.max_seq_len + self.k), tok.pad_id, np.int32)
            for i, t in enumerate(oracle_tokens):
                o[i, : len(t)] = np.asarray(t, np.int32)
            oracle = jnp.asarray(o)
        else:
            oracle = None

        self._key, key = jax.random.split(self._key)
        sd = self._self_draft_layers if oracle is None else 0
        out, n, rounds, accepted, proposed = _spec_generate_jit(
            self.target.params,
            (self.draft_params if not sd else None) if oracle is None else None,
            jnp.asarray(buf),
            jnp.asarray([len(t) for t in prompt_tokens], jnp.int32),
            jnp.int32(max_gen_len),
            key,
            oracle,
            config=cfg,
            draft_config=self.draft_config if oracle is None else None,
            k=self.k,
            out_buf_len=out_buf_len,
            temperature=float(temperature),
            top_p=float(top_p),
            eos_id=int(tok.eos_id),
            kv_quant=self.target.kv_quant,
            self_draft_layers=sd,
        )
        out, n, rounds, accepted, proposed = jax.device_get(
            (out, n, rounds, accepted, proposed)
        )
        self.rounds += int(rounds)
        self.drafts_accepted += int(accepted)
        self.drafts_proposed += int(proposed)
        results = []
        for i in range(bsz):
            toks = out[i].tolist()[: min(int(n[i]), max_gen_len)]
            # host cut identical to Llama.generate: pad first, then eos
            if tok.pad_id in toks:
                toks = toks[: toks.index(tok.pad_id)]
            if tok.eos_id in toks:
                toks = toks[: toks.index(tok.eos_id)]
            results.append(toks)
        return results

    def generate_with_prefix_cache(
        self,
        prompt_tokens: List[List[int]],
        max_gen_len: int,
        temperature: float = 0.0,
        top_p: float = 0.9,
    ) -> List[List[int]]:
        """Speculative generation reusing BOTH models' cached KV for the
        batch-common prompt prefix (the PREGO anticipation regime: the
        same few-shot context hundreds of times per video,
        llama_meta.py:118-174). Prefix discovery/bucketing matches
        Llama.generate_with_prefix_cache; the target's LRU is shared with
        the non-speculative path, the draft keeps its own."""
        target, cfg = self.target, self.target.config
        assert self._draft_llama is not None, (
            "prefix-cached speculation needs a draft model"
        )
        bsz = len(prompt_tokens)
        if bsz > cfg.max_batch_size:
            out: List[List[int]] = []
            for i in range(0, bsz, cfg.max_batch_size):
                out.extend(
                    self.generate_with_prefix_cache(
                        prompt_tokens[i : i + cfg.max_batch_size],
                        max_gen_len, temperature, top_p,
                    )
                )
            return out

        assert max(len(t) for t in prompt_tokens) <= cfg.max_seq_len
        common = min(len(t) for t in prompt_tokens)
        first = prompt_tokens[0]
        shared = 0
        while shared < common and all(
            t[shared] == first[shared] for t in prompt_tokens
        ):
            shared += 1
        # keep >= 1 prompt token in the suffix (the first verify re-feeds it)
        eff = ((min(shared, common - 1)) // target.PREFIX_CHUNK) * target.PREFIX_CHUNK
        if eff < target.PREFIX_CHUNK:
            return self.generate(prompt_tokens, max_gen_len, temperature, top_p)

        prefix = tuple(first[:eff])
        t_prefix = target._ensure_prefix_cache(prefix)
        d_prefix = self._draft_llama._ensure_prefix_cache(prefix)

        tok = target.tokenizer
        suffixes = [t[eff:] for t in prompt_tokens]
        max_s = max(len(s) for s in suffixes)
        max_gen_len = min(max_gen_len, cfg.max_seq_len - eff - max_s)
        s_buf = min(
            _round_up(max_s, self.pad_to_multiple), cfg.max_seq_len - eff
        )
        buf = np.full((bsz, s_buf), tok.pad_id, np.int32)
        for i, s in enumerate(suffixes):
            buf[i, : len(s)] = np.asarray(s, np.int32)
        out_buf_len = _round_up(max_gen_len + self.k + 1, self.pad_to_multiple)

        self._key, key = jax.random.split(self._key)
        sd = self._self_draft_layers
        out, n, rounds, accepted, proposed = _spec_from_prefix_jit(
            target.params,
            self.draft_params if not sd else None,
            jnp.asarray(buf),
            jnp.asarray([len(s) for s in suffixes], jnp.int32),
            jnp.int32(max_gen_len),
            key,
            t_prefix,
            d_prefix,
            jnp.int32(eff),
            config=cfg,
            draft_config=self.draft_config,
            k=self.k,
            out_buf_len=out_buf_len,
            temperature=float(temperature),
            top_p=float(top_p),
            eos_id=int(tok.eos_id),
            kv_quant=target.kv_quant,
            batch=bsz,
            self_draft_layers=sd,
        )
        out, n, rounds, accepted, proposed = jax.device_get(
            (out, n, rounds, accepted, proposed)
        )
        self.rounds += int(rounds)
        self.drafts_accepted += int(accepted)
        self.drafts_proposed += int(proposed)
        results = []
        for i in range(bsz):
            toks = out[i].tolist()[: min(int(n[i]), max_gen_len)]
            if tok.pad_id in toks:
                toks = toks[: toks.index(tok.pad_id)]
            if tok.eos_id in toks:
                toks = toks[: toks.index(tok.eos_id)]
            results.append(toks)
        return results

    def text_completion(
        self,
        prompts: List[str],
        temperature: float = 0.0,
        top_p: float = 0.9,
        max_gen_len: Optional[int] = None,
        use_prefix_cache: bool = False,
    ) -> List[dict]:
        if max_gen_len is None:
            max_gen_len = self.target.config.max_seq_len - 1
        tok = self.target.tokenizer
        prompt_tokens = [tok.encode(x, bos=True, eos=False) for x in prompts]
        gen = (
            self.generate_with_prefix_cache
            if use_prefix_cache and self._draft_llama is not None
            else self.generate
        )
        gens = gen(
            prompt_tokens, max_gen_len=max_gen_len,
            temperature=temperature, top_p=top_p,
        )
        return [{"generation": tok.decode(g)} for g in gens]
