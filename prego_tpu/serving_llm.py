"""Continuous-batching LLM serving loop (slot-based admission).

The reference serves LLaMA with static request batches
(step_anticipation/llama/generation.py:121-215): a batch is padded to
the longest prompt, decodes in lockstep, and new work waits for the
whole batch to drain.  On a TPU the static-shape constraint is real —
but it binds the COMPILED program, not the REQUEST lifecycle.  This
module runs one fixed-shape decode program over S cache slots and lets
requests enter and leave mid-flight:

  - the KV cache is one batched tree (S rows); each slot carries its own
    write position — model.forward's per-row ``start_pos`` mode scatters
    cache updates per row and bounds attention per row (the bounded
    decode kernels take (B,) valid lengths straight into SMEM);
  - admission is PREFIX-SHARING: when a request's prompt starts with a
    prefix held in the Llama's shared KV-prefix LRU (the PREGO workload
    sends the same per-toy few-shot context across hundreds of requests,
    llama_meta.py:118-174), the cached B=1 prefix KV is copied into the
    slot's rows and only the per-request SUFFIX is prefilled — in ONE
    jitted dispatch (bucketed suffix lengths -> bounded compiles) that
    also scatters the result into the batched tree in place (donated);
  - decode runs in fixed ``chunk``-step jitted scans between admission
    points, cache donated through; finished slots (eos / per-request
    budget) retire and free their row without stalling live ones;
  - the host syncs on ONE fetch per chunk (the emitted-token block);
    slot liveness/budgets are mirrored host-side from the emissions, so
    no device state ever round-trips back (the tunnel charges ~ms per
    blocking fetch and the v1 loop paid six of them per chunk);
  - SHORT suffixes ride the decode scan itself (PIGGYBACK admission,
    round 5): instead of a dedicated prefill forward — one full weight
    stream during which every live slot idles — the admitted row feeds
    its pending prompt tokens one per decode step, sharing the weight
    stream the chunk already pays (decode at serving batches is
    weight-streaming-bound, so the extra row's token is ~free).
    Admission then costs only the prefix-KV row copy (a scatter, no
    forward).  The weight-stream break-even (~4*slots) is NOT the right
    threshold under saturation: a piggybacked suffix holds its slot L
    emission-steps without emitting, and the s16 ctx-burst A/B/A
    (chipq_r5a, ~65-token suffixes) measured piggyback-64 at 386.2 tok/s
    vs 493.9/487.6 control — so only TINY suffixes (default <= 4 tokens,
    where the saved dispatch RTT + all-slot stall dominate) ride the
    scan.  PREGO_CB_PIGGYBACK overrides; 0 disables.

Utilization therefore tracks offered load instead of worst-of-batch
latency, and admission cost tracks the NOVEL tokens of each request
instead of its full prompt.
"""

from __future__ import annotations

import functools
import os
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from prego_tpu.models.llama.model import LlamaConfig, forward, init_cache, precompute_rope
from prego_tpu.ops.sampling import sample_next_token

Params = dict
Cache = dict

PAD_EMIT = -1  # emitted for dead rows; never a real token id


@dataclass
class Request:
    uid: int
    prompt: List[int]  # token ids, len >= 1
    max_gen_len: int


@dataclass
class Completion:
    uid: int
    tokens: List[int]  # generated ids (eos included when hit)
    prompt_len: int
    admitted_step: int  # global decode-step index at admission
    finished_step: int
    wall_latency_s: float  # admission -> finish
    finished_wall_s: float  # serve() start -> finish (burst latency)


@dataclass
class ServeStats:
    decode_steps: int = 0
    slot_steps_live: int = 0  # sum over steps of live slots
    slot_steps_total: int = 0  # decode_steps * slots
    prefills: int = 0  # admissions
    prefix_hits: int = 0  # admissions that reused a cached KV prefix
    prefix_tokens_reused: int = 0  # prompt tokens NOT re-prefilled
    suffix_tokens_prefilled: int = 0  # prompt tokens through DEDICATED prefill
    suffix_tokens_piggybacked: int = 0  # prompt tokens fed via the decode scan
    wall_s: float = 0.0

    @property
    def utilization(self) -> float:
        return self.slot_steps_live / max(self.slot_steps_total, 1)


def _insert_row_body(big: Cache, small: Cache, slot: jax.Array) -> Cache:
    """Scatter a B=1 cache tree into row ``slot`` of the batched tree."""
    return jax.tree.map(
        lambda b, s: jax.lax.dynamic_update_slice(
            b, s.astype(b.dtype), (slot,) + (0,) * (b.ndim - 1)
        ),
        big,
        small,
    )


# ``big`` is donated so the insert is an in-place row write instead of a
# full-tree copy (the batched cache is GBs at the 7B serving shapes)
_insert_row = functools.partial(jax.jit, donate_argnames=("big",))(_insert_row_body)

# all-static jit: the whole S-row cache tree materializes in ONE device
# dispatch (host-side init_cache issues one jnp.zeros per leaf — 128
# tunnel round-trips at the 7B shapes)
_init_cache_jit = functools.partial(
    jax.jit, static_argnames=("config", "batch", "dtype", "quantized")
)(init_cache)


@functools.partial(
    jax.jit, static_argnames=("config",), donate_argnames=("big",)
)
def _admit_row(
    params,
    rope,
    prefix_cache,  # B=1 cache tree holding the shared prefix KV, or int32(0)
    #                when the request has no cached prefix (zeros built in-jit)
    suffix,  # (1, Lbuf) int32, pad-filled past the real suffix — bucketed
    start,  # scalar int32: absolute position of suffix[0] (= prefix length)
    big,  # batched (S-row) cache tree — DONATED (in-place row write)
    slot,  # scalar int32
    *,
    config: LlamaConfig,
):
    """One-dispatch admission: continue the (possibly cached) B=1 prefix
    KV with the request's suffix tokens, then scatter the row into the
    batched tree.  Padded tail positions write garbage KV past the real
    prompt body — harmless: decode overwrites position p before attending
    it (forward updates the cache before the attention read), so padded
    entries are never visible to any query.

    The prefix LRU entry is NOT donated (it stays valid for the next
    admission); the fresh-cache branch builds zeros inside the jit so a
    prefix-less admission costs one dispatch, not one per cache leaf."""
    if isinstance(prefix_cache, dict):
        small = prefix_cache
    else:
        small = jax.tree.map(
            lambda b: jnp.zeros((1,) + b.shape[1:], b.dtype), big
        )
    if suffix.shape[1] > 0:
        _, small = forward(params, suffix, start, small, config, rope)
    return _insert_row_body(big, small, slot)


@functools.partial(
    jax.jit, static_argnames=("config", "batch"), donate_argnames=("big",)
)
def _admit_rows_shared_prefix(
    params,
    rope,
    prefix_cache,  # B=1 cache tree with the SHARED prefix KV, or int32(0)
    suffixes,  # (batch, Lbuf) int32, per-row pad-filled — bucketed
    start,  # scalar int32: the shared prefix length (same for all rows)
    big,  # batched cache tree — DONATED
    slots_idx,  # (batch,) int32 slot of each row
    *,
    config: LlamaConfig,
    batch: int,
):
    """Batched admission for K requests sharing one cached prefix: the
    prefix KV broadcasts to K rows in-jit, the K suffixes prefill in ONE
    forward (one weight stream instead of K — the dominant admission cost
    at 7B is streaming 6.6 GB of int8 weights per dispatch), and each row
    scatters to its slot.  Per-row padded tails write garbage KV past
    each row's real body; decode overwrites position p before attending
    it, so the garbage is never visible (same argument as _admit_row)."""
    if isinstance(prefix_cache, dict):
        small = jax.tree.map(lambda x: jnp.repeat(x, batch, axis=0), prefix_cache)
    else:
        small = jax.tree.map(
            lambda b: jnp.zeros((batch,) + b.shape[1:], b.dtype), big
        )
    if suffixes.shape[1] > 0:
        _, small = forward(params, suffixes, start, small, config, rope)

    def scatter_leaf(b, s):
        def body(i, acc):
            row = jax.lax.dynamic_slice_in_dim(s, i, 1, axis=0)
            return jax.lax.dynamic_update_slice(
                acc, row.astype(b.dtype),
                (slots_idx[i],) + (0,) * (b.ndim - 1),
            )

        return jax.lax.fori_loop(0, batch, body, b)

    return jax.tree.map(scatter_leaf, big, small)


@jax.jit
def _apply_admissions(
    tok, pos, live, remaining, pend, pend_idx, pend_rem,
    new_tok, new_pos, new_rem, new_pend, new_prem, mask,
):
    """Merge this round's admissions into the device-resident slot state
    (one host->device transfer, no fetch back).  ``pend``/``pend_rem``
    are each slot's queue of not-yet-fed prompt tokens: every admission
    enqueues at least its LAST prompt token (rem == 1 reproduces the
    classic admission — the first decode feed); piggybacked admissions
    enqueue their whole novel suffix."""
    tok = jnp.where(mask, new_tok, tok)
    pos = jnp.where(mask, new_pos, pos)
    remaining = jnp.where(mask, new_rem, remaining)
    pend = jnp.where(mask[:, None], new_pend, pend)
    pend_idx = jnp.where(mask, 0, pend_idx)
    pend_rem = jnp.where(mask, new_prem, pend_rem)
    live = live | mask
    return tok, pos, live, remaining, pend, pend_idx, pend_rem


@functools.partial(
    jax.jit,
    static_argnames=("config", "chunk", "temperature", "top_p", "eos_id"),
    donate_argnames=("cache",),
)
def _decode_chunk(
    params, rope, cache, tok, pos, live, remaining, pend, pend_idx,
    pend_rem, key,
    *, config, chunk: int, temperature: float, top_p: float, eos_id: int,
):
    """``chunk`` lockstep decode steps over all S slots; per-row
    positions and bounds throughout.  Dead rows feed token 0 at a frozen
    position (their stale cache rows sit beyond every live row's valid
    bound and are overwritten by the next admission or by the row's own
    advancing writes before ever becoming visible).

    Rows with ``pend_rem > 0`` are still PREFILLING: they feed their next
    pending prompt token instead of a sampled one and emit PAD — riding
    the weight stream the decode step already pays (piggyback admission).
    The step that feeds a row's LAST pending token (rem == 1) yields its
    first sampled emission, exactly the classic last-prompt-token feed."""

    def step(carry, _):
        tok, pos, live, remaining, pend, pend_idx, pend_rem, cache, key = carry
        prefilling = pend_rem > 0
        queued = jax.vmap(lambda row, i: row[i])(pend, pend_idx)
        feed = jnp.where(live, jnp.where(prefilling, queued, tok), 0)
        logits, cache = forward(params, feed[:, None], pos, cache, config, rope)
        key, sub = jax.random.split(key)
        nxt = sample_next_token(
            logits[:, 0].astype(jnp.float32), sub, temperature, top_p
        )
        emitting = live & (pend_rem <= 1)  # rem==1: last prompt token fed
        emit = jnp.where(emitting, nxt, PAD_EMIT)
        finished_now = emitting & ((nxt == eos_id) | (remaining <= 1))
        pos = jnp.where(live, pos + 1, pos)
        remaining = jnp.where(emitting, remaining - 1, remaining)
        pend_idx = jnp.where(
            live & prefilling,
            jnp.minimum(pend_idx + 1, pend.shape[1] - 1),
            pend_idx,
        )
        pend_rem = jnp.where(live & prefilling, pend_rem - 1, pend_rem)
        live = live & ~finished_now
        tok = jnp.where(live & emitting, nxt, tok)
        return (tok, pos, live, remaining, pend, pend_idx, pend_rem, cache,
                key), emit

    (tok, pos, live, remaining, pend, pend_idx, pend_rem, cache, key), emits = (
        jax.lax.scan(
            step,
            (tok, pos, live, remaining, pend, pend_idx, pend_rem, cache, key),
            None, length=chunk,
        )
    )
    return tok, pos, live, remaining, pend, pend_idx, pend_rem, cache, key, emits


def _bucket(n: int, chunk: int = 64) -> int:
    """Smallest power-of-two multiple of ``chunk`` >= n (bounded compile
    signatures for the admission suffix prefill)."""
    b = chunk
    while b < n:
        b *= 2
    return b


@dataclass
class _Slot:
    req: Request
    remaining: int
    toks: List[int] = field(default_factory=list)
    admit_step: int = 0
    admit_wall: float = 0.0


class ContinuousBatcher:
    """Serve a request stream through S always-running decode slots.

    ``llama`` is a generation.Llama (params/config/tokenizer AND the
    KV-prefix LRU are shared; the batcher owns its own S-row cache).
    temperature=0 gives deterministic greedy output — the parity bar
    against per-request generation (tests/test_serving_llm.py).

    ``prefix_sharing=True`` (default) makes admission look up the longest
    Llama-LRU prefix of each prompt and prefill only the remainder; use
    ``register_prefix``/``serve_prompts`` to seed the LRU with a shared
    context.  Admission NEVER creates LRU entries on its own (a random
    no-sharing burst must not churn GB-scale cache slots)."""

    def __init__(
        self,
        llama,
        slots: Optional[int] = None,
        chunk: int = 8,
        temperature: float = 0.0,
        top_p: float = 0.9,
        seed: int = 1,
        prefix_sharing: bool = True,
        overlap_fetch: Optional[bool] = None,
        piggyback_max_suffix: Optional[int] = None,
    ):
        self.llama = llama
        self.config: LlamaConfig = llama.config
        self.params: Params = llama.params
        self.slots = slots or self.config.max_batch_size
        self.chunk = chunk
        self.temperature = float(temperature)
        self.top_p = float(top_p)
        self.prefix_sharing = prefix_sharing
        # Piggyback-admission threshold: novel suffixes up to this many
        # tokens (incl. the last prompt token) are fed THROUGH the decode
        # scan instead of a dedicated prefill forward.  0 disables (every
        # admission prefills); the pending buffer is a static shape, so
        # the threshold is fixed per batcher (one compile signature).
        # Default 4, NOT the weight-stream break-even (~4*slots): the
        # same-window A/B/A at the saturated s16 ctx burst (~65-token
        # suffixes, chipq_r5a) read control 493.9 / piggyback-64 386.2 /
        # control 487.6 tok/s — at saturation the scarce resource is slot
        # OCCUPANCY, and a piggybacked suffix holds its slot L emission-
        # steps without emitting.  Tiny suffixes still win: a dedicated
        # prefill stalls every live slot one weight stream plus a ~25-50 ms
        # dispatch RTT, vs <= 3 occupied steps on one slot.
        if piggyback_max_suffix is None:
            env = os.environ.get("PREGO_CB_PIGGYBACK")
            piggyback_max_suffix = int(env) if env is not None else 4
        # >= 1: every admission enqueues at least its last prompt token
        self.pend_buf = max(int(piggyback_max_suffix), 1)
        # Pipeline the per-chunk emits fetch behind the NEXT chunk's
        # execution: the host processes chunk N-1's emissions while the
        # device runs chunk N. Hides one transfer round-trip per chunk —
        # material whenever the fetch crosses a device boundary
        # (same-window A/B/A at the flagship s16 ctx burst, r4d: control
        # 448.2 / overlap 483.1 / control 433.5 tok/s — +9.6% vs control
        # mean, outside the control spread), a slight net loss on a host
        # backend (admission lags one chunk, so retired slots idle ~chunk
        # extra steps and one all-dead trailing chunk runs per burst).
        # Default: PREGO_CB_OVERLAP=1/0 if set, else ON for device
        # backends and OFF on CPU. Host bookkeeping is identical either
        # way — it just observes each chunk's emissions one chunk later.
        if overlap_fetch is None:
            env = os.environ.get("PREGO_CB_OVERLAP")
            if env is not None:
                overlap_fetch = env == "1"
            else:
                overlap_fetch = jax.default_backend() != "cpu"
        self.overlap_fetch = bool(overlap_fetch)
        self.kv_quant = bool(getattr(llama, "kv_quant", False))
        self._cache_dtype = self.params["norm"].dtype  # bf16 on TPU, f32 CPU
        self._rope = precompute_rope(self.config)
        self._key = jax.random.PRNGKey(
            int(os.environ.get("PREGO_SAMPLE_SEED", seed))
        )
        self._eos_id = int(getattr(llama.tokenizer, "eos_id", -2))
        self._cache: Optional[Cache] = None  # reused across serve() calls

    # --------------------------------------------------------- prefixes

    def register_prefix(self, tokens: Sequence[int]) -> int:
        """Seed the shared LRU with the chunk-aligned prefix of ``tokens``
        (built/extended via the Llama's delta-prefill machinery). Returns
        the aligned length actually cached (0 when too short)."""
        eff = (len(tokens) // self.llama.PREFIX_CHUNK) * self.llama.PREFIX_CHUNK
        if eff >= self.llama.PREFIX_CHUNK:
            self.llama._ensure_prefix_cache(tuple(tokens[:eff]))
            return eff
        return 0

    def _lookup_prefix(self, body: Sequence[int]) -> Tuple[int, Optional[Cache]]:
        """Longest cached LRU key that prefixes ``body``; (0, None) if none."""
        if not self.prefix_sharing:
            return 0, None
        best = None
        for k in self.llama._prefix_caches:
            if len(k) <= len(body) and tuple(body[: len(k)]) == k:
                if best is None or len(k) > len(best):
                    best = k
        if best is None:
            return 0, None
        cache = self.llama._prefix_caches[best]
        self.llama._prefix_caches.move_to_end(best)  # LRU touch
        return len(best), cache

    # --------------------------------------------------------- admission

    def _admit_batch(self, cache: Cache, assignments, stats: ServeStats):
        """Write each (slot, request)'s prompt KV into its slot rows and
        decide how the novel tokens reach the model.  Returns
        ``(cache, pend_info)`` with ``pend_info[slot] = (feed_tokens,
        start_pos)`` — the slot's pending-token queue for the decode scan.

        PIGGYBACK admissions (novel suffix <= pend_buf): only the cached
        prefix rows are copied (a scatter, NO forward — grouped per
        prefix into one dispatch); the whole suffix feeds through the
        decode scan one token per step, riding the weight stream the
        chunk already pays.  DEDICATED admissions prefill the suffix
        body in one forward as before (requests sharing a prefix batch
        into ONE dispatch = one weight stream), and enqueue only the
        last prompt token — the classic first decode feed whose forward
        yields the first sampling logits (generation.py's suffix trick)."""
        groups: Dict[object, List] = {}
        copy_groups: Dict[object, List] = {}
        pend_info: Dict[int, Tuple[List[int], int]] = {}
        for slot, r in assignments:
            body = list(r.prompt[:-1])
            plen, prefix_cache = self._lookup_prefix(body)
            stats.prefills += 1
            if plen:
                stats.prefix_hits += 1
                stats.prefix_tokens_reused += plen
            feed = list(r.prompt[plen:])  # novel tokens incl. the last
            if len(feed) <= self.pend_buf:
                stats.suffix_tokens_piggybacked += len(feed) - 1
                pend_info[slot] = (feed, plen)
                if prefix_cache is not None:
                    key = (plen, id(prefix_cache))
                    copy_groups.setdefault(key, [prefix_cache, []])[1].append(
                        slot
                    )
                # no cached prefix: the slot decodes from position plen=0
                # and only ever attends positions it wrote itself, so the
                # stale row needs no clearing
                continue
            suffix = body[plen:]
            stats.suffix_tokens_prefilled += len(suffix)
            pend_info[slot] = ([r.prompt[-1]], len(r.prompt) - 1)
            if not suffix and prefix_cache is None:
                continue
            key = (plen, id(prefix_cache) if prefix_cache is not None else None)
            groups.setdefault(key, [prefix_cache, []])[1].append((slot, suffix))

        for (plen, _), (prefix_cache, pslots) in copy_groups.items():
            # prefix-KV row copies in ONE dispatch per shared prefix (the
            # empty suffix skips the forward inside the admission jits)
            if len(pslots) == 1:
                cache = _admit_row(
                    self.params, self._rope, prefix_cache,
                    jnp.zeros((1, 0), jnp.int32), jnp.int32(plen), cache,
                    jnp.int32(pslots[0]), config=self.config,
                )
            else:
                cache = _admit_rows_shared_prefix(
                    self.params, self._rope, prefix_cache,
                    jnp.zeros((len(pslots), 0), jnp.int32), jnp.int32(plen),
                    cache, jnp.asarray(pslots, jnp.int32),
                    config=self.config, batch=len(pslots),
                )

        for (plen, _), (prefix_cache, rows) in groups.items():
            base = (
                prefix_cache if prefix_cache is not None else jnp.int32(0)
            )
            # the padded suffix buffer must fit the remaining cache window:
            # an unclamped bucket past max_seq_len makes the in-jit
            # dynamic_update_slice clamp its start BACKWARD, silently
            # overwriting real prefix KV with wrong-RoPE-position rows
            # (reachable with fully valid requests — the request validation
            # in serve() only bounds the REAL suffix, not its bucket)
            window = self.config.max_seq_len - plen
            assert all(len(s) <= window for _, s in rows)
            if len(rows) == 1:
                slot, suffix = rows[0]
                buf = min(_bucket(len(suffix)), window) if suffix else 0
                padded = np.zeros((1, buf), np.int32)
                padded[0, : len(suffix)] = suffix
                cache = _admit_row(
                    self.params, self._rope, base, jnp.asarray(padded),
                    jnp.int32(plen), cache, jnp.int32(slot),
                    config=self.config,
                )
            else:
                longest = max(len(s) for _, s in rows)
                buf = min(_bucket(longest), window) if longest else 0
                padded = np.zeros((len(rows), buf), np.int32)
                for i, (_, s) in enumerate(rows):
                    padded[i, : len(s)] = s
                cache = _admit_rows_shared_prefix(
                    self.params, self._rope, base, jnp.asarray(padded),
                    jnp.int32(plen), cache,
                    jnp.asarray([s for s, _ in rows], jnp.int32),
                    config=self.config, batch=len(rows),
                )
        return cache, pend_info

    # ------------------------------------------------------------- loop

    def serve(
        self,
        requests: Sequence[Request],
        collect_stats: bool = True,
        temperature: Optional[float] = None,
        top_p: Optional[float] = None,
    ) -> Tuple[List[Completion], ServeStats]:
        """Run the stream to completion.  Requests are admitted in order
        as slots free up; completions return in finish order."""
        cfg = self.config
        S = self.slots
        temperature = self.temperature if temperature is None else float(temperature)
        top_p = self.top_p if top_p is None else float(top_p)
        for r in requests:
            if len(r.prompt) + r.max_gen_len > cfg.max_seq_len:
                raise ValueError(
                    f"request {r.uid}: prompt {len(r.prompt)} + gen "
                    f"{r.max_gen_len} exceeds max_seq_len {cfg.max_seq_len}"
                )

        t0 = time.perf_counter()
        cache = self._cache
        if cache is None:
            cache = _init_cache_jit(
                config=cfg, batch=S, dtype=self._cache_dtype,
                quantized=self.kv_quant,
            )
        self._cache = None  # donated below; restored on return
        tok = jnp.zeros((S,), jnp.int32)
        pos = jnp.zeros((S,), jnp.int32)
        live = jnp.zeros((S,), bool)
        remaining = jnp.zeros((S,), jnp.int32)
        pend = jnp.zeros((S, self.pend_buf), jnp.int32)
        pend_idx = jnp.zeros((S,), jnp.int32)
        pend_rem = jnp.zeros((S,), jnp.int32)

        pending = list(requests)
        slots: Dict[int, _Slot] = {}  # host mirror of live slots
        done: List[Completion] = []
        stats = ServeStats()
        step_idx = 0

        def process(emits_h: np.ndarray, end_step: int) -> None:
            """Retire finished slots from one chunk's emissions (host
            mirrors the device liveness rule: a slot emits until eos or
            budget)."""
            if collect_stats:
                stats.decode_steps += self.chunk
                stats.slot_steps_live += int((emits_h != PAD_EMIT).sum())
                stats.slot_steps_total += self.chunk * S
            for s in list(slots):
                st = slots[s]
                new = [int(t) for t in emits_h[:, s] if t != PAD_EMIT]
                st.toks.extend(new)
                st.remaining -= len(new)
                if self._eos_id in new or st.remaining <= 0:
                    slots.pop(s)
                    toks = st.toks
                    if self._eos_id in toks:
                        toks = toks[: toks.index(self._eos_id) + 1]
                    now = time.perf_counter()
                    done.append(
                        Completion(
                            uid=st.req.uid,
                            tokens=toks,
                            prompt_len=len(st.req.prompt),
                            admitted_step=st.admit_step,
                            finished_step=end_step,
                            wall_latency_s=now - st.admit_wall,
                            finished_wall_s=now - t0,
                        )
                    )

        inflight = None  # (emits device array, end step) awaiting its fetch

        # Overlap pays one extra chunk per serve() call: emissions are
        # processed one chunk late, so after the last real chunk the
        # loop decodes one more chunk of dead rows before the host
        # learns every slot finished.  On a long burst that is noise
        # (~3% at 36 chunks) and each chunk hides one fetch RTT — the
        # measured s16 win; on the PREGO driver's per-step bursts (8
        # requests, gen 8, chunk 8 = ONE chunk) it DOUBLES the decode
        # work (r5e: 1.187 s/call vs 0.960 batch — the r4b CB workload
        # win reversed).  Gate per call: overlap only when the expected
        # chunk count amortizes the trailing dead chunk (savings ~N x
        # fetch RTT ~25-50 ms vs ~one chunk ~100 ms -> break-even N~3).
        waves = -(-len(requests) // max(1, S))
        max_gen = max((r.max_gen_len for r in requests), default=0)
        est_chunks = waves * max(1, -(-max_gen // self.chunk))
        use_overlap = self.overlap_fetch and est_chunks >= 4

        while pending or slots or inflight is not None:
            # ---- admit into free slots (cache rows scatter in place; the
            # decode batch stalls only for the admitted suffix prefills)
            if pending:
                assignments = []
                for s in range(S):
                    if s not in slots and pending:
                        r = pending.pop(0)
                        assignments.append((s, r))
                        slots[s] = _Slot(
                            req=r, remaining=r.max_gen_len,
                            admit_step=step_idx,
                            admit_wall=time.perf_counter(),
                        )
                if assignments:
                    cache, pend_info = self._admit_batch(
                        cache, assignments, stats
                    )
                    adm_tok = np.zeros((S,), np.int32)
                    adm_pos = np.zeros((S,), np.int32)
                    adm_rem = np.zeros((S,), np.int32)
                    adm_mask = np.zeros((S,), bool)
                    adm_pend = np.zeros((S, self.pend_buf), np.int32)
                    adm_prem = np.zeros((S,), np.int32)
                    for s, r in assignments:
                        feed, start = pend_info[s]
                        adm_pend[s, : len(feed)] = feed
                        adm_prem[s] = len(feed)
                        adm_pos[s] = start
                        adm_rem[s] = r.max_gen_len
                        adm_mask[s] = True
                    (tok, pos, live, remaining, pend, pend_idx,
                     pend_rem) = _apply_admissions(
                        tok, pos, live, remaining, pend, pend_idx, pend_rem,
                        jnp.asarray(adm_tok), jnp.asarray(adm_pos),
                        jnp.asarray(adm_rem), jnp.asarray(adm_pend),
                        jnp.asarray(adm_prem), jnp.asarray(adm_mask),
                    )

            # ---- one jitted chunk of lockstep decode (cache donated);
            # skipped when only the trailing in-flight fetch remains
            emits = None
            if pending or slots:
                (tok, pos, live, remaining, pend, pend_idx, pend_rem, cache,
                 self._key, emits) = _decode_chunk(
                    self.params, self._rope, cache, tok, pos, live, remaining,
                    pend, pend_idx, pend_rem,
                    self._key, config=cfg, chunk=self.chunk,
                    temperature=temperature, top_p=top_p,
                    eos_id=self._eos_id,
                )
                step_idx += self.chunk

            if not use_overlap:
                if emits is not None:
                    process(np.asarray(emits), step_idx)  # the ONE fetch
            else:
                # pipeline: fetch chunk N-1 while chunk N executes
                if inflight is not None:
                    process(np.asarray(inflight[0]), inflight[1])
                inflight = (emits, step_idx) if emits is not None else None
        stats.wall_s = time.perf_counter() - t0
        self._cache = cache  # reuse the rows (and their buffers) next call
        return done, stats

    # ------------------------------------------------- driver seam

    def serve_prompts(
        self,
        prompt_tokens: Sequence[Sequence[int]],
        max_gen_len: int,
        temperature: Optional[float] = None,
        top_p: Optional[float] = None,
    ) -> List[List[int]]:
        """text_completion-shaped entry: serve a batch of tokenized
        prompts, seeding the shared LRU with their COMMON aligned prefix
        first (exactly the sharing structure of the PREGO anticipation
        dispatch — generate_with_prefix_cache computes the same split),
        and return generated token lists in input order (eos stripped)."""
        if not prompt_tokens:
            return []
        first = list(prompt_tokens[0])
        common = min(len(t) for t in prompt_tokens)
        shared = 0
        while shared < common and all(
            t[shared] == first[shared] for t in prompt_tokens
        ):
            shared += 1
        # keep >= 1 prompt token after the prefix (the first decode feed)
        self.register_prefix(first[: min(shared, common - 1)])
        reqs = [
            Request(
                uid=i,
                prompt=list(t),
                max_gen_len=min(max_gen_len, self.config.max_seq_len - len(t)),
            )
            for i, t in enumerate(prompt_tokens)
        ]
        done, _ = self.serve(reqs, temperature=temperature, top_p=top_p)
        out: List[List[int]] = [[] for _ in reqs]
        for c in done:
            toks = c.tokens
            if self._eos_id in toks:
                toks = toks[: toks.index(self._eos_id)]
            out[c.uid] = toks
        return out
