"""Batched LLaMA generation — prefill + jitted single-token decode loop.

Parity surface: Llama.generate / Llama.text_completion
(llama/generation.py:127-282):
  * left-aligned prompts padded with pad_id into a (B, total_len) buffer;
  * positions still inside a longer prompt keep their prompt token
    (input_text_mask override, generation.py:204-207);
  * per-prompt eos tracked only on generated positions; loop exits when
    every row has emitted eos (generation.py:208-212);
  * host-side post-processing cuts echo, max_gen_len and eos
    (generation.py:216-231).

TPU-first: the whole decode loop is ONE jitted lax.while_loop (prefill of
the shared prompt prefix, then one-token steps), cache donated through the
loop, with static buffer shapes — total_len is bucketed so recompiles are
bounded. The reference instead dispatches one python-driven forward per
token.
"""

from __future__ import annotations

import functools
import os
from collections import OrderedDict
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from prego_tpu.models.llama.config import LlamaConfig
from prego_tpu.models.llama.model import (
    Cache,
    Params,
    forward,
    init_cache,
    precompute_rope,
)
from prego_tpu.ops.sampling import sample_next_token


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _generate_body(
    params: Params,
    tokens: jax.Array,  # (B, suffix_buf) int32, pad-filled — SUFFIX coords
    min_prompt_len: jax.Array,  # scalar int32, suffix coords
    total_len: jax.Array,  # scalar int32 (actual, <= buffer len), suffix coords
    cache: Optional[Cache],  # None -> fresh zeros built INSIDE the jit (no
    #                          host-side 32-leaf allocation, no transfer)
    key: jax.Array,
    start_offset: jax.Array,  # scalar int32 — absolute position of suffix[0];
    #                           nonzero when resuming from a cached KV prefix
    config: LlamaConfig,
    temperature: float,
    top_p: float,
    eos_id: int,
    pad_id: int,
    want_logprobs: bool = False,
    kv_quant: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    rope = precompute_rope(config)
    B, buf_len = tokens.shape
    if cache is None:
        cache = init_cache(
            config, B, dtype=params["norm"].dtype, quantized=kv_quant
        )
    input_text_mask = tokens != pad_id

    # prefill the shared prompt prefix [0, min_prompt_len)
    # (static buffer, masked: run forward over the full buffer prefix is
    # wasteful, so prefill over a static max and rely on bucketing instead)
    prefill_logits, cache = forward(
        params, tokens, start_offset, cache, config, rope
    )
    # logits at position min_prompt_len-1 predict the first generated token
    last_logits = jax.vmap(lambda l, i: l[i])(
        prefill_logits, jnp.full((B,), min_prompt_len - 1)
    )

    if want_logprobs:
        # prompt-token logprobs: position i+1 scored by logits at i
        # (generation.py:180-186,199-203 cross-entropy form)
        logprobs = jnp.zeros((B, buf_len), jnp.float32)
        lp = jax.nn.log_softmax(prefill_logits[:, :-1], axis=-1)
        gathered = jnp.take_along_axis(lp, tokens[:, 1:, None], axis=-1)[..., 0]
        pos = jnp.arange(1, buf_len)[None, :]
        in_prompt = (pos < min_prompt_len) & input_text_mask[:, 1:]
        logprobs = logprobs.at[:, 1:].set(jnp.where(in_prompt, gathered, 0.0))
    else:
        # dummy carry: nothing to fetch over the wire when unwanted
        logprobs = jnp.zeros((1, 1), jnp.float32)

    def cond(state):
        cur_pos, _, _, _, _, eos_reached, _ = state
        return (cur_pos < total_len) & ~jnp.all(eos_reached)

    def body(state):
        cur_pos, tokens, cache, last_logits, logprobs, eos_reached, key = state
        key, sub = jax.random.split(key)
        next_token = sample_next_token(last_logits, sub, temperature, top_p)
        # keep prompt tokens where the prompt is still running (gen.py:204-207)
        cur_col = jax.lax.dynamic_index_in_dim(tokens, cur_pos, axis=1, keepdims=False)
        cur_mask = jax.lax.dynamic_index_in_dim(
            input_text_mask, cur_pos, axis=1, keepdims=False
        )
        next_token = jnp.where(cur_mask, cur_col, next_token)
        # rows already done keep emitting pad so eos cut is stable
        next_token = jnp.where(eos_reached, jnp.int32(pad_id), next_token)
        tokens = jax.lax.dynamic_update_slice(tokens, next_token[:, None], (0, cur_pos))
        if want_logprobs:
            lp_t = jax.nn.log_softmax(last_logits, axis=-1)
            val = jnp.take_along_axis(lp_t, next_token[:, None], axis=-1)[:, 0]
            logprobs = jax.lax.dynamic_update_slice(
                logprobs, val[:, None], (0, cur_pos)
            )
        eos_reached = eos_reached | (~cur_mask & (next_token == eos_id))

        logits, cache = forward(
            params, next_token[:, None], start_offset + cur_pos, cache, config, rope
        )
        return (cur_pos + 1, tokens, cache, logits[:, 0], logprobs, eos_reached, key)

    state = (
        min_prompt_len.astype(jnp.int32),
        tokens,
        cache,
        last_logits,
        logprobs,
        jnp.zeros((B,), bool),
        key,
    )
    _, tokens, _, _, logprobs, _, _ = jax.lax.while_loop(cond, body, state)
    return tokens, logprobs


_GEN_STATICS = (
    "config", "temperature", "top_p", "eos_id", "pad_id", "want_logprobs",
    "kv_quant",
)

# fresh-cache entry: the only call site passes cache=None (the cache is
# built inside the jit), so there is nothing to donate
_generate_jit = functools.partial(
    jax.jit, static_argnames=_GEN_STATICS
)(_generate_body)


@functools.partial(
    jax.jit, static_argnames=_GEN_STATICS + ("batch",)
)
def _generate_from_prefix_jit(
    params: Params,
    tokens: jax.Array,
    min_prompt_len: jax.Array,
    total_len: jax.Array,
    cache: Cache,  # B=1 prefix cache — NOT donated (reused across calls);
    #               broadcast to the request batch INSIDE the jit: doing the
    #               per-leaf repeat host-side costs one dispatch per cache
    #               leaf (~2 ms each over a tunneled chip = 60-100 ms/call)
    key: jax.Array,
    start_offset: jax.Array,
    config: LlamaConfig,
    temperature: float,
    top_p: float,
    eos_id: int,
    pad_id: int,
    want_logprobs: bool = False,
    kv_quant: bool = False,
    batch: int = 1,
) -> Tuple[jax.Array, jax.Array]:
    cache = jax.tree.map(lambda x: jnp.repeat(x, batch, axis=0), cache)
    return _generate_body(
        params, tokens, min_prompt_len, total_len, cache, key, start_offset,
        config, temperature, top_p, eos_id, pad_id, want_logprobs, kv_quant,
    )


def _prefill_chunk_body(
    params: Params,
    tokens: jax.Array,  # (1, CHUNK)
    start: jax.Array,
    cache: Cache,
    config: LlamaConfig,
) -> Cache:
    _, cache = forward(params, tokens, start, cache, config)
    return cache


_prefill_chunk = functools.partial(
    jax.jit, static_argnames=("config",), donate_argnames=("cache",)
)(_prefill_chunk_body)

# Non-donating variant for the FIRST chunk of a prefix EXTENSION: the
# input there is a stored LRU entry that must stay valid (donation would
# mark its buffers deleted).  Subsequent chunks consume intermediates and
# use the donating jit.
_prefill_chunk_keep = functools.partial(
    jax.jit, static_argnames=("config",)
)(_prefill_chunk_body)


class Llama:
    """User-facing generation wrapper (Llama.build/text_completion parity).

    Adds KV **prefix caching** on top of the reference surface: the PREGO
    anticipation loop sends the same few-shot context hundreds of times per
    video (llama_meta.py:118-174), so the shared prompt prefix is prefilled
    once (B=1, fixed 64-token chunks -> bounded compiles) and decode resumes
    from the cached KV at a traced start offset.
    """

    PREFIX_CHUNK = 64

    def __init__(
        self,
        params: Params,
        tokenizer,
        config: LlamaConfig,
        pad_to_multiple: int = 64,
        kv_quant: bool = False,
        prefix_cache_slots: int = 4,
    ):
        self.params = params
        self.tokenizer = tokenizer
        self.config = config
        self.pad_to_multiple = pad_to_multiple
        self.kv_quant = kv_quant  # int8 KV cache (see model.init_cache)
        # seed parity: generation.py:95; PREGO_SAMPLE_SEED varies the
        # sampling stream (A/B noise-floor controls, ab_sampled_verdicts.py)
        self._key = jax.random.PRNGKey(
            int(os.environ.get("PREGO_SAMPLE_SEED", "1"))
        )
        # LRU of B=1 prefix KV caches keyed by the token prefix (VERDICT r2
        # #5: Assembly has few distinct toy contexts but many videos, so a
        # single slot paid the ~65 ms rebuild on every toy switch; N slots
        # + the driver's group-by-toy ordering drop rebuilds to ~#contexts).
        # Each slot holds a full (layers, max_seq_len) B=1 KV tree —
        # size slots accordingly for big models (7B bf16 ≈ 1 GB/slot).
        self.prefix_cache_slots = max(1, int(prefix_cache_slots))
        self._prefix_caches: "OrderedDict[Tuple[int, ...], Cache]" = OrderedDict()
        self._prefix_key: Optional[Tuple[int, ...]] = None  # most recent
        self.prefix_rebuilds = 0  # observability: from-scratch prefill count
        self.prefix_extends = 0  # observability: delta-prefill count

    # -- low level --

    def generate(
        self,
        prompt_tokens: List[List[int]],
        max_gen_len: int,
        temperature: float = 0.6,
        top_p: float = 0.9,
        echo: bool = False,
        logprobs: bool = False,
    ) -> Tuple[List[List[int]], Optional[List[List[float]]]]:
        config = self.config
        bsz = len(prompt_tokens)
        if bsz > config.max_batch_size:
            # transparently split oversized batches (the reference asserts,
            # generation.py:160; the batched num_samples^2 dispatch makes
            # overflow easy to hit, so chunk instead)
            out: List[List[int]] = []
            out_lp: List[List[float]] = []
            for i in range(0, bsz, config.max_batch_size):
                toks, lps = self.generate(
                    prompt_tokens[i : i + config.max_batch_size],
                    max_gen_len, temperature, top_p, echo, logprobs,
                )
                out.extend(toks)
                if logprobs:
                    out_lp.extend(lps)
            return out, (out_lp if logprobs else None)
        min_prompt_len = min(len(t) for t in prompt_tokens)
        max_prompt_len = max(len(t) for t in prompt_tokens)
        assert max_prompt_len <= config.max_seq_len
        total_len = min(config.max_seq_len, max_gen_len + max_prompt_len)

        pad_id = self.tokenizer.pad_id
        buf_len = min(
            _round_up(total_len, self.pad_to_multiple), config.max_seq_len
        )
        tokens = np.full((bsz, buf_len), pad_id, np.int32)
        for i, t in enumerate(prompt_tokens):
            tokens[i, : len(t)] = np.asarray(t, np.int32)

        if min_prompt_len == total_len:
            out = tokens  # nothing to generate (generation.py:179-186 edge)
            lp = np.zeros_like(tokens, np.float32)
        else:
            self._key, key = jax.random.split(self._key)
            out, lp = _generate_jit(
                self.params,
                jnp.asarray(tokens),
                jnp.int32(min_prompt_len),
                jnp.int32(total_len),
                None,  # fresh cache built inside the jit
                key,
                jnp.int32(0),
                config=config,
                temperature=float(temperature),
                top_p=float(top_p),
                eos_id=int(self.tokenizer.eos_id),
                pad_id=int(pad_id),
                want_logprobs=logprobs,
                kv_quant=self.kv_quant,
            )
            # ONE blocking round-trip for both outputs (the tunnel charges
            # per fetch, ~25 ms each); lp is a (1,1) dummy when unwanted
            out, lp = jax.device_get((out, lp))
            if not logprobs:
                lp = np.zeros_like(out, np.float32)

        out_tokens, out_logprobs = [], []
        for i, toks in enumerate(out.tolist()):
            start = 0 if echo else len(prompt_tokens[i])
            stop = len(prompt_tokens[i]) + max_gen_len
            toks = toks[start:stop]
            probs = lp[i].tolist()[start:stop]
            # cut at pad (pure padding / post-eos fill), then at eos
            if pad_id in toks:
                cut = toks.index(pad_id)
                toks, probs = toks[:cut], probs[:cut]
            if self.tokenizer.eos_id in toks:
                cut = toks.index(self.tokenizer.eos_id)
                toks, probs = toks[:cut], probs[:cut]
            out_tokens.append(toks)
            out_logprobs.append(probs)
        return out_tokens, (out_logprobs if logprobs else None)

    # -- prefix-cached generation --

    # prefill BUILD granularity: bigger than PREFIX_CHUNK (the eff/reuse
    # granularity) so a ~1.5k-token context costs ~6 dispatches instead of
    # ~23; the tail chunk is pad-filled to keep ONE compile signature —
    # padded positions only write cache entries past the prefix length,
    # which decode never attends (positions >= start_offset are masked)
    PREFIX_BUILD_CHUNK = 256

    def _ensure_prefix_cache(self, prefix: Tuple[int, ...]) -> Cache:
        cached = self._prefix_caches.get(prefix)
        if cached is not None:
            self._prefix_caches.move_to_end(prefix)  # LRU touch
            self._prefix_key = prefix
            return cached
        # A growing history crosses PREFIX_CHUNK buckets within a video, so
        # the requested prefix is often a strict EXTENSION of a cached one:
        # prefill only the delta from the longest cached proper prefix.
        # (Safe: chunk prefill overwrites the base's padded-tail garbage
        # before any query position can attend it — causal mask is on
        # absolute positions; the base entry itself stays valid because
        # cache updates are functional.)
        base_key = None
        for k in self._prefix_caches:
            if len(k) < len(prefix) and prefix[: len(k)] == k:
                if base_key is None or len(k) > len(base_key):
                    base_key = k
        if base_key is not None:
            cache = self._prefix_caches[base_key]
            start = len(base_key)
            self.prefix_extends += 1
        else:
            cache = init_cache(
                self.config, 1, dtype=self.params["norm"].dtype,
                quantized=self.kv_quant,
            )
            start = 0
            self.prefix_rebuilds += 1
        step = min(self.PREFIX_BUILD_CHUNK, self.config.max_seq_len)
        buf = np.asarray(prefix, np.int32)
        first = True
        for i in range(start, len(prefix), step):
            chunk = buf[i : i + step]
            if len(chunk) < step:
                chunk = np.concatenate(
                    [chunk, np.full(step - len(chunk),
                                    self.tokenizer.pad_id, np.int32)]
                )
            # never donate a stored LRU entry (the extend base)
            prefill = _prefill_chunk_keep if (first and base_key is not None) else _prefill_chunk
            first = False
            cache = prefill(
                self.params, jnp.asarray(chunk[None, :]), jnp.int32(i),
                cache, config=self.config,
            )
        self._prefix_caches[prefix] = cache
        while len(self._prefix_caches) > self.prefix_cache_slots:
            self._prefix_caches.popitem(last=False)  # evict least-recent
        self._prefix_key = prefix
        return cache

    def generate_with_prefix_cache(
        self,
        prompt_tokens: List[List[int]],
        max_gen_len: int,
        temperature: float = 0.6,
        top_p: float = 0.9,
    ) -> List[List[int]]:
        """Generate completions reusing the KV of the batch-common prompt
        prefix. Falls back to plain generate when the shareable prefix is
        shorter than one chunk. Returns generated (non-echo) tokens."""
        config = self.config
        bsz = len(prompt_tokens)
        if bsz > config.max_batch_size:
            out: List[List[int]] = []
            for i in range(0, bsz, config.max_batch_size):
                out.extend(
                    self.generate_with_prefix_cache(
                        prompt_tokens[i : i + config.max_batch_size],
                        max_gen_len, temperature, top_p,
                    )
                )
            return out

        assert max(len(t) for t in prompt_tokens) <= config.max_seq_len, (
            "prompt exceeds max_seq_len"
        )
        common = min(len(t) for t in prompt_tokens)
        first = prompt_tokens[0]
        shared = 0
        while shared < common and all(t[shared] == first[shared] for t in prompt_tokens):
            shared += 1
        # keep >= 1 prompt token in the suffix so prefill yields sampling logits
        eff = ((min(shared, common - 1)) // self.PREFIX_CHUNK) * self.PREFIX_CHUNK
        if eff < self.PREFIX_CHUNK:
            return self.generate(prompt_tokens, max_gen_len, temperature, top_p)[0]

        prefix = tuple(first[:eff])
        cache1 = self._ensure_prefix_cache(prefix)

        suffixes = [t[eff:] for t in prompt_tokens]
        min_s = min(len(s) for s in suffixes)
        max_s = max(len(s) for s in suffixes)
        total_s = min(config.max_seq_len - eff, max_gen_len + max_s)
        pad_id = self.tokenizer.pad_id
        buf_len = min(
            _round_up(total_s, self.pad_to_multiple), config.max_seq_len - eff
        )
        tokens = np.full((bsz, buf_len), pad_id, np.int32)
        for i, s in enumerate(suffixes):
            tokens[i, : len(s)] = np.asarray(s, np.int32)

        # the B=1 prefix KV is broadcast to the batch INSIDE the jit
        # (decode writes per-row); the prefix cache itself is not donated
        self._key, key = jax.random.split(self._key)
        out, _ = _generate_from_prefix_jit(
            self.params,
            jnp.asarray(tokens),
            jnp.int32(min_s),
            jnp.int32(total_s),
            cache1,
            key,
            jnp.int32(eff),
            config=config,
            temperature=float(temperature),
            top_p=float(top_p),
            eos_id=int(self.tokenizer.eos_id),
            pad_id=int(pad_id),
            kv_quant=self.kv_quant,
            batch=bsz,
        )
        out = jax.device_get(out)

        out_tokens = []
        for i, toks in enumerate(out.tolist()):
            toks = toks[len(suffixes[i]) : len(suffixes[i]) + max_gen_len]
            if pad_id in toks:
                toks = toks[: toks.index(pad_id)]
            if self.tokenizer.eos_id in toks:
                toks = toks[: toks.index(self.tokenizer.eos_id)]
            out_tokens.append(toks)
        return out_tokens

    # -- reference seam --

    def text_completion(
        self,
        prompts: List[str],
        temperature: float = 0.6,
        top_p: float = 0.9,
        max_gen_len: Optional[int] = None,
        logprobs: bool = False,
        echo: bool = False,
        use_prefix_cache: bool = False,
    ) -> List[Dict]:
        if max_gen_len is None:
            max_gen_len = self.config.max_seq_len - 1
        prompt_tokens = [self.tokenizer.encode(x, bos=True, eos=False) for x in prompts]
        if use_prefix_cache and not logprobs and not echo:
            generation_tokens = self.generate_with_prefix_cache(
                prompt_tokens, max_gen_len=max_gen_len,
                temperature=temperature, top_p=top_p,
            )
            return [{"generation": self.tokenizer.decode(t)} for t in generation_tokens]
        generation_tokens, generation_logprobs = self.generate(
            prompt_tokens, max_gen_len=max_gen_len,
            temperature=temperature, top_p=top_p, echo=echo, logprobs=logprobs,
        )
        if logprobs:
            return [
                {
                    "generation": self.tokenizer.decode(t),
                    "tokens": [self.tokenizer.decode([x]) for x in t],
                    "logprobs": lp,
                }
                for t, lp in zip(generation_tokens, generation_logprobs)
            ]
        return [{"generation": self.tokenizer.decode(t)} for t in generation_tokens]

    def chat_completion(
        self,
        dialogs: List[List[Dict[str, str]]],
        temperature: float = 0.6,
        top_p: float = 0.9,
        max_gen_len: Optional[int] = None,
        logprobs: bool = False,
    ) -> List[Dict]:
        """LLaMA-2 chat format (generation.py:284-395): [INST]/<<SYS>> tag
        assembly, system folded into the first user turn, per-exchange
        bos/eos, final user turn left open for the assistant. Dialogs whose
        content injects any SPECIAL_TAG get UNSAFE_ERROR as the generation
        (generation.py:47-48,324-327,379-393); logprobs passthrough mirrors
        text_completion."""
        B_INST, E_INST = "[INST]", "[/INST]"
        B_SYS, E_SYS = "<<SYS>>\n", "\n<</SYS>>\n\n"
        SPECIAL_TAGS = [B_INST, E_INST, "<<SYS>>", "<</SYS>>"]
        UNSAFE_ERROR = "Error: special tags are not allowed as part of the prompt."
        if max_gen_len is None:
            max_gen_len = self.config.max_seq_len - 1
        prompt_tokens = []
        unsafe_requests = []
        for dialog in dialogs:
            unsafe_requests.append(
                any(tag in msg["content"] for tag in SPECIAL_TAGS for msg in dialog)
            )
            if dialog[0]["role"] == "system":
                dialog = [
                    {
                        "role": dialog[1]["role"],
                        "content": B_SYS + dialog[0]["content"] + E_SYS + dialog[1]["content"],
                    }
                ] + dialog[2:]
            assert all(m["role"] == "user" for m in dialog[::2]) and all(
                m["role"] == "assistant" for m in dialog[1::2]
            ), "roles must alternate user/assistant (optionally system first)"
            toks: List[int] = []
            for prompt, answer in zip(dialog[::2], dialog[1::2]):
                toks += self.tokenizer.encode(
                    f"{B_INST} {prompt['content'].strip()} {E_INST} "
                    f"{answer['content'].strip()} ",
                    bos=True,
                    eos=True,
                )
            assert dialog[-1]["role"] == "user", "last message must be from user"
            toks += self.tokenizer.encode(
                f"{B_INST} {dialog[-1]['content'].strip()} {E_INST}", bos=True, eos=False
            )
            prompt_tokens.append(toks)
        generation_tokens, generation_logprobs = self.generate(
            prompt_tokens, max_gen_len=max_gen_len,
            temperature=temperature, top_p=top_p, logprobs=logprobs,
        )
        if logprobs:
            return [
                {
                    "generation": {
                        "role": "assistant",
                        "content": self.tokenizer.decode(t)
                        if not unsafe
                        else UNSAFE_ERROR,
                    },
                    "tokens": [self.tokenizer.decode([x]) for x in t],
                    "logprobs": lp,
                }
                for t, lp, unsafe in zip(
                    generation_tokens, generation_logprobs, unsafe_requests
                )
            ]
        return [
            {
                "generation": {
                    "role": "assistant",
                    "content": self.tokenizer.decode(t) if not unsafe else UNSAFE_ERROR,
                }
            }
            for t, unsafe in zip(generation_tokens, unsafe_requests)
        ]
