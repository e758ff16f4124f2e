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
  - admission prefills a request's prompt into a free slot's rows via
    the same 64-token-chunk jits the prefix cache uses (bounded compile
    signatures), then the slot joins the running batch at its own
    offset;
  - decode runs in fixed ``chunk``-step jitted scans between host
    admission points; finished slots (eos / per-request budget) retire
    and free their row without stalling live ones.

Utilization therefore tracks offered load instead of worst-of-batch
latency: a mixed-length request stream keeps every slot busy, where the
reference's static batching idles short requests against the longest
prompt in the batch.
"""

from __future__ import annotations

import functools
import time
from dataclasses import dataclass
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
    prefills: int = 0
    wall_s: float = 0.0

    @property
    def utilization(self) -> float:
        return self.slot_steps_live / max(self.slot_steps_total, 1)


def _insert_row(big: Cache, small: Cache, slot: jax.Array) -> Cache:
    """Scatter a B=1 cache tree into row ``slot`` of the batched tree."""
    return jax.tree.map(
        lambda b, s: jax.lax.dynamic_update_slice(
            b, s.astype(b.dtype), (slot,) + (0,) * (b.ndim - 1)
        ),
        big,
        small,
    )


@functools.partial(
    jax.jit,
    static_argnames=("config", "chunk", "temperature", "top_p", "eos_id"),
)
def _decode_chunk(
    params, rope, cache, tok, pos, live, remaining, key,
    *, config, chunk: int, temperature: float, top_p: float, eos_id: int,
):
    """``chunk`` lockstep decode steps over all S slots; per-row
    positions and bounds throughout.  Dead rows feed token 0 at a frozen
    position (their stale cache rows sit beyond every live row's valid
    bound and are overwritten by the next prefill or by the row's own
    advancing writes before ever becoming visible)."""

    def step(carry, _):
        tok, pos, live, remaining, cache, key = carry
        logits, cache = forward(params, tok[:, None], pos, cache, config, rope)
        key, sub = jax.random.split(key)
        nxt = sample_next_token(
            logits[:, 0].astype(jnp.float32), sub, temperature, top_p
        )
        emit = jnp.where(live, nxt, PAD_EMIT)
        finished_now = live & ((nxt == eos_id) | (remaining <= 1))
        pos = jnp.where(live, pos + 1, pos)
        remaining = jnp.where(live, remaining - 1, remaining)
        live = live & ~finished_now
        feed = jnp.where(live, nxt, 0)
        return (feed, pos, live, remaining, cache, key), emit

    (tok, pos, live, remaining, cache, key), emits = jax.lax.scan(
        step, (tok, pos, live, remaining, cache, key), None, length=chunk
    )
    return tok, pos, live, remaining, cache, key, emits


class ContinuousBatcher:
    """Serve a request stream through S always-running decode slots.

    ``llama`` is a generation.Llama (params/config/tokenizer reused; the
    batcher owns its own cache sized to ``slots``).  temperature=0 gives
    deterministic greedy output — the parity bar against per-request
    generation (tests/test_serving_llm.py)."""

    def __init__(
        self,
        llama,
        slots: Optional[int] = None,
        chunk: int = 8,
        temperature: float = 0.0,
        top_p: float = 0.9,
        seed: int = 1,
    ):
        self.llama = llama
        self.config: LlamaConfig = llama.config
        self.params: Params = llama.params
        self.slots = slots or self.config.max_batch_size
        self.chunk = chunk
        self.temperature = float(temperature)
        self.top_p = float(top_p)
        self.kv_quant = bool(getattr(llama, "kv_quant", False))
        self._cache_dtype = self.params["norm"].dtype  # bf16 on TPU, f32 CPU
        self._rope = precompute_rope(self.config)
        self._key = jax.random.PRNGKey(seed)
        self._eos_id = int(getattr(llama.tokenizer, "eos_id", -2))
        self._insert = jax.jit(_insert_row)

    # ------------------------------------------------------------- jits

    def _prefill_into_slot(self, cache: Cache, prompt: Sequence[int],
                           slot: int) -> Cache:
        """Chunked B=1 prefill of prompt[:-1], scattered into ``slot``.
        The last prompt token is NOT prefilled — it is the slot's first
        decode feed, so its forward yields the first sampling logits
        (same trick as generation.py's suffix handling)."""
        from prego_tpu.models.llama.generation import _prefill_chunk

        cfg = self.config
        chunk = 64
        body = list(prompt[:-1])
        pad = (-len(body)) % chunk
        padded = body + [0] * pad
        small = init_cache(cfg, 1, dtype=self._cache_dtype, quantized=self.kv_quant)
        for c in range(0, len(padded), chunk):
            toks = jnp.asarray([padded[c : c + chunk]], jnp.int32)
            small = _prefill_chunk(
                self.params, toks, jnp.int32(c), small, config=cfg
            )
        return self._insert(cache, small, jnp.int32(slot))

    # ------------------------------------------------------------- loop

    def serve(self, requests: Sequence[Request],
              collect_stats: bool = True) -> Tuple[List[Completion], ServeStats]:
        """Run the stream to completion.  Requests are admitted in order
        as slots free up; completions return in finish order."""
        cfg = self.config
        S = self.slots
        for r in requests:
            if len(r.prompt) + r.max_gen_len > cfg.max_seq_len:
                raise ValueError(
                    f"request {r.uid}: prompt {len(r.prompt)} + gen "
                    f"{r.max_gen_len} exceeds max_seq_len {cfg.max_seq_len}"
                )

        t0 = time.perf_counter()
        cache = init_cache(cfg, S, dtype=self._cache_dtype, quantized=self.kv_quant)
        tok = jnp.zeros((S,), jnp.int32)
        pos = jnp.zeros((S,), jnp.int32)
        live = jnp.zeros((S,), bool)
        remaining = jnp.zeros((S,), jnp.int32)

        pending = list(requests)
        slot_req: Dict[int, Request] = {}
        slot_toks: Dict[int, List[int]] = {}
        slot_admit_step: Dict[int, int] = {}
        slot_admit_wall: Dict[int, float] = {}
        done: List[Completion] = []
        stats = ServeStats()
        step_idx = 0

        while pending or slot_req:
            # ---- admit into free slots (host-side; cache rows scatter)
            tok_h, pos_h, live_h, rem_h = (
                np.array(tok), np.array(pos), np.array(live),
                np.array(remaining),
            )
            for s in range(S):
                if not live_h[s] and s not in slot_req and pending:
                    r = pending.pop(0)
                    cache = self._prefill_into_slot(cache, r.prompt, s)
                    tok_h[s] = r.prompt[-1]
                    pos_h[s] = len(r.prompt) - 1
                    live_h[s] = True
                    rem_h[s] = r.max_gen_len
                    slot_req[s] = r
                    slot_toks[s] = []
                    slot_admit_step[s] = step_idx
                    slot_admit_wall[s] = time.perf_counter()
                    stats.prefills += 1
            tok = jnp.asarray(tok_h)
            pos = jnp.asarray(pos_h)
            live = jnp.asarray(live_h)
            remaining = jnp.asarray(rem_h)

            # ---- one jitted chunk of lockstep decode
            tok, pos, live, remaining, cache, self._key, emits = _decode_chunk(
                self.params, self._rope, cache, tok, pos, live, remaining,
                self._key, config=cfg, chunk=self.chunk,
                temperature=self.temperature, top_p=self.top_p,
                eos_id=self._eos_id,
            )
            emits_h = np.asarray(emits)  # (chunk, S)
            live_h = np.asarray(live)
            if collect_stats:
                live_per_step = (emits_h != PAD_EMIT).sum()
                stats.decode_steps += self.chunk
                stats.slot_steps_live += int(live_per_step)
                stats.slot_steps_total += self.chunk * S
            step_idx += self.chunk

            # ---- collect emissions; retire finished slots
            for s in list(slot_req):
                col = emits_h[:, s]
                slot_toks[s].extend(int(t) for t in col if t != PAD_EMIT)
                if not live_h[s]:
                    r = slot_req.pop(s)
                    toks = slot_toks.pop(s)
                    if self._eos_id in toks:
                        toks = toks[: toks.index(self._eos_id) + 1]
                    done.append(
                        Completion(
                            uid=r.uid,
                            tokens=toks,
                            prompt_len=len(r.prompt),
                            admitted_step=slot_admit_step.pop(s),
                            finished_step=step_idx,
                            wall_latency_s=time.perf_counter()
                            - slot_admit_wall.pop(s),
                            finished_wall_s=time.perf_counter() - t0,
                        )
                    )
        stats.wall_s = time.perf_counter() - t0
        return done, stats
