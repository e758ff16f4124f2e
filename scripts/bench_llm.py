"""Reproducible LLM decode + online-serving benchmarks (one JSON line per case).

Companion to the repo-root bench.py (recognition throughput): these are the
RESULTS.md rows for the anticipation/serving side, measured the tunnel-safe
way (whole decode inside one jitted while_loop; sync via a scalar checksum
fetch because block_until_ready is a no-op on the tunneled platform).

  python scripts/bench_llm.py --case decode_b8            # 1B-class, bf16
  python scripts/bench_llm.py --case decode_b8_int8
  python scripts/bench_llm.py --case decode_b8_int8x8
  python scripts/bench_llm.py --case decode_b1
  python scripts/bench_llm.py --case decode_7b_int8       # REFERENCE shape:
  python scripts/bench_llm.py --case decode_7b_b8_int8x8  #   dim 4096, 32 L,
  python scripts/bench_llm.py --case anticipation_step_7b_int8_kv8  # vocab 32k
  python scripts/bench_llm.py --case online_microbatch    # frames/s, 1 stream
  python scripts/bench_llm.py --case online_perframe
  python scripts/bench_llm.py --all [--tiny]              # --tiny: CPU smoke

Each case prints {"case", "value", "unit", ...}.
"""

import argparse
import json
import os
import sys
import threading
import time
from typing import Optional

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _watchdog(seconds: float):
    def trip():
        print(f"bench_llm watchdog: hung for {seconds:.0f}s", file=sys.stderr)
        os._exit(3)

    t = threading.Timer(seconds, trip)
    t.daemon = True
    t.start()


_WEATHER = None


def _weather_probe(force: bool = False) -> float:
    """Fixed-reference transport/weather index in ms (VERDICT r4 #1): the
    median of 5 round-trips of one fixed jitted op (dispatch + ~µs of
    compute + a scalar fetch).  On the tunneled platform this is
    dominated by the transport RTT — the term per-case 'weather' swings
    inflate — so a case whose probe sits far above the session median
    marks a weather-poisoned reading.  bench.py re-runs such cases once.
    Cached per process (each bench.py extra runs in its own child)."""
    global _WEATHER
    if _WEATHER is not None and not force:
        return _WEATHER
    import prego_tpu  # noqa: F401 — applies PREGO_PLATFORM pinning BEFORE
    #                   the first jax use initializes a backend
    import jax
    import jax.numpy as jnp

    x = jnp.full((128, 128), 1.0 / 128.0, jnp.float32)

    @jax.jit
    def probe(x):
        return jnp.sum(jax.lax.fori_loop(0, 64, lambda i, a: a @ x, x))

    float(probe(x))  # compile + first transfer outside the timings
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(probe(x))  # scalar fetch = the reliable sync on this platform
        ts.append(time.perf_counter() - t0)
    _WEATHER = round(sorted(ts)[2] * 1e3, 2)
    return _WEATHER


def _llama(tiny: bool, quantize: str, kv_quant: bool = False):
    import jax
    import jax.numpy as jnp

    from prego_tpu.models.llama import ByteTokenizer, Llama, LlamaConfig, init_params
    from prego_tpu.models.llama.model import fuse_projections, quantize_params

    tok = ByteTokenizer()
    if tiny:
        cfg = LlamaConfig(
            dim=128, n_layers=2, n_heads=4, n_kv_heads=4, vocab_size=tok.n_words,
            multiple_of=32, norm_eps=1e-5, max_batch_size=8, max_seq_len=256,
        )
    else:  # the RESULTS.md 1B-class serving shape
        cfg = LlamaConfig(
            dim=2048, n_layers=16, n_heads=16, n_kv_heads=16, vocab_size=tok.n_words,
            multiple_of=256, norm_eps=1e-5, max_batch_size=8, max_seq_len=512,
        )
    # bf16 is the TPU serving dtype; CPU XLA can't execute bf16 dots, so the
    # --tiny smoke path falls back to f32
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    params = fuse_projections(init_params(cfg, jax.random.PRNGKey(0), dtype=dtype))
    if quantize == "int8":
        params = quantize_params(params)
    elif quantize == "int8x8":
        params = quantize_params(params, activations=True)
    return Llama(params, tok, cfg, kv_quant=kv_quant), cfg


def bench_decode(batch: int, tiny: bool, quantize: str = "none", kv_quant: bool = False):
    llama, cfg = _llama(tiny, quantize, kv_quant)
    gen_len = 32 if tiny else 128
    prompts = [[1, 2, 3, 4, 5, 6, 7, 8]] * batch
    llama.generate(prompts, max_gen_len=gen_len, temperature=0.0)  # compile
    t0 = time.perf_counter()
    reps = 1 if tiny else 3
    for _ in range(reps):
        out = llama.generate(prompts, max_gen_len=gen_len, temperature=0.0)
    dt = (time.perf_counter() - t0) / reps
    ms_per_step = dt / gen_len * 1e3
    return {
        "case": f"decode_b{batch}"
        + (f"_{quantize}" if quantize != "none" else "")
        + ("_kv8" if kv_quant else ""),
        "value": round(ms_per_step, 3),
        "unit": "ms/step",
        "tok_per_s": round(batch * gen_len / dt, 1),
    }


def bench_online(micro_batch: int, tiny: bool):
    import jax

    from prego_tpu.core import RecognitionConfig
    from prego_tpu.models.miniroad import MiniROAD
    from prego_tpu.serving import OnlineRecognizer

    cfg = RecognitionConfig.from_dict(
        {
            "rgb_type": "rgb_anet_resnet50",
            "flow_type": "flow_anet_resnet50",
            "embedding_dim": 128 if tiny else 2048,
            "hidden_dim": 64 if tiny else 1024,
            "num_layers": 1,
            "num_classes": 86,
            "dropout": 0.2,
        }
    )
    model = MiniROAD(cfg)
    params = model.init(jax.random.PRNGKey(0))
    rec = OnlineRecognizer(model, params, batch=1, flow_is_zero=True)
    rng = np.random.default_rng(0)
    T = 256 if tiny else 2048
    frames = rng.normal(0, 1, (T, 1, model.rgb_dim)).astype(np.float32)

    if micro_batch == 1:
        rec.step(frames[0])  # compile
        t0 = time.perf_counter()
        for t in range(T):
            rec.step(frames[t])
        dt = time.perf_counter() - t0
    else:
        blocks = [
            frames[t0 : t0 + micro_batch]
            for t0 in range(0, T, micro_batch)
            if t0 + micro_batch <= T
        ]
        rec.step_block(blocks[0])  # compile
        t0 = time.perf_counter()
        for b in blocks:
            rec.step_block(b)
        dt = time.perf_counter() - t0
        T = len(blocks) * micro_batch
    return {
        "case": "online_perframe" if micro_batch == 1 else "online_microbatch",
        "value": round(T / dt, 1),
        "unit": "frames/sec (1 stream)",
        "micro_batch": micro_batch,
    }


def bench_anticipation_step(tiny: bool, step_batch: int = 1,
                            quantize: str = "none", kv_quant: bool = False):
    """The PREGO anticipation serving step: 4 sampled generations sharing
    a long few-shot context (driver.py:71-81 batched num_samples²
    dispatch), served with the KV prefix cache. RESULTS.md headline row.
    Needs max_seq_len 2048 so the shared context matches the real
    ~1.5k-token prompts. step_batch folds that many consecutive steps
    into one dispatch (driver --step_batch): per-step cost is dt/N."""
    import jax
    import jax.numpy as jnp

    from prego_tpu.models.llama import ByteTokenizer, Llama, LlamaConfig, init_params
    from prego_tpu.models.llama.model import fuse_projections, quantize_params

    tok = ByteTokenizer()
    bsz = 4 * step_batch
    if tiny:
        cfg = LlamaConfig(
            dim=128, n_layers=2, n_heads=4, n_kv_heads=4, vocab_size=tok.n_words,
            multiple_of=32, norm_eps=1e-5, max_batch_size=bsz, max_seq_len=512,
        )
        ctx_len, gen_len = 200, 8
    else:
        cfg = LlamaConfig(
            dim=2048, n_layers=16, n_heads=16, n_kv_heads=16, vocab_size=tok.n_words,
            multiple_of=256, norm_eps=1e-5, max_batch_size=bsz, max_seq_len=2048,
        )
        ctx_len, gen_len = 1500, 8
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    params = fuse_projections(init_params(cfg, jax.random.PRNGKey(0), dtype=dtype))
    if quantize == "int8":
        params = quantize_params(params)
    elif quantize == "int8x8":
        params = quantize_params(params, activations=True)
    llama = Llama(params, tok, cfg, kv_quant=kv_quant)
    rng = np.random.default_rng(0)
    context = rng.integers(4, 200, ctx_len).tolist()

    def step(observed):
        # step_batch steps x num_samples²=4 prompts, one batched dispatch;
        # consecutive steps differ by their observed-history tail
        prompts = []
        for s in range(step_batch):
            prompts.extend([context + observed + list(range(7, 7 + s))] * 4)
        return llama.generate_with_prefix_cache(
            prompts, max_gen_len=gen_len, temperature=0.6, top_p=0.9
        )

    step([7, 8, 9])  # compile + build the prefix cache once (per-video cost)
    t0 = time.perf_counter()
    reps = 2 if tiny else 10
    for i in range(reps):
        step([7, 8, 9] + rng.integers(4, 200, i % 5).tolist())
    dt = (time.perf_counter() - t0) / reps / step_batch
    return {
        "case": "anticipation_step"
        + (f"_sb{step_batch}" if step_batch > 1 else "")
        + (f"_{quantize}" if quantize != "none" else "")
        + ("_kv8" if kv_quant else ""),
        "value": round(dt * 1e3, 1),
        "unit": "ms/step (4 gens, shared ctx)",
        "ctx_len": ctx_len,
        "step_batch": step_batch,
    }


# The reference's served checkpoint shapes (llama/model.py:20-31 defaults
# + Llama.build's 7B/13B checkpoints, generation.py:101-120).
_REF_SHAPES = {
    "7b": dict(dim=4096, n_layers=32, n_heads=32),
    "13b": dict(dim=5120, n_layers=40, n_heads=40),
}


def _llama_ref(shape: str, kv_quant: bool, max_batch: int, max_seq: int,
               activations: bool = False):
    """One of the reference's served shapes with **vocab 32000** — so the
    dim x 32000 lm-head read is part of every measured step.  bf16 7B is
    13.5 GB (13B: 26 GB) and cannot fit a 16 GB v5e beside its KV cache;
    weight-only int8 (~6.7 GB / ~13.2 GB) can, built directly as int8 via
    init_params_quantized (fabricated weights)."""
    import jax
    from prego_tpu.models.llama import ByteTokenizer, Llama, LlamaConfig
    from prego_tpu.models.llama.model import init_params_quantized

    s = _REF_SHAPES[shape]
    cfg = LlamaConfig(
        dim=s["dim"], n_layers=s["n_layers"], n_heads=s["n_heads"],
        n_kv_heads=s["n_heads"], vocab_size=32000,
        multiple_of=256, norm_eps=1e-5, max_batch_size=max_batch,
        max_seq_len=max_seq,
    )
    params = init_params_quantized(
        cfg, jax.random.PRNGKey(0), fused=True, activations=activations
    )
    # ByteTokenizer only supplies pad/eos sentinels here; prompts are raw
    # ids in [4, 31999] so nothing ever hits the 258-word byte vocab
    return Llama(params, ByteTokenizer(), cfg, kv_quant=kv_quant), cfg


def _llama_7b(kv_quant: bool, max_batch: int, max_seq: int,
              activations: bool = False):
    return _llama_ref("7b", kv_quant, max_batch, max_seq, activations)


# v5e HBM bandwidth, for the weight-streaming decode floor
_V5E_HBM_GBS = 819.0


def bench_decode_7b(batch: int, tiny: bool, kv_quant: bool = False,
                    gen_len: int = 128, activations: bool = False,
                    shape: str = "7b"):
    case = (f"decode_{shape}_b{batch}_int8" + ("x8" if activations else "")
            + ("_kv8" if kv_quant else ""))
    if tiny:  # the 7B/13B cases are real-chip measurements; CPU smoke skips
        return {"case": case, "skipped": "tiny"}
    llama, cfg = _llama_ref(shape, kv_quant, max_batch=batch, max_seq=256,
                            activations=activations)
    rng = np.random.default_rng(0)
    prompts = [rng.integers(4, 31999, 8).tolist() for _ in range(batch)]
    llama.generate(prompts, max_gen_len=gen_len, temperature=0.0)  # compile
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        llama.generate(prompts, max_gen_len=gen_len, temperature=0.0)
    dt = (time.perf_counter() - t0) / reps
    ms_per_step = dt / gen_len * 1e3
    # weights actually streamed per step (int8 dense bytes, no embeddings)
    D, F, V, L = cfg.dim, cfg.ffn_hidden, cfg.vocab_size, cfg.n_layers
    stream_gb = (D * V + L * (D * 3 * D + D * D + D * 2 * F + F * D)) / 1e9
    floor_ms = stream_gb / _V5E_HBM_GBS * 1e3
    return {
        "case": case,
        "value": round(ms_per_step, 2),
        "unit": "ms/step",
        "tok_per_s": round(batch * gen_len / dt, 1),
        "weight_stream_floor_ms": round(floor_ms, 2),
        "pct_of_floor": round(100 * floor_ms / ms_per_step, 1),
    }


def bench_anticipation_step_7b_cb(tiny: bool, step_batch: int = 2,
                                  slots: int = 8):
    """The 7B anticipation step routed through the continuous-batching
    slot loop (serve_prompts — the --serving cb driver backend) instead
    of drain-style generate_with_prefix_cache: same prompts, same
    sampling, per-request retirement + prefix-sharing admission."""
    if tiny:
        return {"case": f"anticipation_step_7b_cb_sb{step_batch}",
                "skipped": "tiny"}
    from prego_tpu.serving_llm import ContinuousBatcher

    bsz = 4 * step_batch
    llama, cfg = _llama_7b(True, max_batch=max(bsz, slots), max_seq=2048)
    cb = ContinuousBatcher(llama, slots=slots, chunk=8, temperature=0.6)
    rng = np.random.default_rng(0)
    context = rng.integers(4, 31999, 1500).tolist()
    gen_len = 8

    def step(observed):
        prompts = []
        for s in range(step_batch):
            prompts.extend([context + observed + list(range(7, 7 + s))] * 4)
        return cb.serve_prompts(prompts, max_gen_len=gen_len,
                                temperature=0.6, top_p=0.9)

    step([7, 8, 9])  # compile + context prefill (per-video one-time cost)
    t0 = time.perf_counter()
    reps = 5
    for i in range(reps):
        step([7, 8, 9] + rng.integers(4, 31999, i % 5).tolist())
    dt = (time.perf_counter() - t0) / reps / step_batch
    return {
        "case": f"anticipation_step_7b_cb_sb{step_batch}",
        "value": round(dt * 1e3, 1),
        "unit": "ms/step (4 gens, shared ctx, CB backend)",
        "ctx_len": 1500,
        "step_batch": step_batch,
        "prefix_rebuilds": llama.prefix_rebuilds,
        "prefix_extends": llama.prefix_extends,
    }


def bench_anticipation_step_7b(tiny: bool, kv_quant: bool = True,
                               step_batch: int = 1):
    """The PREGO anticipation step AT THE REFERENCE SHAPE: 4 sampled
    generations (num_samples=2 squared) sharing a 1,500-token context,
    7B int8, real 32k lm-head, KV prefix cache. step_batch folds that
    many consecutive steps into one dispatch (driver --step_batch).

    ctx_len=1500 is a deliberate UPPER BOUND: the real Assembly101-O
    prompt stream (all 643 dispatches, measured by
    scripts/measure_prompt_tokens.py on the reference's shipped
    predictions + context assets) brackets at ~240-400 estimated
    SentencePiece tokens p50 and ~965 max even in the richest
    emoji+toy-class-context configuration — so real-workload steps are
    FASTER than this bench."""
    if tiny:
        return {
            "case": "anticipation_step_7b_int8"
            + ("_kv8" if kv_quant else "")
            + (f"_sb{step_batch}" if step_batch > 1 else ""),
            "skipped": "tiny",
        }
    bsz = 4 * step_batch
    llama, cfg = _llama_7b(kv_quant, max_batch=bsz, max_seq=2048)
    rng = np.random.default_rng(0)
    context = rng.integers(4, 31999, 1500).tolist()
    gen_len = 8

    def step(observed):
        prompts = []
        for s in range(step_batch):
            prompts.extend([context + observed + list(range(7, 7 + s))] * 4)
        return llama.generate_with_prefix_cache(
            prompts, max_gen_len=gen_len, temperature=0.6, top_p=0.9
        )

    step([7, 8, 9])  # compile + build the prefix cache once (per-video)
    t0 = time.perf_counter()
    reps = 5
    for i in range(reps):
        step([7, 8, 9] + rng.integers(4, 31999, i % 5).tolist())
    dt = (time.perf_counter() - t0) / reps / step_batch
    return {
        "case": "anticipation_step_7b_int8"
        + ("_kv8" if kv_quant else "")
        + (f"_sb{step_batch}" if step_batch > 1 else ""),
        "value": round(dt * 1e3, 1),
        "unit": "ms/step (4 gens, shared ctx)",
        "ctx_len": 1500,
        "step_batch": step_batch,
        "prefix_rebuilds": llama.prefix_rebuilds,
    }


def _serving_workload(tiny: bool, n_reqs: int, seed: int = 7):
    """Burst of mixed-length requests (the continuous-batching case):
    prompts 32-384 tokens, budgets 16-96 generated tokens (tiny: scaled
    down).  Mirrors the PREGO anticipation stream's spread (RESULTS.md
    workload-shaped context table: p50 ~30-400, max ~965)."""
    rng = np.random.default_rng(seed)
    lo_p, hi_p = (2, 24) if tiny else (32, 384)
    lo_g, hi_g = (2, 8) if tiny else (16, 96)
    hi_id = 250 if tiny else 31999  # tiny smoke runs the 258-word byte vocab
    return [
        (
            rng.integers(4, hi_id, rng.integers(lo_p, hi_p)).tolist(),
            int(rng.integers(lo_g, hi_g)),
        )
        for _ in range(n_reqs)
    ], []


def _serving_workload_ctx(tiny: bool, n_reqs: int, seed: int = 7,
                          ctx_len: Optional[int] = None):
    """PREGO-shaped burst: a few shared per-toy contexts, each request =
    context + short novel history tail (llama_meta.py:118-174 — hundreds
    of requests share one few-shot context per toy).  The regime where
    prefix-sharing admission should collapse prefill cost to ~#contexts
    context prefills + tiny per-request suffixes.

    The default 300-token context is NOT 64-aligned, so admission reuses
    only the aligned 256 tokens and every suffix carries the 44-token
    remainder (measured ~65-token suffixes at s16 — chipq_r5a).  Pass an
    aligned ctx_len (e.g. 256) to make the suffix the bare novel tail
    (5-40 tokens) — the piggyback-admission win regime."""
    rng = np.random.default_rng(seed)
    n_ctx = 2 if tiny else 4
    # tiny contexts must still clear the 64-token prefix chunk so the
    # smoke actually exercises prefix-sharing admission
    if ctx_len is None:
        ctx_len = 80 if tiny else 300
    lo_t, hi_t = (2, 8) if tiny else (5, 40)
    lo_g, hi_g = (2, 8) if tiny else (16, 96)
    hi_id = 250 if tiny else 31999
    contexts = [rng.integers(4, hi_id, ctx_len).tolist() for _ in range(n_ctx)]
    work = []
    for i in range(n_reqs):
        ctx = contexts[i % n_ctx]
        work.append(
            (
                ctx + rng.integers(4, hi_id, rng.integers(lo_t, hi_t)).tolist(),
                int(rng.integers(lo_g, hi_g)),
            )
        )
    return work, contexts


def bench_serving_cb(tiny: bool, mode: str = "cb", slots: int = 8,
                     n_reqs: int = 32, shape: str = "7b",
                     workload: str = "mixed"):
    """Request burst through S slots: continuous batching
    (serving_llm.ContinuousBatcher, prefix-sharing admission) vs the
    reference's static batching (generate() pads each group of S to its
    longest prompt and decodes the whole group to its longest budget —
    generation.py:121-215).  workload="ctx" is the PREGO-shaped shared-
    context stream.  Both modes WARM their jit signatures on a prologue
    burst first — the measured wall is serving, not compilation."""
    case = f"serving_{mode}_{shape}_s{slots}" + (
        {"ctx": "_ctx", "ctxa": "_ctxa"}.get(workload, "")
    )
    from prego_tpu.serving_llm import ContinuousBatcher, Request

    if tiny:
        llama, cfg = _llama(True, "none")
        n_reqs = min(n_reqs, 6)
        slots = min(slots, 2)
    else:
        llama, cfg = _llama_ref(shape, kv_quant=True, max_batch=slots,
                                max_seq=512)
    if workload == "ctx":
        work, contexts = _serving_workload_ctx(tiny, n_reqs)
    elif workload == "ctxa":  # 64-ALIGNED contexts: suffixes are the bare
        # 5-40-token novel tails (the piggyback-admission win regime)
        work, contexts = _serving_workload_ctx(
            tiny, n_reqs, ctx_len=64 if tiny else 256
        )
    else:
        work, contexts = _serving_workload(tiny, n_reqs)
    gen_total = 0
    if mode == "cb":
        cb = ContinuousBatcher(
            llama, slots=slots,
            chunk=4 if tiny else int(os.environ.get("PREGO_CB_CHUNK", "8")),
            temperature=0.0,
            # overlap_fetch: auto default (PREGO_CB_OVERLAP env, else ON
            # for device backends — the r4d same-window A/B/A win)
        )
        t_reg = time.perf_counter()
        for c in contexts:
            cb.register_prefix(c)
        t_reg = time.perf_counter() - t_reg  # one-time per-toy context cost
        #   (dominated by the prefill-chunk COMPILE on a cold process),
        #   reported separately below
        # warm = serve the real burst once: compiles every decode/admit
        # signature and hot-loads the prefix LRU; the TIMED pass below is
        # steady-state serving (first pass previously left the real
        # burst's admission bucket compiling INSIDE the timer)
        cb.serve(
            [Request(uid=-1 - i, prompt=p, max_gen_len=g)
             for i, (p, g) in enumerate(work)]
        )
        t0 = time.perf_counter()
        done, stats = cb.serve(
            [Request(uid=i, prompt=p, max_gen_len=g)
             for i, (p, g) in enumerate(work)]
        )
        dt = time.perf_counter() - t0
        lats = sorted(c.finished_wall_s for c in done)
        gen_total = sum(len(c.tokens) for c in done)
    else:  # static: groups of `slots` in arrival order via generate()
        for i in range(0, len(work), slots):  # warm pass (same groups)
            group = work[i : i + slots]
            llama.generate([p for p, _ in group],
                           max_gen_len=max(g for _, g in group),
                           temperature=0.0)
        finish = []
        t0 = time.perf_counter()
        for i in range(0, len(work), slots):
            group = work[i : i + slots]
            outs, _ = llama.generate(
                [p for p, _ in group],
                max_gen_len=max(g for _, g in group),
                temperature=0.0,
            )
            now = time.perf_counter() - t0
            # every request in the group finishes when the group drains;
            # per-request budgets are honored by truncation (the compute
            # for the excess steps is the static-batching cost being
            # measured)
            for (p, g), out in zip(group, outs):
                gen_total += min(len(out), g)
                finish.append(now)
        dt = time.perf_counter() - t0
        lats = sorted(finish)
    p50 = lats[len(lats) // 2]
    p95 = lats[min(int(len(lats) * 0.95), len(lats) - 1)]
    row = {
        "case": case,
        "value": round(gen_total / dt, 1),
        "unit": f"useful tok/s ({workload} burst)",
        "wall_s": round(dt, 2),
        "n_reqs": n_reqs,
        "lat_p50_s": round(p50, 2),
        "lat_p95_s": round(p95, 2),
    }
    if mode == "cb":
        row["slot_utilization"] = round(stats.utilization, 3)
        row["prefix_hits"] = stats.prefix_hits
        row["prefix_tokens_reused"] = stats.prefix_tokens_reused
        row["suffix_tokens_prefilled"] = stats.suffix_tokens_prefilled
        row["suffix_tokens_piggybacked"] = stats.suffix_tokens_piggybacked
        if contexts:
            row["ctx_register_s"] = round(t_reg, 2)
    return row


def bench_spec_decode(tiny: bool, k: int = 8, draft: str = "oracle",
                      shape: str = "7b", gen_len: int = 128):
    """Speculative decoding at batch 1 (models/llama/speculative.py),
    bracketed between its two measurable endpoints on fabricated
    weights: draft="oracle" replays the target's own greedy continuation
    (acceptance 1 — the ceiling: one k-token verify forward per k
    tokens), draft="1b" runs a real 1B-class bf16 draft (acceptance ~0
    on random weights — the overhead floor: every round pays k draft
    steps + one verify for ~1 emitted token).  A real trained pair lands
    between the endpoints at its measured acceptance rate.  The plain
    greedy baseline is measured in the SAME process/window."""
    case = f"spec_decode_{shape}_" + (
        draft if draft == "oracle" or draft.startswith("self")
        else f"draft{draft}"
    ) + f"_k{k}"
    if tiny:
        from prego_tpu.models.llama.speculative import SpeculativeLlama

        llama, cfg = _llama(True, "none")
        gen_len = 16
        k = 2
        prompt = [5, 9, 21, 3]
        want, _ = llama.generate([list(prompt)], max_gen_len=gen_len,
                                 temperature=0.0)
        spec = SpeculativeLlama(llama, k=k)
        got = spec.generate([list(prompt)], max_gen_len=gen_len,
                            temperature=0.0,
                            oracle_tokens=[list(prompt) + want[0]])
        assert got == want
        return {"case": case, "smoke": "ok", "tokens": len(got[0])}

    import jax

    from prego_tpu.models.llama import LlamaConfig, init_params
    from prego_tpu.models.llama.speculative import SpeculativeLlama

    llama, cfg = _llama_ref(shape, kv_quant=True, max_batch=1, max_seq=256)
    rng = np.random.default_rng(0)
    prompt = rng.integers(4, 31999, 8).tolist()

    # plain greedy baseline, same window; reps >= 5 with median + spread
    # (VERDICT r4 #7: reps=2 in a ±10-30% weather regime left the spec
    # rows statistically thin)
    want, _ = llama.generate([list(prompt)], max_gen_len=gen_len,
                             temperature=0.0)  # compile
    reps = 5
    base_ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out, _ = llama.generate([list(prompt)], max_gen_len=gen_len,
                                temperature=0.0)
        base_ts.append(time.perf_counter() - t0)
    base_dt = sorted(base_ts)[reps // 2]
    n_base = max(len(out[0]), 1)

    if draft == "oracle":
        spec = SpeculativeLlama(llama, k=k)
        # Fixed-point oracle: on TPU bf16 the 1-token decode path and the
        # (B, k) verify forward disagree on a few near-tie argmaxes (same
        # flip class as flat-head, RESULTS.md), so replaying the PLAIN
        # path's tokens cannot reach acceptance 1. Iterate oracle <- spec
        # output until the replay reproduces itself; the converged replay
        # measures the true acceptance-1 ceiling THROUGH the verify path.
        oracle_tail = list(want[0])
        for _ in range(3):
            out_fp = spec.generate(
                [list(prompt)], max_gen_len=gen_len, temperature=0.0,
                oracle_tokens=[list(prompt) + oracle_tail],
            )
            if out_fp[0] == oracle_tail:
                break
            oracle_tail = list(out_fp[0])
        kw = {"oracle_tokens": [list(prompt) + oracle_tail]}
    elif draft.startswith("self"):  # layer-truncated self-draft
        # shares the target's weight arrays — zero extra HBM; measures
        # the REAL per-round draft cost at (N/target-layers) depth
        # (acceptance ~0 on fabricated weights, like any non-oracle draft)
        from prego_tpu.models.llama.speculative import self_draft

        d_params, d_cfg = self_draft(llama.params, cfg, int(draft[4:]))
        spec = SpeculativeLlama(llama, d_params, d_cfg, k=k)
        kw = {}
    else:  # 1B-class bf16 draft (same vocab, fabricated weights)
        import jax.numpy as jnp

        d_cfg = LlamaConfig(
            dim=2048, n_layers=16, n_heads=16, n_kv_heads=16,
            vocab_size=cfg.vocab_size, multiple_of=256, norm_eps=1e-5,
            max_batch_size=1, max_seq_len=cfg.max_seq_len,
        )
        d_params = init_params(d_cfg, jax.random.PRNGKey(3),
                               dtype=jnp.bfloat16)
        spec = SpeculativeLlama(llama, d_params, d_cfg, k=k)
        kw = {}

    got = spec.generate([list(prompt)], max_gen_len=gen_len,
                        temperature=0.0, **kw)  # compile
    # vs plain greedy: bf16 near-tie flips between the 1-token and k-token
    # forward paths are expected on TPU (exact equality is the CPU-f32
    # hermetic test bar, tests/test_speculative.py); report, don't assert
    n_cmp = max(min(len(got[0]), len(want[0])), 1)
    greedy_match = sum(
        1 for x, y in zip(got[0], want[0]) if x == y
    ) / n_cmp
    spec.rounds = spec.drafts_accepted = spec.drafts_proposed = 0
    spec_ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out_s = spec.generate([list(prompt)], max_gen_len=gen_len,
                              temperature=0.0, **kw)
        spec_ts.append(time.perf_counter() - t0)
    spec_dt = sorted(spec_ts)[reps // 2]
    n_spec = max(len(out_s[0]), 1)
    rounds = spec.rounds / reps
    acc = spec.drafts_accepted / max(spec.drafts_proposed, 1)

    def spread(ts):  # (max - min) / median, the per-case weather spread
        med = sorted(ts)[len(ts) // 2]
        return round(100 * (max(ts) - min(ts)) / med, 1)

    return {
        "case": case,
        "value": round(n_spec / spec_dt, 1),
        "unit": "tok/s (b1 greedy, median of 5)",
        "ms_per_token": round(spec_dt / n_spec * 1e3, 2),
        "spread_pct": spread(spec_ts),
        "baseline_tok_s": round(n_base / base_dt, 1),
        "baseline_ms_per_token": round(base_dt / n_base * 1e3, 2),
        "baseline_spread_pct": spread(base_ts),
        "speedup_vs_plain": round((n_spec / spec_dt) / (n_base / base_dt), 2),
        "acceptance_rate": round(acc, 3),
        "greedy_match_vs_plain": round(greedy_match, 3),
        "rounds": rounds,
        "k": k,
    }


def bench_reconcile_7b_b1(tiny: bool, gen_len: int = 128):
    """VERDICT r4 #1: BENCH_r04 recorded decode_7b_int8 at 14.5 ms/step
    while the spec-decode case's plain baseline — the same config PLUS
    int8-KV — read 10.81 ms in the same capture.  This case interleaves
    the two configs in ONE process (shared int8 params, two Llama
    wrappers differing only in kv_quant), A/B/A/B, so the pair is read
    under identical weather: if they agree within the int8-KV b1 premium
    (~+6-7%), the r4 contradiction was per-case weather, not a real
    regression of the e2e path."""
    if tiny:
        return {"case": "reconcile_7b_b1", "skipped": "tiny"}
    import jax
    from prego_tpu.models.llama import ByteTokenizer, Llama, LlamaConfig
    from prego_tpu.models.llama.model import init_params_quantized

    s = _REF_SHAPES["7b"]
    cfg = LlamaConfig(
        dim=s["dim"], n_layers=s["n_layers"], n_heads=s["n_heads"],
        n_kv_heads=s["n_heads"], vocab_size=32000, multiple_of=256,
        norm_eps=1e-5, max_batch_size=1, max_seq_len=256,
    )
    params = init_params_quantized(cfg, jax.random.PRNGKey(0), fused=True)
    tok = ByteTokenizer()
    plain = Llama(params, tok, cfg)  # the decode_7b_int8 config
    kv8 = Llama(params, tok, cfg, kv_quant=True)  # the spec-baseline config
    rng = np.random.default_rng(0)
    prompt = [rng.integers(4, 31999, 8).tolist()]
    for llm in (plain, kv8):  # compile both signatures first
        llm.generate([list(prompt[0])], max_gen_len=gen_len, temperature=0.0)
    t_plain, t_kv8 = [], []
    for _ in range(3):  # interleaved A/B rounds
        t0 = time.perf_counter()
        plain.generate([list(prompt[0])], max_gen_len=gen_len, temperature=0.0)
        t_plain.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        kv8.generate([list(prompt[0])], max_gen_len=gen_len, temperature=0.0)
        t_kv8.append(time.perf_counter() - t0)
    ms = lambda ts: round(sorted(ts)[len(ts) // 2] / gen_len * 1e3, 2)  # noqa: E731
    return {
        "case": "reconcile_7b_b1",
        "value": ms(t_plain),
        "unit": "ms/step (decode_7b_int8 leg, median of 3 interleaved)",
        "kv8_ms_per_step": ms(t_kv8),
        "kv8_over_plain_pct": round(100 * (ms(t_kv8) / ms(t_plain) - 1), 1),
        "plain_all": [round(t / gen_len * 1e3, 2) for t in t_plain],
        "kv8_all": [round(t / gen_len * 1e3, 2) for t in t_kv8],
    }


def bench_anticipation_step_7b_spec(tiny: bool, draft: str = "self16",
                                    k: int = 4, step_batch: int = 1):
    """VERDICT r4 #3: speculative decoding COMPOSED with the PREGO
    anticipation step — 4 sampled gens (num_samples²) sharing the
    1,500-token context at 7B int8+kv8, generated through
    SpeculativeLlama.generate_with_prefix_cache (the --spec_k driver
    seam), with the plain prefix-cached step measured in the SAME
    process/window.  Drafts are layer-truncated SELF-drafts (shared
    weight arrays, zero extra HBM): self-32 = full depth (acceptance ~1
    with REAL draft cost — the step's speculation ceiling), self-16 =
    half depth (the deployable config; acceptance ~0 on fabricated
    weights -> the overhead floor).  The draft cache inherits int8-KV
    (chipq_r5a: the bf16 draft cache OOM'd the self-32 leg at B=4), and
    max_seq 1792 (ctx 1500 + observed + gen 8 + speculative spare) keeps
    the two B=4 caches + two B=1 prefix slots + 6.74 GB weights under the
    15.75 GB HBM budget."""
    case = f"anticipation_step_7b_spec_{draft.replace('-', '')}_k{k}"
    from prego_tpu.models.llama.speculative import SpeculativeLlama, self_draft

    if tiny:
        llama, cfg = _llama(True, "none")
        d_params, d_cfg = self_draft(llama.params, cfg, cfg.n_layers)
        spec = SpeculativeLlama(llama, d_params, d_cfg, k=2)
        out = spec.generate_with_prefix_cache(
            [[5] * 70 + [9, i] for i in range(4)], max_gen_len=4,
            temperature=0.6,
        )
        assert len(out) == 4
        return {"case": case, "smoke": "ok"}

    bsz = 4 * step_batch
    llama, cfg = _llama_7b(True, max_batch=bsz, max_seq=1792)
    n_layers = int(draft[4:]) if draft.startswith("self") else cfg.n_layers
    d_params, d_cfg = self_draft(llama.params, cfg, n_layers)
    spec = SpeculativeLlama(llama, d_params, d_cfg, k=k)
    rng = np.random.default_rng(0)
    context = rng.integers(4, 31999, 1500).tolist()
    gen_len = 8

    def prompts_for(observed):
        prompts = []
        for s in range(step_batch):
            prompts.extend([context + observed + list(range(7, 7 + s))] * 4)
        return prompts

    def run(gen_fn, label):
        gen_fn(prompts_for([7, 8, 9]))  # compile + prefix build
        # timed generations only in the counters (methodology parity
        # with bench_spec_decode's post-warmup reset)
        spec.rounds = spec.drafts_accepted = spec.drafts_proposed = 0
        ts = []
        for i in range(5):
            obs = [7, 8, 9] + rng.integers(4, 31999, i % 5).tolist()
            t0 = time.perf_counter()
            gen_fn(prompts_for(obs))
            ts.append(time.perf_counter() - t0)
        return sorted(ts)[len(ts) // 2] / step_batch

    spec_dt = run(
        lambda p: spec.generate_with_prefix_cache(
            p, max_gen_len=gen_len, temperature=0.6, top_p=0.9
        ),
        "spec",
    )
    acc = spec.drafts_accepted / max(spec.drafts_proposed, 1)
    plain_dt = run(
        lambda p: llama.generate_with_prefix_cache(
            p, max_gen_len=gen_len, temperature=0.6, top_p=0.9
        ),
        "plain",
    )
    return {
        "case": case,
        "value": round(spec_dt * 1e3, 1),
        "unit": "ms/step (4 gens, shared ctx, speculative; median of 5)",
        "plain_ms_per_step": round(plain_dt * 1e3, 1),
        "speedup_vs_plain": round(plain_dt / spec_dt, 2),
        "acceptance_rate": round(acc, 3),
        "ctx_len": 1500,
        "step_batch": step_batch,
        "k": k,
    }


def bench_spec_decode_batched(tiny: bool, batch: int = 8, k: int = 4,
                              gen_len: int = 128):
    """Speculative decoding AT SERVING BATCH (the CB×spec decision input,
    VERDICT r4 #3): B rows advance per-row through oracle-draft rounds
    (acceptance 1 — the ceiling), vs the plain batched decode in the same
    process.  At b1 the verify rides a weight stream that dominates; at
    b8+ the per-token weight cost is already amortized, so the measured
    ceiling here bounds what adding per-row verify to the CB slot loop
    could ever pay."""
    case = f"spec_decode_7b_b{batch}_oracle_k{k}"
    if tiny:
        return {"case": case, "skipped": "tiny"}
    from prego_tpu.models.llama.speculative import SpeculativeLlama

    llama, cfg = _llama_ref("7b", kv_quant=True, max_batch=batch, max_seq=256)
    rng = np.random.default_rng(0)
    prompts = [rng.integers(4, 31999, 8).tolist() for _ in range(batch)]

    want, _ = llama.generate([list(p) for p in prompts], max_gen_len=gen_len,
                             temperature=0.0)  # compile
    base_ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out, _ = llama.generate([list(p) for p in prompts],
                                max_gen_len=gen_len, temperature=0.0)
        base_ts.append(time.perf_counter() - t0)
    base_dt = sorted(base_ts)[1]
    n_base = sum(max(len(o), 1) for o in out)

    spec = SpeculativeLlama(llama, k=k)
    # per-row fixed-point oracle (same bf16 near-tie handling as the b1
    # case): iterate replay <- spec output until it reproduces itself
    tails = [list(w) for w in want]
    for _ in range(3):
        out_fp = spec.generate(
            [list(p) for p in prompts], max_gen_len=gen_len, temperature=0.0,
            oracle_tokens=[list(p) + t for p, t in zip(prompts, tails)],
        )
        if all(o == t for o, t in zip(out_fp, tails)):
            break
        tails = [list(o) for o in out_fp]
    kw = {"oracle_tokens": [list(p) + t for p, t in zip(prompts, tails)]}
    spec.generate([list(p) for p in prompts], max_gen_len=gen_len,
                  temperature=0.0, **kw)  # warm
    spec.rounds = spec.drafts_accepted = spec.drafts_proposed = 0
    spec_ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out_s = spec.generate([list(p) for p in prompts],
                              max_gen_len=gen_len, temperature=0.0, **kw)
        spec_ts.append(time.perf_counter() - t0)
    spec_dt = sorted(spec_ts)[1]
    n_spec = sum(max(len(o), 1) for o in out_s)
    acc = spec.drafts_accepted / max(spec.drafts_proposed, 1)
    return {
        "case": case,
        "value": round(n_spec / spec_dt, 1),
        "unit": f"tok/s (b{batch} greedy, median of 3)",
        "baseline_tok_s": round(n_base / base_dt, 1),
        "speedup_vs_plain": round(
            (n_spec / spec_dt) / (n_base / base_dt), 2
        ),
        "acceptance_rate": round(acc, 3),
        "k": k,
        "batch": batch,
    }


CASES = {
    "decode_b1": lambda tiny: bench_decode(1, tiny),
    "spec_decode_7b_oracle_k8": lambda tiny: bench_spec_decode(tiny, k=8),
    "spec_decode_7b_oracle_k4": lambda tiny: bench_spec_decode(tiny, k=4),
    "spec_decode_7b_draft1b_k4": lambda tiny: bench_spec_decode(
        tiny, k=4, draft="1b"),
    # layer-truncated self-drafts (shared weights, zero extra HBM):
    # self16 = half depth (real draft cost at 16/32 layers), self32 =
    # full depth (the draft IS the target — acceptance ~1 with REAL
    # draft-loop cost, vs the oracle's zero-cost ceiling)
    "spec_decode_7b_self16_k4": lambda tiny: bench_spec_decode(
        tiny, k=4, draft="self16"),
    "spec_decode_7b_self32_k4": lambda tiny: bench_spec_decode(
        tiny, k=4, draft="self32"),
    "decode_b8": lambda tiny: bench_decode(8, tiny),
    "decode_b8_int8": lambda tiny: bench_decode(8, tiny, "int8"),
    "decode_b8_int8x8": lambda tiny: bench_decode(8, tiny, "int8x8"),
    "decode_b8_kv8": lambda tiny: bench_decode(8, tiny, kv_quant=True),
    "decode_b8_int8x8_kv8": lambda tiny: bench_decode(8, tiny, "int8x8", kv_quant=True),
    "online_perframe": lambda tiny: bench_online(1, tiny),
    "online_microbatch": lambda tiny: bench_online(256, tiny),
    "anticipation_step": bench_anticipation_step,
    "anticipation_step_sb2": lambda tiny: bench_anticipation_step(tiny, 2),
    "anticipation_step_int8x8_kv8": lambda tiny: bench_anticipation_step(
        tiny, quantize="int8x8", kv_quant=True),
    "anticipation_step_int8x8": lambda tiny: bench_anticipation_step(
        tiny, quantize="int8x8"),
    "anticipation_step_kv8": lambda tiny: bench_anticipation_step(
        tiny, kv_quant=True),
    "decode_7b_int8": lambda tiny: bench_decode_7b(1, tiny),
    "decode_13b_int8": lambda tiny: bench_decode_7b(1, tiny, shape="13b"),
    "decode_13b_int8_kv8": lambda tiny: bench_decode_7b(
        1, tiny, kv_quant=True, shape="13b"),
    # 13B batched serving: 13.2 GB int8 weights + ~0.9 GB int8 KV at
    # b8/max_seq 256 — the largest-shape batch row that fits one v5e
    "decode_13b_b8_int8_kv8": lambda tiny: bench_decode_7b(
        8, tiny, kv_quant=True, shape="13b"),
    "decode_7b_b8_int8": lambda tiny: bench_decode_7b(8, tiny),
    "decode_7b_b8_int8_kv8": lambda tiny: bench_decode_7b(8, tiny, kv_quant=True),
    "decode_7b_b16_int8_kv8": lambda tiny: bench_decode_7b(16, tiny, kv_quant=True),
    "decode_7b_b32_int8_kv8": lambda tiny: bench_decode_7b(32, tiny, kv_quant=True),
    # b64 at max_seq 256: int8 KV ~4.3 GB + 6.6 GB weights — fits; the
    # throughput-scaling edge once the attention dispatch cost is paid once
    "decode_7b_b64_int8_kv8": lambda tiny: bench_decode_7b(64, tiny, kv_quant=True),
    "decode_7b_int8x8": lambda tiny: bench_decode_7b(1, tiny, activations=True),
    "serving_cb_7b": lambda tiny: bench_serving_cb(tiny, mode="cb"),
    "serving_static_7b": lambda tiny: bench_serving_cb(tiny, mode="static"),
    # PREGO-shaped burst (4 shared 300-token contexts): the prefix-
    # sharing admission regime — prefill cost ~#contexts, not ~#requests
    "serving_cb_7b_ctx": lambda tiny: bench_serving_cb(
        tiny, mode="cb", workload="ctx"),
    "serving_static_7b_ctx": lambda tiny: bench_serving_cb(
        tiny, mode="static", workload="ctx"),
    "serving_cb_7b_s16_ctx": lambda tiny: bench_serving_cb(
        tiny, mode="cb", slots=16, n_reqs=48, workload="ctx"),
    # 64-ALIGNED contexts: suffixes are the bare 5-40-token tails — the
    # piggyback-admission threshold sweep runs here (PREGO_CB_PIGGYBACK)
    "serving_cb_7b_s16_ctxa": lambda tiny: bench_serving_cb(
        tiny, mode="cb", slots=16, n_reqs=48, workload="ctxa"),
    # 16-slot variants: flat-head attention makes the b16 decode
    # marginal nearly batch-flat (12.13 vs 12.09 ms at b8), so doubling
    # the slot count should nearly double useful tok/s on a deep burst
    "serving_cb_7b_s16": lambda tiny: bench_serving_cb(
        tiny, mode="cb", slots=16, n_reqs=48),
    "serving_static_7b_s16": lambda tiny: bench_serving_cb(
        tiny, mode="static", slots=16, n_reqs=48),
    "decode_7b_b8_int8x8": lambda tiny: bench_decode_7b(8, tiny, activations=True),
    "anticipation_step_7b_int8_kv8": lambda tiny: bench_anticipation_step_7b(tiny),
    "anticipation_step_7b_int8_kv8_sb2": lambda tiny: bench_anticipation_step_7b(
        tiny, step_batch=2),
    # same step through the continuous-batching backend (--serving cb)
    "anticipation_step_7b_cb_sb2": lambda tiny: bench_anticipation_step_7b_cb(tiny),
    # r4 VERDICT #1: the two contradicting BENCH_r04 7B b1 rows read
    # interleaved in ONE process (weather-controlled pair)
    "reconcile_7b_b1": bench_reconcile_7b_b1,
    # r4 VERDICT #3: speculation composed with the PREGO anticipation
    # step (self-draft brackets) and with serving batches (oracle ceiling)
    "anticipation_step_7b_spec_self16_k4": lambda tiny:
        bench_anticipation_step_7b_spec(tiny, draft="self16", k=4),
    "anticipation_step_7b_spec_self32_k4": lambda tiny:
        bench_anticipation_step_7b_spec(tiny, draft="self32", k=4),
    "spec_decode_7b_b8_oracle_k4": lambda tiny:
        bench_spec_decode_batched(tiny, batch=8, k=4),
    "spec_decode_7b_b16_oracle_k4": lambda tiny:
        bench_spec_decode_batched(tiny, batch=16, k=4),
}


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--case", choices=sorted(CASES), default=None)
    p.add_argument("--all", action="store_true")
    p.add_argument("--tiny", action="store_true", help="CPU smoke shapes")
    p.add_argument("--watchdog", type=float, default=900)
    args = p.parse_args()
    _watchdog(args.watchdog)
    names = sorted(CASES) if args.all or not args.case else [args.case]
    for name in names:
        # probed fresh BEFORE each case body (force: the per-process
        # cache would otherwise label a mid-session slow patch with the
        # first case's clean reading in --all runs)
        weather = _weather_probe(force=True)
        row = CASES[name](args.tiny)
        if isinstance(row, dict) and "skipped" not in row:
            row["weather_ms"] = weather
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
