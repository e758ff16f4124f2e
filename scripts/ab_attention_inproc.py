"""In-process paired A/B of the decode-ATTENTION dispatch variants.

The e2e queue readings for fold_batch / flat-head live in different
tunnel-weather windows (cross-process, tens of minutes apart) and the
window-to-window drift is +/-50% — unusable for a <10% kernel decision.
This harness holds ONE process and ONE weight set, compiles every
variant up front, then times them INTERLEAVED (round-robin, one timed
call per variant per round) so weather drift hits all variants equally;
the per-variant medians of per-round readings are the decision numbers.

Variants (all trace-time env gates on the same forward()):
  perhead  PREGO_FOLD_BATCH=0                per-(batch,head) block walk
  fold     PREGO_FOLD_BATCH=1                one grid program per layer
  flatG    PREGO_HEAD_GROUP=G (implies fold) G heads per matmul pair

  python scripts/ab_attention_inproc.py --quantize --kv_quant \
      --dim 4096 --layers 32 --heads 32 --vocab 32000 --batch 8
  python scripts/ab_attention_inproc.py --batch 8   # 1B bf16 shape
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def make_runner(cfg, kv_quant):
    """Fresh function object per variant (fresh trace under its env
    gates); params/rope are jit ARGUMENTS so the 7B weight set is not
    baked into each variant's remote compile as constants."""
    from prego_tpu.models.llama.model import forward, init_cache

    def run(params, rope, tokens, gen_len):
        B = tokens.shape[0]
        cache = init_cache(cfg, B, dtype=jnp.bfloat16, quantized=kv_quant)

        def body(i, carry):
            tok, cache, acc = carry
            logits, cache = forward(params, tok[:, None], i, cache, cfg, rope)
            nxt = jnp.argmax(logits[:, 0], axis=-1).astype(jnp.int32)
            acc = jax.lax.dynamic_update_slice(acc, nxt[:, None], (0, i))
            return (nxt, cache, acc)

        acc0 = jnp.zeros((B, gen_len + 1), jnp.int32)
        _, _, acc = jax.lax.fori_loop(0, gen_len, body, (tokens, cache, acc0))
        return acc

    return jax.jit(run, static_argnums=(3,))


def set_gates(fold, group):
    os.environ["PREGO_FOLD_BATCH"] = fold
    # Explicit "1" (= off), never unset: since flat-head became the
    # shape-aware DEFAULT at >=24 layers, popping the env would silently
    # turn the perhead/fold control legs INTO flat legs at those shapes
    # (observed: a b16 sweep where all four variants read identical).
    os.environ["PREGO_HEAD_GROUP"] = str(group) if group else "1"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gen", type=int, default=128)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--quantize", action="store_true", help="int8 weights")
    ap.add_argument("--kv_quant", action="store_true", help="int8 KV cache")
    ap.add_argument("--dim", type=int, default=2048)
    ap.add_argument("--layers", type=int, default=16)
    ap.add_argument("--heads", type=int, default=16)
    ap.add_argument("--vocab", type=int, default=0, help="0 = byte vocab")
    ap.add_argument("--max_seq", type=int, default=512)
    ap.add_argument("--groups", default=None,
                    help="comma list of flat group sizes; default heads,8")
    ap.add_argument("--compile_retries", type=int, default=2)
    args = ap.parse_args()

    from prego_tpu.models.llama import ByteTokenizer, LlamaConfig, init_params
    from prego_tpu.models.llama.model import (
        fuse_projections,
        init_params_quantized,
        precompute_rope,
    )

    tok = ByteTokenizer()
    cfg = LlamaConfig(
        dim=args.dim, n_layers=args.layers, n_heads=args.heads,
        n_kv_heads=args.heads, vocab_size=args.vocab or tok.n_words,
        multiple_of=256, norm_eps=1e-5, max_batch_size=args.batch,
        max_seq_len=args.max_seq,
    )
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    if args.quantize:
        params = init_params_quantized(cfg, jax.random.PRNGKey(0), fused=True)
    else:
        params = fuse_projections(
            init_params(cfg, jax.random.PRNGKey(0), dtype=dtype))
    rope = precompute_rope(cfg)
    tokens = jnp.asarray(np.arange(args.batch) % 200 + 4, jnp.int32)
    sync = jax.jit(lambda t: jnp.sum(t))

    groups = ([int(g) for g in args.groups.split(",")] if args.groups
              else sorted({args.heads, 8}))
    variants = [("perhead", ("0", 0)), ("fold", ("1", 0))]
    variants += [(f"flat{g}", ("1", g)) for g in groups]

    # compile phase — one fresh trace per variant under its gates
    fns, outs = {}, {}
    for name, (fold, group) in variants:
        set_gates(fold, group)
        out = None
        for attempt in range(args.compile_retries):
            fn = make_runner(cfg, args.kv_quant)
            t0 = time.perf_counter()
            try:
                out = fn(params, rope, tokens, args.gen)
                float(sync(out))
                break
            except Exception as e:  # noqa: BLE001 — weather: report, retry
                print(f"[{name:8s}] attempt {attempt + 1} FAILED after "
                      f"{time.perf_counter()-t0:.0f}s: {type(e).__name__}: "
                      f"{str(e)[:120]}", flush=True)
                out = None
        if out is None:
            continue
        print(f"[{name:8s}] compiled+first {time.perf_counter()-t0:.1f}s",
              flush=True)
        fns[name] = fn
        outs[name] = np.asarray(out)

    # interleaved timing rounds (gates are trace-time only; the compiled
    # executables are fixed, so flipping env between calls is inert)
    times = {n: [] for n in fns}
    for r in range(args.rounds):
        row = []
        for name, (fold, group) in variants:
            if name not in fns:
                continue
            set_gates(fold, group)
            t0 = time.perf_counter()
            out = fns[name](params, rope, tokens, args.gen)
            float(sync(out))
            ms = (time.perf_counter() - t0) / args.gen * 1e3
            times[name].append(ms)
            row.append(f"{name} {ms:6.3f}")
        print(f"round {r}: " + "  ".join(row), flush=True)

    print()
    base = np.median(times.get("perhead", times[next(iter(times))]))
    for name in times:
        med = np.median(times[name])
        print(f"[{name:8s}] median {med:6.3f} ms/step  "
              f"({(med / base - 1) * 100:+.1f}% vs perhead)", flush=True)

    names = list(outs)
    same = all(np.array_equal(outs[names[0]], outs[n]) for n in names[1:])
    print(f"greedy tokens identical across {names}: {same}")
    if not same:
        base_out = outs[names[0]]
        for n in names[1:]:
            d = outs[n] != base_out
            firsts = [int(np.argmax(rw)) if rw.any() else -1 for rw in d]
            print(f"  [{n:8s}] first-divergence step per row: {firsts}")


if __name__ == "__main__":
    main()
