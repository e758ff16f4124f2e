"""In-process A/B of the fused decode paths (VERDICT r2 #4).

One process, one model; each variant sets the fusion kill-switch env
vars and builds a FRESH jitted closure (new function object => fresh
trace, so the env gates are honored per variant).  Times a greedy
fori_loop decode — the marginal per-step cost without generate()'s
fixed per-call overhead — and checks all variants emit identical
greedy tokens.

  python scripts/ab_fused_inproc.py [--gen 128] [--batch 8] [--reps 5]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

_GATES = (
    "PREGO_FUSED_FFN",
    "PREGO_FUSED_ATTN_WO",
    "PREGO_FUSED_LAYER",
    "PREGO_FUSED_CACHE_UPD",
    "PREGO_FUSED_FFN_Q8",
    "PREGO_FUSED_DENSE_Q8",
)

VARIANTS = {
    # bf16 fusion ladder
    "baseline": {},
    "+ffn": {"PREGO_FUSED_FFN": "1"},
    "+wo": {"PREGO_FUSED_ATTN_WO": "1"},
    "+both": {"PREGO_FUSED_FFN": "1", "PREGO_FUSED_ATTN_WO": "1"},
    "+layer": {  # norm prologue + residual epilogues
        "PREGO_FUSED_FFN": "1",
        "PREGO_FUSED_ATTN_WO": "1",
        "PREGO_FUSED_LAYER": "1",
    },
    "+cacheupd": {  # cache write in-kernel too
        "PREGO_FUSED_FFN": "1",
        "PREGO_FUSED_ATTN_WO": "1",
        "PREGO_FUSED_LAYER": "1",
        "PREGO_FUSED_CACHE_UPD": "1",
    },
    # weight-only-int8 fusion ladder (--quantize; the 7B serving path).
    # PREGO_FUSED_LAYER is a default-on kill switch the q8 FFN dispatch
    # also consults — keep it on in the q8 variants.
    "qbase": {},
    "+ffnq8": {"PREGO_FUSED_FFN_Q8": "1", "PREGO_FUSED_LAYER": "1"},
    "+denseq8": {"PREGO_FUSED_DENSE_Q8": "1"},
    "+allq8": {
        "PREGO_FUSED_FFN_Q8": "1",
        "PREGO_FUSED_LAYER": "1",
        "PREGO_FUSED_DENSE_Q8": "1",
    },
}


def make_runner(cfg):
    """Fresh function object per variant so each traces under its own env
    gates.  params/rope are jit ARGUMENTS, not closed-over constants — a
    closure would capture the full weight set as compile-time constants
    (6.9 GB at the 7B shape), which the remote compile helper has to
    ingest per variant."""
    from prego_tpu.models.llama.model import forward, init_cache

    def run(params, rope, tokens, gen_len):
        B = tokens.shape[0]
        cache = init_cache(cfg, B, dtype=params["norm"].dtype)

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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gen", type=int, default=128)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--variants", default=None)
    ap.add_argument("--compile_retries", type=int, default=2)
    ap.add_argument("--quantize", action="store_true",
                    help="weight-only-int8 params; A/B the q8 fusion ladder")
    ap.add_argument("--dim", type=int, default=2048)
    ap.add_argument("--layers", type=int, default=16)
    ap.add_argument("--heads", type=int, default=16)
    ap.add_argument("--vocab", type=int, default=0,
                    help="0 = byte vocab (258); e.g. 32000 for the 7B shape")
    args = ap.parse_args()
    if args.variants is None:
        args.variants = (
            "qbase,+ffnq8,+denseq8,+allq8" if args.quantize
            else "baseline,+ffn,+wo,+both,+layer,+cacheupd"
        )

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
        multiple_of=256, norm_eps=1e-5, max_batch_size=args.batch, max_seq_len=512,
    )
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    if args.quantize:
        params = init_params_quantized(cfg, jax.random.PRNGKey(0), fused=True)
    else:
        params = fuse_projections(init_params(cfg, jax.random.PRNGKey(0), dtype=dtype))
    rope = precompute_rope(cfg)
    tokens = jnp.asarray(np.arange(args.batch) % 200 + 4, jnp.int32)
    sync = jax.jit(lambda t: jnp.sum(t))

    outs = {}
    for name in args.variants.split(","):
        env = VARIANTS[name]
        for gate in _GATES:
            os.environ[gate] = env.get(gate, "0")
        # the tunnel's remote-compile endpoint drops long compiles in bad
        # weather (broken pipe after tens of minutes) — retry per variant
        out = None
        for attempt in range(args.compile_retries):
            fn = make_runner(cfg)
            t0 = time.perf_counter()
            try:
                out = fn(params, rope, tokens, args.gen)
                float(sync(out))
                break
            except Exception as e:  # noqa: BLE001 — report and retry/continue
                print(
                    f"[{name:9s}] attempt {attempt + 1} FAILED after "
                    f"{time.perf_counter()-t0:.0f}s: {type(e).__name__}: "
                    f"{str(e)[:120]}",
                    flush=True,
                )
                out = None
        if out is None:
            continue
        print(f"[{name:9s}] compiled+first {time.perf_counter()-t0:.1f}s", flush=True)
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out = fn(params, rope, tokens, args.gen)
        float(sync(out))
        ms = (time.perf_counter() - t0) / args.reps / args.gen * 1e3
        outs[name] = np.asarray(out)
        print(f"[{name:9s}] {ms:6.3f} ms/step", flush=True)

    names = list(outs)
    same = all(np.array_equal(outs[names[0]], outs[n]) for n in names[1:])
    print(f"greedy tokens identical across {names}: {same}")
    if not same:
        # With random weights, near-tie logits make a single argmax flip
        # under any bf16 reduction reorder — after which greedy sequences
        # diverge permanently.  The informative stat is the per-row
        # first-divergence step, not the bare mismatch.
        base = outs[names[0]]
        for n in names[1:]:
            d = outs[n] != base
            firsts = [int(np.argmax(r)) if r.any() else -1 for r in d]
            print(f"  [{n:9s}] first-divergence step per row "
                  f"(-1 = identical): {firsts}")


if __name__ == "__main__":
    main()
