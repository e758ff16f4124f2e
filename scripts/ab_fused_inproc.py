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

VARIANTS = {
    # (PREGO_FUSED_FFN, PREGO_FUSED_ATTN_WO, PREGO_FUSED_LAYER,
    #  PREGO_FUSED_CACHE_UPD)
    "baseline": ("0", "0", "0", "0"),
    "+ffn": ("1", "0", "0", "0"),
    "+wo": ("0", "1", "0", "0"),
    "+both": ("1", "1", "0", "0"),
    "+layer": ("1", "1", "1", "0"),  # norm prologue + residual epilogues
    "+cacheupd": ("1", "1", "1", "1"),  # cache write in-kernel too
}


def make_runner(cfg, params, rope):
    """Fresh closure per call so each variant traces under its own env."""
    from prego_tpu.models.llama.model import forward, init_cache

    def run(tokens, gen_len):
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

    return jax.jit(run, static_argnums=(1,))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gen", type=int, default=128)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--variants", default="baseline,+ffn,+wo,+both,+layer,+cacheupd")
    ap.add_argument("--compile_retries", type=int, default=2)
    args = ap.parse_args()

    from prego_tpu.models.llama import ByteTokenizer, LlamaConfig, init_params
    from prego_tpu.models.llama.model import fuse_projections, precompute_rope

    tok = ByteTokenizer()
    cfg = LlamaConfig(
        dim=2048, n_layers=16, n_heads=16, n_kv_heads=16, vocab_size=tok.n_words,
        multiple_of=256, norm_eps=1e-5, max_batch_size=args.batch, max_seq_len=512,
    )
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    params = fuse_projections(init_params(cfg, jax.random.PRNGKey(0), dtype=dtype))
    rope = precompute_rope(cfg)
    tokens = jnp.asarray(np.arange(args.batch) % 200 + 4, jnp.int32)
    sync = jax.jit(lambda t: jnp.sum(t))

    outs = {}
    for name in args.variants.split(","):
        ffn, wo, lyr, upd = VARIANTS[name]
        os.environ["PREGO_FUSED_FFN"] = ffn
        os.environ["PREGO_FUSED_ATTN_WO"] = wo
        os.environ["PREGO_FUSED_LAYER"] = lyr
        os.environ["PREGO_FUSED_CACHE_UPD"] = upd
        # the tunnel's remote-compile endpoint drops long compiles in bad
        # weather (broken pipe after tens of minutes) — retry per variant
        out = None
        for attempt in range(args.compile_retries):
            fn = make_runner(cfg, params, rope)
            t0 = time.perf_counter()
            try:
                out = fn(tokens, args.gen)
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
            out = fn(tokens, args.gen)
        float(sync(out))
        ms = (time.perf_counter() - t0) / args.reps / args.gen * 1e3
        outs[name] = np.asarray(out)
        print(f"[{name:9s}] {ms:6.3f} ms/step", flush=True)

    names = list(outs)
    same = all(np.array_equal(outs[names[0]], outs[n]) for n in names[1:])
    print(f"greedy tokens identical across {names}: {same}")


if __name__ == "__main__":
    main()
