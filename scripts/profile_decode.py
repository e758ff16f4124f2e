"""Structural profile of the B=8 bf16 decode step (VERDICT r2 #4).

jax.profiler device traces are unavailable over the tunneled axon
platform, so this attributes the per-step cost BY CONSTRUCTION: each
variant is a jitted 16-layer loop body with one op class removed (or
isolated), timed with the scalar-checksum sync.  The difference between
the full step and the sum of its parts is the inter-op scheduling
residue the mega-kernel would have to reclaim.

Variants (all iterate the same 16-layer x gen_len structure):
  full          — the real decode step (matmuls + attention + pointwise)
  matmuls_only  — just the 4 weight matmuls per layer (the HBM floor in
                  executable form: every weight byte still streams)
  no_attention  — full minus the flash-decode kernel (cache update kept)
  attention_only— flash kernel + cache update alone

Run: python scripts/profile_decode.py [--gen 128] [--batch 8]
     python scripts/profile_decode.py --shape 7b --quantize [--kv_quant]
       (the reference serving shapes: vocab 32000, int8 weights built
       directly via init_params_quantized — bf16 7B does not fit the
       chip; the printed floor is the int8 weight-stream bound)
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def build(cfg, mode: str, kv_quant: bool = False):
    # params/rope are jit ARGUMENTS — closing over them would bake the
    # full weight set into the trace as captured constants (1.7 GB at
    # the 1B shape), which the remote compile helper must ingest.
    from prego_tpu.models.llama.model import (
        _attention, _dense, _feed_forward, init_cache, rms_norm,
    )

    def step_layer(layer, h, cache_k, cache_v, pos, cos, sin):
        if mode == "matmuls_only":
            # same four weight reads, no attention/norm/rope
            a, f = layer["attention"], layer["feed_forward"]
            x = _dense(h, a["wqkv"]).astype(h.dtype)[..., : h.shape[-1]]
            x = _dense(x, a["wo"]).astype(h.dtype)
            g = _dense(x, f["w13"]).astype(h.dtype)
            F = g.shape[-1] // 2
            x = _dense(g[..., :F], f["w2"]).astype(h.dtype)
            return x, cache_k, cache_v
        if mode == "attention_only":
            attn, ck, cv = _attention(
                layer["attention"], h, pos, cos, sin, cache_k, cache_v, cfg
            )
            return attn, ck, cv
        if mode == "no_attention":
            a = layer["attention"]
            x = rms_norm(h, layer["attention_norm"], cfg.norm_eps)
            x = _dense(x, a["wqkv"]).astype(h.dtype)[..., : h.shape[-1]]
            x = _dense(x, a["wo"]).astype(h.dtype)
            h = h + x
            h = h + _feed_forward(
                layer["feed_forward"], rms_norm(h, layer["ffn_norm"], cfg.norm_eps)
            )
            return h, cache_k, cache_v
        # full
        attn, ck, cv = _attention(
            layer["attention"],
            rms_norm(h, layer["attention_norm"], cfg.norm_eps),
            pos, cos, sin, cache_k, cache_v, cfg,
        )
        h = h + attn
        h = h + _feed_forward(
            layer["feed_forward"], rms_norm(h, layer["ffn_norm"], cfg.norm_eps)
        )
        return h, ck, cv

    def run(params, rope, tokens, gen_len):
        B = tokens.shape[0]
        cache = init_cache(cfg, B, dtype=params["norm"].dtype, quantized=kv_quant)
        cos_full, sin_full = rope

        def body(i, carry):
            tok, cache = carry
            h = jnp.take(params["tok_embeddings"], tok, axis=0)[:, None, :]
            cos = jax.lax.dynamic_slice_in_dim(cos_full, i, 1, axis=0)
            sin = jax.lax.dynamic_slice_in_dim(sin_full, i, 1, axis=0)
            new_k, new_v = list(cache["k"]), list(cache["v"])
            for li, layer in enumerate(params["layers"]):
                h, new_k[li], new_v[li] = step_layer(
                    layer, h, new_k[li], new_v[li], i, cos, sin
                )
            h = rms_norm(h, params["norm"], cfg.norm_eps)
            logits = _dense(h, params["output"])
            nxt = jnp.argmax(logits[:, 0], axis=-1).astype(jnp.int32)
            return (nxt, {"k": new_k, "v": new_v})

        tok, cache = jax.lax.fori_loop(0, gen_len, body, (tokens, cache))
        return tok

    return jax.jit(run, static_argnums=(3,))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gen", type=int, default=128)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument(
        "--modes", type=str,
        default="full,matmuls_only,no_attention,attention_only",
        help="comma-separated subset (each variant costs a slow remote compile)",
    )
    ap.add_argument(
        "--shape", choices=("1b", "7b", "13b", "tiny"), default="1b",
        help="1b = the byte-vocab A/B shape; 7b/13b = the reference "
        "serving shapes (vocab 32000, require --quantize to fit the chip)",
    )
    ap.add_argument("--quantize", action="store_true",
                    help="weight-only int8 (init_params_quantized)")
    ap.add_argument("--kv_quant", action="store_true", help="int8 KV cache")
    args = ap.parse_args()

    from prego_tpu.models.llama import ByteTokenizer, LlamaConfig, init_params
    from prego_tpu.models.llama.model import (
        fuse_projections, init_params_quantized, precompute_rope,
    )

    shapes = {
        # 1b keeps the byte vocab + max_seq 512 of the r2/r3 A/B runs
        "1b": dict(dim=2048, n_layers=16, n_heads=16,
                   vocab_size=ByteTokenizer().n_words, max_seq=512),
        # the reference's served sizes (bench_llm._REF_SHAPES), vocab
        # 32000 so the lm-head read is in every variant, max_seq 256
        "7b": dict(dim=4096, n_layers=32, n_heads=32,
                   vocab_size=32000, max_seq=256),
        "13b": dict(dim=5120, n_layers=40, n_heads=40,
                    vocab_size=32000, max_seq=256),
        "tiny": dict(dim=256, n_layers=2, n_heads=4,
                     vocab_size=512, max_seq=64),  # CPU smoke
    }
    s = shapes[args.shape]
    cfg = LlamaConfig(
        dim=s["dim"], n_layers=s["n_layers"], n_heads=s["n_heads"],
        n_kv_heads=s["n_heads"], vocab_size=s["vocab_size"],
        multiple_of=256, norm_eps=1e-5, max_batch_size=args.batch,
        max_seq_len=s["max_seq"],
    )
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    if args.quantize:
        params = init_params_quantized(cfg, jax.random.PRNGKey(0), fused=True)
    else:
        if args.shape in ("7b", "13b") and jax.default_backend() == "tpu":
            sys.exit("bf16 7b/13b does not fit one v5e — pass --quantize")
        params = fuse_projections(
            init_params(cfg, jax.random.PRNGKey(0), dtype=dtype)
        )
    rope = precompute_rope(cfg)
    tokens = jnp.asarray(
        np.arange(args.batch) % min(200, cfg.vocab_size - 5) + 4, jnp.int32
    )

    sync = jax.jit(lambda t: jnp.sum(t))
    results = {}
    for mode in args.modes.split(","):
        fn = build(cfg, mode, kv_quant=args.kv_quant)
        t0 = time.perf_counter()
        out = fn(params, rope, tokens, args.gen)
        float(sync(out))
        print(f"[{mode}] compiled+first in {time.perf_counter()-t0:.1f}s", flush=True)
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out = fn(params, rope, tokens, args.gen)
        float(sync(out))
        dt = (time.perf_counter() - t0) / args.reps
        ms = dt / args.gen * 1e3
        results[mode] = ms
        print(f"[{mode:14s}] {ms:6.3f} ms/step", flush=True)

    if {"full", "matmuls_only", "no_attention"} <= set(results):
        full, mm, noat = (
            results["full"], results["matmuls_only"], results["no_attention"]
        )
        print(f"  attention marginal (full - no_attention): {full - noat:.3f} ms")
        print(f"  pointwise+sched   (no_attention - matmuls_only): {noat - mm:.3f} ms")
        print(f"  matmul (HBM) core : {mm:.3f} ms")
    if args.quantize:
        D, F, V, L = cfg.dim, cfg.ffn_hidden, cfg.vocab_size, cfg.n_layers
        stream_gb = (D * V + L * (D * 3 * D + D * D + D * 2 * F + F * D)) / 1e9
        print(f"  int8 weight-stream floor: {stream_gb / 0.819:.3f} ms"
              f" ({stream_gb:.2f} GB @ 819 GB/s)")


if __name__ == "__main__":
    main()
