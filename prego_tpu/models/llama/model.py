"""TPU-native LLaMA decoder in functional JAX.

Parity surface: the vendored Meta reference decoder
(step_anticipation/llama/model.py:19-487): RMSNorm, rotary embeddings
(complex-multiply form — here the equivalent real paired rotation), grouped
-query attention with repeat_kv, SwiGLU FFN, final norm + output head.

TPU-first design decisions:
  * functional params + functional KV cache — no in-place CUDA buffers
    (model.py:237-252); the cache is a pytree of per-layer head-major
    (B, KV, T, hd) leaves threaded through jit, updated with
    lax.dynamic_update_slice and aliased in place by the decode while_loop;
  * prefill attention scores against the full max_seq_len cache with a
    position mask — static shapes so XLA compiles one kernel
    (model.py:283-290 slices dynamically); single-token decode runs the
    fused streaming-softmax kernel (ops/decode_attention.py);
  * tensor parallelism is sharding metadata, not module classes: wq/wk/wv/
    w1/w3 are column-sharded, wo/w2 row-sharded, exactly the fairscale
    Column/RowParallelLinear layout (model.py:202-235,338-346), with XLA
    inserting the all-reduces over ICI;
  * bf16 parameters/activations with f32 softmax, norms and logits
    (the reference runs fp16 with f32 norm upcasts, model.py:75-77);
    optional weight-only int8 serving (quantize_params + ops/quant.py).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from prego_tpu.models.llama.config import LlamaConfig

Params = Dict[str, Any]
Cache = Dict[str, List[jax.Array]]  # {"k": [per-layer], "v": [per-layer]}


# ---- initialization ----

def init_params(
    config: LlamaConfig, key: jax.Array, dtype=jnp.bfloat16
) -> Params:
    """Random init (normal/scaled); real weights come from the converter."""
    D, V, F = config.dim, config.vocab_size, config.ffn_hidden
    H, KV, hd = config.n_heads, config.kv_heads, config.head_dim
    n = config.n_layers
    keys = iter(jax.random.split(key, 4 + 7 * n))

    def dense(k, d_in, d_out):
        scale = 1.0 / jnp.sqrt(jnp.asarray(d_in, jnp.float32))
        return (jax.random.normal(k, (d_in, d_out), jnp.float32) * scale).astype(dtype)

    layers = []
    for _ in range(n):
        layers.append(
            {
                "attention": {
                    "wq": dense(next(keys), D, H * hd),
                    "wk": dense(next(keys), D, KV * hd),
                    "wv": dense(next(keys), D, KV * hd),
                    "wo": dense(next(keys), H * hd, D),
                },
                "feed_forward": {
                    "w1": dense(next(keys), D, F),
                    "w2": dense(next(keys), F, D),
                    "w3": dense(next(keys), D, F),
                },
                "attention_norm": jnp.ones((D,), dtype),
                "ffn_norm": jnp.ones((D,), dtype),
            }
        )
    return {
        "tok_embeddings": dense(next(keys), V, D),
        "layers": layers,
        "norm": jnp.ones((D,), dtype),
        "output": dense(next(keys), D, V),
    }


def init_params_quantized(
    config: LlamaConfig, key: jax.Array, fused: bool = True,
    dtype=jnp.bfloat16, activations: bool = False,
) -> Params:
    """Fabricated weight-only-int8 params built DIRECTLY as int8 + scales.

    7B bf16 (13.5 GB) cannot be materialized then quantized on a 16 GB
    v5e — quantize_params(init_params(...)) would need both copies live.
    This constructor emits each projection as {"q": int8, "s": f32 (1,N)}
    straight from the RNG (values uniform in [-127, 127], scales set so
    the effective weights match init_params' 1/sqrt(d_in) magnitude), so
    peak memory is the int8 footprint (~6.7 GB at 7B).  For benchmarking
    and capacity planning only; real weights come from the checkpoint
    converter + quantize_params.  Layout matches
    fuse_projections(quantize_params(...)) when fused=True (the
    single-chip serving layout)."""
    D, V, F = config.dim, config.vocab_size, config.ffn_hidden
    H, KV, hd = config.n_heads, config.kv_heads, config.head_dim
    n = config.n_layers
    keys = iter(jax.random.split(key, 4 + 7 * n))

    def qdense(k, d_in, d_out):
        q = jax.random.randint(k, (d_in, d_out), -127, 128, jnp.int8)
        # int8 uniform has rms ~73.3; scale so q*s has rms 1/sqrt(d_in)
        s = jnp.full((1, d_out), 1.0 / (73.3 * jnp.sqrt(float(d_in))), jnp.float32)
        out = {"q": q, "s": s}
        if activations:  # int8 x int8 MXU path (see quantize_params)
            out["act"] = ()
        return out

    def dense(k, d_in, d_out):
        scale = 1.0 / jnp.sqrt(jnp.asarray(d_in, jnp.float32))
        return (jax.random.normal(k, (d_in, d_out), jnp.float32) * scale).astype(dtype)

    layers = []
    for _ in range(n):
        if fused:
            attention = {
                "wqkv": qdense(next(keys), D, (H + 2 * KV) * hd),
                "wo": qdense(next(keys), H * hd, D),
            }
            ff = {
                "w13": qdense(next(keys), D, 2 * F),
                "w2": qdense(next(keys), F, D),
            }
            for _ in range(3):  # keep the key schedule aligned with init_params
                next(keys)
        else:
            attention = {
                "wq": qdense(next(keys), D, H * hd),
                "wk": qdense(next(keys), D, KV * hd),
                "wv": qdense(next(keys), D, KV * hd),
                "wo": qdense(next(keys), H * hd, D),
            }
            ff = {
                "w1": qdense(next(keys), D, F),
                "w2": qdense(next(keys), F, D),
                "w3": qdense(next(keys), D, F),
            }
        layers.append(
            {
                "attention": attention,
                "feed_forward": ff,
                "attention_norm": jnp.ones((D,), dtype),
                "ffn_norm": jnp.ones((D,), dtype),
            }
        )
    return {
        "tok_embeddings": dense(next(keys), V, D),
        "layers": layers,
        "norm": jnp.ones((D,), dtype),
        "output": qdense(next(keys), D, V),
    }


def init_cache(
    config: LlamaConfig, batch: int, dtype=jnp.bfloat16, quantized: bool = False
) -> Cache:
    """Per-layer K/V arrays kept as SEPARATE pytree leaves: a stacked
    (L, ...) cache forces a materializing slice per layer per decode step
    (profiled at ~2k copy ops per short generation); separate leaves let
    the while_loop alias every update in place. Layout is head-major
    (B, KV, T, hd) so the flash-decode kernel can index heads on untiled
    leading dims.

    ``quantized=True`` stores each leaf as int8 values + per-position-
    per-head f32 scales ({"q": (B, KV, T, hd) int8, "s": (B, KV, T) f32}):
    half the decode HBM cache traffic, double the context capacity."""
    shape = (batch, config.kv_heads, config.max_seq_len, config.head_dim)
    if quantized:
        def leaf():
            return {
                "q": jnp.zeros(shape, jnp.int8),
                "s": jnp.zeros(shape[:3], jnp.float32),
            }

        return {
            "k": [leaf() for _ in range(config.n_layers)],
            "v": [leaf() for _ in range(config.n_layers)],
        }
    return {
        "k": [jnp.zeros(shape, dtype) for _ in range(config.n_layers)],
        "v": [jnp.zeros(shape, dtype) for _ in range(config.n_layers)],
    }


def _kv_quantize(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(B, KV, S, hd) -> (int8 values, (B, KV, S) f32 symmetric scales)."""
    xf = x.astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1), 1e-8) / 127.0
    q = jnp.round(xf / s[..., None]).astype(jnp.int8)
    return q, s


def _kv_dequant(leaf: Dict[str, jax.Array], dtype) -> jax.Array:
    """Dequantize an int8 cache leaf for the (prefill) einsum path; XLA
    fuses the multiply into the consumer so only int8 bytes stream."""
    return (leaf["q"].astype(jnp.float32) * leaf["s"][..., None]).astype(dtype)


# ---- building blocks ----

def quantize_params(params: Params, activations: bool = False) -> Params:
    """Weight-only int8 for all dense projections (embeddings/norms stay
    bf16). Quantized leaves are {"q": int8 (K, N), "s": f32 (1, N)} and are
    consumed transparently by the forward (see _dense). With
    activations=True the forward additionally quantizes each projection's
    input per-token so the matmuls run int8 x int8 -> int32 on the MXU
    (leaf gains "act": True)."""
    from prego_tpu.ops.quant import quantize_weight

    def quant(leaf):
        q, s = quantize_weight(leaf)
        out = {"q": q, "s": s}
        if activations:
            # structural marker, not a leaf: an empty tuple adds no pytree
            # leaves, so it is never traced under jit nor touched by tree maps
            out["act"] = ()
        return out

    out = {
        "tok_embeddings": params["tok_embeddings"],
        "norm": params["norm"],
        "output": quant(params["output"]),
        "layers": [],
    }
    for layer in params["layers"]:
        out["layers"].append(
            {
                "attention": {k: quant(v) for k, v in layer["attention"].items()},
                "feed_forward": {k: quant(v) for k, v in layer["feed_forward"].items()},
                "attention_norm": layer["attention_norm"],
                "ffn_norm": layer["ffn_norm"],
            }
        )
    return out


def fuse_projections(params: Params) -> Params:
    """Serving-time transform: concatenate wq|wk|wv -> wqkv and w1|w3 -> w13
    so each decode layer issues one projection matmul instead of three/two
    (fewer kernel launches; same bytes). Single-chip layout — the fairscale
    TP sharding rules apply to the UNfused leaves, so fuse only when not
    tensor-parallel. Composes with quantize_params (fuse first)."""
    out = {
        "tok_embeddings": params["tok_embeddings"],
        "norm": params["norm"],
        "output": params["output"],
        "layers": [],
    }
    for layer in params["layers"]:
        a, f = layer["attention"], layer["feed_forward"]
        out["layers"].append(
            {
                "attention": {
                    "wqkv": jnp.concatenate([a["wq"], a["wk"], a["wv"]], axis=1),
                    "wo": a["wo"],
                },
                "feed_forward": {
                    "w13": jnp.concatenate([f["w1"], f["w3"]], axis=1),
                    "w2": f["w2"],
                },
                "attention_norm": layer["attention_norm"],
                "ffn_norm": layer["ffn_norm"],
            }
        )
    return out


def mark_xla_dense(params: Params) -> Params:
    """Tag every int8 {"q","s"} leaf with the structural marker "xla": ()
    so _dense routes it through the XLA dequant-fused matmul instead of
    the Pallas kernel.  Used for tensor-parallel serving: a pallas_call
    is a custom call XLA's SPMD partitioner cannot split, while the jnp
    reference path partitions cleanly (dequant fuses into the sharded
    dot).  The empty tuple adds no pytree leaves (same trick as the
    "act" marker), so jit tracing and tree maps are unaffected."""

    def tag(leaf):
        if isinstance(leaf, dict) and "q" in leaf and "xla" not in leaf:
            return {**leaf, "xla": ()}
        return leaf

    def walk(node):
        if isinstance(node, dict) and "q" in node:
            return tag(node)
        if isinstance(node, dict):
            return {k: walk(v) for k, v in node.items()}
        if isinstance(node, list):
            return [walk(v) for v in node]
        return node

    return walk(params)


_Q8_DENSE_WARNED = False


def _q8_dense_backend(shape=None) -> str:
    """Backend for int8 dense projections on TPU: the dequantizing
    Pallas matmul ("pallas") or the dequant-fused jnp.dot the
    tensor-parallel path uses ("xla").  PREGO_Q8_DENSE forces either;
    an unparsable value warns once and falls through to the shape
    default (the ADVICE-r3 pattern — a typo must not silently change
    behavior).  Shape default: "xla" when the projection's min dim is
    >= 4096 — the measured regime (r4d/r4e A/B/A on chip: 7B b1 9.93 vs
    10.32/10.52, 7B b8+kv8 11.70 vs 12.22/12.26, 13B b1 19.59 vs 20.05;
    the 1B shapes measured flat-to-worse, and XLA does NOT hoist a bf16
    weight copy out of the decode loop at 7B — it fits and runs).  The
    ~129 per-pallas-call launches/step (~10 µs each) were the b8
    matmul-core gap RESULTS.md pinned; one fused XLA module has none."""
    import os
    import sys

    env = os.environ.get("PREGO_Q8_DENSE")
    if env in ("xla", "pallas"):
        return env
    if env:
        global _Q8_DENSE_WARNED
        if not _Q8_DENSE_WARNED:
            _Q8_DENSE_WARNED = True
            print(
                f"prego_tpu: ignoring unparsable PREGO_Q8_DENSE={env!r} "
                "(expected 'xla' or 'pallas'); using the shape default",
                file=sys.stderr,
            )
    if shape is not None and min(shape) >= 4096:
        return "xla"
    return "pallas"


def _dense(x: jax.Array, leaf) -> jax.Array:
    """Dense projection dispatch: plain arrays use jnp.dot; int8-quantized
    {"q","s"} leaves stream through the dequantizing Pallas matmul on TPU
    (XLA dequant fallback elsewhere, whenever the leaf carries the
    "xla" marker — tensor-parallel serving, see mark_xla_dense — and
    under PREGO_Q8_DENSE=xla, see _q8_dense_backend).
    Returns f32."""
    if isinstance(leaf, dict) and "q" in leaf:
        from prego_tpu.ops.quant import (
            int8_matmul,
            int8_matmul_reference,
            int8xint8_matmul,
            int8xint8_matmul_reference,
            quantize_activations,
        )

        lead = x.shape[:-1]
        x2 = x.reshape(-1, x.shape[-1])
        # both layouts take the shape-aware backend default (xla at
        # min-dim >= 4096): the act path's int32-dot XLA route measured
        # 7B b8 12.93 -> 11.80 (r4h) and b1 10.09 -> 9.95 (chipq_r5a)
        backend = _q8_dense_backend(leaf["q"].shape)
        on_tpu = (
            jax.default_backend() == "tpu"
            and "xla" not in leaf
            and backend != "xla"
        )
        if "act" in leaf:  # int8 x int8 -> int32 MXU path
            xq, xs = quantize_activations(x2)
            if on_tpu:
                y = int8xint8_matmul(xq, xs, leaf["q"], leaf["s"])
            else:
                y = int8xint8_matmul_reference(xq, xs, leaf["q"], leaf["s"])
        elif on_tpu:
            y = int8_matmul(x2, leaf["q"], leaf["s"])
        else:
            y = int8_matmul_reference(x2, leaf["q"], leaf["s"])
        return y.reshape(*lead, -1)
    return jnp.dot(x, leaf, preferred_element_type=jnp.float32)


def rms_norm(x: jax.Array, weight: jax.Array, eps: float) -> jax.Array:
    xf = x.astype(jnp.float32)
    normed = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return (normed.astype(x.dtype)) * weight


def precompute_rope(config: LlamaConfig) -> Tuple[jax.Array, jax.Array]:
    """cos/sin tables, shape (2*max_seq_len, head_dim//2) like the reference's
    freqs_cis precomputed at 2x max_seq_len (model.py:450-456)."""
    hd = config.head_dim
    inv_freq = 1.0 / (
        config.rope_theta ** (jnp.arange(0, hd, 2, dtype=jnp.float32) / hd)
    )
    t = jnp.arange(2 * config.max_seq_len, dtype=jnp.float32)
    freqs = jnp.outer(t, inv_freq)  # (T, hd/2)
    return jnp.cos(freqs), jnp.sin(freqs)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Rotate adjacent pairs: equivalent to the reference's complex multiply
    (model.py:132-165). x: (B, S, H, hd); cos/sin: (S, hd/2)."""
    B, S, H, hd = x.shape
    xf = x.astype(jnp.float32).reshape(B, S, H, hd // 2, 2)
    x0, x1 = xf[..., 0], xf[..., 1]
    if cos.ndim == 3:  # per-row tables (B, S, hd/2) — continuous batching
        c = cos[:, :, None, :]
        s = sin[:, :, None, :]
    else:
        c = cos[None, :, None, :]
        s = sin[None, :, None, :]
    out0 = x0 * c - x1 * s
    out1 = x0 * s + x1 * c
    return jnp.stack([out0, out1], axis=-1).reshape(B, S, H, hd).astype(x.dtype)


def _attention(
    layer_params: Params,
    x: jax.Array,
    start_pos: jax.Array,
    cos: jax.Array,
    sin: jax.Array,
    cache_k: jax.Array,  # (B, KV, T, hd) — THIS layer's cache leaf
    cache_v: jax.Array,
    config: LlamaConfig,
    use_flash_decode: bool = True,
    residual: Optional[jax.Array] = None,  # (B, S, D) pre-norm stream
    norm_weight: Optional[jax.Array] = None,  # (D,) attention_norm weight
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """With ``residual`` the returned activation is the POST-residual
    stream ``residual + attn_out`` (the add fused into the wo-projection
    kernel epilogue on the eligible decode path, plain XLA elsewhere);
    without it, the bare attention output (legacy contract).

    With ``norm_weight``, ``x`` is the PRE-norm residual stream and the
    attention rms_norm happens here — fused into the int8 qkv projection
    kernel on the eligible decode path (ops/fused_dense.py), plain
    rms_norm otherwise."""
    B, S, D = x.shape
    H, KV, hd = config.n_heads, config.kv_heads, config.head_dim
    p = layer_params

    xqkv = None
    if norm_weight is not None:
        if (
            S == 1
            and "wqkv" in p
            and isinstance(p["wqkv"], dict)
            and "q" in p["wqkv"]
            and "act" not in p["wqkv"]  # weight-only int8
            and "xla" not in p["wqkv"]  # not tensor-parallel
            and _fused_dense_q8_supported()
        ):
            # rms_norm prologue fused into the int8 qkv projection
            from prego_tpu.ops.fused_dense import fused_dense_q8

            xqkv = fused_dense_q8(
                x.reshape(B * S, D),
                p["wqkv"]["q"],
                p["wqkv"]["s"],
                norm_weight=norm_weight,
                eps=config.norm_eps,
                out_dtype=x.dtype,
            ).reshape(B, S, -1)
        else:
            x = rms_norm(x, norm_weight, config.norm_eps)

    if xqkv is not None or "wqkv" in p:  # fused serving layout
        if xqkv is None:
            xqkv = _dense(x, p["wqkv"]).astype(x.dtype)
        xq = xqkv[..., : H * hd]
        xk = xqkv[..., H * hd : (H + KV) * hd]
        xv = xqkv[..., (H + KV) * hd :]
    else:
        xq = _dense(x, p["wq"]).astype(x.dtype)
        xk = _dense(x, p["wk"]).astype(x.dtype)
        xv = _dense(x, p["wv"]).astype(x.dtype)
    xq = xq.reshape(B, S, H, hd)
    xk = xk.reshape(B, S, KV, hd)
    xv = xv.reshape(B, S, KV, hd)

    xq = apply_rope(xq, cos, sin)
    xk = apply_rope(xk, cos, sin)

    # functional cache update at [:, :, start_pos:start_pos+S] of the
    # layer's own head-major (B, KV, T, hd) leaf — aliasable in place by
    # the while_loop carry. int8 leaves ({"q","s"}) quantize the new
    # tokens per position per head on the way in.  Per-row start_pos
    # ((B,) — continuous batching) scatters each row at its own offset;
    # the bounded decode kernels take (B,) valid bounds directly (the
    # wo-fused variants stay scalar-only and are skipped per-row).
    per_row = jnp.ndim(start_pos) == 1
    kv_quant = isinstance(cache_k, dict)
    k_upd = jnp.swapaxes(xk, 1, 2)
    v_upd = jnp.swapaxes(xv, 1, 2)
    if (
        not per_row
        and not kv_quant
        and S == 1
        and use_flash_decode
        and _flash_decode_supported(config)
        and residual is not None
        and not isinstance(p["wo"], dict)
        and p["wo"].size <= 4_500_000
        and _fused_attn_wo_supported()
        and _fused_layer_supported()
        and _fused_cache_upd_supported()
    ):
        # whole attention tail in one program: cache write + bounded walk
        # + wo + residual (ops/decode_attention.py); the XLA
        # dynamic_update_slice boundaries disappear, caches are donated
        from prego_tpu.ops.decode_attention import (
            decode_attention_bounded_wo_res_upd,
        )

        q = xq.reshape(B, S, KV, H // KV, hd)
        h_next, cache_k, cache_v = decode_attention_bounded_wo_res_upd(
            q[:, 0],
            residual,
            k_upd.astype(cache_k.dtype),
            v_upd.astype(cache_v.dtype),
            cache_k,
            cache_v,
            start_pos,
            p["wo"],
        )
        return h_next, cache_k, cache_v
    if per_row:
        # per-row scatter: each batch row lands at its own offset
        row_upd3 = jax.vmap(
            lambda c, u, p: jax.lax.dynamic_update_slice(c, u, (0, p, 0))
        )
        row_upd2 = jax.vmap(
            lambda c, u, p: jax.lax.dynamic_update_slice(c, u, (0, p))
        )
        if kv_quant:
            kq, ks = _kv_quantize(k_upd)
            vq, vs = _kv_quantize(v_upd)
            cache_k = {
                "q": row_upd3(cache_k["q"], kq, start_pos),
                "s": row_upd2(cache_k["s"], ks, start_pos),
            }
            cache_v = {
                "q": row_upd3(cache_v["q"], vq, start_pos),
                "s": row_upd2(cache_v["s"], vs, start_pos),
            }
            T = cache_k["q"].shape[2]
        else:
            cache_k = row_upd3(cache_k, k_upd.astype(cache_k.dtype), start_pos)
            cache_v = row_upd3(cache_v, v_upd.astype(cache_v.dtype), start_pos)
            T = cache_k.shape[2]
    elif kv_quant:
        kq, ks = _kv_quantize(k_upd)
        vq, vs = _kv_quantize(v_upd)
        cache_k = {
            "q": jax.lax.dynamic_update_slice(cache_k["q"], kq, (0, 0, start_pos, 0)),
            "s": jax.lax.dynamic_update_slice(cache_k["s"], ks, (0, 0, start_pos)),
        }
        cache_v = {
            "q": jax.lax.dynamic_update_slice(cache_v["q"], vq, (0, 0, start_pos, 0)),
            "s": jax.lax.dynamic_update_slice(cache_v["s"], vs, (0, 0, start_pos)),
        }
        T = cache_k["q"].shape[2]
    else:
        cache_k = jax.lax.dynamic_update_slice(
            cache_k, k_upd.astype(cache_k.dtype), (0, 0, start_pos, 0)
        )
        cache_v = jax.lax.dynamic_update_slice(
            cache_v, v_upd.astype(cache_v.dtype), (0, 0, start_pos, 0)
        )
        T = cache_k.shape[2]

    q = xq.reshape(B, S, KV, H // KV, hd)

    if S == 1 and use_flash_decode and _flash_decode_supported(config):
        # single-token decode: fused streaming-softmax Pallas kernel
        # (ops/decode_attention.py) — XLA lowers this contraction to a slow
        # VPU multiply-reduce (~5x off the K/V bandwidth floor)
        if kv_quant:
            from prego_tpu.ops.decode_attention import decode_attention_bounded_q8

            out = decode_attention_bounded_q8(
                q[:, 0], cache_k["q"], cache_k["s"],
                cache_v["q"], cache_v["s"], start_pos + 1,
                fold_batch=_fold_batch_requested(B, config),
                head_group=_head_group_requested(B, config),
            )
        elif (
            not per_row  # the wo-fused kernels keep scalar valid bounds
            and not isinstance(p["wo"], dict)  # bf16 leaf (not int8)
            and p["wo"].size <= 4_500_000  # wo must fit VMEM beside k/v bufs
            and _fused_attn_wo_supported()
        ):
            # wo projection fused into the kernel epilogue: one program
            # covers attention + output projection (ops/decode_attention.py)
            from prego_tpu.ops.decode_attention import decode_attention_bounded_wo

            if residual is not None and _fused_layer_supported():
                # residual add absorbed too: kernel returns the new h
                h_next = decode_attention_bounded_wo(
                    q[:, 0], cache_k, cache_v, start_pos + 1, p["wo"],
                    residual=residual,
                )  # (B, 1, D) residual.dtype — residual + attn @ wo
                return h_next, cache_k, cache_v
            proj = decode_attention_bounded_wo(
                q[:, 0], cache_k, cache_v, start_pos + 1, p["wo"]
            )  # (B, 1, D) f32 — already projected
            out = proj.astype(x.dtype)
            if residual is not None:
                out = residual + out
            return out, cache_k, cache_v
        else:
            from prego_tpu.ops.decode_attention import decode_attention_bounded

            out = decode_attention_bounded(
                q[:, 0], cache_k, cache_v, start_pos + 1,
                fold_batch=_fold_batch_requested(B, config),
                head_group=_head_group_requested(B, config),
            )  # (B, KV, R, hd); HBM reads stop at the valid cache length
        out = out.reshape(B, 1, H * hd).astype(x.dtype)
    else:
        # GQA against the full cache with a causal+validity mask
        # (static shapes; see module docstring)
        k_full = _kv_dequant(cache_k, x.dtype) if kv_quant else cache_k
        v_full = _kv_dequant(cache_v, x.dtype) if kv_quant else cache_v
        scores = jnp.einsum(
            "bsgrh,bgth->bgrst", q, k_full, preferred_element_type=jnp.float32
        ) / jnp.sqrt(jnp.asarray(hd, jnp.float32))

        if per_row:
            # (B, S, T) causal mask at each row's own offset
            q_pos = start_pos[:, None, None] + jnp.arange(S)[None, :, None]
            k_pos = jnp.arange(T)[None, None, :]
            mask = (k_pos <= q_pos)[:, None, None]  # (B, 1, 1, S, T)
        else:
            q_pos = start_pos + jnp.arange(S)[:, None]  # (S, 1) absolute
            k_pos = jnp.arange(T)[None, :]  # (1, T)
            mask = (k_pos <= q_pos)[None, None, None]  # causal over cache
        scores = jnp.where(mask, scores, -jnp.inf)
        probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)

        out = jnp.einsum(
            "bgrst,bgth->bsgrh", probs, v_full, preferred_element_type=jnp.float32
        ).astype(x.dtype)
        out = out.reshape(B, S, H * hd)
    if (
        S == 1
        and residual is not None
        and isinstance(p["wo"], dict)
        and "q" in p["wo"]
        and "act" not in p["wo"]  # weight-only int8
        and "xla" not in p["wo"]  # not tensor-parallel
        and _fused_dense_q8_supported()
    ):
        # int8 wo projection + residual add in one program
        # (ops/fused_dense.py) — the 7B serving path's attention tail
        from prego_tpu.ops.fused_dense import fused_dense_q8

        y = fused_dense_q8(
            out.reshape(B, H * hd),
            p["wo"]["q"],
            p["wo"]["s"],
            residual=residual.reshape(B, D),
        )
        return y.reshape(B, 1, D), cache_k, cache_v
    out = _dense(out, p["wo"]).astype(x.dtype)
    if residual is not None:
        out = residual + out
    return out, cache_k, cache_v


def _flash_decode_supported(config: LlamaConfig) -> bool:
    import jax as _jax

    return (
        not config.tp_serving  # pallas custom calls don't SPMD-partition
        and config.head_dim % 128 == 0
        and config.max_seq_len % 256 == 0
        and _jax.default_backend() == "tpu"
    )


def _feed_forward(
    layer_params: Params, x: jax.Array, config: Optional[LlamaConfig] = None
) -> jax.Array:
    p = layer_params
    if "w13" in p:  # fused serving layout
        if (
            not isinstance(p["w13"], dict)  # bf16 leaves only (not int8)
            and x.shape[1] == 1  # decode rows
            and (config is None or not config.tp_serving)
            and _fused_ffn_supported()
        ):
            # whole SwiGLU FFN in one Pallas program (ops/fused_ffn.py):
            # fewer per-layer op boundaries on the decode path
            from prego_tpu.ops.fused_ffn import fused_ffn

            B, S, D = x.shape
            y = fused_ffn(x.reshape(B * S, D), p["w13"], p["w2"])
            return y.reshape(B, S, D).astype(x.dtype)
        g13 = _dense(x, p["w13"])
        F = g13.shape[-1] // 2
        gate, up = g13[..., :F], g13[..., F:]
    else:
        gate = _dense(x, p["w1"])
        up = _dense(x, p["w3"])
    act = (jax.nn.silu(gate) * up).astype(x.dtype)
    return _dense(act, p["w2"]).astype(x.dtype)


def _fused_ffn_supported() -> bool:
    import os

    if os.environ.get("PREGO_FUSED_FFN", "1") == "0":  # kill switch
        return False
    import jax as _jax

    return _jax.default_backend() == "tpu"


def _fused_attn_wo_supported() -> bool:
    import os

    return os.environ.get("PREGO_FUSED_ATTN_WO", "1") != "0"  # kill switch


def _fused_dense_q8_supported() -> bool:
    """Gate for the int8 fused dense boundaries — norm+qkv, wo+residual,
    final-norm+lm-head (PREGO_FUSED_DENSE_Q8=1). TPU-only like the other
    decode kernels.  Measured and DELIBERATELY opt-in: the clean A/B/A
    at 7B b1 reads the full q8-fusion stack at −1.4% e2e (10.33/10.19/
    10.34 ms/step), but the same gates REGRESS at b8 (16.46 vs 14.48) —
    RESULTS.md 7B table."""
    import os

    import jax as _jax

    return (
        os.environ.get("PREGO_FUSED_DENSE_Q8", "0") == "1"
        and _jax.default_backend() == "tpu"
    )


def _fused_ffn_q8_supported() -> bool:
    """Gate for the int8 fused FFN sub-layer (PREGO_FUSED_FFN_Q8=1).
    TPU-only like the bf16 kernel.  Measured and DELIBERATELY opt-in —
    see _fused_dense_q8_supported (the −1.4%-at-b1 / regression-at-b8
    verdict covers the whole q8 fusion stack)."""
    import os

    import jax as _jax

    return (
        os.environ.get("PREGO_FUSED_FFN_Q8", "0") == "1"
        and _jax.default_backend() == "tpu"
    )


def _fused_cache_upd_supported() -> bool:
    """Gate for the cache-write-in-kernel attention tail
    (PREGO_FUSED_CACHE_UPD=1).  Measured and DELIBERATELY opt-in: the
    bf16 fusion ladder shows it regressing (3.543 -> 3.579 ms/step at
    the 1B b8 shape — RESULTS.md)."""
    import os

    return os.environ.get("PREGO_FUSED_CACHE_UPD", "0") == "1"


def _fused_layer_supported() -> bool:
    """Gate for the layer-level fusions (norm prologue + residual-add
    epilogue inside the decode kernels). PREGO_FUSED_LAYER=0 kill switch
    for A/Bs; only ever engages on top of an active base fusion."""
    import os

    return os.environ.get("PREGO_FUSED_LAYER", "1") != "0"


def _ffn_sublayer(layer: Params, h: jax.Array, config: LlamaConfig) -> jax.Array:
    """The whole FFN sub-layer: h + ffn(rms_norm(h, ffn_norm)).  On the
    eligible bf16 decode path the norm, both matmuls, the SwiGLU gate and
    the residual add run as ONE Pallas program (ops/fused_ffn.py::
    fused_ffn_block); everywhere else the op sequence is the legacy
    rms_norm -> _feed_forward -> add with identical numerics."""
    p = layer["feed_forward"]
    nw = layer["ffn_norm"]
    if (
        "w13" in p
        and not isinstance(p["w13"], dict)  # bf16 leaves only (not int8)
        and h.shape[1] == 1  # decode rows
        and not config.tp_serving
        and _fused_ffn_supported()
        and _fused_layer_supported()
    ):
        from prego_tpu.ops.fused_ffn import fused_ffn_block

        B, S, D = h.shape
        y = fused_ffn_block(
            h.reshape(B * S, D), nw, p["w13"], p["w2"], config.norm_eps
        )
        return y.reshape(B, S, D)
    if (
        "w13" in p
        and isinstance(p["w13"], dict)
        and "q" in p["w13"]
        and "act" not in p["w13"]  # weight-only int8 (not activation-quant)
        and "xla" not in p["w13"]  # not tensor-parallel
        and h.shape[1] == 1
        and _fused_ffn_q8_supported()
        and _fused_layer_supported()
    ):
        # the 7B single-chip serving path: whole int8 FFN sub-layer in one
        # program (ops/fused_ffn.py::fused_ffn_block_q8)
        from prego_tpu.ops.fused_ffn import fused_ffn_block_q8

        B, S, D = h.shape
        y = fused_ffn_block_q8(
            h.reshape(B * S, D), nw,
            p["w13"]["q"], p["w13"]["s"], p["w2"]["q"], p["w2"]["s"],
            config.norm_eps,
        )
        return y.reshape(B, S, D)
    return h + _feed_forward(p, rms_norm(h, nw, config.norm_eps), config)


def _fold_batch_requested(batch: int, config: "LlamaConfig" = None) -> bool:
    """Run the bounded decode-attention kernels with the whole batch
    folded into ONE grid program (per-program launch/DMA-warmup overhead
    paid once instead of B times).  Measured: at the 7B shape the
    batched-decode win is unambiguous (14.48 -> 14.04 ms/step b8
    int8+kv8, RESULTS.md) because the heavier layers amortize the fold's
    per-call fixed cost; at the 1B shape it is -7.5% marginal but
    +25 ms per call — a net loss for short serving calls.  Default is
    therefore shape-aware: AUTO-ON for 1 < batch <= 8 at >= 24 layers
    (the measured regime; the r3 b16/b32 watchdog trips were a tunnel
    outage, not the kernel — the retries compiled normally).  Where the
    flat-head default applies (>= 24 layers, _head_group_requested) it
    SUPERSEDES this gate: head_group > 1 implies the folded walk, and
    the formal interleaved controls read flat8 ahead of fold at every
    batch (b8 −14.7/−4.8, b16 −27.7/−8.5, b32 −39.4/−12.5 vs perhead).
    PREGO_FOLD_BATCH=1/0 forces either way."""
    import os

    if batch <= 1:
        return False
    env = os.environ.get("PREGO_FOLD_BATCH")
    if env is not None:
        return env == "1"
    return config is not None and config.n_layers >= 24 and batch <= 8


def _head_group_requested(batch: int, config: "LlamaConfig" = None) -> int:
    """Flat-head group size for the bounded decode-attention kernels:
    stack G heads per score/value matmul pair (ops/decode_attention.py
    ``_flat_group_update``) instead of serializing kv_heads tiny R-row
    dots per block — the per-(batch,head) op-issue residue that grows
    with batch at the 7B/13B shapes (RESULTS.md batch sweep: 55% -> 41%
    -> 27% of floor at b8/b16/b32).

    Default is shape-aware: AUTO-ON with G=8 at >= 24 layers (the
    7B/13B serving shapes), where it is the measured-fastest dispatch at
    every batch tried — in-process interleaved A/B at 7B b8 int8+kv8:
    perhead 13.49 / fold 12.84 / flat8 11.50 / flat32 11.37 ms/step
    (flat8 -14.7%); e2e same-window sweep: b8 -12.6%, b16 -23%,
    b32 -32%, b1 and 13B b1 -3.5%/-8.4% (RESULTS.md).  G=8 ~ G=32 in
    every reading, and G=8 also fits the 13B row budget.  The 16-layer
    1B-class shapes stay off pending their own interleaved A/B.  The A/B
    set was 7B/13B int8[+kv8] (R=1); bf16 and GQA >=24-layer shapes get
    the same default by extrapolation — numerics are parity-tested
    either way, and G is clamped to a divisor of kv_heads downstream
    (_fit_head_group), so the worst case is unmeasured perf, not wrong
    output.  PREGO_HEAD_GROUP=<G> forces a group size either way
    (0/1 = off); an unparsable value warns and falls through to the
    shape-aware default instead of silently forcing it off."""
    import os

    env = os.environ.get("PREGO_HEAD_GROUP")
    if env is not None:
        try:
            return max(int(env), 1)
        except ValueError:
            import sys

            print(
                f"prego_tpu: ignoring unparsable PREGO_HEAD_GROUP={env!r}; "
                "using the shape-aware default",
                file=sys.stderr,
            )
    if config is not None and config.n_layers >= 24:
        return 8
    return 1


def forward(
    params: Params,
    tokens: jax.Array,  # (B, S) int32
    start_pos: jax.Array,  # scalar int32
    cache: Cache,
    config: LlamaConfig,
    rope: Optional[Tuple[jax.Array, jax.Array]] = None,
) -> Tuple[jax.Array, Cache]:
    """Decoder forward. Returns (f32 logits (B, S, V), updated cache).

    ``start_pos`` may be a scalar (the reference semantics: every batch
    row decodes at the same cache offset) or a (B,) vector of PER-ROW
    positions — the continuous-batching serving path, where each slot
    of the shared cache advances independently (new requests join a
    running decode batch mid-flight instead of waiting for the batch to
    drain).  Per-row mode gathers per-row RoPE rows, scatters the cache
    update per row, and masks attention per row; with equal entries it
    is numerically identical to the scalar path."""
    if rope is None:
        rope = precompute_rope(config)
    cos_full, sin_full = rope
    S = tokens.shape[1]
    if jnp.ndim(start_pos) == 1:  # per-row positions (B,)
        pos_ids = start_pos[:, None] + jnp.arange(S, dtype=jnp.int32)[None]
        cos = cos_full[pos_ids]  # (B, S, hd/2)
        sin = sin_full[pos_ids]
    else:
        cos = jax.lax.dynamic_slice_in_dim(cos_full, start_pos, S, axis=0)
        sin = jax.lax.dynamic_slice_in_dim(sin_full, start_pos, S, axis=0)

    h = jnp.take(params["tok_embeddings"], tokens, axis=0)

    new_k = list(cache["k"])
    new_v = list(cache["v"])
    for i, layer in enumerate(params["layers"]):
        h, new_k[i], new_v[i] = _attention(
            layer["attention"],
            h,  # pre-norm stream; _attention applies (or fuses) the norm
            start_pos,
            cos,
            sin,
            new_k[i],
            new_v[i],
            config,
            residual=h,
            norm_weight=layer["attention_norm"],
        )
        h = _ffn_sublayer(layer, h, config)

    out_w = params["output"]
    if (
        isinstance(out_w, dict)
        and "q" in out_w
        and "act" not in out_w  # weight-only int8
        and "xla" not in out_w  # not tensor-parallel
        and h.shape[0] * h.shape[1] <= 64  # decode rows (prefill M too big)
        and _fused_dense_q8_supported()
    ):
        # final rms_norm fused into the int8 lm-head projection
        from prego_tpu.ops.fused_dense import fused_dense_q8

        B, S, D = h.shape
        logits = fused_dense_q8(
            h.reshape(B * S, D),
            out_w["q"],
            out_w["s"],
            norm_weight=params["norm"],
            eps=config.norm_eps,
        ).reshape(B, S, -1)
        return logits, {"k": new_k, "v": new_v}
    h = rms_norm(h, params["norm"], config.norm_eps)
    logits = _dense(h, params["output"])
    return logits, {"k": new_k, "v": new_v}
