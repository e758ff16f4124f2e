"""Fused SwiGLU FFN for decode: w13 matmul + silu*up + w2 matmul in ONE
Pallas kernel (VERDICT r2 #4 lever — collapse per-layer op count).

At decode (M = batch, S = 1) the FFN is three XLA fusions per layer
(w13 dot, silu*up, w2 dot) with inter-op scheduling between them; across
16 layers that boundary cost is part of the measured gap between the
3.13 ms/step decode and its ~2.2-2.7 ms weight-streaming floor.  This
kernel walks the hidden dimension F in tiles: per tile it loads the gate
and up slices of w13 and the matching w2 rows, computes
silu(x @ gate) * (x @ up) @ w2_tile and accumulates into a resident
(M, D) f32 scratch — weights stream exactly once (same HBM bytes as
XLA), every intermediate stays in VMEM, and the whole FFN is one
program.

Layout contract: w13 is the fused [w1 | w3] concatenation produced by
fuse_projections (model.py), stored (D, 2F); w2 is (F, D).  bf16-only
path (quantized leaves keep the existing _dense dispatch).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fused_ffn_kernel(x_ref, gate_ref, up_ref, w2_ref, out_ref, acc_ref):
    f = pl.program_id(0)

    @pl.when(f == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[:]
    g = jnp.dot(x, gate_ref[:], preferred_element_type=jnp.float32)
    u = jnp.dot(x, up_ref[:], preferred_element_type=jnp.float32)
    a = (jax.nn.silu(g) * u).astype(x.dtype)
    acc_ref[:] += jnp.dot(a, w2_ref[:], preferred_element_type=jnp.float32)

    @pl.when(f == pl.num_programs(0) - 1)
    def _():
        out_ref[:] = acc_ref[:]


def _fused_ffn_block_kernel(
    h_ref,  # (M, D) — UN-normed residual stream
    nw_ref,  # (1, D) — ffn_norm weight
    gate_ref, up_ref, w2_ref,
    out_ref,  # (M, D) h.dtype — h + ffn(rms_norm(h))
    xn_ref,  # (M, D) h.dtype scratch — normed input, computed once
    acc_ref,  # (M, D) f32 scratch
    *,
    eps: float,
):
    """fused_ffn with the layer's rms_norm PROLOGUE and residual-add
    EPILOGUE absorbed: replicates model.rms_norm's exact dtype walk
    (f32 square-mean/rsqrt, cast to h.dtype, THEN scale by the weight)
    and forward()'s h + ffn.astype(h.dtype) bf16 add, so the fused layer
    is numerically identical to the unfused op sequence."""
    f = pl.program_id(0)

    @pl.when(f == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        hf = h_ref[:].astype(jnp.float32)
        normed = hf * jax.lax.rsqrt(
            jnp.mean(hf * hf, axis=-1, keepdims=True) + eps
        )
        xn_ref[:] = normed.astype(xn_ref.dtype) * nw_ref[0]

    x = xn_ref[:]
    g = jnp.dot(x, gate_ref[:], preferred_element_type=jnp.float32)
    u = jnp.dot(x, up_ref[:], preferred_element_type=jnp.float32)
    a = (jax.nn.silu(g) * u).astype(x.dtype)
    acc_ref[:] += jnp.dot(a, w2_ref[:], preferred_element_type=jnp.float32)

    @pl.when(f == pl.num_programs(0) - 1)
    def _():
        out_ref[:] = h_ref[:] + acc_ref[:].astype(out_ref.dtype)


def fused_ffn(
    x: jax.Array,  # (M, D)
    w13: jax.Array,  # (D, 2F) fused [w1 | w3]
    w2: jax.Array,  # (F, D)
    f_block: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """Returns silu(x @ w1) * (x @ w3) @ w2 as (M, D) f32.

    f_block=256 keeps one grid cell's three weight windows at ~3 MB
    (x6 MB double-buffered) — Mosaic double-buffers every grid-mapped
    block, and the r3 bisects showed the compile helper dies opaquely
    right at the 16 MB scoped-VMEM edge, so stay well under it."""
    M, D = x.shape
    F = w2.shape[0]
    assert w13.shape == (D, 2 * F), (w13.shape, (D, 2 * F))
    while F % f_block != 0 and f_block > 128:
        f_block //= 2
    if F % f_block != 0:
        f_block = F
    n_f = F // f_block

    kernel = _fused_ffn_kernel
    return pl.pallas_call(
        kernel,
        grid=(n_f,),
        in_specs=[
            pl.BlockSpec((M, D), lambda f: (0, 0), memory_space=pltpu.VMEM),
            # gate tile: w13[:, f*fb : (f+1)*fb]
            pl.BlockSpec((D, f_block), lambda f: (0, f), memory_space=pltpu.VMEM),
            # up tile: w13[:, F + f*fb : F + (f+1)*fb] — same array, offset
            # index map (block index is in units of f_block; F = n_f blocks)
            pl.BlockSpec(
                (D, f_block),
                lambda f, n_f=n_f: (0, f + n_f),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((f_block, D), lambda f: (f, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((M, D), lambda f: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, D), jnp.float32),
        scratch_shapes=[pltpu.VMEM((M, D), jnp.float32)],
        interpret=interpret,
    )(x, w13, w13, w2)


def fused_ffn_block(
    h: jax.Array,  # (M, D) — un-normed residual stream
    norm_weight: jax.Array,  # (D,)
    w13: jax.Array,  # (D, 2F)
    w2: jax.Array,  # (F, D)
    eps: float,
    f_block: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """Whole decode FFN sub-layer in ONE program: returns
    ``h + ffn(rms_norm(h, norm_weight, eps))`` as (M, D) in h's dtype.
    Same weight-streaming schedule as fused_ffn; additionally removes the
    norm and residual-add op boundaries (2 XLA fusions per layer)."""
    M, D = h.shape
    F = w2.shape[0]
    assert w13.shape == (D, 2 * F), (w13.shape, (D, 2 * F))
    while F % f_block != 0 and f_block > 128:
        f_block //= 2
    if F % f_block != 0:
        f_block = F
    n_f = F // f_block

    kernel = functools.partial(_fused_ffn_block_kernel, eps=eps)
    return pl.pallas_call(
        kernel,
        grid=(n_f,),
        in_specs=[
            pl.BlockSpec((M, D), lambda f: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda f: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, f_block), lambda f: (0, f), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (D, f_block),
                lambda f, n_f=n_f: (0, f + n_f),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((f_block, D), lambda f: (f, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((M, D), lambda f: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, D), h.dtype),
        scratch_shapes=[
            pltpu.VMEM((M, D), h.dtype),
            pltpu.VMEM((M, D), jnp.float32),
        ],
        interpret=interpret,
    )(h, norm_weight.reshape(1, -1), w13, w13, w2)


def _fused_ffn_block_q8_kernel(
    h_ref,  # (M, D) — UN-normed residual stream
    nw_ref,  # (1, D) — ffn_norm weight
    gq_ref,  # (D, fb) int8 — gate tile of w13
    uq_ref,  # (D, fb) int8 — up tile of w13
    sg_ref,  # (1, fb) f32 — gate columns' scales (block-mapped)
    su_ref,  # (1, fb) f32 — up columns' scales (block-mapped)
    w2q_ref,  # (fb, D) int8
    s2_ref,  # (1, D) f32 — w2 scales
    out_ref,  # (M, D) h.dtype — h + ffn(rms_norm(h))
    xn_ref,  # (M, D) h.dtype scratch
    acc_ref,  # (M, D) f32 scratch
    *,
    eps: float,
):
    """Weight-only-int8 fused FFN sub-layer.  Dequant follows
    ops/quant.py::int8_matmul exactly: the int8 tile is CAST to bf16 for
    the MXU and the per-output-channel scale is applied AFTER the dot
    (w13 scales per f-tile; w2's output-channel scale once on the final
    accumulator, equivalent to the unfused full-K matmul)."""
    f = pl.program_id(0)

    @pl.when(f == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        hf = h_ref[:].astype(jnp.float32)
        normed = hf * jax.lax.rsqrt(
            jnp.mean(hf * hf, axis=-1, keepdims=True) + eps
        )
        xn_ref[:] = normed.astype(xn_ref.dtype) * nw_ref[0]

    x = xn_ref[:].astype(jnp.bfloat16)
    g = jnp.dot(x, gq_ref[:].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32) * sg_ref[0]
    u = jnp.dot(x, uq_ref[:].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32) * su_ref[0]
    a = (jax.nn.silu(g) * u).astype(jnp.bfloat16)
    acc_ref[:] += jnp.dot(a, w2q_ref[:].astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)

    @pl.when(f == pl.num_programs(0) - 1)
    def _():
        y = acc_ref[:] * s2_ref[0]
        out_ref[:] = h_ref[:] + y.astype(out_ref.dtype)


def fused_ffn_block_q8(
    h: jax.Array,  # (M, D) — un-normed residual stream
    norm_weight: jax.Array,  # (D,)
    w13q: jax.Array,  # (D, 2F) int8
    w13s: jax.Array,  # (1, 2F) f32
    w2q: jax.Array,  # (F, D) int8
    w2s: jax.Array,  # (1, D) f32
    eps: float,
    f_block: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """Whole int8 decode FFN sub-layer in ONE program (the 7B serving
    shape: 32 layers x [w13 int8_matmul, silu*up, w2 int8_matmul] becomes
    32 programs).  Returns h + ffn(rms_norm(h)) in h's dtype; weight HBM
    bytes identical to the unfused int8_matmul path."""
    M, D = h.shape
    F = w2q.shape[0]
    assert w13q.shape == (D, 2 * F), (w13q.shape, (D, 2 * F))
    assert w13s.shape == (1, 2 * F) and w2s.shape == (1, D)
    # keep one grid cell's three int8 windows + their bf16 casts well
    # under scoped VMEM (see fused_ffn's margin note; int8+cast ~ 3 bytes
    # per element, 3 windows, double-buffered)
    while D * f_block * 18 > 12_000_000 and f_block > 128:
        f_block //= 2
    while F % f_block != 0 and f_block > 128:
        f_block //= 2
    if F % f_block != 0:
        f_block = F
    n_f = F // f_block

    kernel = functools.partial(_fused_ffn_block_q8_kernel, eps=eps)
    return pl.pallas_call(
        kernel,
        grid=(n_f,),
        in_specs=[
            pl.BlockSpec((M, D), lambda f: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda f: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, f_block), lambda f: (0, f), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (D, f_block),
                lambda f, n_f=n_f: (0, f + n_f),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, f_block), lambda f: (0, f), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, f_block),
                lambda f, n_f=n_f: (0, f + n_f),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((f_block, D), lambda f: (f, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda f: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((M, D), lambda f: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, D), h.dtype),
        scratch_shapes=[
            pltpu.VMEM((M, D), h.dtype),
            pltpu.VMEM((M, D), jnp.float32),
        ],
        interpret=interpret,
    )(h, norm_weight.reshape(1, -1), w13q, w13q, w13s, w13s, w2q, w2s)


def fused_ffn_reference(x: jax.Array, w13: jax.Array, w2: jax.Array) -> jax.Array:
    F = w2.shape[0]
    g13 = jnp.dot(x, w13, preferred_element_type=jnp.float32)
    gate, up = g13[..., :F], g13[..., F:]
    act = (jax.nn.silu(gate) * up).astype(x.dtype)
    return jnp.dot(act, w2, preferred_element_type=jnp.float32)
