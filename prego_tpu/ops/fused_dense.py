"""Weight-only-int8 dense projection with fused norm prologue / residual
epilogue — the remaining per-layer op boundaries on the 7B int8 decode
path (beyond-reference; the reference serves bf16 via fairscale layers,
llama/model.py:218-286).

With ops/fused_ffn.py::fused_ffn_block_q8 the FFN sub-layer is one
program; this kernel collapses the attention side the same way:

  norm+qkv   rms_norm(h) @ dequant(wqkv)            (2 ops -> 1 program)
  wo+res     residual + attn @ dequant(wo)          (3 ops -> 1 program)
  norm+head  rms_norm(h) @ dequant(output)          (2 ops -> 1 program)

Numerics replicate the unfused sequence exactly: model.rms_norm's dtype
walk (f32 square-mean/rsqrt, cast to x.dtype, then scale by the weight),
then ops/quant.py::int8_matmul's convention (x cast to bf16, int8 tile
cast to bf16 for the MXU, per-output-channel f32 scale applied after the
dot), then the caller's `.astype(out_dtype)` / residual add.

Weights stream from HBM exactly once per call (grid over N tiles, the
activation row block stays VMEM-resident), so HBM bytes equal the
unfused int8_matmul — the win is the removed XLA op boundaries.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _norm_kernel(x_ref, nw_ref, q_ref, s_ref, out_ref, xn_ref, *, eps):
    """out = rms_norm(x, nw) @ dequant(q); norm computed once on tile 0
    into a resident scratch, re-used by every weight tile."""
    n = pl.program_id(0)

    @pl.when(n == 0)
    def _():
        hf = x_ref[:].astype(jnp.float32)
        normed = hf * jax.lax.rsqrt(
            jnp.mean(hf * hf, axis=-1, keepdims=True) + eps
        )
        xn_ref[:] = normed.astype(xn_ref.dtype) * nw_ref[0]

    y = jnp.dot(
        xn_ref[:].astype(jnp.bfloat16),
        q_ref[:].astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    ) * s_ref[0]
    out_ref[:] = y.astype(out_ref.dtype)


def _res_kernel(x_ref, res_ref, q_ref, s_ref, out_ref):
    """out = residual + (x @ dequant(q)).astype(residual.dtype)."""
    y = jnp.dot(
        x_ref[:].astype(jnp.bfloat16),
        q_ref[:].astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    ) * s_ref[0]
    out_ref[:] = res_ref[:] + y.astype(out_ref.dtype)


def _pick_block(N: int, K: int, want: int) -> int:
    """Largest divisor of N <= want that keeps one cell's weight window
    (int8, double-buffered by Mosaic, plus its in-kernel bf16 cast) well
    under the 16 MB scoped-VMEM edge (~6 bytes/element headroom rule —
    the r3 bisects showed the remote compile helper dies opaquely at the
    edge)."""
    while K * want * 6 > 9_000_000 and want > 128:
        want //= 2
    while N % want != 0 and want > 128:
        want //= 2
    if N % want != 0:
        for d in range(min(want, N), 0, -1):
            if N % d == 0:
                return d
    return want


def fused_dense_q8(
    x: jax.Array,  # (M, K)
    q: jax.Array,  # (K, N) int8
    scale: jax.Array,  # (1, N) f32
    *,
    norm_weight: Optional[jax.Array] = None,  # (K,) — rms_norm prologue
    residual: Optional[jax.Array] = None,  # (M, N) — added in epilogue
    eps: float = 1e-5,
    out_dtype=None,
    n_block: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """One-program int8 projection with an rms_norm prologue XOR a
    residual epilogue (exactly one — no call site needs both or
    neither; the bare projection is ops/quant.py::int8_matmul).

    With ``norm_weight``: returns ``rms_norm(x) @ dequant(q)`` cast to
    ``out_dtype`` (default f32).  With ``residual``: returns
    ``residual + (x @ dequant(q)).astype(residual.dtype)``."""
    M, K = x.shape
    N = q.shape[1]
    assert q.shape == (K, N) and scale.shape == (1, N)
    assert (norm_weight is None) != (residual is None)
    n_block = _pick_block(N, K, n_block)
    grid = (N // n_block,)

    w_spec = pl.BlockSpec((K, n_block), lambda n: (0, n), memory_space=pltpu.VMEM)
    s_spec = pl.BlockSpec((1, n_block), lambda n: (0, n), memory_space=pltpu.VMEM)
    x_spec = pl.BlockSpec((M, K), lambda n: (0, 0), memory_space=pltpu.VMEM)
    o_spec = pl.BlockSpec((M, n_block), lambda n: (0, n), memory_space=pltpu.VMEM)

    if residual is not None:
        assert residual.shape == (M, N), (residual.shape, (M, N))
        return pl.pallas_call(
            _res_kernel,
            grid=grid,
            in_specs=[x_spec, o_spec, w_spec, s_spec],
            out_specs=o_spec,
            out_shape=jax.ShapeDtypeStruct((M, N), residual.dtype),
            interpret=interpret,
        )(x, residual, q, scale)

    out_dtype = jnp.float32 if out_dtype is None else out_dtype
    return pl.pallas_call(
        functools.partial(_norm_kernel, eps=eps),
        grid=grid,
        in_specs=[
            x_spec,
            pl.BlockSpec((1, K), lambda n: (0, 0), memory_space=pltpu.VMEM),
            w_spec,
            s_spec,
        ],
        out_specs=o_spec,
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        scratch_shapes=[pltpu.VMEM((M, K), x.dtype)],
        interpret=interpret,
    )(x, norm_weight.reshape(1, -1), q, scale)
