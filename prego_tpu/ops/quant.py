"""Weight-only int8 quantization for serving.

Single-token decode is weight-streaming-bound (~2 GB of bf16 weights per
token at 1B scale — RESULTS.md). Per-output-channel symmetric int8 halves
that traffic; the Pallas matmul streams int8 tiles from HBM, dequantizes
them in VMEM and runs the MXU in bf16 with f32 accumulation, so accuracy
loss is the weight rounding only (per-channel, typically <0.5% logits
drift).

  quantize_weight:  W (K, N) -> int8 q (K, N), f32 scale (1, N)
                    with scale_j = max|W[:, j]| / 127
  int8_matmul:      y = (x @ dequant(q)) — grid over N tiles, x resident.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def quantize_weight(w: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Per-output-channel symmetric int8. w: (K, N) -> (q, scale (1, N))."""
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=0, keepdims=True)  # (1, N)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return q, scale


def _pick_n_block(N: int, want: int) -> int:
    """Largest divisor of N that is <= want, preferring lane-aligned
    (multiple-of-128) tiles.  The old rule 'if N % want: use N' made any
    non-multiple N a SINGLE tile — catastrophic at the LLaMA 32000-wide
    lm-head (32000 % 512 != 0 -> a (M, 32000) f32 VMEM block, 126 MB at
    prefill, found as a scoped-vmem OOM in the 7B bench)."""
    if N % want == 0:
        return want
    for d in range(min(want, N), 0, -1):
        if N % d == 0 and d % 128 == 0:
            return d
    for d in range(min(want, N), 0, -1):
        if N % d == 0:
            return d
    return N


def _fit_blocks(
    K: int, N: int, m_block: int, n_block: int, x_item: int, w_item: int
) -> Tuple[int, int]:
    """Shrink (m_block, n_block) until one grid cell's VMEM windows fit
    under half the 16 MB scoped budget (Mosaic double-buffers grid
    blocks).  Found the hard way: the w2 prefill tile at 7B
    (M=1536, K=11008) with the default blocks overflows by ~1 MB and the
    remote compile helper reports only 'subprocess exit code 1'."""
    budget = 7_500_000

    def cell_bytes(m, n):
        return m * K * x_item + K * n * w_item + m * n * 4 + n * 4

    while cell_bytes(m_block, n_block) > budget and m_block > 8:
        m_block //= 2
    while cell_bytes(m_block, n_block) > budget and n_block > 128:
        n_block = _pick_n_block(N, max(n_block // 2, 128))
        if n_block <= 128:
            break
    return m_block, n_block


def _int8_matmul_kernel(x_ref, q_ref, s_ref, out_ref):
    w = q_ref[:].astype(jnp.bfloat16)  # dequant int8 tile in VMEM
    y = jnp.dot(x_ref[:], w, preferred_element_type=jnp.float32)
    out_ref[:] = (y * s_ref[0, :]).astype(out_ref.dtype)


def int8_matmul(
    x: jax.Array,  # (M, K)
    q: jax.Array,  # (K, N) int8
    scale: jax.Array,  # (1, N) f32
    n_block: int = None,
    m_block: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """Returns x @ dequant(q) as (M, N) f32. Grid over (M, N) tiles so
    both tiny decode rows and large prefill batches fit VMEM; M is padded
    up to a block multiple and sliced back.

    ``n_block`` default 512; PREGO_Q8_NBLOCK overrides (the tile sweep
    lever — scripts/sweep_q8_nblock.py; _fit_blocks still clamps to the
    scoped-VMEM budget, so oversized requests degrade gracefully).
    MEASURED (r4 e2e A/B/A at the 7B b8 serving shape): controls
    12.29/12.20 ms/step, 256 -> 12.08 (-1.7%, ~the control spread),
    1024 -> 15.0 (+22% regression) — 512 stays the default; op-level
    sweeps read <=3% tile sensitivity at b1 (VERDICT r3 #3 closed as a
    negative result)."""
    if n_block is None:
        import os

        n_block = int(os.environ.get("PREGO_Q8_NBLOCK", "512"))
    M, K = x.shape
    N = q.shape[1]
    # bf16 x-blocks: the kernel computes in bf16 anyway, and f32 blocks
    # double the x window (the 7B w2 prefill overflowed scoped VMEM)
    x = x.astype(jnp.bfloat16)
    n_block = _pick_n_block(N, n_block)
    m_block, n_block = _fit_blocks(K, N, m_block, n_block, x_item=2, w_item=1)
    M_pad = M
    if M > m_block:
        M_pad = ((M + m_block - 1) // m_block) * m_block
        if M_pad != M:
            x = jnp.pad(x, ((0, M_pad - M), (0, 0)))
    else:
        m_block = M
    grid = (M_pad // m_block, N // n_block)
    out = pl.pallas_call(
        _int8_matmul_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((m_block, K), lambda m, n: (m, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, n_block), lambda m, n: (0, n), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_block), lambda m, n: (0, n), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (m_block, n_block), lambda m, n: (m, n), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((M_pad, N), jnp.float32),
        interpret=interpret,
    )(x, q, scale)
    return out[:M] if M_pad != M else out


def int8_matmul_reference(x, q, scale):
    return jnp.dot(
        x.astype(jnp.bfloat16), q.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    ) * scale[0]


# ---------------- int8 x int8 (activation quant) ----------------


def quantize_activations(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Dynamic per-row (per-token) symmetric int8. x: (M, K) -> (q, scale (M, 1)).

    Weight-only int8 still pays a VPU dequant-to-bf16 per tile; quantizing
    the activations too lets the MXU run int8 x int8 -> int32 natively
    (2x MXU throughput tier) and the rescale collapses to one f32 multiply
    per output element: y = (xq @ wq) * (x_scale * w_scale)."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)  # (M, 1)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return q, scale


def _int8xint8_matmul_kernel(xq_ref, xs_ref, q_ref, s_ref, out_ref):
    acc = jax.lax.dot_general(
        xq_ref[:], q_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out_ref[:] = acc.astype(jnp.float32) * xs_ref[:] * s_ref[0, :]


def int8xint8_matmul(
    xq: jax.Array,  # (M, K) int8
    x_scale: jax.Array,  # (M, 1) f32
    q: jax.Array,  # (K, N) int8
    scale: jax.Array,  # (1, N) f32
    n_block: int = 512,
    m_block: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """Returns dequant(xq) @ dequant(q) as (M, N) f32 with int32 MXU
    accumulation. Same tiling scheme as int8_matmul."""
    M, K = xq.shape
    N = q.shape[1]
    n_block = _pick_n_block(N, n_block)
    m_block, n_block = _fit_blocks(K, N, m_block, n_block, x_item=1, w_item=1)
    M_pad = M
    if M > m_block:
        M_pad = ((M + m_block - 1) // m_block) * m_block
        if M_pad != M:
            xq = jnp.pad(xq, ((0, M_pad - M), (0, 0)))
            x_scale = jnp.pad(x_scale, ((0, M_pad - M), (0, 0)))
    else:
        m_block = M
    grid = (M_pad // m_block, N // n_block)
    out = pl.pallas_call(
        _int8xint8_matmul_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((m_block, K), lambda m, n: (m, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m_block, 1), lambda m, n: (m, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, n_block), lambda m, n: (0, n), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_block), lambda m, n: (0, n), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (m_block, n_block), lambda m, n: (m, n), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((M_pad, N), jnp.float32),
        interpret=interpret,
    )(xq, x_scale, q, scale)
    return out[:M] if M_pad != M else out


def int8xint8_matmul_reference(xq, x_scale, q, scale):
    acc = jax.lax.dot_general(
        xq.astype(jnp.int32), q.astype(jnp.int32),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return acc.astype(jnp.float32) * x_scale * scale[0]
