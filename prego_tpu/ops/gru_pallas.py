"""Fused streaming GRU recurrence as a Pallas TPU kernel.

This is the performance-critical recurrence of MiniROAD (SURVEY.md §7 hard
part 1, replacing cuDNN's fused GRU). The input-side projection
xg = x @ W_ih + b_ih is a bulk MXU matmul done OUTSIDE the kernel (see
prego_tpu.ops.gru); the truly-sequential part — per-frame
h @ W_hh (H, 3H) + gate math — runs here with:

  * W_hh DMA'd from HBM into a persistent VMEM scratch ONCE at the first
    grid step and reused for the entire video — the XLA scan re-reads it
    from HBM every timestep (~6 MB/step at production size), and letting
    the Pallas pipeline stream it would double-buffer the constant block,
    so the copy is manual; stored bf16, accumulated f32 on the MXU;
  * time-major (T, B, 3H) layout: per-frame slices are dynamic indexes on
    the UNTILED leading dim (the (8,128) tiling constrains the trailing
    two dims to static-aligned indexing only);
  * a (batch_blocks, time_blocks) grid — time innermost, so each batch
    block walks its whole timeline in order while the carried hidden state
    lives in an f32 VMEM scratch that persists across sequential grid
    steps; xg blocks stream HBM->VMEM double-buffered by the pipeline;
  * a fori_loop over the frames of each block (a python unroll would
    multiply kernel stack temporaries and OOM scoped vmem), each frame one
    (Bb, H) x (H, 3H) MXU matmul + VPU gate math in f32.

Numerics match prego_tpu.ops.gru.gru_scan (diffed in tests; exact in f32
interpret mode, bf16-matmul tolerance on hardware).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gru_kernel(
    xg_ref,  # (Tb, Bb, 3H) VMEM block — time-major
    h0_ref,  # (Bb, H) VMEM block
    w_hh_hbm,  # (H, 3H) in HBM/ANY — manually DMA'd once
    b_hh_ref,  # (1, 3H) VMEM
    hs_ref,  # (Tb, Bb, H) output block — time-major
    hT_ref,  # (Bb, H) final-state output
    h_state,  # (Bb, H) f32 scratch, persists across sequential grid steps
    w_vmem,  # (H, 3H) scratch — W_hh resident copy
    w_sem,  # DMA semaphore
    *,
    time_block: int,
    hidden_dim: int,
):
    b = pl.program_id(0)
    t = pl.program_id(1)  # time is the innermost grid dimension

    @pl.when((b == 0) & (t == 0))  # one-time W_hh HBM -> VMEM copy
    def _():
        dma = pltpu.make_async_copy(w_hh_hbm, w_vmem, w_sem)
        dma.start()
        dma.wait()

    @pl.when(t == 0)  # new batch block starts its timeline
    def _():
        h_state[:] = h0_ref[:].astype(jnp.float32)

    H = hidden_dim
    b_hh = b_hh_ref[0, :].astype(jnp.float32)

    def step(i, _):
        h = h_state[:]
        hg = (
            jnp.dot(
                h.astype(w_vmem.dtype),
                w_vmem[:],
                preferred_element_type=jnp.float32,
            )
            + b_hh
        )
        xg_t = xg_ref[i].astype(jnp.float32)  # (Bb, 3H)
        r = jax.nn.sigmoid(xg_t[:, :H] + hg[:, :H])
        z = jax.nn.sigmoid(xg_t[:, H : 2 * H] + hg[:, H : 2 * H])
        n = jnp.tanh(xg_t[:, 2 * H :] + r * hg[:, 2 * H :])
        h_new = (1.0 - z) * n + z * h
        h_state[:] = h_new
        hs_ref[i] = h_new.astype(hs_ref.dtype)
        return 0

    jax.lax.fori_loop(0, time_block, step, 0)

    @pl.when(t == pl.num_programs(1) - 1)
    def _():
        hT_ref[:] = h_state[:].astype(hT_ref.dtype)


def gru_recurrence_pallas(
    xg_tm: jax.Array,  # (T, B, 3H) precomputed input gates, TIME-MAJOR
    h0: jax.Array,  # (B, H)
    w_hh: jax.Array,  # (H, 3H)
    b_hh: jax.Array,  # (3H,)
    time_block: int = 8,
    batch_block: int = 64,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Run the fused recurrence. T % time_block == 0 and
    B % batch_block == 0 (callers pad). Returns (hs (T, B, H), hT (B, H))."""
    T, B, threeH = xg_tm.shape
    H = threeH // 3
    if T % time_block != 0:
        raise ValueError(f"T={T} not a multiple of time_block={time_block}")
    batch_block = min(batch_block, B)
    if B % batch_block != 0:
        raise ValueError(f"B={B} not a multiple of batch_block={batch_block}")
    n_b = B // batch_block
    n_t = T // time_block

    kernel = functools.partial(_gru_kernel, time_block=time_block, hidden_dim=H)
    hs, hT = pl.pallas_call(
        kernel,
        grid=(n_b, n_t),
        in_specs=[
            pl.BlockSpec(
                (time_block, batch_block, threeH),
                lambda b, t: (t, b, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (batch_block, H), lambda b, t: (b, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pl.ANY),  # W_hh: manual one-time DMA
            pl.BlockSpec((1, threeH), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(
                (time_block, batch_block, H),
                lambda b, t: (t, b, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (batch_block, H), lambda b, t: (b, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, H), xg_tm.dtype),
            jax.ShapeDtypeStruct((B, H), h0.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((batch_block, H), jnp.float32),
            pltpu.VMEM((H, threeH), w_hh.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * T * H * threeH,
            bytes_accessed=xg_tm.size * xg_tm.dtype.itemsize
            + H * threeH * w_hh.dtype.itemsize,
            transcendentals=B * T * 3 * H,
        ),
    )(xg_tm, h0, w_hh, b_hh.reshape(1, threeH))
    return hs, hT


def gru_pallas(
    x: jax.Array,  # (B, T, E)
    h0: jax.Array,  # (B, H)
    params,  # dict with w_ih/b_ih/w_hh/b_hh (see ops.gru)
    time_block: int = 8,
    batch_block: int = 64,
    interpret: bool = False,
    stream_dtype=None,  # dtype of xg/W_hh inside the kernel; bf16 on TPU
) -> Tuple[jax.Array, jax.Array]:
    """Full GRU layer: bulk input projection + fused Pallas recurrence.
    Pads T up to a time_block multiple and slices the result back.
    Input/output follow the model's batch-major (B, T, ...) convention;
    the time-major kernel layout is internal. B and T are auto-padded up
    to block multiples and sliced back (padded rows/frames compute junk
    that is discarded; the recurrence is batch-independent)."""
    B, T, _ = x.shape
    # produce xg directly time-major: (T, B, 3H)
    xg = (
        jnp.einsum(
            "bte,eg->tbg", x, params["w_ih"], preferred_element_type=jnp.float32
        )
        + params["b_ih"]
    ).astype(stream_dtype or x.dtype)
    T_pad = ((T + time_block - 1) // time_block) * time_block
    bb = min(batch_block, B) if B % min(batch_block, B) == 0 else batch_block
    B_pad = ((B + bb - 1) // bb) * bb if B % bb else B
    if T_pad != T or B_pad != B:
        xg = jnp.pad(xg, ((0, T_pad - T), (0, B_pad - B), (0, 0)))
        h0_k = jnp.pad(h0, ((0, B_pad - B), (0, 0)))
    else:
        h0_k = h0
    w_hh = params["w_hh"].astype(stream_dtype) if stream_dtype else params["w_hh"]
    hs_tm, hT = gru_recurrence_pallas(
        xg, h0_k, w_hh, params["b_hh"], time_block, bb, interpret
    )
    hs = jnp.swapaxes(hs_tm, 0, 1).astype(x.dtype)
    hT = hT[:B]
    if B_pad != B:
        hs = hs[:B]
    if T_pad != T:
        hs = hs[:, :T]
        # hT reflects padded frames; recompute the true last state
        hT = hs[:, -1, :].astype(h0.dtype)
    return hs, hT
