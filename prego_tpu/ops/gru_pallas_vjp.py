"""Trainable fused GRU: Pallas forward + Pallas reverse-time backward.

Training with the XLA scan re-reads W_hh from HBM on every step of BOTH the
forward and backward scans (~256 x 6-12 MB per 128-frame window batch) —
the dominant cost of the recognition train step. Here both directions are
Pallas kernels with W_hh DMA'd to VMEM once, and every weight-gradient
reduction is hoisted OUT of the recurrence into bulk MXU matmuls:

  forward : prego_tpu.ops.gru_pallas (hs saved as residuals, xg recomputed
            in the backward as one bulk matmul — cheaper than saving B*T*3H)
  backward: reverse-time kernel carrying the dh chain in VMEM, emitting
            per-frame pre-activation gradients dXG (and the recomputed reset
            gate R); then
              dW_hh = Σ_t h_{t-1}ᵀ dHG_t,  dHG = dXG with n-slice * R
              dW_ih = xᵀ dXG,  dx = dXG W_ihᵀ,  biases = sums
            are plain einsums XLA tiles onto the MXU.

Gradient math (per step, gates r=σ(a), z=σ(b), n=tanh(c), c = xn + r*hn):
  dz=G(h_prev-n), db=dz z(1-z), dn=G(1-z), dc=dn(1-n²),
  dr=dc*hn, da=dr r(1-r), dh_prev = G z + [da,db,dc*r] W_hhᵀ.

Verified against jax.grad of the lax.scan reference in tests.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from prego_tpu.ops.gru import gru_scan
from prego_tpu.ops.gru_pallas import gru_recurrence_pallas


def _gru_bwd_kernel(
    xg_ref,  # (Tb, Bb, 3H) — time-major, blocks delivered in REVERSE order
    hprev_ref,  # (Tb, Bb, H) h_{t-1} per frame
    dhs_ref,  # (Tb, Bb, H) upstream gradient per frame
    w_hh_hbm,  # (H, 3H) in ANY — manual one-time DMA
    b_hh_ref,  # (1, 3H)
    dxg_ref,  # (Tb, Bb, 3H) out: [da, db, dc]
    r_ref,  # (Tb, Bb, H) out: reset gate values
    dh0_ref,  # (Bb, H) out: gradient wrt h0 (chain at t=0)
    dh_state,  # (Bb, H) f32 scratch — the reverse chain
    w_vmem,  # (H, 3H) scratch
    w_sem,
    *,
    time_block: int,
    hidden_dim: int,
):
    b = pl.program_id(0)
    t = pl.program_id(1)  # 0 .. n_t-1, mapped to reversed blocks

    @pl.when((b == 0) & (t == 0))
    def _():
        dma = pltpu.make_async_copy(w_hh_hbm, w_vmem, w_sem)
        dma.start()
        dma.wait()

    @pl.when(t == 0)  # new batch block starts its reverse chain
    def _():
        dh_state[:] = jnp.zeros_like(dh_state)

    H = hidden_dim
    b_hh = b_hh_ref[0, :].astype(jnp.float32)

    def step(j, _):
        i = time_block - 1 - j  # walk the block backwards in time
        h_prev = hprev_ref[i].astype(jnp.float32)
        # recompute the gates (one MXU matmul)
        hg = (
            jnp.dot(
                h_prev.astype(w_vmem.dtype), w_vmem[:],
                preferred_element_type=jnp.float32,
            )
            + b_hh
        )
        xg_t = xg_ref[i].astype(jnp.float32)
        hr, hz, hn = hg[:, :H], hg[:, H : 2 * H], hg[:, 2 * H :]
        r = jax.nn.sigmoid(xg_t[:, :H] + hr)
        z = jax.nn.sigmoid(xg_t[:, H : 2 * H] + hz)
        n = jnp.tanh(xg_t[:, 2 * H :] + r * hn)

        G = dhs_ref[i].astype(jnp.float32) + dh_state[:]
        dz = G * (h_prev - n)
        db = dz * z * (1.0 - z)
        dn = G * (1.0 - z)
        dc = dn * (1.0 - n * n)
        dr = dc * hn
        da = dr * r * (1.0 - r)

        dhg = jnp.concatenate([da, db, dc * r], axis=-1)
        # dh_prev = G*z + dhg @ W_hh^T (contract 3H against W's out dim)
        dh_prev = G * z + jax.lax.dot_general(
            dhg.astype(w_vmem.dtype),
            w_vmem[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dh_state[:] = dh_prev
        dxg_ref[i] = jnp.concatenate([da, db, dc], axis=-1).astype(dxg_ref.dtype)
        r_ref[i] = r.astype(r_ref.dtype)
        return 0

    jax.lax.fori_loop(0, time_block, step, 0)

    @pl.when(t == pl.num_programs(1) - 1)  # reached the first frame
    def _():
        dh0_ref[:] = dh_state[:].astype(dh0_ref.dtype)


def gru_bwd_pallas(
    xg_tm: jax.Array,  # (T, B, 3H) time-major input gates
    hprev_tm: jax.Array,  # (T, B, H) h_{t-1} per frame (h0 at t=0)
    dhs_tm: jax.Array,  # (T, B, H) upstream grads
    w_hh: jax.Array,
    b_hh: jax.Array,
    time_block: int = 8,
    batch_block: int = 32,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Reverse-time recurrence. Returns (dXG (T,B,3H), R (T,B,H), dh0 (B,H))."""
    T, B, threeH = xg_tm.shape
    H = threeH // 3
    if T % time_block != 0:
        raise ValueError(f"T={T} %% time_block={time_block}")
    batch_block = min(batch_block, B)
    if B % batch_block != 0:
        raise ValueError(f"B={B} %% batch_block={batch_block}")
    n_b = B // batch_block
    n_t = T // time_block
    rev = lambda b, t: (n_t - 1 - t, b, 0)  # reverse time order

    kernel = functools.partial(
        _gru_bwd_kernel, time_block=time_block, hidden_dim=H
    )
    # dxg aliases xg and r aliases dhs (same shapes, same block maps; each
    # frame index is read strictly before it is overwritten inside the
    # step).  This halves the double-buffered block footprint: without the
    # aliases the in+out blocks at (tb=8, bb=16, H=1024) plus the resident
    # 6 MB W_hh overflow the 16 MB VMEM budget and the remote compile
    # helper dies with an opaque "subprocess exit code 1" (the r2 B>=64
    # mystery — see scripts/repro_pallas_train_b64.py).  CALLER CONTRACT:
    # xg_tm and dhs_tm are consumed (donated) by this call.
    dxg, r, dh0 = pl.pallas_call(
        kernel,
        grid=(n_b, n_t),
        in_specs=[
            pl.BlockSpec((time_block, batch_block, threeH), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((time_block, batch_block, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((time_block, batch_block, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, threeH), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((time_block, batch_block, threeH), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((time_block, batch_block, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((batch_block, H), lambda b, t: (b, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, threeH), xg_tm.dtype),
            jax.ShapeDtypeStruct((T, B, H), xg_tm.dtype),
            jax.ShapeDtypeStruct((B, H), jnp.float32),
        ],
        input_output_aliases={0: 0, 2: 1},  # xg->dxg, dhs->r
        scratch_shapes=[
            pltpu.VMEM((batch_block, H), jnp.float32),
            pltpu.VMEM((H, threeH), w_hh.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xg_tm, hprev_tm, dhs_tm, w_hh, b_hh.reshape(1, threeH))
    return dxg, r, dh0


# ---------------------------------------------------------------- custom vjp

@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def gru_trainable(
    x: jax.Array,  # (B, T, E)
    h0: jax.Array,  # (B, H)
    params,  # dict w_ih/b_ih/w_hh/b_hh
    time_block: int = 8,
    batch_block: int = 64,
    interpret: bool = False,
    stream_dtype=None,  # kernel stream dtype; bf16 for production TPU runs
):
    """Differentiable fused GRU layer. Returns (hs (B,T,H), hT (B,H))."""
    hs, hT, _ = _gru_fwd_impl(x, h0, params, time_block, batch_block, interpret, stream_dtype)
    return hs, hT


def _fit_batch_block(
    batch_block: int, batch: int, hidden_dim: int, time_block: int = 0
) -> int:
    """Clamp the per-grid batch block so the train kernels fit scoped
    VMEM with the (H, 3H) W_hh resident.  At H >= 1024 the production
    shape sits at the 16 MB edge; past it the remote compile helper dies
    with an opaque 'subprocess exit code 1' instead of a Mosaic OOM
    diagnostic (repro: scripts/repro_pallas_train_b64.py).  Empirical
    envelope on v5e (r3 bisect): the FORWARD kernel is fine at 16-row
    blocks at any grid size, but the BACKWARD kernel carries ~2.3x the
    block bytes (5 live (tb,bb,*) windows, double-buffered, beside the
    6 MB resident W_hh) and needs time_block*batch_block <= 64 — pass
    ``time_block`` to apply that stricter product cap.  Throughput is
    insensitive because the recurrence is bandwidth-bound on W_hh, which
    stays resident either way.

    The returned block always divides `batch` (the kernels require
    B % batch_block == 0): we take the largest divisor of B that fits
    under both the caller's block and the VMEM cap, so shapes like
    B=24 at H=1024 run with block 8 instead of raising."""
    cap = min(batch_block, batch)
    if hidden_dim >= 1024:
        cap = min(cap, 16)
        if time_block:
            cap = min(cap, max(1, 64 // time_block))
    while cap > 1 and batch % cap != 0:
        cap -= 1
    return max(cap, 1)


def _gru_fwd_impl(x, h0, params, time_block, batch_block, interpret, stream_dtype):
    B, T, _ = x.shape
    if T % time_block != 0:
        raise ValueError("gru_trainable requires T % time_block == 0")
    stream = stream_dtype or x.dtype
    batch_block = _fit_batch_block(batch_block, B, h0.shape[-1])
    xg = (
        jnp.einsum("bte,eg->tbg", x, params["w_ih"], preferred_element_type=jnp.float32)
        + params["b_ih"]
    ).astype(stream)
    hs_tm, hT = gru_recurrence_pallas(
        xg, h0, params["w_hh"].astype(stream), params["b_hh"],
        time_block, batch_block, interpret,
    )
    hs = jnp.swapaxes(hs_tm, 0, 1).astype(x.dtype)
    return hs, hT.astype(h0.dtype), hs_tm


def _gru_fwd(x, h0, params, time_block, batch_block, interpret, stream_dtype):
    hs, hT, hs_tm = _gru_fwd_impl(x, h0, params, time_block, batch_block, interpret, stream_dtype)
    return (hs, hT), (x, h0, params, hs_tm)


def _gru_bwd(time_block, batch_block, interpret, stream_dtype, residuals, grads):
    x, h0, params, hs_tm = residuals
    dhs, dhT = grads
    B, T, E = x.shape
    H = h0.shape[-1]
    stream = stream_dtype or x.dtype

    # fold the final-state cotangent into the last frame (hT == hs[:, -1])
    dhs = dhs.at[:, -1, :].add(dhT)
    dhs_tm = jnp.swapaxes(dhs, 0, 1).astype(stream)

    # recompute xg (bulk MXU) instead of saving (B,T,3H) residuals
    xg_tm = (
        jnp.einsum("bte,eg->tbg", x, params["w_ih"], preferred_element_type=jnp.float32)
        + params["b_ih"]
    ).astype(stream)
    hprev_tm = jnp.concatenate([h0[None], hs_tm[:-1]], axis=0).astype(stream)

    dxg_tm, r_tm, dh0 = gru_bwd_pallas(
        xg_tm, hprev_tm, dhs_tm, params["w_hh"].astype(stream), params["b_hh"],
        time_block=time_block,
        batch_block=_fit_batch_block(min(batch_block, 32), B, H, time_block),
        interpret=interpret,
    )

    dxg = dxg_tm.astype(jnp.float32)
    # dHG = dXG with the n-slice scaled by the reset gate
    dhg = jnp.concatenate(
        [dxg[..., : 2 * H], dxg[..., 2 * H :] * r_tm.astype(jnp.float32)], axis=-1
    )
    hprev_f = hprev_tm.astype(jnp.float32)

    d_w_hh = jnp.einsum("tbh,tbg->hg", hprev_f, dhg, preferred_element_type=jnp.float32)
    d_b_hh = jnp.sum(dhg, axis=(0, 1))
    d_w_ih = jnp.einsum(
        "bte,tbg->eg", x, dxg, preferred_element_type=jnp.float32
    )
    d_b_ih = jnp.sum(dxg, axis=(0, 1))
    dx = jnp.einsum(
        "tbg,eg->bte", dxg, params["w_ih"].astype(jnp.float32),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)

    dparams = {
        "w_ih": d_w_ih.astype(params["w_ih"].dtype),
        "b_ih": d_b_ih.astype(params["b_ih"].dtype),
        "w_hh": d_w_hh.astype(params["w_hh"].dtype),
        "b_hh": d_b_hh.astype(params["b_hh"].dtype),
    }
    return dx, dh0.astype(h0.dtype), dparams


gru_trainable.defvjp(_gru_fwd, _gru_bwd)
