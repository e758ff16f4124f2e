"""Flash-decode attention: fused single-token GQA over the KV cache.

XLA lowers the S=1 decode attention contraction to a VPU multiply-reduce
that profiles ~5x off the K/V-read bandwidth floor (441 us/layer at
B=8, T=1024, 16 heads — see RESULTS.md). This kernel streams the
head-major (B, KV, T, hd) cache through VMEM in T blocks with an online
(streaming) softmax, the classic flash-attention recurrence specialized to
one query token:

  per block: s = q k^T (MXU), masked by the valid cache length;
  m' = max(m, max s);  alpha = exp(m - m');
  l <- l*alpha + sum exp(s - m');  acc <- acc*alpha + exp(s - m') V.

Grid is (B, T_blocks) with T innermost; the running (m, l, acc) state
lives in VMEM scratch across the sequential block walk, and the output is
normalized once at the last block. Heads are walked with a static python
loop over the untiled leading dim of each block.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _decode_kernel(
    valid_ref,  # (1, 1) SMEM int32 — number of valid cache positions
    q_ref,  # (1, KV, R, hd)
    k_ref,  # (1, KV, Tb, hd)
    v_ref,  # (1, KV, Tb, hd)
    out_ref,  # (1, KV, R, hd)
    m_ref,  # (KV, R, 128) f32 scratch — running max (lane-replicated)
    l_ref,  # (KV, R, 128) f32 scratch — running normalizer
    acc_ref,  # (KV, R, hd) f32 scratch
    *,
    kv_heads: int,
    t_block: int,
    head_dim: int,
):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, -1e30)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    valid = valid_ref[0, 0]
    scale = jax.lax.rsqrt(jnp.asarray(head_dim, jnp.float32))
    base = t * t_block

    for g in range(kv_heads):  # static walk over the untiled head dim
        q_g = q_ref[0, g]  # (R, hd)
        k_g = k_ref[0, g]  # (Tb, hd)
        s = (
            jax.lax.dot_general(
                q_g, k_g, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            * scale
        )  # (R, Tb)
        pos = base + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(pos < valid, s, -1e30)

        m_old = m_ref[g][:, :1]  # (R, 1)
        m_new = jnp.maximum(m_old, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp(m_old - m_new)  # (R, 1)
        p = jnp.exp(s - m_new)  # (R, Tb)

        l_new = l_ref[g][:, :1] * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc_ref[g] = acc_ref[g] * alpha + jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0, g], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_ref[g] = jnp.broadcast_to(m_new, m_ref[g].shape)
        l_ref[g] = jnp.broadcast_to(l_new, l_ref[g].shape)

    @pl.when(t == pl.num_programs(1) - 1)
    def _():
        for g in range(kv_heads):
            denom = jnp.maximum(l_ref[g][:, :1], 1e-30)
            out_ref[0, g] = (acc_ref[g] / denom).astype(out_ref.dtype)


def _t_block_default() -> int:
    """Block length staged per DMA by the bounded kernels.  Default 256;
    PREGO_T_BLOCK overrides (trace-time).  The LAST block of a walk is
    always staged in full, so at short serving occupancies (valid ~72 of
    a 256-token window in the decode bench) a 256 block over-reads KV by
    ~2-3x — a 128 block halves that at the cost of twice the loop trips
    on long contexts.  Sweep on chip via scripts/chipq_r4*."""
    import os

    return int(os.environ.get("PREGO_T_BLOCK", "256"))


def decode_attention(
    q: jax.Array,  # (B, KV, R, hd) — query for ONE token per sequence
    cache_k: jax.Array,  # (B, KV, T, hd)
    cache_v: jax.Array,  # (B, KV, T, hd)
    valid_len: jax.Array,  # scalar int32 — attend to positions < valid_len
    t_block: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """Returns (B, KV, R, hd) attention output in q's dtype."""
    B, KV, R, hd = q.shape
    T = cache_k.shape[2]
    if T % t_block != 0:
        raise ValueError(f"T={T} not a multiple of t_block={t_block}")
    n_t = T // t_block

    kernel = functools.partial(
        _decode_kernel, kv_heads=KV, t_block=t_block, head_dim=hd
    )
    valid = jnp.asarray(valid_len, jnp.int32).reshape(1, 1)
    return pl.pallas_call(
        kernel,
        grid=(B, n_t),
        in_specs=[
            pl.BlockSpec((1, 1), lambda b, t: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, KV, R, hd), lambda b, t: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, KV, t_block, hd), lambda b, t: (b, 0, t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, KV, t_block, hd), lambda b, t: (b, 0, t, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, KV, R, hd), lambda b, t: (b, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, KV, R, hd), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((KV, R, 128), jnp.float32),
            pltpu.VMEM((KV, R, 128), jnp.float32),
            pltpu.VMEM((KV, R, hd), jnp.float32),
        ],
        interpret=interpret,
    )(valid, q, cache_k, cache_v)


def _bounded_walk(
    b, valid, q_ref, k_hbm, v_hbm, k_buf, v_buf, m_ref, l_ref, acc_ref, sem,
    *, kv_heads: int, t_block: int, head_dim: int,
):
    """Shared dynamic-trip block walk for the bounded decode kernels:
    streams k/v blocks up to valid_len through a double buffer and leaves
    the UNNORMALIZED streaming-softmax state in (m_ref, l_ref, acc_ref)."""
    # dynamic trip count: blocks wholly past valid_len are never DMA'd,
    # so HBM cache traffic scales with occupancy, not buffer length.
    # Clamped to >= 1: the block-0 DMA is started unconditionally below,
    # so valid_len == 0 must still run one (fully masked) iteration or
    # the copy would never be awaited (dangling semaphore)
    n_blocks = jnp.maximum((valid + t_block - 1) // t_block, 1)

    m_ref[:] = jnp.full_like(m_ref, -1e30)
    l_ref[:] = jnp.zeros_like(l_ref)
    acc_ref[:] = jnp.zeros_like(acc_ref)

    def k_dma(slot, idx):
        return pltpu.make_async_copy(
            k_hbm.at[b, :, pl.ds(idx * t_block, t_block), :],
            k_buf.at[slot],
            sem.at[slot, 0],
        )

    def v_dma(slot, idx):
        return pltpu.make_async_copy(
            v_hbm.at[b, :, pl.ds(idx * t_block, t_block), :],
            v_buf.at[slot],
            sem.at[slot, 1],
        )

    k_dma(0, 0).start()
    v_dma(0, 0).start()
    scale = jax.lax.rsqrt(jnp.asarray(head_dim, jnp.float32))

    def body(i, carry):
        slot = jax.lax.rem(i, 2)
        nxt = jax.lax.rem(i + 1, 2)

        @pl.when(i + 1 < n_blocks)
        def _():
            k_dma(nxt, i + 1).start()
            v_dma(nxt, i + 1).start()

        k_dma(slot, i).wait()
        v_dma(slot, i).wait()
        base = i * t_block

        for g in range(kv_heads):  # static walk over untiled head dim
            q_g = q_ref[0, g]  # (R, hd)
            s = (
                jax.lax.dot_general(
                    q_g, k_buf[slot, g], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                * scale
            )  # (R, Tb)
            pos = base + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(pos < valid, s, -1e30)

            m_old = m_ref[g][:, :1]
            m_new = jnp.maximum(m_old, jnp.max(s, axis=1, keepdims=True))
            alpha = jnp.exp(m_old - m_new)
            # explicit re-mask: in an ALL-masked block (the valid_len == 0
            # clamp iteration) m_new stays -1e30 and exp(s - m_new) would be
            # exp(0) = 1 for every masked position
            p = jnp.where(pos < valid, jnp.exp(s - m_new), 0.0)

            l_new = l_ref[g][:, :1] * alpha + jnp.sum(p, axis=1, keepdims=True)
            acc_ref[g] = acc_ref[g] * alpha + jax.lax.dot_general(
                p.astype(v_buf.dtype), v_buf[slot, g], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            m_ref[g] = jnp.broadcast_to(m_new, m_ref[g].shape)
            l_ref[g] = jnp.broadcast_to(l_new, l_ref[g].shape)
        return carry

    jax.lax.fori_loop(0, n_blocks, body, 0)


def _decode_kernel_bounded(
    valid_ref,  # (1, B+1) SMEM int32 — per-row valid lengths, [B] = max
    q_ref,  # (1, KV, R, hd) VMEM
    k_hbm,  # (B, KV, T, hd) ANY/HBM — full cache, blocks DMA'd manually
    v_hbm,  # (B, KV, T, hd) ANY/HBM
    out_ref,  # (1, KV, R, hd) VMEM
    k_buf,  # (2, KV, Tb, hd) VMEM scratch — double buffer
    v_buf,  # (2, KV, Tb, hd) VMEM scratch
    m_ref,  # (KV, R, 128) f32 scratch
    l_ref,  # (KV, R, 128) f32 scratch
    acc_ref,  # (KV, R, hd) f32 scratch
    sem,  # DMA semaphores (2 slots x {k, v})
    *,
    kv_heads: int,
    t_block: int,
    head_dim: int,
):
    b = pl.program_id(0)
    valid = valid_ref[0, b]  # per-row: each program walks its own bound
    _bounded_walk(
        b, valid, q_ref, k_hbm, v_hbm, k_buf, v_buf, m_ref, l_ref, acc_ref,
        sem, kv_heads=kv_heads, t_block=t_block, head_dim=head_dim,
    )

    for g in range(kv_heads):
        denom = jnp.maximum(l_ref[g][:, :1], 1e-30)
        out_ref[0, g] = (acc_ref[g] / denom).astype(out_ref.dtype)


def _decode_kernel_bounded_wo(
    valid_ref,  # (1, 1) SMEM int32
    q_ref,  # (1, KV, R, hd) VMEM
    k_hbm,  # (B, KV, T, hd) ANY/HBM
    v_hbm,  # (B, KV, T, hd) ANY/HBM
    wo_hbm,  # (KV*R*hd, D) ANY/HBM — one-time DMA, resident across grid
    out_ref,  # (1, 1, D) VMEM — attention output ALREADY projected by wo
    k_buf, v_buf, m_ref, l_ref, acc_ref,
    wo_vmem,  # (KV*R*hd, D) scratch
    sem,
    wo_sem,
    *,
    kv_heads: int,
    t_block: int,
    head_dim: int,
):
    b = pl.program_id(0)
    valid = valid_ref[0, 0]

    @pl.when(b == 0)
    def _():
        dma = pltpu.make_async_copy(wo_hbm, wo_vmem, wo_sem)
        dma.start()
        dma.wait()

    _bounded_walk(
        b, valid, q_ref, k_hbm, v_hbm, k_buf, v_buf, m_ref, l_ref, acc_ref,
        sem, kv_heads=kv_heads, t_block=t_block, head_dim=head_dim,
    )

    # normalize, flatten heads ((g, r, hd) order matches wo's row order =
    # h * hd with h = g*R + r), project: (1, H*hd) @ (H*hd, D)
    denom = jnp.maximum(l_ref[:, :, :1], 1e-30)  # (KV, R, 1)
    o = (acc_ref[:] / denom).astype(wo_vmem.dtype)  # (KV, R, hd)
    flat = o.reshape(1, -1)
    out_ref[0] = jax.lax.dot_general(
        flat, wo_vmem[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(out_ref.dtype)


def _decode_kernel_bounded_wo_res(
    valid_ref,  # (1, 1) SMEM int32
    q_ref,  # (1, KV, R, hd) VMEM
    h_ref,  # (1, 1, D) VMEM — residual stream row for this batch element
    k_hbm, v_hbm, wo_hbm,
    out_ref,  # (1, 1, D) h.dtype — h + attn @ wo (the post-attention h)
    k_buf, v_buf, m_ref, l_ref, acc_ref, wo_vmem, sem, wo_sem,
    *,
    kv_heads: int,
    t_block: int,
    head_dim: int,
):
    """_decode_kernel_bounded_wo with the residual add absorbed into the
    epilogue: replicates forward()'s ``h + wo_out.astype(h.dtype)`` add
    exactly (f32 projection cast to h.dtype, then added in h.dtype)."""
    b = pl.program_id(0)
    valid = valid_ref[0, 0]

    @pl.when(b == 0)
    def _():
        dma = pltpu.make_async_copy(wo_hbm, wo_vmem, wo_sem)
        dma.start()
        dma.wait()

    _bounded_walk(
        b, valid, q_ref, k_hbm, v_hbm, k_buf, v_buf, m_ref, l_ref, acc_ref,
        sem, kv_heads=kv_heads, t_block=t_block, head_dim=head_dim,
    )

    denom = jnp.maximum(l_ref[:, :, :1], 1e-30)
    o = (acc_ref[:] / denom).astype(wo_vmem.dtype)
    flat = o.reshape(1, -1)
    proj = jax.lax.dot_general(
        flat, wo_vmem[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out_ref[0] = h_ref[0] + proj.astype(out_ref.dtype)


def _decode_kernel_bounded_wo_res_upd(
    pos_ref,  # (1, 1) SMEM int32 — write position; attends to <= pos
    q_ref,  # (1, KV, R, hd) VMEM
    h_ref,  # (1, 1, D) VMEM — residual stream row
    knew_ref,  # (1, KV, 1, hd) VMEM — this token's post-rope key
    vnew_ref,  # (1, KV, 1, hd) VMEM
    wo_hbm,  # (KV*R*hd, D) ANY
    ck_in, cv_in,  # (B, KV, T, hd) ANY — aliased with the outputs
    out_ref,  # (1, 1, D) h.dtype — h + attn @ wo
    ck_out,  # (B, KV, T, hd) ANY — the updated cache (same buffer as ck_in)
    cv_out,
    k_buf, v_buf, m_ref, l_ref, acc_ref, wo_vmem, ktile, vtile,
    sem, wo_sem, upd_sem,
    *,
    kv_heads: int,
    t_block: int,
    head_dim: int,
):
    """The whole attention sub-layer tail in ONE program: write this
    token's k/v into the cache (the XLA dynamic_update_slice boundaries
    absorbed — 2 per layer), run the bounded flash walk over the updated
    cache, project through wo and add the residual.  The cache operands
    are input_output_aliased, so the write is in-place exactly like the
    donated while_loop carry; the k/v block walk starts only after the
    write DMA completes, so the final block reads the new token.

    The write is a read-modify-write of the containing 8-row sublane
    tile: Mosaic rejects DMA offsets that are not tile-aligned on a
    tiled dim (an arbitrary ``pos`` lands mid-tile — observed on-chip as
    a bare compile-helper exit 1), so we stage [tile, tile+8), insert the
    new row with an iota mask, and write the tile back."""
    b = pl.program_id(0)
    pos = pos_ref[0, 0]
    valid = pos + 1
    tile = (pos // 8) * 8
    row = pos - tile

    @pl.when(b == 0)
    def _():
        dma = pltpu.make_async_copy(wo_hbm, wo_vmem, wo_sem)
        dma.start()
        dma.wait()

    # stage the 8-row tiles containing pos (8-aligned dynamic offsets)
    kr = pltpu.make_async_copy(
        ck_in.at[b, :, pl.ds(tile, 8), :], ktile, upd_sem.at[0]
    )
    vr = pltpu.make_async_copy(
        cv_in.at[b, :, pl.ds(tile, 8), :], vtile, upd_sem.at[1]
    )
    kr.start()
    vr.start()
    kr.wait()
    vr.wait()
    rows = jax.lax.broadcasted_iota(jnp.int32, (kv_heads, 8, head_dim), 1)
    ktile[:] = jnp.where(rows == row, knew_ref[0, :, 0][:, None, :], ktile[:])
    vtile[:] = jnp.where(rows == row, vnew_ref[0, :, 0][:, None, :], vtile[:])
    kw = pltpu.make_async_copy(
        ktile, ck_out.at[b, :, pl.ds(tile, 8), :], upd_sem.at[0]
    )
    vw = pltpu.make_async_copy(
        vtile, cv_out.at[b, :, pl.ds(tile, 8), :], upd_sem.at[1]
    )
    kw.start()
    vw.start()
    kw.wait()
    vw.wait()

    _bounded_walk(
        b, valid, q_ref, ck_out, cv_out, k_buf, v_buf, m_ref, l_ref, acc_ref,
        sem, kv_heads=kv_heads, t_block=t_block, head_dim=head_dim,
    )

    denom = jnp.maximum(l_ref[:, :, :1], 1e-30)
    o = (acc_ref[:] / denom).astype(wo_vmem.dtype)
    flat = o.reshape(1, -1)
    proj = jax.lax.dot_general(
        flat, wo_vmem[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out_ref[0] = h_ref[0] + proj.astype(out_ref.dtype)


def _decode_kernel_bounded_fold(
    valid_ref,  # (1, B+1) SMEM int32 — per-row valid lengths, [B] = max
    q_ref,  # (B, KV, R, hd) VMEM — ALL batch rows resident (tiny)
    k_hbm,  # (B, KV, T, hd) ANY/HBM
    v_hbm,  # (B, KV, T, hd) ANY/HBM
    out_ref,  # (B, KV, R, hd) VMEM
    k_buf,  # (2, KV, Tb, hd) VMEM scratch — double buffer
    v_buf,
    m_ref,  # (KV, R, 128) f32 scratch
    l_ref,
    acc_ref,  # (KV, R, hd) f32 scratch
    sem,
    *,
    batch: int,
    kv_heads: int,
    t_block: int,
    head_dim: int,
):
    """Batch-FOLDED variant: one grid program walks a flat (b, block)
    sequence in a single fori_loop, so the double-buffered DMA pipeline
    spans batch-row boundaries (row b+1's first block prefetches while
    row b's last block computes) and the per-grid-program overhead of the
    (B,) grid is paid once instead of B times.

    The flat f -> (b, block) mapping needs a SHARED trip count, so the
    walk is bounded by the batch MAX (valid_ref[0, batch]); rows shorter
    than the max mask their tail blocks (wasted DMA bounded by the
    occupancy spread — per-row exact bounds ride the per-head kernel)."""
    n_blocks = jnp.maximum((valid_ref[0, batch] + t_block - 1) // t_block, 1)
    total = batch * n_blocks

    def k_dma(slot, flat):
        b = flat // n_blocks
        idx = flat - b * n_blocks
        return pltpu.make_async_copy(
            k_hbm.at[b, :, pl.ds(idx * t_block, t_block), :],
            k_buf.at[slot],
            sem.at[slot, 0],
        )

    def v_dma(slot, flat):
        b = flat // n_blocks
        idx = flat - b * n_blocks
        return pltpu.make_async_copy(
            v_hbm.at[b, :, pl.ds(idx * t_block, t_block), :],
            v_buf.at[slot],
            sem.at[slot, 1],
        )

    k_dma(0, 0).start()
    v_dma(0, 0).start()
    scale = jax.lax.rsqrt(jnp.asarray(head_dim, jnp.float32))

    def body(f, carry):
        slot = jax.lax.rem(f, 2)
        nxt = jax.lax.rem(f + 1, 2)

        @pl.when(f + 1 < total)
        def _():
            k_dma(nxt, f + 1).start()
            v_dma(nxt, f + 1).start()

        k_dma(slot, f).wait()
        v_dma(slot, f).wait()
        b = f // n_blocks
        i = f - b * n_blocks
        valid = valid_ref[0, b]  # per-row bound

        @pl.when(i == 0)
        def _():
            m_ref[:] = jnp.full_like(m_ref, -1e30)
            l_ref[:] = jnp.zeros_like(l_ref)
            acc_ref[:] = jnp.zeros_like(acc_ref)

        base = i * t_block
        for g in range(kv_heads):
            q_g = q_ref[b, g]  # (R, hd) — dynamic untiled leading index
            s = (
                jax.lax.dot_general(
                    q_g, k_buf[slot, g], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                * scale
            )
            pos = base + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(pos < valid, s, -1e30)

            m_old = m_ref[g][:, :1]
            m_new = jnp.maximum(m_old, jnp.max(s, axis=1, keepdims=True))
            alpha = jnp.exp(m_old - m_new)
            # explicit re-mask: all-masked blocks must contribute zero
            p = jnp.where(pos < valid, jnp.exp(s - m_new), 0.0)

            l_new = l_ref[g][:, :1] * alpha + jnp.sum(p, axis=1, keepdims=True)
            acc_ref[g] = acc_ref[g] * alpha + jax.lax.dot_general(
                p.astype(v_buf.dtype), v_buf[slot, g], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            m_ref[g] = jnp.broadcast_to(m_new, m_ref[g].shape)
            l_ref[g] = jnp.broadcast_to(l_new, l_ref[g].shape)

        @pl.when(i == n_blocks - 1)
        def _():
            for g in range(kv_heads):
                denom = jnp.maximum(l_ref[g][:, :1], 1e-30)
                out_ref[b, g] = (acc_ref[g] / denom).astype(out_ref.dtype)

        return carry

    jax.lax.fori_loop(0, total, body, 0)


def _valid_vec(valid_len: jax.Array, batch: int) -> jax.Array:
    """Lower scalar-or-(B,) ``valid_len`` to the bounded kernels' shared
    (1, B+1) SMEM layout: per-row valid lengths with the batch max in the
    last slot (the folded walks' shared trip bound)."""
    v = jnp.asarray(valid_len, jnp.int32)
    if v.ndim == 0:
        v = jnp.full((batch,), v, jnp.int32)
    return jnp.concatenate([v, jnp.max(v)[None]]).reshape(1, batch + 1)


def _fit_head_group(head_group: int, kv_heads: int, rows_per_head: int) -> int:
    """Largest usable flat-head group <= the requested one: must divide
    kv_heads (static group walk) and keep the group's stacked query rows
    (G * R) a multiple of 8, because the flat kernels slice the running
    (m, l, acc) scratch along the SUBLANE dim at group offsets.  Returns
    1 (flat path disabled) when nothing fits."""
    g = min(head_group, kv_heads)
    while g > 1:
        if kv_heads % g == 0 and (g * rows_per_head) % 8 == 0:
            return g
        g -= 1
    return 1


def _flat_group_update(
    g0,  # python int — first head of the group
    group,  # python int — heads stacked into this update
    q_rows,  # (G*R, hd) — the group's queries, head-major rows
    slot, base, valid,
    k_buf, v_buf,  # (2, KV, Tb, hd) staged block (int8 when quantized)
    ks_buf, vs_buf,  # (2, KV, Tb) f32 scales, or None (bf16 cache)
    m_ref, l_ref, acc_ref,  # FLAT scratch: (KV*R, 128/128/hd) f32
    *,
    scale, t_block: int, rows_per_head: int,
):
    """Streaming-softmax update for ``group`` heads STACKED into one
    matmul pair.  The per-head R=1 dots of _q8_head_update/_decode_kernel
    use one MXU row each and serialize KV-many tiny ops per block; here
    the group's queries form a (G*R, hd) operand against the group's
    cache block flattened to (G*Tb, hd), so scores come out as ONE
    (G*R, G*Tb) matmul whose off-diagonal head pairs are masked to -1e30
    (softmax) and exact 0 (value contraction).  The redundant cross-head
    FLOPs are G x, but these matmuls underfilled the MXU by ~G x to begin
    with — op-issue count drops G x for roughly constant MXU time.

    The (KV, Tb, hd) -> (G*Tb, hd) reshape merges a leading (untiled) dim
    into the sublane dim; with Tb % 8 == 0 both layouts tile identically,
    so Mosaic lowers it as a no-op view."""
    G, R, Tb = group, rows_per_head, t_block
    rows = G * R
    quantized = ks_buf is not None

    kg = k_buf[slot][g0 : g0 + G]  # (G, Tb, hd) — static head slice
    vg = v_buf[slot][g0 : g0 + G]
    k2 = kg.reshape(G * Tb, kg.shape[-1])
    v2 = vg.reshape(G * Tb, vg.shape[-1])
    if quantized:
        # VPU-dequant the staged tiles (int8 MXU contraction is a slow
        # Mosaic fallback on v5e — see _q8_head_update); per-position
        # scales ride on the score columns / p rows instead of the tiles
        k2 = k2.astype(jnp.bfloat16)
        v2 = v2.astype(jnp.bfloat16)
        q_rows = q_rows.astype(jnp.bfloat16)
        # (1, G*Tb) scale rows: lane-concat of per-head (1, Tb) strips —
        # a (KV, Tb) -> (1, KV*Tb) reshape would relayout TILED dims
        ks_row = jnp.concatenate(
            [ks_buf[slot, g0 + j][None, :] for j in range(G)], axis=1
        )
        vs_row = jnp.concatenate(
            [vs_buf[slot, g0 + j][None, :] for j in range(G)], axis=1
        )

    s = (
        jax.lax.dot_general(
            q_rows, k2, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        * scale
    )  # (G*R, G*Tb)
    if quantized:
        s = s * ks_row

    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
    col_head = col // Tb
    pos = base + (col - col_head * Tb)
    keep = (col_head == row // R) & (pos < valid)
    s = jnp.where(keep, s, -1e30)

    rs = pl.ds(g0 * R, rows)  # 8-aligned sublane slice (see _fit_head_group)
    m_old = m_ref[rs][:, :1]  # (rows, 1)
    m_new = jnp.maximum(m_old, jnp.max(s, axis=1, keepdims=True))
    alpha = jnp.exp(m_old - m_new)
    # exact zeros off-diagonal and beyond valid: cross-head columns must
    # contribute nothing to l or to the value contraction
    p = jnp.where(keep, jnp.exp(s - m_new), 0.0)

    l_new = l_ref[rs][:, :1] * alpha + jnp.sum(p, axis=1, keepdims=True)
    pv = p * vs_row if quantized else p
    contrib = jax.lax.dot_general(
        pv.astype(v2.dtype), v2, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (rows, hd)
    acc_ref[rs] = acc_ref[rs] * alpha + contrib
    m_ref[rs] = jnp.broadcast_to(m_new, (rows, m_ref.shape[-1]))
    l_ref[rs] = jnp.broadcast_to(l_new, (rows, l_ref.shape[-1]))


def _decode_kernel_bounded_fold_flat(
    valid_ref,  # (1, B+1) SMEM int32 — per-row valid lengths, [B] = max
    q_ref,  # (B, KV*R, hd) VMEM — queries flattened head-major
    k_hbm,  # (B, KV, T, hd) ANY/HBM
    v_hbm,
    out_ref,  # (B, KV*R, hd) VMEM
    k_buf,  # (2, KV, Tb, hd) VMEM scratch
    v_buf,
    m_ref,  # (KV*R, 128) f32 scratch — FLAT across heads
    l_ref,
    acc_ref,  # (KV*R, hd) f32
    sem,
    *,
    batch: int,
    kv_heads: int,
    t_block: int,
    head_dim: int,
    head_group: int,
    rows_per_head: int,
):
    """Batch-folded walk (see _decode_kernel_bounded_fold) with the
    per-head update replaced by _flat_group_update: kv_heads/head_group
    stacked matmul pairs per block instead of kv_heads serial R-row
    dots — the per-(batch,head) op-issue cost that dominates the 7B/13B
    B>1 decode residue (RESULTS.md batch sweep).  Trips are bounded by
    the batch max; each row masks with its own valid length."""
    n_blocks = jnp.maximum((valid_ref[0, batch] + t_block - 1) // t_block, 1)
    total = batch * n_blocks

    def k_dma(slot, flat):
        b = flat // n_blocks
        idx = flat - b * n_blocks
        return pltpu.make_async_copy(
            k_hbm.at[b, :, pl.ds(idx * t_block, t_block), :],
            k_buf.at[slot],
            sem.at[slot, 0],
        )

    def v_dma(slot, flat):
        b = flat // n_blocks
        idx = flat - b * n_blocks
        return pltpu.make_async_copy(
            v_hbm.at[b, :, pl.ds(idx * t_block, t_block), :],
            v_buf.at[slot],
            sem.at[slot, 1],
        )

    k_dma(0, 0).start()
    v_dma(0, 0).start()
    scale = jax.lax.rsqrt(jnp.asarray(head_dim, jnp.float32))

    def body(f, carry):
        slot = jax.lax.rem(f, 2)
        nxt = jax.lax.rem(f + 1, 2)

        @pl.when(f + 1 < total)
        def _():
            k_dma(nxt, f + 1).start()
            v_dma(nxt, f + 1).start()

        k_dma(slot, f).wait()
        v_dma(slot, f).wait()
        b = f // n_blocks
        i = f - b * n_blocks
        valid = valid_ref[0, b]  # per-row bound

        @pl.when(i == 0)
        def _():
            m_ref[:] = jnp.full_like(m_ref, -1e30)
            l_ref[:] = jnp.zeros_like(l_ref)
            acc_ref[:] = jnp.zeros_like(acc_ref)

        base = i * t_block
        for gi in range(kv_heads // head_group):
            g0 = gi * head_group
            _flat_group_update(
                g0, head_group,
                q_ref[b, pl.ds(g0 * rows_per_head, head_group * rows_per_head)],
                slot, base, valid,
                k_buf, v_buf, None, None, m_ref, l_ref, acc_ref,
                scale=scale, t_block=t_block, rows_per_head=rows_per_head,
            )

        @pl.when(i == n_blocks - 1)
        def _():
            denom = jnp.maximum(l_ref[:, :1], 1e-30)
            out_ref[b] = (acc_ref[:] / denom).astype(out_ref.dtype)

        return carry

    jax.lax.fori_loop(0, total, body, 0)


def decode_attention_bounded(
    q: jax.Array,  # (B, KV, R, hd)
    cache_k: jax.Array,  # (B, KV, T, hd)
    cache_v: jax.Array,  # (B, KV, T, hd)
    valid_len: jax.Array,  # scalar int32
    t_block: int = None,
    interpret: bool = False,
    fold_batch: bool = False,
    head_group: int = 1,
) -> jax.Array:
    """Flash-decode variant whose HBM cache reads stop at valid_len: the
    block walk is a dynamic-trip fori_loop with manual double-buffered
    DMA (k/v blocks staged HBM -> VMEM scratch), so a decode at position p
    reads ceil(p / t_block) blocks instead of T / t_block. At PREGO's
    serving occupancy (~1.5k of 2048, or 136 of 512 in the decode bench)
    this removes most of the 0.67 ms/step full-window KV read.
    ``fold_batch`` runs the whole batch in ONE grid program (flat
    (b, block) walk) so the DMA pipeline crosses batch-row boundaries.
    ``head_group`` > 1 additionally stacks that many heads into each
    score/value matmul pair (_flat_group_update) — implies the folded
    walk; requests that don't fit (_fit_head_group) fall back.

    ``valid_len`` may be a scalar (all rows share the bound — the
    reference decode semantics) or a (B,) vector of PER-ROW bounds (the
    continuous-batching serving path: each slot attends to its own
    occupancy).  Either lowers to one (1, B+1) SMEM operand — per-row
    valids plus the batch max in the last slot."""
    B, KV, R, hd = q.shape
    T = cache_k.shape[2]
    if t_block is None:
        t_block = _t_block_default()
    t_block = min(t_block, T)
    if T % t_block != 0:
        raise ValueError(f"T={T} not a multiple of t_block={t_block}")

    valid = _valid_vec(valid_len, B)
    head_group = _fit_head_group(head_group, KV, R)
    if head_group > 1:
        kernel = functools.partial(
            _decode_kernel_bounded_fold_flat,
            batch=B, kv_heads=KV, t_block=t_block, head_dim=hd,
            head_group=head_group, rows_per_head=R,
        )
        out = pl.pallas_call(
            kernel,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, KV * R, hd), q.dtype),
            scratch_shapes=[
                pltpu.VMEM((2, KV, t_block, hd), cache_k.dtype),
                pltpu.VMEM((2, KV, t_block, hd), cache_v.dtype),
                pltpu.VMEM((KV * R, 128), jnp.float32),
                pltpu.VMEM((KV * R, 128), jnp.float32),
                pltpu.VMEM((KV * R, hd), jnp.float32),
                pltpu.SemaphoreType.DMA((2, 2)),
            ],
            interpret=interpret,
        )(valid, q.reshape(B, KV * R, hd), cache_k, cache_v)
        return out.reshape(B, KV, R, hd)
    if fold_batch:
        kernel = functools.partial(
            _decode_kernel_bounded_fold,
            batch=B, kv_heads=KV, t_block=t_block, head_dim=hd,
        )
        return pl.pallas_call(
            kernel,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, KV, R, hd), q.dtype),
            scratch_shapes=[
                pltpu.VMEM((2, KV, t_block, hd), cache_k.dtype),
                pltpu.VMEM((2, KV, t_block, hd), cache_v.dtype),
                pltpu.VMEM((KV, R, 128), jnp.float32),
                pltpu.VMEM((KV, R, 128), jnp.float32),
                pltpu.VMEM((KV, R, hd), jnp.float32),
                pltpu.SemaphoreType.DMA((2, 2)),
            ],
            interpret=interpret,
        )(valid, q, cache_k, cache_v)

    kernel = functools.partial(
        _decode_kernel_bounded, kv_heads=KV, t_block=t_block, head_dim=hd
    )
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, B + 1), lambda b: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, KV, R, hd), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, KV, R, hd), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, KV, R, hd), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, KV, t_block, hd), cache_k.dtype),
            pltpu.VMEM((2, KV, t_block, hd), cache_v.dtype),
            pltpu.VMEM((KV, R, 128), jnp.float32),
            pltpu.VMEM((KV, R, 128), jnp.float32),
            pltpu.VMEM((KV, R, hd), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        interpret=interpret,
    )(valid, q, cache_k, cache_v)


def decode_attention_bounded_wo(
    q: jax.Array,  # (B, KV, R, hd)
    cache_k: jax.Array,  # (B, KV, T, hd)
    cache_v: jax.Array,  # (B, KV, T, hd)
    valid_len: jax.Array,  # scalar int32
    wo: jax.Array,  # (KV*R*hd, D) bf16 — the attention output projection
    t_block: int = None,
    interpret: bool = False,
    residual: "jax.Array | None" = None,  # (B, 1, D) — fuse h + proj
) -> jax.Array:
    """Bounded flash decode with the wo projection FUSED into the kernel
    epilogue (VERDICT r2 #4 lever: one fewer op boundary per layer).  wo
    is DMA'd to VMEM once at grid step 0 and stays resident across the
    (B,) grid, so its HBM bytes are read once per step exactly like the
    XLA path.  Returns (B, 1, D) f32 — already projected; the middle
    singleton keeps the per-program output block (1, 1, D), whose last
    two dims satisfy the Mosaic (8, 128) tiling rule for any B (a 2D
    (1, D) block over (B, D) does NOT lower when B > 1).  Caller gates on
    wo fitting VMEM beside the k/v double buffers (~8 MB at the 1B
    serving shape; the 7B shape serves int8 and keeps the unfused path).

    With ``residual`` the kernel also absorbs the post-attention residual
    add and returns ``residual + proj.astype(residual.dtype)`` in
    residual's dtype — one fewer XLA fusion per layer again."""
    B, KV, R, hd = q.shape
    T = cache_k.shape[2]
    D = wo.shape[1]
    assert wo.shape[0] == KV * R * hd, (wo.shape, KV * R * hd)
    if t_block is None:
        t_block = _t_block_default()
    t_block = min(t_block, T)
    if T % t_block != 0:
        raise ValueError(f"T={T} not a multiple of t_block={t_block}")

    valid = jnp.asarray(valid_len, jnp.int32).reshape(1, 1)
    scratch_shapes = [
        pltpu.VMEM((2, KV, t_block, hd), cache_k.dtype),
        pltpu.VMEM((2, KV, t_block, hd), cache_v.dtype),
        pltpu.VMEM((KV, R, 128), jnp.float32),
        pltpu.VMEM((KV, R, 128), jnp.float32),
        pltpu.VMEM((KV, R, hd), jnp.float32),
        pltpu.VMEM((KV * R * hd, D), wo.dtype),
        pltpu.SemaphoreType.DMA((2, 2)),
        pltpu.SemaphoreType.DMA,
    ]
    if residual is not None:
        assert residual.shape == (B, 1, D), (residual.shape, (B, 1, D))
        kernel = functools.partial(
            _decode_kernel_bounded_wo_res,
            kv_heads=KV, t_block=t_block, head_dim=hd,
        )
        return pl.pallas_call(
            kernel,
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, 1), lambda b: (0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((1, KV, R, hd), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, D), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(
                (1, 1, D), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((B, 1, D), residual.dtype),
            scratch_shapes=scratch_shapes,
            interpret=interpret,
        )(valid, q, residual, cache_k, cache_v, wo)

    kernel = functools.partial(
        _decode_kernel_bounded_wo, kv_heads=KV, t_block=t_block, head_dim=hd
    )
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda b: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, KV, R, hd), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, D), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, 1, D), jnp.float32),
        scratch_shapes=scratch_shapes,
        interpret=interpret,
    )(valid, q, cache_k, cache_v, wo)


def decode_attention_bounded_wo_res_upd(
    q: jax.Array,  # (B, KV, R, hd)
    residual: jax.Array,  # (B, 1, D)
    k_new: jax.Array,  # (B, KV, 1, hd) — this token's post-rope key
    v_new: jax.Array,  # (B, KV, 1, hd)
    cache_k: jax.Array,  # (B, KV, T, hd) — will be DONATED (aliased)
    cache_v: jax.Array,
    pos: jax.Array,  # scalar int32 write position; attends to <= pos
    wo: jax.Array,  # (KV*R*hd, D)
    t_block: int = None,
    interpret: bool = False,
):
    """Attention sub-layer tail as one program: cache write + bounded
    flash walk + wo projection + residual add.  Returns
    ``(residual + attn @ wo, cache_k', cache_v')`` with the caches
    updated IN PLACE via input_output_aliasing (callers must treat the
    passed caches as consumed, like any donated buffer)."""
    B, KV, R, hd = q.shape
    T = cache_k.shape[2]
    D = wo.shape[1]
    assert wo.shape[0] == KV * R * hd, (wo.shape, KV * R * hd)
    assert residual.shape == (B, 1, D), (residual.shape, (B, 1, D))
    assert k_new.shape == (B, KV, 1, hd), k_new.shape
    if t_block is None:
        t_block = _t_block_default()
    t_block = min(t_block, T)
    if T % t_block != 0:
        raise ValueError(f"T={T} not a multiple of t_block={t_block}")

    pos_arr = jnp.asarray(pos, jnp.int32).reshape(1, 1)
    kernel = functools.partial(
        _decode_kernel_bounded_wo_res_upd,
        kv_heads=KV, t_block=t_block, head_dim=hd,
    )
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda b: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, KV, R, hd), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, D), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, KV, 1, hd), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, KV, 1, hd), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # wo
            pl.BlockSpec(memory_space=pl.ANY),  # cache_k (aliased -> out 1)
            pl.BlockSpec(memory_space=pl.ANY),  # cache_v (aliased -> out 2)
        ],
        out_specs=[
            pl.BlockSpec((1, 1, D), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, 1, D), residual.dtype),
            jax.ShapeDtypeStruct(cache_k.shape, cache_k.dtype),
            jax.ShapeDtypeStruct(cache_v.shape, cache_v.dtype),
        ],
        input_output_aliases={6: 1, 7: 2},
        scratch_shapes=[
            pltpu.VMEM((2, KV, t_block, hd), cache_k.dtype),
            pltpu.VMEM((2, KV, t_block, hd), cache_v.dtype),
            pltpu.VMEM((KV, R, 128), jnp.float32),
            pltpu.VMEM((KV, R, 128), jnp.float32),
            pltpu.VMEM((KV, R, hd), jnp.float32),
            pltpu.VMEM((KV * R * hd, D), wo.dtype),
            pltpu.VMEM((KV, 8, hd), cache_k.dtype),
            pltpu.VMEM((KV, 8, hd), cache_v.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(pos_arr, q, residual, k_new, v_new, wo, cache_k, cache_v)


def _q8_head_update(
    g, q_row, slot, base, valid,
    kq_buf, ks_buf, vq_buf, vs_buf, m_ref, l_ref, acc_ref,
    *, scale, int8_mxu: bool,
):
    """One head's streaming-softmax update against the staged int8 block
    (shared by the per-batch-program and batch-folded q8 kernels).
    ``g`` may be a Python int (unrolled heads) or a traced scalar
    (fori_loop heads) — all indexing is dynamic-leading-dim safe."""
    k_sc = ks_buf[slot, pl.ds(g, 1)]  # (1, Tb)
    if int8_mxu:
        # quantize the query per row so q@k runs int8 x int8 ->
        # int32 on the MXU (int8 operands straight into the dot —
        # casting to int32 first is an unsupported Mosaic matmul)
        q_g = q_row.astype(jnp.float32)  # (R, hd)
        qmax = jnp.maximum(
            jnp.max(jnp.abs(q_g), axis=1, keepdims=True), 1e-8
        )
        qs = qmax / 127.0  # (R, 1)
        q_q = jnp.round(q_g / qs).astype(jnp.int8)
        s_i32 = jax.lax.dot_general(
            q_q, kq_buf[slot, g],
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # (R, Tb)
        s = s_i32.astype(jnp.float32) * qs * k_sc * scale
    else:
        # VPU-dequantize the int8 tile to bf16 and ride the proven
        # bf16 MXU path (the transposed int8 contraction lowers to
        # a slow Mosaic fallback on v5e)
        k_bf = kq_buf[slot, g].astype(jnp.bfloat16)  # (Tb, hd)
        s = (
            jax.lax.dot_general(
                q_row.astype(jnp.bfloat16), k_bf,
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            * k_sc
            * scale
        )  # (R, Tb)
    pos = base + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(pos < valid, s, -1e30)

    m_old = m_ref[g][:, :1]
    m_new = jnp.maximum(m_old, jnp.max(s, axis=1, keepdims=True))
    alpha = jnp.exp(m_old - m_new)
    # explicit re-mask (see _decode_kernel_bounded): all-masked
    # blocks must contribute zero, not exp(0)
    p = jnp.where(pos < valid, jnp.exp(s - m_new), 0.0)  # (R, Tb)

    l_new = l_ref[g][:, :1] * alpha + jnp.sum(p, axis=1, keepdims=True)
    # fold the per-position v scale into p
    pv = p * vs_buf[slot, pl.ds(g, 1)]  # (R, Tb)
    if int8_mxu:
        # quantize p per row at int16-equivalent precision emulated
        # as TWO 7-bit int8 dots (hi/lo split): single-int8 p costs
        # ~2% max-norm error, the split makes it negligible
        pmax = jnp.maximum(
            jnp.max(jnp.abs(pv), axis=1, keepdims=True), 1e-30
        )
        ps = pmax / (127.0 * 128.0)
        pq = jnp.round(pv / ps)  # integers in [0, 16256]
        hi = jnp.floor(pq / 128.0)
        lo = pq - hi * 128.0

        def _pdot(rows):
            return jax.lax.dot_general(
                rows, vq_buf[slot, g],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32)

        contrib = (
            _pdot(hi.astype(jnp.int8)) * 128.0 + _pdot(lo.astype(jnp.int8))
        ) * ps  # (R, hd)
    else:
        contrib = jax.lax.dot_general(
            pv.astype(jnp.bfloat16),
            vq_buf[slot, g].astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (R, hd)
    acc_ref[g] = acc_ref[g] * alpha + contrib
    m_ref[g] = jnp.broadcast_to(m_new, m_ref[g].shape)
    l_ref[g] = jnp.broadcast_to(l_new, l_ref[g].shape)


def _decode_kernel_bounded_q8(
    valid_ref,  # (1, B+1) SMEM int32 — per-row valid lengths, [B] = max
    q_ref,  # (1, KV, R, hd) VMEM — bf16/f32 query
    kq_hbm,  # (B, KV, T, hd) int8
    ks_hbm,  # (B, KV, T) f32 per-position k scales
    vq_hbm,  # (B, KV, T, hd) int8
    vs_hbm,  # (B, KV, T) f32 per-position v scales
    out_ref,  # (1, KV, R, hd) VMEM
    kq_buf,  # (2, KV, Tb, hd) int8 scratch
    ks_buf,  # (2, KV, Tb) f32 scratch
    vq_buf,  # (2, KV, Tb, hd) int8 scratch
    vs_buf,  # (2, KV, Tb) f32 scratch
    m_ref,  # (KV, R, 128) f32
    l_ref,  # (KV, R, 128) f32
    acc_ref,  # (KV, R, hd) f32
    sem,  # DMA semaphores (2 slots x 4 streams)
    *,
    kv_heads: int,
    t_block: int,
    head_dim: int,
    int8_mxu: bool,
    head_loop: bool = False,
):
    b = pl.program_id(0)
    valid = valid_ref[0, b]  # per-row: each program walks its own bound
    # clamped like _decode_kernel_bounded: the warmup DMA must be awaited
    n_blocks = jnp.maximum((valid + t_block - 1) // t_block, 1)

    m_ref[:] = jnp.full_like(m_ref, -1e30)
    l_ref[:] = jnp.zeros_like(l_ref)
    acc_ref[:] = jnp.zeros_like(acc_ref)

    def dmas(slot, idx):
        sl = pl.ds(idx * t_block, t_block)
        return [
            pltpu.make_async_copy(kq_hbm.at[b, :, sl, :], kq_buf.at[slot], sem.at[slot, 0]),
            pltpu.make_async_copy(ks_hbm.at[b, :, sl], ks_buf.at[slot], sem.at[slot, 1]),
            pltpu.make_async_copy(vq_hbm.at[b, :, sl, :], vq_buf.at[slot], sem.at[slot, 2]),
            pltpu.make_async_copy(vs_hbm.at[b, :, sl], vs_buf.at[slot], sem.at[slot, 3]),
        ]

    for d in dmas(0, 0):
        d.start()
    scale = jax.lax.rsqrt(jnp.asarray(head_dim, jnp.float32))

    def body(i, carry):
        slot = jax.lax.rem(i, 2)
        nxt = jax.lax.rem(i + 1, 2)

        @pl.when(i + 1 < n_blocks)
        def _():
            for d in dmas(nxt, i + 1):
                d.start()

        for d in dmas(slot, i):
            d.wait()
        base = i * t_block

        def _upd(g):
            _q8_head_update(
                g, q_ref[0, g], slot, base, valid,
                kq_buf, ks_buf, vq_buf, vs_buf, m_ref, l_ref, acc_ref,
                scale=scale, int8_mxu=int8_mxu,
            )

        if head_loop:
            # fori_loop over heads: the unrolled body at many-KV-head
            # shapes (40 at 13B) can stall the Mosaic compile; the loop
            # keeps the body one head wide at a small interleave cost
            jax.lax.fori_loop(
                0, kv_heads, lambda g, c: (_upd(g), c)[1], 0
            )
        else:
            for g in range(kv_heads):
                _upd(g)
        return carry

    jax.lax.fori_loop(0, n_blocks, body, 0)

    def _emit(g):
        denom = jnp.maximum(l_ref[g][:, :1], 1e-30)
        out_ref[0, g] = (acc_ref[g] / denom).astype(out_ref.dtype)

    if head_loop:
        jax.lax.fori_loop(0, kv_heads, lambda g, c: (_emit(g), c)[1], 0)
    else:
        for g in range(kv_heads):
            _emit(g)


def _decode_kernel_bounded_q8_fold(
    valid_ref,  # (1, B+1) SMEM int32 — per-row valid lengths, [B] = max
    q_ref,  # (B, KV, R, hd) VMEM — ALL batch rows resident (tiny)
    kq_hbm,  # (B, KV, T, hd) int8
    ks_hbm,  # (B, KV, T) f32
    vq_hbm,  # (B, KV, T, hd) int8
    vs_hbm,  # (B, KV, T) f32
    out_ref,  # (B, KV, R, hd) VMEM
    kq_buf, ks_buf, vq_buf, vs_buf,  # double-buffered block scratch
    m_ref, l_ref, acc_ref,  # streaming-softmax state (one row at a time)
    sem,  # DMA semaphores (2 slots x 4 streams)
    *,
    batch: int,
    kv_heads: int,
    t_block: int,
    head_dim: int,
    int8_mxu: bool,
    head_loop: bool = False,
):
    """Batch-FOLDED int8-KV variant (see _decode_kernel_bounded_fold):
    one grid program walks a flat (b, block) sequence so the 4-stream DMA
    pipeline crosses batch-row boundaries and per-grid-program overhead
    is paid once instead of B times — the B=8 7B serving lever
    (RESULTS.md: per-(batch,head) program costs grow at 32 layers).
    Trips bounded by the batch max (valid_ref[0, batch]); per-row mask."""
    n_blocks = jnp.maximum((valid_ref[0, batch] + t_block - 1) // t_block, 1)
    total = batch * n_blocks

    def dmas(slot, flat):
        b = flat // n_blocks
        idx = flat - b * n_blocks
        sl = pl.ds(idx * t_block, t_block)
        return [
            pltpu.make_async_copy(kq_hbm.at[b, :, sl, :], kq_buf.at[slot], sem.at[slot, 0]),
            pltpu.make_async_copy(ks_hbm.at[b, :, sl], ks_buf.at[slot], sem.at[slot, 1]),
            pltpu.make_async_copy(vq_hbm.at[b, :, sl, :], vq_buf.at[slot], sem.at[slot, 2]),
            pltpu.make_async_copy(vs_hbm.at[b, :, sl], vs_buf.at[slot], sem.at[slot, 3]),
        ]

    for d in dmas(0, 0):
        d.start()
    scale = jax.lax.rsqrt(jnp.asarray(head_dim, jnp.float32))

    def body(f, carry):
        slot = jax.lax.rem(f, 2)
        nxt = jax.lax.rem(f + 1, 2)

        @pl.when(f + 1 < total)
        def _():
            for d in dmas(nxt, f + 1):
                d.start()

        for d in dmas(slot, f):
            d.wait()
        b = f // n_blocks
        i = f - b * n_blocks
        valid = valid_ref[0, b]  # per-row bound

        @pl.when(i == 0)
        def _():
            m_ref[:] = jnp.full_like(m_ref, -1e30)
            l_ref[:] = jnp.zeros_like(l_ref)
            acc_ref[:] = jnp.zeros_like(acc_ref)

        base = i * t_block

        def _upd(g):
            _q8_head_update(
                g, q_ref[b, g], slot, base, valid,
                kq_buf, ks_buf, vq_buf, vs_buf, m_ref, l_ref, acc_ref,
                scale=scale, int8_mxu=int8_mxu,
            )

        def _emit(g):
            denom = jnp.maximum(l_ref[g][:, :1], 1e-30)
            out_ref[b, g] = (acc_ref[g] / denom).astype(out_ref.dtype)

        if head_loop:
            jax.lax.fori_loop(0, kv_heads, lambda g, c: (_upd(g), c)[1], 0)
        else:
            for g in range(kv_heads):
                _upd(g)

        @pl.when(i == n_blocks - 1)
        def _():
            if head_loop:
                jax.lax.fori_loop(
                    0, kv_heads, lambda g, c: (_emit(g), c)[1], 0
                )
            else:
                for g in range(kv_heads):
                    _emit(g)

        return carry

    jax.lax.fori_loop(0, total, body, 0)


def _decode_kernel_bounded_q8_fold_flat(
    valid_ref,  # (1, B+1) SMEM int32 — per-row valid lengths, [B] = max
    q_ref,  # (B, KV*R, hd) VMEM — queries flattened head-major
    kq_hbm,  # (B, KV, T, hd) int8
    ks_hbm,  # (B, KV, T) f32
    vq_hbm,  # (B, KV, T, hd) int8
    vs_hbm,  # (B, KV, T) f32
    out_ref,  # (B, KV*R, hd) VMEM
    kq_buf, ks_buf, vq_buf, vs_buf,  # double-buffered block scratch
    m_ref, l_ref, acc_ref,  # FLAT (KV*R, 128/128/hd) f32
    sem,  # DMA semaphores (2 slots x 4 streams)
    *,
    batch: int,
    kv_heads: int,
    t_block: int,
    head_dim: int,
    head_group: int,
    rows_per_head: int,
):
    """int8-KV batch-folded walk with stacked-head updates — the
    production 7B/13B B>1 serving kernel shape (see
    _decode_kernel_bounded_fold_flat).  Dequant stays on the VPU; the
    per-position k/v scales ride the flat score columns / p rows
    (_flat_group_update).  Trips bounded by the batch max; per-row mask."""
    n_blocks = jnp.maximum((valid_ref[0, batch] + t_block - 1) // t_block, 1)
    total = batch * n_blocks

    def dmas(slot, flat):
        b = flat // n_blocks
        idx = flat - b * n_blocks
        sl = pl.ds(idx * t_block, t_block)
        return [
            pltpu.make_async_copy(kq_hbm.at[b, :, sl, :], kq_buf.at[slot], sem.at[slot, 0]),
            pltpu.make_async_copy(ks_hbm.at[b, :, sl], ks_buf.at[slot], sem.at[slot, 1]),
            pltpu.make_async_copy(vq_hbm.at[b, :, sl, :], vq_buf.at[slot], sem.at[slot, 2]),
            pltpu.make_async_copy(vs_hbm.at[b, :, sl], vs_buf.at[slot], sem.at[slot, 3]),
        ]

    for d in dmas(0, 0):
        d.start()
    scale = jax.lax.rsqrt(jnp.asarray(head_dim, jnp.float32))

    def body(f, carry):
        slot = jax.lax.rem(f, 2)
        nxt = jax.lax.rem(f + 1, 2)

        @pl.when(f + 1 < total)
        def _():
            for d in dmas(nxt, f + 1):
                d.start()

        for d in dmas(slot, f):
            d.wait()
        b = f // n_blocks
        i = f - b * n_blocks
        valid = valid_ref[0, b]  # per-row bound

        @pl.when(i == 0)
        def _():
            m_ref[:] = jnp.full_like(m_ref, -1e30)
            l_ref[:] = jnp.zeros_like(l_ref)
            acc_ref[:] = jnp.zeros_like(acc_ref)

        base = i * t_block
        for gi in range(kv_heads // head_group):
            g0 = gi * head_group
            _flat_group_update(
                g0, head_group,
                q_ref[b, pl.ds(g0 * rows_per_head, head_group * rows_per_head)],
                slot, base, valid,
                kq_buf, vq_buf, ks_buf, vs_buf, m_ref, l_ref, acc_ref,
                scale=scale, t_block=t_block, rows_per_head=rows_per_head,
            )

        @pl.when(i == n_blocks - 1)
        def _():
            denom = jnp.maximum(l_ref[:, :1], 1e-30)
            out_ref[b] = (acc_ref[:] / denom).astype(out_ref.dtype)

        return carry

    jax.lax.fori_loop(0, total, body, 0)


def decode_attention_bounded_q8(
    q: jax.Array,  # (B, KV, R, hd)
    cache_kq: jax.Array,  # (B, KV, T, hd) int8
    cache_ks: jax.Array,  # (B, KV, T) f32
    cache_vq: jax.Array,  # (B, KV, T, hd) int8
    cache_vs: jax.Array,  # (B, KV, T) f32
    valid_len: jax.Array,
    t_block: int = None,
    interpret: bool = False,
    int8_mxu: bool = False,
    fold_batch: bool = False,
    head_loop: bool = None,
    head_group: int = 1,
) -> jax.Array:
    """Bounded flash decode over an int8 KV cache (per-position-per-head
    symmetric scales): halves decode HBM cache traffic and doubles the
    context capacity per chip. Default mode dequantizes each staged tile
    to bf16 on the VPU and rides the bf16 MXU — measured 48 ms/step for
    the transposed int8 contraction on v5e (Mosaic fallback) vs the bf16
    path's sub-ms, so ``int8_mxu=True`` is kept for re-evaluation on
    hardware whose Mosaic lowers it natively. ``fold_batch`` runs the
    whole batch in ONE grid program (flat (b, block) walk), like
    decode_attention_bounded's fold variant. ``head_loop`` switches the
    per-head unroll to a fori_loop (default: auto-on at > 32 kv heads,
    where the unrolled body stalls the Mosaic compile — observed at the
    13B shape; PREGO_Q8_HEAD_LOOP=1/0 forces). ``head_group`` > 1 stacks
    that many heads per matmul pair (_flat_group_update; implies the
    folded walk, VPU-dequant mode only — int8_mxu keeps the per-head
    path).  ``valid_len``: scalar or (B,) per-row bounds (see
    decode_attention_bounded)."""
    import os

    if head_loop is None:
        env = os.environ.get("PREGO_Q8_HEAD_LOOP")
        q8hl = env == "1" if env is not None else None
        head_loop = q8hl if q8hl is not None else q.shape[1] > 32
    B, KV, R, hd = q.shape
    T = cache_kq.shape[2]
    if t_block is None:
        t_block = _t_block_default()
    t_block = min(t_block, T)
    if T % t_block != 0:
        raise ValueError(f"T={T} not a multiple of t_block={t_block}")

    valid = _valid_vec(valid_len, B)
    head_group = 1 if int8_mxu else _fit_head_group(head_group, KV, R)
    if head_group > 1:
        kernel = functools.partial(
            _decode_kernel_bounded_q8_fold_flat,
            batch=B, kv_heads=KV, t_block=t_block, head_dim=hd,
            head_group=head_group, rows_per_head=R,
        )
        out = pl.pallas_call(
            kernel,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, KV * R, hd), q.dtype),
            scratch_shapes=[
                pltpu.VMEM((2, KV, t_block, hd), jnp.int8),
                pltpu.VMEM((2, KV, t_block), jnp.float32),
                pltpu.VMEM((2, KV, t_block, hd), jnp.int8),
                pltpu.VMEM((2, KV, t_block), jnp.float32),
                pltpu.VMEM((KV * R, 128), jnp.float32),
                pltpu.VMEM((KV * R, 128), jnp.float32),
                pltpu.VMEM((KV * R, hd), jnp.float32),
                pltpu.SemaphoreType.DMA((2, 4)),
            ],
            interpret=interpret,
        )(valid, q.reshape(B, KV * R, hd), cache_kq, cache_ks, cache_vq, cache_vs)
        return out.reshape(B, KV, R, hd)
    if fold_batch:
        kernel = functools.partial(
            _decode_kernel_bounded_q8_fold,
            batch=B, kv_heads=KV, t_block=t_block, head_dim=hd,
            int8_mxu=int8_mxu, head_loop=head_loop,
        )
        return pl.pallas_call(
            kernel,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, KV, R, hd), q.dtype),
            scratch_shapes=[
                pltpu.VMEM((2, KV, t_block, hd), jnp.int8),
                pltpu.VMEM((2, KV, t_block), jnp.float32),
                pltpu.VMEM((2, KV, t_block, hd), jnp.int8),
                pltpu.VMEM((2, KV, t_block), jnp.float32),
                pltpu.VMEM((KV, R, 128), jnp.float32),
                pltpu.VMEM((KV, R, 128), jnp.float32),
                pltpu.VMEM((KV, R, hd), jnp.float32),
                pltpu.SemaphoreType.DMA((2, 4)),
            ],
            interpret=interpret,
        )(valid, q, cache_kq, cache_ks, cache_vq, cache_vs)

    kernel = functools.partial(
        _decode_kernel_bounded_q8, kv_heads=KV, t_block=t_block, head_dim=hd,
        int8_mxu=int8_mxu, head_loop=head_loop,
    )
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, B + 1), lambda b: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, KV, R, hd), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, KV, R, hd), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, KV, R, hd), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, KV, t_block, hd), jnp.int8),
            pltpu.VMEM((2, KV, t_block), jnp.float32),
            pltpu.VMEM((2, KV, t_block, hd), jnp.int8),
            pltpu.VMEM((2, KV, t_block), jnp.float32),
            pltpu.VMEM((KV, R, 128), jnp.float32),
            pltpu.VMEM((KV, R, 128), jnp.float32),
            pltpu.VMEM((KV, R, hd), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 4)),
        ],
        interpret=interpret,
    )(valid, q, cache_kq, cache_ks, cache_vq, cache_vs)


def decode_attention_reference(q, cache_k, cache_v, valid_len):
    """Plain-XLA reference with identical semantics (testing/fallback).
    ``valid_len``: scalar or (B,) per-row bounds."""
    hd = q.shape[-1]
    scores = jnp.einsum(
        "bgrh,bgth->bgrt", q, cache_k, preferred_element_type=jnp.float32
    ) / jnp.sqrt(jnp.asarray(hd, jnp.float32))
    T = cache_k.shape[2]
    vl = jnp.asarray(valid_len)
    if vl.ndim == 1:
        vl = vl[:, None, None, None]
    mask = jnp.arange(T)[None, None, None, :] < vl
    scores = jnp.where(mask, scores, -jnp.inf)
    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    return jnp.einsum(
        "bgrt,bgth->bgrh", probs, cache_v, preferred_element_type=jnp.float32
    ).astype(q.dtype)
