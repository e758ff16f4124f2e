"""Flash-decode attention kernel vs the XLA reference (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from prego_tpu.ops.decode_attention import (
    decode_attention,
    decode_attention_bounded,
    decode_attention_reference,
)


@pytest.mark.parametrize("valid", [1, 100, 511, 512])
@pytest.mark.parametrize("R", [1, 2])
def test_matches_reference(rng, valid, R):
    B, KV, hd, T = 2, 4, 128, 512
    q = rng.normal(0, 1, (B, KV, R, hd)).astype(np.float32)
    k = rng.normal(0, 1, (B, KV, T, hd)).astype(np.float32)
    v = rng.normal(0, 1, (B, KV, T, hd)).astype(np.float32)
    # positions >= valid are garbage and must not leak
    k[:, :, valid:] = 1e4
    v[:, :, valid:] = -1e4

    ref = decode_attention_reference(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.int32(valid)
    )
    got = decode_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.int32(valid),
        t_block=256, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_online_softmax_across_blocks(rng):
    """valid span crossing multiple T blocks exercises the m/l carry."""
    B, KV, R, hd, T = 1, 2, 1, 128, 1024
    q = rng.normal(0, 1, (B, KV, R, hd)).astype(np.float32)
    k = rng.normal(0, 1, (B, KV, T, hd)).astype(np.float32)
    v = rng.normal(0, 1, (B, KV, T, hd)).astype(np.float32)
    for valid in (257, 700, 1024):
        ref = decode_attention_reference(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.int32(valid)
        )
        got = decode_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.int32(valid),
            t_block=256, interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5
        )


@pytest.mark.parametrize("fold", [False, True])
@pytest.mark.parametrize("valid", [1, 100, 255, 256, 257, 511, 512])
@pytest.mark.parametrize("R", [1, 2])
def test_bounded_matches_reference(rng, valid, R, fold):
    """The DMA-bounded variant must equal the reference at every block
    occupancy, including exact block boundaries (its trip count is
    dynamic in valid_len)."""
    B, KV, hd, T = 2, 4, 128, 512
    q = rng.normal(0, 1, (B, KV, R, hd)).astype(np.float32)
    k = rng.normal(0, 1, (B, KV, T, hd)).astype(np.float32)
    v = rng.normal(0, 1, (B, KV, T, hd)).astype(np.float32)
    k[:, :, valid:] = 1e4
    v[:, :, valid:] = -1e4

    ref = decode_attention_reference(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.int32(valid)
    )
    got = decode_attention_bounded(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.int32(valid),
        t_block=256, interpret=True, fold_batch=fold,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_bounded_empty_cache_defined(rng):
    """valid_len == 0 must stay defined (one fully-masked block iteration,
    zeros out) — the warmup DMA is started unconditionally and has to be
    awaited rather than left dangling."""
    B, KV, R, hd, T = 1, 2, 1, 128, 512
    q = rng.normal(0, 1, (B, KV, R, hd)).astype(np.float32)
    k = rng.normal(0, 1, (B, KV, T, hd)).astype(np.float32)
    v = rng.normal(0, 1, (B, KV, T, hd)).astype(np.float32)
    got = decode_attention_bounded(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.int32(0),
        t_block=256, interpret=True,
    )
    assert np.all(np.asarray(got) == 0)


def test_bounded_small_buffer(rng):
    """T smaller than the default t_block clamps the block size."""
    B, KV, R, hd, T = 1, 2, 1, 128, 128
    q = rng.normal(0, 1, (B, KV, R, hd)).astype(np.float32)
    k = rng.normal(0, 1, (B, KV, T, hd)).astype(np.float32)
    v = rng.normal(0, 1, (B, KV, T, hd)).astype(np.float32)
    ref = decode_attention_reference(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.int32(77)
    )
    got = decode_attention_bounded(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.int32(77),
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


def _quantize_kv(x):
    s = np.maximum(np.max(np.abs(x), axis=-1), 1e-8) / 127.0
    q = np.round(x / s[..., None]).astype(np.int8)
    return q, s.astype(np.float32)


@pytest.mark.parametrize("fold", [False, True])
@pytest.mark.parametrize("int8_mxu", [False, True])
@pytest.mark.parametrize("valid", [1, 100, 256, 300, 512])
def test_q8_matches_dequantized_reference(rng, valid, int8_mxu, fold):
    """int8-KV flash decode vs the f32 reference run on the DEQUANTIZED
    cache: isolates the kernel's own error (q/p row quantization) from
    the storage quantization, which the bar covers separately. fold=True
    exercises the batch-folded single-program walk (distinct per-row
    state reset/output paths)."""
    B, KV, R, hd, T = 2, 4, 1, 128, 512
    q = rng.normal(0, 1, (B, KV, R, hd)).astype(np.float32)
    k = rng.normal(0, 1, (B, KV, T, hd)).astype(np.float32)
    v = rng.normal(0, 1, (B, KV, T, hd)).astype(np.float32)
    kq, ks = _quantize_kv(k)
    vq, vs = _quantize_kv(v)
    k_deq = kq.astype(np.float32) * ks[..., None]
    v_deq = vq.astype(np.float32) * vs[..., None]

    from prego_tpu.ops.decode_attention import decode_attention_bounded_q8

    ref = decode_attention_reference(
        jnp.asarray(q), jnp.asarray(k_deq), jnp.asarray(v_deq), jnp.int32(valid)
    )
    got = decode_attention_bounded_q8(
        jnp.asarray(q), jnp.asarray(kq), jnp.asarray(ks),
        jnp.asarray(vq), jnp.asarray(vs), jnp.int32(valid),
        t_block=256, interpret=True, int8_mxu=int8_mxu, fold_batch=fold,
    )
    # residual error: bf16 rounding (default mode) or in-kernel q int8
    # rounding (int8_mxu; p runs at int16-equivalent precision via the
    # hi/lo split) — bounded in max-norm terms
    err = np.abs(np.asarray(got) - np.asarray(ref))
    norm = np.abs(np.asarray(ref)).max()
    assert err.max() / norm < 0.01
    assert err.mean() / norm < 0.003


def test_fit_head_group():
    """Group must divide kv_heads and keep G*R sublane-slice aligned."""
    from prego_tpu.ops.decode_attention import _fit_head_group

    assert _fit_head_group(32, 32, 1) == 32
    assert _fit_head_group(16, 32, 1) == 16
    assert _fit_head_group(12, 32, 1) == 8  # 12 doesn't divide 32
    assert _fit_head_group(8, 40, 1) == 8  # 13B: 40 % 8 == 0
    assert _fit_head_group(16, 40, 1) == 8  # 16 doesn't divide 40
    assert _fit_head_group(4, 32, 1) == 1  # 4*1 rows not 8-aligned
    assert _fit_head_group(4, 32, 2) == 4  # but fine at R=2
    assert _fit_head_group(8, 4, 1) == 1  # nothing fits -> per-head path


@pytest.mark.parametrize("head_group", [8, 16])
@pytest.mark.parametrize("valid", [1, 100, 255, 256, 257, 511, 512])
def test_flat_heads_match_reference(rng, valid, head_group):
    """Stacked-head (flat) kernel vs the XLA reference: the block-diagonal
    mask must keep cross-head score columns out of both the softmax and
    the value contraction, at every block occupancy."""
    B, KV, R, hd, T = 2, 16, 1, 128, 512
    q = rng.normal(0, 1, (B, KV, R, hd)).astype(np.float32)
    k = rng.normal(0, 1, (B, KV, T, hd)).astype(np.float32)
    v = rng.normal(0, 1, (B, KV, T, hd)).astype(np.float32)
    k[:, :, valid:] = 1e4
    v[:, :, valid:] = -1e4

    ref = decode_attention_reference(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.int32(valid)
    )
    got = decode_attention_bounded(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.int32(valid),
        t_block=256, interpret=True, head_group=head_group,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_flat_heads_gqa_rows(rng):
    """R>1 (GQA query rows per kv head): row->head mapping inside the flat
    mask is row // R; a group of 4 heads x R=2 rows stays 8-aligned."""
    B, KV, R, hd, T = 1, 8, 2, 128, 512
    q = rng.normal(0, 1, (B, KV, R, hd)).astype(np.float32)
    k = rng.normal(0, 1, (B, KV, T, hd)).astype(np.float32)
    v = rng.normal(0, 1, (B, KV, T, hd)).astype(np.float32)
    for valid in (77, 300):
        ref = decode_attention_reference(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.int32(valid)
        )
        got = decode_attention_bounded(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.int32(valid),
            t_block=256, interpret=True, head_group=4,
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5
        )


def test_flat_heads_unfit_group_falls_back(rng):
    """A head_group that can't satisfy the alignment/divisibility rules
    silently uses the per-head path (same numbers)."""
    B, KV, R, hd, T = 1, 4, 1, 128, 256
    q = rng.normal(0, 1, (B, KV, R, hd)).astype(np.float32)
    k = rng.normal(0, 1, (B, KV, T, hd)).astype(np.float32)
    v = rng.normal(0, 1, (B, KV, T, hd)).astype(np.float32)
    ref = decode_attention_reference(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.int32(100)
    )
    got = decode_attention_bounded(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.int32(100),
        t_block=256, interpret=True, head_group=16,  # 4 heads: no fit
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("head_group", [8, 16])
@pytest.mark.parametrize("valid", [1, 100, 256, 300, 512])
def test_q8_flat_heads_match_dequantized_reference(rng, valid, head_group):
    """int8-KV flat-head kernel vs the f32 reference on the dequantized
    cache — the per-position k/v scale rows (lane-concat strips) must land
    on the right flat columns."""
    B, KV, R, hd, T = 2, 16, 1, 128, 512
    q = rng.normal(0, 1, (B, KV, R, hd)).astype(np.float32)
    k = rng.normal(0, 1, (B, KV, T, hd)).astype(np.float32)
    v = rng.normal(0, 1, (B, KV, T, hd)).astype(np.float32)
    kq, ks = _quantize_kv(k)
    vq, vs = _quantize_kv(v)
    k_deq = kq.astype(np.float32) * ks[..., None]
    v_deq = vq.astype(np.float32) * vs[..., None]

    from prego_tpu.ops.decode_attention import decode_attention_bounded_q8

    ref = decode_attention_reference(
        jnp.asarray(q), jnp.asarray(k_deq), jnp.asarray(v_deq), jnp.int32(valid)
    )
    got = decode_attention_bounded_q8(
        jnp.asarray(q), jnp.asarray(kq), jnp.asarray(ks),
        jnp.asarray(vq), jnp.asarray(vs), jnp.int32(valid),
        t_block=256, interpret=True, head_group=head_group,
    )
    err = np.abs(np.asarray(got) - np.asarray(ref))
    norm = np.abs(np.asarray(ref)).max()
    assert err.max() / norm < 0.01
    assert err.mean() / norm < 0.003


def test_head_group_default_is_shape_aware(monkeypatch):
    """Flat-head attention auto-on (G=8) at >=24 layers — the measured-
    fastest dispatch at the 7B/13B shapes for every batch tried — off at
    the 16-layer 1B-class shapes; PREGO_HEAD_GROUP forces either way
    (unset-with-no-config/0 -> 1 = off; garbage falls through to the
    shape-aware default)."""
    from prego_tpu.models.llama.config import LlamaConfig
    from prego_tpu.models.llama.model import _head_group_requested

    def cfg(layers):
        return LlamaConfig(
            dim=64, n_layers=layers, n_heads=4, n_kv_heads=4, vocab_size=64,
            multiple_of=16, norm_eps=1e-5, max_batch_size=8, max_seq_len=64,
        )

    monkeypatch.delenv("PREGO_HEAD_GROUP", raising=False)
    assert _head_group_requested(8) == 1
    assert _head_group_requested(8, cfg(32)) == 8
    assert _head_group_requested(1, cfg(32)) == 8  # b1: 7B/13B both win
    assert _head_group_requested(8, cfg(16)) == 1  # 1B-class: unmeasured
    monkeypatch.setenv("PREGO_HEAD_GROUP", "16")
    assert _head_group_requested(8) == 16
    assert _head_group_requested(8, cfg(16)) == 16
    monkeypatch.setenv("PREGO_HEAD_GROUP", "0")
    assert _head_group_requested(8) == 1
    assert _head_group_requested(8, cfg(32)) == 1  # env forces OFF too
    monkeypatch.setenv("PREGO_HEAD_GROUP", "bogus")
    assert _head_group_requested(8) == 1
    # a typo must NOT silently disable the measured shape-aware default:
    # unparsable values warn and fall through (ADVICE r3 findings 1+3)
    assert _head_group_requested(8, cfg(32)) == 8
    assert _head_group_requested(8, cfg(16)) == 1


def test_q8_storage_error_budget(rng):
    """End-to-end int8-KV attention vs the exact f32 attention on the
    ORIGINAL cache: total relative error (storage + kernel) stays small."""
    B, KV, R, hd, T = 1, 2, 1, 128, 512
    q = rng.normal(0, 1, (B, KV, R, hd)).astype(np.float32)
    k = rng.normal(0, 1, (B, KV, T, hd)).astype(np.float32)
    v = rng.normal(0, 1, (B, KV, T, hd)).astype(np.float32)
    kq, ks = _quantize_kv(k)
    vq, vs = _quantize_kv(v)

    from prego_tpu.ops.decode_attention import decode_attention_bounded_q8

    ref = decode_attention_reference(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.int32(400)
    )
    got = decode_attention_bounded_q8(
        jnp.asarray(q), jnp.asarray(kq), jnp.asarray(ks),
        jnp.asarray(vq), jnp.asarray(vs), jnp.int32(400),
        t_block=256, interpret=True,
    )
    err = np.abs(np.asarray(got) - np.asarray(ref))
    norm = np.abs(np.asarray(ref)).max()
    assert err.max() / norm < 0.02 and err.mean() / norm < 0.005


@pytest.mark.parametrize("R", [4, 8])
def test_gqa_wide_groups(rng, R):
    """GQA with many query heads per kv head (LLaMA-3-style ratios)."""
    B, KV, hd, T = 2, 2, 128, 512
    q = rng.normal(0, 1, (B, KV, R, hd)).astype(np.float32)
    k = rng.normal(0, 1, (B, KV, T, hd)).astype(np.float32)
    v = rng.normal(0, 1, (B, KV, T, hd)).astype(np.float32)
    ref = decode_attention_reference(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.int32(300)
    )
    got = decode_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.int32(300),
        t_block=256, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("valid", [1, 137, 512])
def test_bounded_wo_fusion_matches_unfused(valid):
    """Attention with the wo projection fused into the kernel epilogue
    must equal bounded attention followed by the XLA wo matmul."""
    from prego_tpu.ops.decode_attention import decode_attention_bounded_wo

    rng = np.random.default_rng(valid)
    B, KV, R, hd, T, D = 3, 4, 2, 128, 512, 256
    q = rng.normal(0, 1, (B, KV, R, hd)).astype(np.float32)
    k = rng.normal(0, 1, (B, KV, T, hd)).astype(np.float32)
    v = rng.normal(0, 1, (B, KV, T, hd)).astype(np.float32)
    wo = rng.normal(0, 0.05, (KV * R * hd, D)).astype(np.float32)
    k[:, :, valid:] = 1e4
    v[:, :, valid:] = -1e4

    attn = decode_attention_bounded(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.int32(valid),
        t_block=256, interpret=True,
    )  # (B, KV, R, hd)
    want = jnp.dot(
        attn.reshape(B, KV * R * hd), jnp.asarray(wo),
        preferred_element_type=jnp.float32,
    )
    got = decode_attention_bounded_wo(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.int32(valid),
        jnp.asarray(wo), t_block=256, interpret=True,
    )  # (B, 1, D)
    assert got.shape == (B, 1, D)
    np.testing.assert_allclose(
        np.asarray(got)[:, 0], np.asarray(want), rtol=2e-4, atol=2e-4
    )

    # residual-epilogue variant: returns h + proj in h's dtype
    h = jnp.asarray(rng.normal(0, 1, (B, 1, D)).astype(np.float32))
    got_res = decode_attention_bounded_wo(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.int32(valid),
        jnp.asarray(wo), t_block=256, interpret=True, residual=h,
    )
    assert got_res.shape == (B, 1, D) and got_res.dtype == h.dtype
    np.testing.assert_allclose(
        np.asarray(got_res), np.asarray(h + got.astype(h.dtype)),
        rtol=2e-5, atol=2e-5,
    )


@pytest.mark.parametrize("pos", [0, 13, 136, 511])
def test_bounded_wo_res_upd_matches_update_then_attend(pos):
    """The cache-write-fused attention tail must equal: XLA
    dynamic_update_slice into the cache, bounded attention over it with
    valid = pos+1, wo projection, residual add — and must return caches
    identical to the dus result everywhere."""
    from prego_tpu.ops.decode_attention import (
        decode_attention_bounded_wo,
        decode_attention_bounded_wo_res_upd,
    )

    rng = np.random.default_rng(pos + 17)
    B, KV, R, hd, T, D = 3, 4, 2, 128, 512, 256
    q = jnp.asarray(rng.normal(0, 1, (B, KV, R, hd)).astype(np.float32))
    k0 = jnp.asarray(rng.normal(0, 1, (B, KV, T, hd)).astype(np.float32))
    v0 = jnp.asarray(rng.normal(0, 1, (B, KV, T, hd)).astype(np.float32))
    kn = jnp.asarray(rng.normal(0, 1, (B, KV, 1, hd)).astype(np.float32))
    vn = jnp.asarray(rng.normal(0, 1, (B, KV, 1, hd)).astype(np.float32))
    wo = jnp.asarray(rng.normal(0, 0.05, (KV * R * hd, D)).astype(np.float32))
    h = jnp.asarray(rng.normal(0, 1, (B, 1, D)).astype(np.float32))

    k_ref = jax.lax.dynamic_update_slice(k0, kn, (0, 0, pos, 0))
    v_ref = jax.lax.dynamic_update_slice(v0, vn, (0, 0, pos, 0))
    want = decode_attention_bounded_wo(
        q, k_ref, v_ref, jnp.int32(pos + 1), wo,
        t_block=256, interpret=True, residual=h,
    )

    got, ck, cv = decode_attention_bounded_wo_res_upd(
        q, h, kn, vn, k0, v0, jnp.int32(pos), wo, t_block=256, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)
    np.testing.assert_array_equal(np.asarray(ck), np.asarray(k_ref))
    np.testing.assert_array_equal(np.asarray(cv), np.asarray(v_ref))


def test_fold_batch_default_is_shape_aware(monkeypatch):
    """fold_batch auto-on for batch>1 at >=24 layers (7B-class, measured
    win), off below (1B-class, measured loss); env forces either way."""
    from prego_tpu.models.llama.config import LlamaConfig
    from prego_tpu.models.llama.model import _fold_batch_requested

    def cfg(layers):
        return LlamaConfig(
            dim=64, n_layers=layers, n_heads=4, n_kv_heads=4, vocab_size=64,
            multiple_of=16, norm_eps=1e-5, max_batch_size=8, max_seq_len=64,
        )

    monkeypatch.delenv("PREGO_FOLD_BATCH", raising=False)
    assert _fold_batch_requested(8, cfg(32))
    assert not _fold_batch_requested(8, cfg(16))
    assert not _fold_batch_requested(1, cfg(32))  # b1 never folds
    assert not _fold_batch_requested(16, cfg(32))  # >8 unproven on-chip
    monkeypatch.setenv("PREGO_FOLD_BATCH", "0")
    assert not _fold_batch_requested(8, cfg(32))
    monkeypatch.setenv("PREGO_FOLD_BATCH", "1")
    assert _fold_batch_requested(8, cfg(16))


@pytest.mark.parametrize("fold", [False, True])
def test_q8_head_loop_matches_unrolled(rng, fold):
    """fori_loop-over-heads variant (compile-size lever for many-KV-head
    shapes, auto-on above 32 heads) must equal the unrolled walk."""
    B, KV, R, hd, T = 2, 4, 1, 128, 512
    q = rng.normal(0, 1, (B, KV, R, hd)).astype(np.float32)
    k = rng.normal(0, 1, (B, KV, T, hd)).astype(np.float32)
    v = rng.normal(0, 1, (B, KV, T, hd)).astype(np.float32)
    kq, ks = _quantize_kv(k)
    vq, vs = _quantize_kv(v)

    from prego_tpu.ops.decode_attention import decode_attention_bounded_q8

    args = (jnp.asarray(q), jnp.asarray(kq), jnp.asarray(ks),
            jnp.asarray(vq), jnp.asarray(vs), jnp.int32(300))
    unrolled = decode_attention_bounded_q8(
        *args, t_block=256, interpret=True, fold_batch=fold, head_loop=False
    )
    looped = decode_attention_bounded_q8(
        *args, t_block=256, interpret=True, fold_batch=fold, head_loop=True
    )
    np.testing.assert_array_equal(np.asarray(unrolled), np.asarray(looped))


# ------------------------------------------------- per-row valid lengths


@pytest.mark.parametrize("variant", ["perhead", "fold", "flat"])
def test_per_row_valid_matches_reference(rng, variant):
    """(B,) valid_len: each row attends to its own occupancy (the
    continuous-batching serving bound), including a zero-valid row
    (inactive slot -> all-masked -> zeros out, defined)."""
    B, KV, R, hd, T = 4, 8, 1, 128, 512
    valids = np.array([1, 100, 512, 0], np.int32)
    q = rng.normal(0, 1, (B, KV, R, hd)).astype(np.float32)
    k = rng.normal(0, 1, (B, KV, T, hd)).astype(np.float32)
    v = rng.normal(0, 1, (B, KV, T, hd)).astype(np.float32)
    for b, vl in enumerate(valids):
        k[b, :, vl:] = 1e4  # garbage beyond each row's bound must not leak
        v[b, :, vl:] = -1e4

    live = valids > 0
    ref = decode_attention_reference(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(valids)
    )
    got = decode_attention_bounded(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(valids),
        t_block=256, interpret=True,
        fold_batch=(variant == "fold"),
        head_group=8 if variant == "flat" else 1,
    )
    np.testing.assert_allclose(
        np.asarray(got)[live], np.asarray(ref)[live], rtol=2e-5, atol=2e-5
    )
    # zero-valid rows: reference softmaxes all -inf (NaN); the kernels
    # clamp the denominator and emit zeros
    np.testing.assert_array_equal(np.asarray(got)[~live], 0.0)


@pytest.mark.parametrize("variant", ["perhead", "fold", "flat"])
def test_q8_per_row_valid_matches_reference(rng, variant):
    B, KV, R, hd, T = 3, 8, 1, 128, 512
    valids = np.array([257, 64, 512], np.int32)
    q = rng.normal(0, 1, (B, KV, R, hd)).astype(np.float32)
    k = rng.normal(0, 1, (B, KV, T, hd)).astype(np.float32)
    v = rng.normal(0, 1, (B, KV, T, hd)).astype(np.float32)
    kq, ks = _quantize_kv(k)
    vq, vs = _quantize_kv(v)
    k_deq = kq.astype(np.float32) * ks[..., None]
    v_deq = vq.astype(np.float32) * vs[..., None]

    from prego_tpu.ops.decode_attention import decode_attention_bounded_q8

    ref = decode_attention_reference(
        jnp.asarray(q), jnp.asarray(k_deq), jnp.asarray(v_deq),
        jnp.asarray(valids),
    )
    got = decode_attention_bounded_q8(
        jnp.asarray(q), jnp.asarray(kq), jnp.asarray(ks),
        jnp.asarray(vq), jnp.asarray(vs), jnp.asarray(valids),
        t_block=256, interpret=True,
        fold_batch=(variant == "fold"),
        head_group=8 if variant == "flat" else 1,
    )
    err = np.abs(np.asarray(got) - np.asarray(ref))
    norm = np.abs(np.asarray(ref)).max()
    assert err.max() / norm < 0.01


def test_per_row_valid_equals_scalar_when_uniform(rng):
    """A constant (B,) vector must produce bit-identical results to the
    scalar bound on every dispatch variant."""
    B, KV, R, hd, T = 2, 8, 2, 128, 512
    q = rng.normal(0, 1, (B, KV, R, hd)).astype(np.float32)
    k = rng.normal(0, 1, (B, KV, T, hd)).astype(np.float32)
    v = rng.normal(0, 1, (B, KV, T, hd)).astype(np.float32)
    for fold, group in ((False, 1), (True, 1), (True, 4)):
        a = decode_attention_bounded(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.int32(300),
            t_block=256, interpret=True, fold_batch=fold, head_group=group,
        )
        b = decode_attention_bounded(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            jnp.full((B,), 300, jnp.int32),
            t_block=256, interpret=True, fold_batch=fold, head_group=group,
        )
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
