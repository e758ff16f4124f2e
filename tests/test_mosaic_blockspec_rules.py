"""Mosaic block-shape tiling rule enforced on CPU for every pallas_call.

The Pallas TPU lowering requires that a VMEM block's last two dims be
divisible by (8, 128) respectively OR equal the array's dim — interpret
mode does NOT enforce this, so a kernel can pass its interpret-equality
tests and still fail to lower on the chip (exactly how the wo-fusion
kernel's (1, D) output block over (B, D) slipped to the first real-chip
A/B).  This test monkeypatches pl.pallas_call to validate every blocked
VMEM spec against the rule while driving each Pallas op in interpret
mode at production-representative shapes, turning that chip-only failure
class into a CPU test.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl


def _check_block(block_shape, array_shape, where):
    if block_shape is None:
        return
    bs = [d for d in block_shape]
    if len(bs) != len(array_shape):
        # squeezed/None entries: treat None as full-dim
        return
    problems = []
    if len(bs) >= 1:
        b, a = bs[-1], array_shape[-1]
        if b is not None and not (b % 128 == 0 or b == a):
            problems.append(f"last dim {b} (array {a}) not /128 nor full")
    if len(bs) >= 2:
        b, a = bs[-2], array_shape[-2]
        if b is not None and not (b % 8 == 0 or b == a):
            problems.append(f"2nd-to-last dim {b} (array {a}) not /8 nor full")
    assert not problems, f"{where}: illegal Mosaic block {block_shape} over {array_shape}: {problems}"


@pytest.fixture
def checked_pallas(monkeypatch):
    """pl.pallas_call wrapper validating VMEM block specs at call time."""
    real = pl.pallas_call

    def checked(kernel, **kw):
        inner = real(kernel, **kw)

        def run(*operands):
            in_specs = kw.get("in_specs")
            if in_specs is not None:
                for i, (spec, op) in enumerate(zip(in_specs, operands)):
                    if str(getattr(spec, "memory_space", "vmem")) in ("smem", "any"):
                        continue
                    _check_block(spec.block_shape, op.shape, f"in_specs[{i}]")
            out_specs = kw.get("out_specs")
            out_shape = kw.get("out_shape")
            if out_specs is not None and out_shape is not None:
                specs = out_specs if isinstance(out_specs, (list, tuple)) else [out_specs]
                shapes = out_shape if isinstance(out_shape, (list, tuple)) else [out_shape]
                for i, (spec, sh) in enumerate(zip(specs, shapes)):
                    if str(getattr(spec, "memory_space", "vmem")) in ("smem", "any"):
                        continue
                    _check_block(spec.block_shape, sh.shape, f"out_specs[{i}]")
            return inner(*operands)

        return run

    monkeypatch.setattr(pl, "pallas_call", checked)
    return checked


def test_rule_rejects_the_wo_bug():
    """The exact shape class that slipped through: (1, D) block over
    (B, D) with B > 1."""
    with pytest.raises(AssertionError, match="not /8 nor full"):
        _check_block((1, 2048), (8, 2048), "repro")
    # and the fix is legal
    _check_block((1, 1, 2048), (8, 1, 2048), "fixed")


def test_decode_attention_specs(checked_pallas, rng):
    from prego_tpu.ops.decode_attention import (
        decode_attention,
        decode_attention_bounded,
        decode_attention_bounded_q8,
        decode_attention_bounded_wo,
    )

    B, KV, R, hd, T, D = 8, 4, 1, 128, 512, 256
    q = jnp.asarray(rng.normal(0, 1, (B, KV, R, hd)).astype(np.float32))
    k = jnp.asarray(rng.normal(0, 1, (B, KV, T, hd)).astype(np.float32))
    v = jnp.asarray(rng.normal(0, 1, (B, KV, T, hd)).astype(np.float32))
    wo = jnp.asarray(rng.normal(0, 0.05, (KV * R * hd, D)).astype(np.float32))
    valid = jnp.int32(300)

    decode_attention(q, k, v, valid, t_block=256, interpret=True)
    for fold in (False, True):
        decode_attention_bounded(q, k, v, valid, t_block=256, interpret=True,
                                 fold_batch=fold)
    decode_attention_bounded_wo(q, k, v, valid, wo, t_block=256, interpret=True)
    h = jnp.asarray(rng.normal(0, 1, (B, 1, D)).astype(np.float32))
    decode_attention_bounded_wo(q, k, v, valid, wo, t_block=256, interpret=True,
                                residual=h)
    from prego_tpu.ops.decode_attention import decode_attention_bounded_wo_res_upd

    kn = jnp.asarray(rng.normal(0, 1, (B, KV, 1, hd)).astype(np.float32))
    vn = jnp.asarray(rng.normal(0, 1, (B, KV, 1, hd)).astype(np.float32))
    decode_attention_bounded_wo_res_upd(q, h, kn, vn, k, v, jnp.int32(300), wo,
                                        t_block=256, interpret=True)

    kq = jnp.asarray(rng.integers(-127, 127, (B, KV, T, hd)).astype(np.int8))
    ks = jnp.asarray(rng.uniform(0.01, 0.02, (B, KV, T)).astype(np.float32))
    for fold in (False, True):
        decode_attention_bounded_q8(q, kq, ks, kq, ks, valid, t_block=256,
                                    interpret=True, fold_batch=fold)


def test_fused_ffn_specs(checked_pallas, rng):
    from prego_tpu.ops.fused_ffn import fused_ffn, fused_ffn_block

    for M in (1, 4, 8):  # decode batches incl. the anticipation bsz=4
        x = jnp.asarray(rng.normal(0, 1, (M, 256)).astype(np.float32))
        nw = jnp.asarray(rng.normal(1, 0.1, (256,)).astype(np.float32))
        w13 = jnp.asarray(rng.normal(0, 0.05, (256, 2 * 512)).astype(np.float32))
        w2 = jnp.asarray(rng.normal(0, 0.05, (512, 256)).astype(np.float32))
        fused_ffn(x, w13, w2, f_block=256, interpret=True)
        fused_ffn_block(x, nw, w13, w2, 1e-5, f_block=256, interpret=True)


def test_quant_matmul_specs(checked_pallas, rng):
    from prego_tpu.ops.quant import (
        int8_matmul,
        int8xint8_matmul,
        quantize_activations,
        quantize_weight,
    )

    w = jnp.asarray(rng.normal(0, 0.05, (256, 512)).astype(np.float32))
    q8, sc = quantize_weight(w)
    for M in (1, 8):
        x = jnp.asarray(rng.normal(0, 1, (M, 256)).astype(np.float32))
        int8_matmul(x, q8, sc, interpret=True)
        xq, xs = quantize_activations(x)
        int8xint8_matmul(xq, xs, q8, sc, interpret=True)


def test_gru_kernel_specs(checked_pallas, rng):
    from prego_tpu.ops.gru import init_gru_params
    from prego_tpu.ops.gru_pallas import gru_pallas

    B, T, H = 8, 16, 128
    params = init_gru_params(jax.random.PRNGKey(0), H, H)
    x = jnp.asarray(rng.normal(0, 1, (B, T, H)).astype(np.float32))
    h0 = jnp.zeros((B, H), jnp.float32)
    gru_pallas(x, h0, params, interpret=True)


def test_gru_train_kernel_specs(checked_pallas, rng):
    from prego_tpu.ops.gru import init_gru_params
    from prego_tpu.ops.gru_pallas_vjp import gru_trainable

    B, T, H = 8, 16, 128
    params = init_gru_params(jax.random.PRNGKey(0), H, H)
    x = jnp.asarray(rng.normal(0, 1, (B, T, H)).astype(np.float32))
    h0 = jnp.zeros((B, H), jnp.float32)

    def loss(p):
        hs, hT = gru_trainable(x, h0, p, interpret=True)
        return jnp.sum(hs**2) + jnp.sum(hT**2)

    jax.grad(loss)(params)  # exercises fwd AND bwd pallas_calls
