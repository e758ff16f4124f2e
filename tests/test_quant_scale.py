"""int8 serving acceptance at realistic scale (134M-param LLaMA shape).

The honest baseline for TPU serving is bf16 (nobody serves f32), and on a
random-weight model argmax is margin-limited: even pure bf16 casting flips
~3% of positions because random logits have tiny top1-top2 gaps. The
acceptance bars are therefore:

  1. margin-conditioned greedy agreement vs the bf16 baseline — positions
     whose bf16 margin exceeds 0.25 x std(logits) must agree >= 99.5%
     (measured: 100%). PREGO's single-symbol prompts on trained checkpoints
     are far more peaked than 0.25 sigma, so greedy decisions survive.
  2. explicit logits-error budget — relative RMS drift vs bf16 <= 6%
     (weight-only int8; measured 4.6%) / <= 12% (int8 x int8 activation
     quant), and p99 drift at the argmax coordinate <= 0.2 x std.

Numbers recorded in RESULTS.md; thresholds are deterministic (fixed seeds).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from prego_tpu.models.llama import LlamaConfig, forward, init_cache, init_params
from prego_tpu.models.llama.model import quantize_params

CFG = LlamaConfig(
    dim=768, n_layers=12, n_heads=12, n_kv_heads=12, vocab_size=32000,
    multiple_of=256, norm_eps=1e-5, max_batch_size=1, max_seq_len=1024,
)
T = 1024  # teacher-forced greedy decisions evaluated (= "1k decode steps")


@pytest.fixture(scope="module")
def logit_sets():
    params = init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)
    toks = jnp.asarray(
        np.random.default_rng(0).integers(0, CFG.vocab_size, (1, T)).astype(np.int32)
    )

    def run(p):
        out, _ = forward(
            p, toks, jnp.int32(0), init_cache(CFG, 1, dtype=jnp.float32), CFG
        )
        return np.asarray(out[0])

    bf16 = run(jax.tree.map(lambda x: x.astype(jnp.bfloat16).astype(jnp.float32), params))
    w8 = run(quantize_params(params))
    w8a8 = run(quantize_params(params, activations=True))
    return bf16, w8, w8a8


def _check(bf16, quant, rms_budget):
    arg_b, arg_q = np.argmax(bf16, -1), np.argmax(quant, -1)
    std = bf16.std()
    srt = np.sort(bf16, -1)
    margin = srt[:, -1] - srt[:, -2]

    confident = margin > 0.25 * std
    assert confident.sum() > T // 10  # the bar must actually bite
    agreement = np.mean(arg_b[confident] == arg_q[confident])
    assert agreement >= 0.995, f"confident-position agreement {agreement:.4f}"

    rel_rms = np.sqrt(np.mean((quant - bf16) ** 2)) / np.sqrt(np.mean(bf16**2))
    assert rel_rms <= rms_budget, f"rel-RMS drift {rel_rms:.4f} > {rms_budget}"

    coord_drift = np.abs(quant[np.arange(T), arg_b] - bf16[np.arange(T), arg_b])
    assert np.percentile(coord_drift, 99) <= 0.2 * std

    assert np.mean(arg_b == arg_q) >= 0.80  # unconditional sanity floor


def test_weight_only_int8_acceptance(logit_sets):
    bf16, w8, _ = logit_sets
    _check(bf16, w8, rms_budget=0.06)


def test_int8xint8_activation_quant_acceptance(logit_sets):
    bf16, _, w8a8 = logit_sets
    _check(bf16, w8a8, rms_budget=0.12)


def test_q8_dense_backend_env_gate(monkeypatch):
    """PREGO_Q8_DENSE=xla routes int8 projections through the XLA
    dequant-fused jnp.dot (the TP path's matmul) even single-chip; any
    other value keeps the Pallas default. Numerics are identical up to
    dot-accumulation order — on CPU both routes already share
    int8_matmul_reference, so assert the gate itself plus a forward
    under each setting agreeing bit-for-bit (same route on CPU)."""
    from prego_tpu.models.llama.model import _q8_dense_backend

    monkeypatch.delenv("PREGO_Q8_DENSE", raising=False)
    assert _q8_dense_backend() == "pallas"  # no shape info -> pallas
    # shape-aware default: xla at the measured >=4096 regime (7B/13B
    # projections), pallas below (1B and smaller)
    assert _q8_dense_backend((4096, 12288)) == "xla"
    assert _q8_dense_backend((11008, 4096)) == "xla"
    assert _q8_dense_backend((2048, 11008)) == "pallas"
    # an unparsable value falls through to the shape default (warn, not
    # silently flip — the ADVICE-r3 pattern)
    monkeypatch.setenv("PREGO_Q8_DENSE", "bogus")
    assert _q8_dense_backend() == "pallas"
    assert _q8_dense_backend((4096, 12288)) == "xla"
    monkeypatch.setenv("PREGO_Q8_DENSE", "xla")
    assert _q8_dense_backend() == "xla"
    assert _q8_dense_backend((2048, 11008)) == "xla"
    monkeypatch.setenv("PREGO_Q8_DENSE", "pallas")
    assert _q8_dense_backend((4096, 12288)) == "pallas"
    monkeypatch.setenv("PREGO_Q8_DENSE", "xla")

    cfg = LlamaConfig(
        dim=64, n_layers=2, n_heads=4, n_kv_heads=4, vocab_size=128,
        multiple_of=16, norm_eps=1e-5, max_batch_size=1, max_seq_len=32,
    )
    params = quantize_params(init_params(cfg, jax.random.PRNGKey(1)))
    toks = jnp.asarray([[5, 9, 21, 3]], dtype=jnp.int32)

    def run():
        out, _ = forward(
            params, toks, jnp.int32(0), init_cache(cfg, 1), cfg
        )
        return np.asarray(out)

    xla_out = run()
    monkeypatch.delenv("PREGO_Q8_DENSE")
    np.testing.assert_array_equal(xla_out, run())
