"""Tensor-parallel serving of the QUANTIZED (int8) LLaMA layout.

VERDICT r3 #2: the fairscale column/row TP layout (llama/model.py:202-235)
previously covered only the unfused bf16 leaves; these tests pin the int8
{"q","s"} PartitionSpecs, the fused-layout specs, the "xla" dense-marker
routing, and JaxLlamaLLM's shard-instead-of-silently-ignoring behavior —
all on the virtual 8-device CPU mesh (tests/conftest.py)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from prego_tpu.models.llama import LlamaConfig, init_params
from prego_tpu.models.llama.model import (
    forward,
    fuse_projections,
    init_cache,
    mark_xla_dense,
    quantize_params,
)
from prego_tpu.parallel import llama_param_specs, shard_params, tp_mesh


def _cfg(**kw):
    base = dict(
        dim=64, n_layers=2, n_heads=4, n_kv_heads=2, vocab_size=258,
        multiple_of=32, norm_eps=1e-5, max_batch_size=4, max_seq_len=128,
    )
    base.update(kw)
    return LlamaConfig(**base)


@pytest.fixture(scope="module")
def q8_params():
    cfg = _cfg()
    return cfg, quantize_params(init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32))


def _decode_logits(params, cfg, tokens):
    """Prefill + one cached decode step; returns both logit blocks."""
    cache = init_cache(cfg, tokens.shape[0], dtype=jnp.float32)
    pre, cache = forward(params, tokens, jnp.int32(0), cache, cfg)
    nxt = jnp.argmax(pre[:, -1:], axis=-1).astype(jnp.int32)
    step, _ = forward(params, nxt, jnp.int32(tokens.shape[1]), cache, cfg)
    return np.asarray(pre), np.asarray(step)


def test_quantized_specs_match_tree_and_shard(q8_params):
    cfg, params = q8_params
    mesh = tp_mesh(8)
    cfg_tp = dataclasses.replace(cfg, tp_serving=True)
    sharded = shard_params(
        params, llama_param_specs(cfg_tp, quantized=True), mesh
    )
    wq = sharded["layers"][0]["attention"]["wq"]
    # column-parallel: q AND the per-output-channel scales shard on out
    assert wq["q"].sharding.spec == jax.sharding.PartitionSpec(None, "tp")
    assert wq["s"].sharding.spec == jax.sharding.PartitionSpec(None, "tp")
    wo = sharded["layers"][0]["attention"]["wo"]
    assert wo["q"].sharding.spec == jax.sharding.PartitionSpec("tp", None)
    # row-parallel scales replicate (their axis is the unsharded output)
    assert wo["s"].sharding.spec == jax.sharding.PartitionSpec()


def test_int8_tp_decode_matches_single_device(q8_params):
    """The repo's flagship serving mode (weight-only int8) tensor-parallel:
    prefill + cached decode over the 8-way mesh must equal the single-
    device int8 path."""
    cfg, params = q8_params
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(4, 250, (2, 8)).astype(np.int32))
    ref_pre, ref_step = _decode_logits(params, cfg, tokens)

    cfg_tp = dataclasses.replace(cfg, tp_serving=True)
    mesh = tp_mesh(8)
    sharded = mark_xla_dense(
        shard_params(params, llama_param_specs(cfg_tp, quantized=True), mesh)
    )
    tp_pre, tp_step = _decode_logits(sharded, cfg_tp, tokens)
    np.testing.assert_allclose(ref_pre, tp_pre, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(ref_step, tp_step, rtol=1e-5, atol=1e-5)


def test_int8_fused_layout_tp_decode_matches(q8_params):
    """The fused wqkv/w13 int8 layout also has PartitionSpecs: correct
    under SPMD (contiguous column split; XLA reshards at the q|k|v slice
    boundaries), though multi-chip serving should prefer unfused."""
    cfg, _ = q8_params
    fused = quantize_params(
        fuse_projections(init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32))
    )
    rng = np.random.default_rng(1)
    tokens = jnp.asarray(rng.integers(4, 250, (2, 8)).astype(np.int32))
    ref_pre, ref_step = _decode_logits(fused, cfg, tokens)

    cfg_tp = dataclasses.replace(cfg, tp_serving=True)
    mesh = tp_mesh(8)
    sharded = mark_xla_dense(
        shard_params(
            fused, llama_param_specs(cfg_tp, quantized=True, fused=True), mesh
        )
    )
    tp_pre, tp_step = _decode_logits(sharded, cfg_tp, tokens)
    np.testing.assert_allclose(ref_pre, tp_pre, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(ref_step, tp_step, rtol=1e-5, atol=1e-5)


def test_bf16_fused_specs_exist_too():
    """llama_param_specs(fused=True) without quantized: plain-array specs
    for a fused bf16 tree."""
    cfg = _cfg()
    fused = fuse_projections(init_params(cfg, jax.random.PRNGKey(2), dtype=jnp.float32))
    mesh = tp_mesh(8)
    sharded = shard_params(fused, llama_param_specs(cfg, fused=True), mesh)
    spec = sharded["layers"][0]["feed_forward"]["w13"].sharding.spec
    assert spec == jax.sharding.PartitionSpec(None, "tp")


def test_mark_xla_dense_adds_no_leaves(q8_params):
    _, params = q8_params
    marked = mark_xla_dense(params)
    assert "xla" in marked["layers"][0]["attention"]["wq"]
    assert marked["layers"][0]["attention"]["wq"]["xla"] == ()
    # structural marker only: identical pytree leaves (jit keys unchanged)
    a = jax.tree.leaves(params)
    b = jax.tree.leaves(marked)
    assert len(a) == len(b)
    assert all(x is y for x, y in zip(a, b))


def test_jax_llama_llm_tp_quantize_shards(tmp_path):
    """JaxLlamaLLM(tp=8, quantize=True) must SHARD (not silently ignore
    tp): unfused int8 leaves on the mesh, xla markers set, generation
    greedy-identical to the single-chip quantized path."""
    import json as _json

    torch = pytest.importorskip("torch")
    from tests.test_convert import _params_to_meta_state

    cfg = _cfg()
    src = init_params(cfg, jax.random.PRNGKey(11), dtype=jnp.float32)
    sd = _params_to_meta_state(src)
    torch.save(sd, tmp_path / "consolidated.00.pth")
    (tmp_path / "params.json").write_text(_json.dumps({
        "dim": cfg.dim, "n_layers": cfg.n_layers, "n_heads": cfg.n_heads,
        "n_kv_heads": cfg.n_kv_heads, "norm_eps": cfg.norm_eps,
        "vocab_size": -1, "multiple_of": cfg.multiple_of,
    }))
    from prego_tpu.anticipation.llm import JaxLlamaLLM

    kw = dict(ckpt_dir=str(tmp_path), tokenizer_path="byte",
              max_seq_len=64, max_batch_size=2, dtype=jnp.float32,
              quantize=True)
    tp8 = JaxLlamaLLM(tp=8, **kw)
    assert tp8.llama.config.tp_serving
    wq = tp8.llama.params["layers"][0]["attention"]["wq"]
    assert "xla" in wq  # pallas kernels routed to the XLA dequant path
    assert "tp" in wq["q"].sharding.spec  # actually sharded on the mesh
    single = JaxLlamaLLM(tp=1, **kw)
    a = tp8.text_completion(["abc"], max_gen_len=4, temperature=0.0)
    b = single.text_completion(["abc"], max_gen_len=4, temperature=0.0)
    assert a[0]["generation"] == b[0]["generation"]


def test_int8x8_tp_decode_matches_single_device():
    """The activation-quant (int8x8) layout shards with the same
    column/row specs as weight-only (the "act" marker is structural);
    under SPMD the per-token activation amax all-reduces over tp on
    row-parallel inputs and the int32 partial dots psum exactly, so the
    8-way decode must equal the single-device act path."""
    cfg = _cfg()
    params = quantize_params(
        init_params(cfg, jax.random.PRNGKey(3), dtype=jnp.float32),
        activations=True,
    )
    rng = np.random.default_rng(2)
    tokens = jnp.asarray(rng.integers(4, 250, (2, 8)).astype(np.int32))
    ref_pre, ref_step = _decode_logits(params, cfg, tokens)

    cfg_tp = dataclasses.replace(cfg, tp_serving=True)
    mesh = tp_mesh(8)
    sharded = mark_xla_dense(
        shard_params(
            params,
            llama_param_specs(cfg_tp, quantized=True, activations=True),
            mesh,
        )
    )
    wq = sharded["layers"][0]["attention"]["wq"]
    assert "act" in wq and "xla" in wq
    assert wq["q"].sharding.spec == jax.sharding.PartitionSpec(None, "tp")
    tp_pre, tp_step = _decode_logits(sharded, cfg_tp, tokens)
    np.testing.assert_allclose(ref_pre, tp_pre, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(ref_step, tp_step, rtol=1e-5, atol=1e-5)


def test_int8x8_fused_layout_tp_decode_matches():
    """fused=True + activations=True: the fused wqkv/w13 act layout also
    lays out and verifies under TP (contiguous column split, same caveats
    as the weight-only fused specs — multi-chip serving prefers unfused)."""
    cfg = _cfg()
    fused = quantize_params(
        fuse_projections(init_params(cfg, jax.random.PRNGKey(4), dtype=jnp.float32)),
        activations=True,
    )
    rng = np.random.default_rng(3)
    tokens = jnp.asarray(rng.integers(4, 250, (2, 8)).astype(np.int32))
    ref_pre, ref_step = _decode_logits(fused, cfg, tokens)

    cfg_tp = dataclasses.replace(cfg, tp_serving=True)
    mesh = tp_mesh(8)
    sharded = mark_xla_dense(
        shard_params(
            fused,
            llama_param_specs(
                cfg_tp, quantized=True, fused=True, activations=True
            ),
            mesh,
        )
    )
    tp_pre, tp_step = _decode_logits(sharded, cfg_tp, tokens)
    np.testing.assert_allclose(ref_pre, tp_pre, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(ref_step, tp_step, rtol=1e-5, atol=1e-5)


def test_jax_llama_llm_int8x8_tp_shards(tmp_path):
    """JaxLlamaLLM(tp=8, quantize='int8x8') shards the act layout (it
    used to raise — the r5 guard is superseded by real TP specs) and
    generates greedy-identical to the single-chip act path."""
    import json as _json

    torch = pytest.importorskip("torch")
    from tests.test_convert import _params_to_meta_state

    cfg = _cfg()
    src = init_params(cfg, jax.random.PRNGKey(11), dtype=jnp.float32)
    sd = _params_to_meta_state(src)
    torch.save(sd, tmp_path / "consolidated.00.pth")
    (tmp_path / "params.json").write_text(_json.dumps({
        "dim": cfg.dim, "n_layers": cfg.n_layers, "n_heads": cfg.n_heads,
        "n_kv_heads": cfg.n_kv_heads, "norm_eps": cfg.norm_eps,
        "vocab_size": -1, "multiple_of": cfg.multiple_of,
    }))
    from prego_tpu.anticipation.llm import JaxLlamaLLM

    kw = dict(ckpt_dir=str(tmp_path), tokenizer_path="byte",
              max_seq_len=64, max_batch_size=2, dtype=jnp.float32,
              quantize="int8x8")
    tp8 = JaxLlamaLLM(tp=8, **kw)
    wq = tp8.llama.params["layers"][0]["attention"]["wq"]
    assert "act" in wq and "xla" in wq
    assert "tp" in wq["q"].sharding.spec
    single = JaxLlamaLLM(tp=1, **kw)
    wqkv = single.llama.params["layers"][0]["attention"]["wqkv"]
    assert "act" in wqkv  # single-chip stays on the fused act layout
    a = tp8.text_completion(["abc"], max_gen_len=4, temperature=0.0)
    b = single.text_completion(["abc"], max_gen_len=4, temperature=0.0)
    assert a[0]["generation"] == b[0]["generation"]
