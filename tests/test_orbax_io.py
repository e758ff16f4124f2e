"""Orbax sharded persistence of LLaMA params: roundtrip + mesh restore."""

import jax
import jax.numpy as jnp
import numpy as np

from prego_tpu.checkpoint.orbax_io import load_llama_params, save_llama_params
from prego_tpu.models.llama import init_params, tiny_test_config
from prego_tpu.parallel import tp_mesh

CFG = tiny_test_config(vocab_size=64)


def test_roundtrip_unsharded(tmp_path):
    params = init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)
    path = tmp_path / "llama_ckpt"
    save_llama_params(str(path), params)
    restored = load_llama_params(str(path), CFG, dtype=jnp.float32)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        params,
        restored,
    )


def test_restore_onto_tp_mesh(tmp_path):
    params = init_params(CFG, jax.random.PRNGKey(1), dtype=jnp.float32)
    path = tmp_path / "llama_ckpt_tp"
    save_llama_params(str(path), params)
    mesh = tp_mesh(8)
    restored = load_llama_params(str(path), CFG, mesh=mesh, dtype=jnp.float32)
    # values equal AND arrays land sharded over the tp axis
    wq = restored["layers"][0]["attention"]["wq"]
    assert len(wq.sharding.device_set) == 8
    np.testing.assert_array_equal(
        np.asarray(wq), np.asarray(params["layers"][0]["attention"]["wq"])
    )


def test_roundtrip_quantized_int8(tmp_path):
    """int8 serving params restore DIRECTLY into their quantized leaves
    (no bf16 materialization) — the single-chip 7B startup path."""
    from prego_tpu.models.llama.model import fuse_projections, quantize_params

    params = quantize_params(
        fuse_projections(init_params(CFG, jax.random.PRNGKey(2), dtype=jnp.float32))
    )
    path = tmp_path / "llama_ckpt_q8"
    save_llama_params(str(path), params)
    restored = load_llama_params(str(path), CFG, quantized=True, fused=True,
                                 dtype=jnp.float32)
    wqkv = restored["layers"][0]["attention"]["wqkv"]
    assert wqkv["q"].dtype == jnp.int8 and wqkv["s"].dtype == jnp.float32
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        params,
        restored,
    )


def test_quantized_restore_rejects_mesh(tmp_path):
    import pytest

    with pytest.raises(ValueError, match="single-chip"):
        load_llama_params(str(tmp_path), CFG, mesh=tp_mesh(8), quantized=True)
