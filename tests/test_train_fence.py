"""Compile-failure fence for the pallas_train backend (VERDICT r2 #3).

On this image's tunneled TPU the fused train recurrence fails to compile
at B>=64/H=1024 ("tpu_compile_helper subprocess exit code 1", reproduced
by scripts/repro_pallas_train_b64.py).  make_train_step fences the
pallas_train backend: a compile-time failure rebuilds the step on the
lax.scan backend with a logged warning instead of crashing mid-training.
These tests drive the fence hermetically with a stub model whose
pallas_train path raises the same error shape the helper produces.
"""

import logging

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from prego_tpu.train.trainer import make_train_step


class JaxRuntimeError(RuntimeError):
    """Same type NAME as jax's compile-failure error (matched by name)."""


class StubModel:
    """Minimal model: pallas_train backend raises the helper's error."""

    def __init__(self, fail_message):
        self.fail_message = fail_message
        self.calls = []

    def forward_train(self, params, rgb, flow, rng, flow_is_zero, backend):
        self.calls.append(backend)
        if backend == "pallas_train":
            raise JaxRuntimeError(self.fail_message)
        return jnp.einsum("btf,fk->bk", rgb, params["w"]) / rgb.shape[1]


def _setup(fail_message):
    import optax

    model = StubModel(fail_message)
    optimizer = optax.sgd(0.1)
    params = {"w": jnp.ones((4, 3), jnp.float32)}
    opt_state = optimizer.init(params)
    step = make_train_step(
        model, optimizer, flow_is_zero=True, gru_backend="pallas_train",
        logger=logging.getLogger("fence-test"),
    )
    args = (
        jnp.ones((2, 5, 4)),  # rgb
        jnp.zeros((2, 5, 4)),  # flow
        jax.nn.one_hot(jnp.array([1, 2]), 3),  # target_last
        jnp.ones((2,), bool),  # valid
        jax.random.PRNGKey(0),
    )
    return model, step, params, opt_state, args


def test_fence_falls_back_to_scan(caplog):
    model, step, params, opt_state, args = _setup(
        "INTERNAL: http://127.0.0.1:8103/remote_compile: HTTP 500: "
        "tpu_compile_helper subprocess exit code 1"
    )
    with caplog.at_level(logging.WARNING, logger="fence-test"):
        params2, opt_state2, loss = step(params, opt_state, *args)
    assert np.isfinite(float(loss))
    # tried pallas_train first, then rebuilt on scan
    assert model.calls[0] == "pallas_train"
    assert model.calls[-1] == "scan"
    assert any("falling back" in r.message for r in caplog.records)
    # params were actually updated by the fallback step
    assert not np.allclose(np.asarray(params2["w"]), 1.0)
    # subsequent calls go straight to the fallback (no retry of pallas)
    n_pallas = model.calls.count("pallas_train")
    step(params2, opt_state2, *args)
    assert model.calls.count("pallas_train") == n_pallas


def test_fence_catches_cpu_interpret_error(caplog):
    """pallas_call raises ValueError('Only interpret mode is supported on
    CPU backend.') at TRACE time when the production (non-interpret)
    kernel path runs on CPU — the fence must treat it as a compile-class
    failure (it has no compile/Mosaic/INTERNAL marker and a plain
    ValueError name)."""

    class CpuModel(StubModel):
        def forward_train(self, params, rgb, flow, rng, flow_is_zero, backend):
            self.calls.append(backend)
            if backend == "pallas_train":
                raise ValueError("Only interpret mode is supported on CPU backend.")
            return jnp.einsum("btf,fk->bk", rgb, params["w"]) / rgb.shape[1]

    import optax

    model = CpuModel("")
    optimizer = optax.sgd(0.1)
    params = {"w": jnp.ones((4, 3), jnp.float32)}
    opt_state = optimizer.init(params)
    step = make_train_step(
        model, optimizer, flow_is_zero=True, gru_backend="pallas_train",
        logger=logging.getLogger("fence-test"),
    )
    with caplog.at_level(logging.WARNING, logger="fence-test"):
        _, _, loss = step(
            params, opt_state,
            jnp.ones((2, 5, 4)), jnp.zeros((2, 5, 4)),
            jax.nn.one_hot(jnp.array([1, 2]), 3), jnp.ones((2,), bool),
            jax.random.PRNGKey(0),
        )
    assert np.isfinite(float(loss))
    assert model.calls[-1] == "scan"


def test_fence_reraises_unrelated_errors():
    """Only compile-shaped failures are fenced; a genuine error (wrong
    name, no compile markers) must propagate."""
    import optax

    class BoomModel(StubModel):
        def forward_train(self, params, rgb, flow, rng, flow_is_zero, backend):
            raise ValueError("user bug: shapes are nonsense")

    model = BoomModel("")
    optimizer = optax.sgd(0.1)
    params = {"w": jnp.ones((4, 3), jnp.float32)}
    opt_state = optimizer.init(params)
    step = make_train_step(
        model, optimizer, flow_is_zero=True, gru_backend="pallas_train"
    )
    with pytest.raises(ValueError, match="user bug"):
        step(
            params, opt_state,
            jnp.ones((2, 5, 4)), jnp.zeros((2, 5, 4)),
            jax.nn.one_hot(jnp.array([1, 2]), 3), jnp.ones((2,), bool),
            jax.random.PRNGKey(0),
        )


def test_scan_backend_unfenced():
    """The default backend returns the bare jitted step (no wrapper)."""
    import optax

    model = StubModel("")
    step = make_train_step(model, optax.sgd(0.1), flow_is_zero=True)
    assert hasattr(step, "lower")  # a jax.jit-wrapped callable, not the fence
