"""MiniROAD streaming step-recognition model, TPU-native.

Parity surface: MROAD (step_recognition/model/rnn/rnn.py:18-71):

  input  = concat(rgb, flow) along features        (rnn.py:52-58)
  embed  = Dropout(ReLU(LayerNorm(Linear(Din->E)))) (rnn.py:39-44)
  gru    = GRU(E -> H, num_layers, zero h0)         (rnn.py:38,47-49,63)
  logits = Linear(ReLU(h) -> K)                     (rnn.py:45-46,64-67)
  train returns logits; eval returns softmax scores (rnn.py:66-70)

Design differences from the reference (TPU-first, numerics preserved):

  * functional params pytree + explicit dropout rng — jit/pjit friendly;
  * the input-side GRU projection is hoisted into one bulk MXU matmul
    (see prego_tpu.ops.gru);
  * when the flow stream is structurally zero (the PREGO configs zero it,
    dataset.py:63-69) the dead half of the embed matmul is skipped via
    ``flow_is_zero`` — numerically identical, half the FLOPs of the
    largest matmul;
  * full-video eval is batched across videos with per-video masks instead
    of batch-1 python loops (the recurrence is batch-independent, so
    per-frame outputs are unchanged).

Init matches torch defaults in distribution (Linear/GRU: U(-1/sqrt(fan_in),
1/sqrt(fan_in)); LayerNorm: ones/zeros).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from prego_tpu.core.registry import MODELS
from prego_tpu.data.features import FEATURE_SIZES
from prego_tpu.ops.gru import gru_cell, gru_scan, init_gru_params

Params = Dict[str, Any]


def _linear_init(key: jax.Array, d_in: int, d_out: int, dtype=jnp.float32):
    k = 1.0 / jnp.sqrt(jnp.asarray(d_in, jnp.float32))
    kw, kb = jax.random.split(key)
    return {
        "w": jax.random.uniform(kw, (d_in, d_out), dtype, -k, k),
        "b": jax.random.uniform(kb, (d_out,), dtype, -k, k),
    }


@MODELS.register("MiniROAD")
class MiniROAD:
    """Stateless module: params live outside, methods are pure functions."""

    def __init__(self, cfg):
        self.use_rgb = not cfg["no_rgb"]
        self.use_flow = not cfg["no_flow"]
        self.rgb_dim = FEATURE_SIZES[cfg["rgb_type"]] if self.use_rgb else 0
        self.flow_dim = FEATURE_SIZES[cfg["flow_type"]] if self.use_flow else 0
        self.input_dim = self.rgb_dim + self.flow_dim
        self.embedding_dim = cfg["embedding_dim"]
        self.hidden_dim = cfg["hidden_dim"]
        self.num_layers = cfg["num_layers"]
        self.num_classes = cfg["num_classes"]
        self.dropout = cfg["dropout"]

    # ---- parameters ----

    def init(self, key: jax.Array, dtype=jnp.float32) -> Params:
        ks = jax.random.split(key, 2 + self.num_layers)
        params: Params = {
            "embed": _linear_init(ks[0], self.input_dim, self.embedding_dim, dtype),
            "ln": {
                "scale": jnp.ones((self.embedding_dim,), dtype),
                "bias": jnp.zeros((self.embedding_dim,), dtype),
            },
            "cls": _linear_init(ks[1], self.hidden_dim, self.num_classes, dtype),
            "gru": [],
        }
        in_dim = self.embedding_dim
        for layer in range(self.num_layers):
            params["gru"].append(init_gru_params(ks[2 + layer], in_dim, self.hidden_dim, dtype))
            in_dim = self.hidden_dim
        return params

    # ---- building blocks ----

    def _embed(
        self,
        params: Params,
        rgb: jax.Array,
        flow: jax.Array,
        *,
        flow_is_zero: bool,
        train: bool,
        dropout_rng: Optional[jax.Array],
    ) -> jax.Array:
        w, b = params["embed"]["w"], params["embed"]["b"]
        if self.use_rgb and self.use_flow:
            if flow_is_zero:
                # flow features are structurally zero (dataset.py:63-69):
                # concat(rgb, 0) @ W == rgb @ W[:rgb_dim] — skip the dead half.
                x = jnp.dot(rgb, w[: self.rgb_dim], preferred_element_type=jnp.float32) + b
            else:
                x = (
                    jnp.dot(rgb, w[: self.rgb_dim], preferred_element_type=jnp.float32)
                    + jnp.dot(flow, w[self.rgb_dim :], preferred_element_type=jnp.float32)
                    + b
                )
        elif self.use_rgb:
            x = jnp.dot(rgb, w, preferred_element_type=jnp.float32) + b
        else:
            x = jnp.dot(flow, w, preferred_element_type=jnp.float32) + b
        # LayerNorm (torch eps=1e-5)
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True)
        x = (x - mu) * jax.lax.rsqrt(var + 1e-5)
        x = x * params["ln"]["scale"] + params["ln"]["bias"]
        x = jax.nn.relu(x)
        if train and self.dropout > 0.0:
            if dropout_rng is None:
                raise ValueError("dropout_rng required in train mode")
            keep = 1.0 - self.dropout
            mask = jax.random.bernoulli(dropout_rng, keep, x.shape)
            x = jnp.where(mask, x / keep, 0.0)
        return x.astype(rgb.dtype)

    def _run_gru(
        self, params: Params, x: jax.Array, unroll: int = 1, backend: str = "scan"
    ) -> jax.Array:
        B = x.shape[0]
        h = x
        for layer_params in params["gru"]:
            h0 = jnp.zeros((B, self.hidden_dim), x.dtype)  # rnn.py:48-49 fixed zero h0
            if backend == "pallas":
                from prego_tpu.ops.gru_pallas import gru_pallas

                h, _ = gru_pallas(h, h0, layer_params, stream_dtype=jnp.bfloat16)
            elif backend == "pallas_train":
                from prego_tpu.ops.gru_pallas_vjp import gru_trainable

                h, _ = gru_trainable(h, h0, layer_params, 8, 64, False, jnp.bfloat16)
            else:
                h, _ = gru_scan(h, h0, layer_params, unroll=unroll)
        return h

    def _classify(self, params: Params, h: jax.Array) -> jax.Array:
        h = jax.nn.relu(h)  # rnn.py:64
        return jnp.dot(h, params["cls"]["w"], preferred_element_type=jnp.float32) + params["cls"]["b"]

    # ---- public forwards ----

    def forward_train(
        self,
        params: Params,
        rgb: jax.Array,
        flow: jax.Array,
        dropout_rng: jax.Array,
        flow_is_zero: bool = False,
        backend: str = "scan",
    ) -> jax.Array:
        """Training forward on windows. Returns last-frame logits (B, K).

        The reference computes logits for every frame and the NONUNIFORM
        loss then keeps only the last (loss.py:15-22); computing the
        classifier on the last hidden state alone is identical.
        backend='pallas_train' uses the fused custom-VJP recurrence.
        """
        x = self._embed(
            params, rgb, flow, flow_is_zero=flow_is_zero, train=True, dropout_rng=dropout_rng
        )
        h = self._run_gru(params, x, backend=backend)
        return self._classify(params, h[:, -1, :])

    def forward_full(
        self,
        params: Params,
        rgb: jax.Array,
        flow: jax.Array,
        flow_is_zero: bool = False,
        softmax: bool = True,
        unroll: int = 1,
    ) -> jax.Array:
        """Eval forward on full (padded) sequences. Returns (B, T, K) scores.

        Softmax-at-eval-only matches rnn.py:66-70.
        """
        x = self._embed(params, rgb, flow, flow_is_zero=flow_is_zero, train=False, dropout_rng=None)
        h = self._run_gru(params, x, unroll=unroll)
        logits = self._classify(params, h)
        return jax.nn.softmax(logits, axis=-1) if softmax else logits

    def forward_step(
        self,
        params: Params,
        rgb_t: jax.Array,
        flow_t: jax.Array,
        hidden: Tuple[jax.Array, ...],
        flow_is_zero: bool = False,
    ) -> Tuple[jax.Array, Tuple[jax.Array, ...]]:
        """Strictly-causal single-frame step for online serving.

        rgb_t: (B, D_rgb); hidden: per-layer (B, H) carried state.
        Returns (softmax scores (B, K), new hidden).
        """
        x = self._embed(
            params, rgb_t[:, None, :], flow_t[:, None, :],
            flow_is_zero=flow_is_zero, train=False, dropout_rng=None,
        )[:, 0, :]
        new_hidden = []
        h_in = x
        for layer_params, h_prev in zip(params["gru"], hidden):
            xg = jnp.dot(h_in, layer_params["w_ih"], preferred_element_type=jnp.float32) + layer_params["b_ih"]
            h_new = gru_cell(xg.astype(h_prev.dtype), h_prev, layer_params["w_hh"], layer_params["b_hh"])
            new_hidden.append(h_new)
            h_in = h_new
        logits = self._classify(params, h_in)
        return jax.nn.softmax(logits, axis=-1), tuple(new_hidden)

    def init_hidden(self, batch: int, dtype=jnp.float32) -> Tuple[jax.Array, ...]:
        return tuple(
            jnp.zeros((batch, self.hidden_dim), dtype) for _ in range(self.num_layers)
        )
