"""MiniROAD-Anticipation variant (MROADA).

Parity surface: MROADA (step_recognition/model/rnn/rnn.py:73-137),
registered "MiniROADA". Adds to MiniROAD an anticipation head: a linear
layer expanding each hidden state into ``anticipation_length`` future
hidden states, classified by the SAME classifier head. Not used by the two
PREGO configs (SURVEY.md §2.1) but part of the reference's model zoo and
the ANTICIPATION task path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from prego_tpu.core.registry import MODELS
from prego_tpu.models.miniroad import MiniROAD, Params, _linear_init


@MODELS.register("MiniROADA")
class MiniROADA(MiniROAD):
    def __init__(self, cfg):
        super().__init__(cfg)
        self.anticipation_length = cfg["anticipation_length"]
        self.actionness = cfg.get("actionness", False)

    def init(self, key: jax.Array, dtype=jnp.float32) -> Params:
        k1, k2, k3 = jax.random.split(key, 3)
        params = super().init(k1, dtype)
        params["anticipation"] = _linear_init(
            k2, self.hidden_dim, self.anticipation_length * self.hidden_dim, dtype
        )
        if self.actionness:
            params["actionness"] = _linear_init(k3, self.hidden_dim, 1, dtype)
        return params

    def _heads(self, params: Params, ht: jax.Array):
        """ht: (B, S, H) raw GRU states -> (logits, anticipation_logits).

        Matches rnn.py:123-126: classifier on relu(ht); anticipation layer
        on relu(ht) -> (B, S, L, H) -> classifier on relu of that.
        """
        B, S, _ = ht.shape
        relu_ht = jax.nn.relu(ht)
        logits = (
            jnp.dot(relu_ht, params["cls"]["w"], preferred_element_type=jnp.float32)
            + params["cls"]["b"]
        )
        ant_h = (
            jnp.dot(
                relu_ht,
                params["anticipation"]["w"],
                preferred_element_type=jnp.float32,
            )
            + params["anticipation"]["b"]
        ).reshape(B, S, self.anticipation_length, self.hidden_dim)
        ant_logits = (
            jnp.dot(
                jax.nn.relu(ant_h),
                params["cls"]["w"],
                preferred_element_type=jnp.float32,
            )
            + params["cls"]["b"]
        )
        return logits, ant_logits

    def forward_train(
        self,
        params: Params,
        rgb: jax.Array,
        flow: jax.Array,
        dropout_rng: jax.Array,
        flow_is_zero: bool = False,
    ):
        """Returns (last-frame logits (B, K), last-frame anticipation logits
        (B, L, K)) — the ANTICIPATION loss consumes only the last frame
        (criterions/loss.py:51-55)."""
        x = self._embed(
            params, rgb, flow, flow_is_zero=flow_is_zero, train=True, dropout_rng=dropout_rng
        )
        ht = self._run_gru(params, x)
        logits, ant_logits = self._heads(params, ht[:, -1:, :])
        return logits[:, 0], ant_logits[:, 0]

    def forward_full(
        self,
        params: Params,
        rgb: jax.Array,
        flow: jax.Array,
        flow_is_zero: bool = False,
        softmax: bool = True,
        unroll: int = 1,
    ):
        """Returns (scores (B, T, K), anticipation scores (B, T, L, K))."""
        x = self._embed(params, rgb, flow, flow_is_zero=flow_is_zero, train=False, dropout_rng=None)
        ht = self._run_gru(params, x, unroll=unroll)
        logits, ant_logits = self._heads(params, ht)
        if softmax:
            return jax.nn.softmax(logits, -1), jax.nn.softmax(ant_logits, -1)
        return logits, ant_logits
