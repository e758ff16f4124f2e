"""GRU recurrence — reference (lax.scan) implementation.

Replaces the reference's cuDNN GRU (step_recognition/model/rnn/rnn.py:38,63)
with a TPU-shaped formulation:

  * the input-side gate projection x_t @ W_ih is hoisted out of the
    recurrence and computed for ALL timesteps as one large MXU matmul
    (B*T, E) @ (E, 3H);
  * the scan body then only does the hidden-side matmul (B, H) @ (H, 3H)
    plus VPU elementwise gate math — the minimum truly-sequential work.

Gate order and math match torch.nn.GRU (r, z, n):

  r = sigmoid(x W_ir + b_ir + h W_hr + b_hr)
  z = sigmoid(x W_iz + b_iz + h W_hz + b_hz)
  n = tanh(x W_in + b_in + r * (h W_hn + b_hn))
  h' = (1 - z) * n + z * h

Weights are stored transposed relative to torch ((E, 3H) / (H, 3H)) so the
forward is right-multiplication, the natural MXU layout.

A fused Pallas kernel with the same semantics lives in
prego_tpu.ops.gru_pallas; this module is the correctness oracle it is
diffed against (SURVEY.md §7 hard part 1).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp


def init_gru_params(
    key: jax.Array, input_dim: int, hidden_dim: int, dtype=jnp.float32
) -> Dict[str, jax.Array]:
    """torch.nn.GRU default init: U(-k, k), k = 1/sqrt(hidden_dim)."""
    k = 1.0 / jnp.sqrt(jnp.asarray(hidden_dim, jnp.float32))
    ks = jax.random.split(key, 4)
    u = lambda kk, shape: jax.random.uniform(kk, shape, dtype, -k, k)
    return {
        "w_ih": u(ks[0], (input_dim, 3 * hidden_dim)),
        "b_ih": u(ks[1], (3 * hidden_dim,)),
        "w_hh": u(ks[2], (hidden_dim, 3 * hidden_dim)),
        "b_hh": u(ks[3], (3 * hidden_dim,)),
    }


def gru_cell(
    xg: jax.Array, h: jax.Array, w_hh: jax.Array, b_hh: jax.Array
) -> jax.Array:
    """One GRU step given precomputed input gates xg = x @ w_ih + b_ih.

    xg: (..., 3H), h: (..., H) -> (..., H)
    """
    H = h.shape[-1]
    hg = jnp.dot(h, w_hh, preferred_element_type=jnp.float32) + b_hh
    xr, xz, xn = xg[..., :H], xg[..., H : 2 * H], xg[..., 2 * H :]
    hr, hz, hn = hg[..., :H], hg[..., H : 2 * H], hg[..., 2 * H :]
    r = jax.nn.sigmoid(xr + hr)
    z = jax.nn.sigmoid(xz + hz)
    n = jnp.tanh(xn + r * hn)
    return ((1.0 - z) * n + z * h).astype(h.dtype)


def gru_scan(
    x: jax.Array,
    h0: jax.Array,
    params: Dict[str, jax.Array],
    unroll: int = 1,
) -> Tuple[jax.Array, jax.Array]:
    """Run the GRU over time. x: (B, T, E), h0: (B, H) -> ((B, T, H), (B, H))."""
    xg = (
        jnp.dot(x, params["w_ih"], preferred_element_type=jnp.float32)
        + params["b_ih"]
    ).astype(x.dtype)
    w_hh, b_hh = params["w_hh"], params["b_hh"]

    def step(h, xg_t):
        h = gru_cell(xg_t, h, w_hh, b_hh)
        return h, h

    # scan over the time axis; xg laid out (T, B, 3H) for the scan
    hT, hs = jax.lax.scan(step, h0, jnp.swapaxes(xg, 0, 1), unroll=unroll)
    return jnp.swapaxes(hs, 0, 1), hT
