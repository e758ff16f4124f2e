"""Transformer (ViT-encoder) online recognizer, TPU-native.

Parity surface: the reference's registered-but-unused "Transformer" model
(ViTEnc, step_recognition/model/transformer_models/ViT.py:25-160 — the
OadTR-style zoo; PREGO consumes OadTR predictions as shipped JSONs).

Numerics-matched to the reference (oracle-tested in
tests/test_transformer.py against an independent torch restatement):

  * per-frame features linearly embedded (ViT.py:58,124), a zeros-initialized
    learnable CLS token APPENDED at the end (ViT.py:131), learned positional
    embeddings added (PositionalEncoding.py:26-41), then a pre-LN encoder
    stack: x + drop(attn(LN(x))) and x + mlp(LN(x)) (Transformer.py:49-82),
    attention with NO qkv bias and scale hd^-0.5 (Attention.py:7-41), GELU
    MLP, final LayerNorm (ViT.py:79), and the classifier reads token 0 —
    which, with the CLS token at the END, is the FIRST FRAME's token
    (ViT.py:138). Kept bug-for-bug: it defines the checkpoint contract.
  * dropout placement: pe dropout + block-output dropout + both MLP dropouts
    at cfg.dropout; attention-prob and attention-proj dropouts at
    cfg.attn_dropout_rate (Transformer.py:23-46, Attention.py:17-19,40).

Deliberate deviation (documented in PARITY.md): the reference declares
``flatten_dim = patch_dim² × channels`` (ViT.py:55) but its forward never
reshapes into patches — the Linear is applied to raw (B, T, C) frames
(ViT.py:124), so any ``patch_dim > 1`` crashes there. We define
``flatten_dim = patch_dim × channels`` with a real patch reshape; at the
only functional reference setting (patch_dim=1) the two are identical.

TPU-first: one jitted batched forward for training windows; full-video
eval materializes per-frame causal windows of the padded features in
fixed-size chunks (constant memory in video length) — every frame t is
classified from the window ending at t, strictly causal like the GRU path.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from prego_tpu.core.registry import MODELS
from prego_tpu.data.features import FEATURE_SIZES
from prego_tpu.models.miniroad import _linear_init

Params = Dict[str, Any]


def _dropout(rng, rate: float, x: jax.Array):
    """Inverted dropout; returns (next_rng, y)."""
    if rate <= 0.0:
        return rng, x
    rng, sub = jax.random.split(rng)
    keep = 1.0 - rate
    return rng, jnp.where(jax.random.bernoulli(sub, keep, x.shape), x / keep, 0.0)


@MODELS.register("Transformer")
class TransformerRecognizer:
    def __init__(self, cfg):
        self.use_rgb = not cfg["no_rgb"]
        self.use_flow = not cfg["no_flow"]
        self.rgb_dim = FEATURE_SIZES[cfg["rgb_type"]] if self.use_rgb else 0
        self.flow_dim = FEATURE_SIZES[cfg["flow_type"]] if self.use_flow else 0
        self.input_dim = self.rgb_dim + self.flow_dim
        self.window_size = cfg["window_size"]
        self.patch_dim = cfg.get("patch_dim", 1)
        assert self.window_size % self.patch_dim == 0
        self.num_patches = self.window_size // self.patch_dim
        self.embedding_dim = cfg["embedding_dim"]
        self.num_heads = cfg.get("num_heads", 8)
        assert self.embedding_dim % self.num_heads == 0
        self.num_layers = cfg["num_layers"]
        self.hidden_dim = cfg["hidden_dim"]  # MLP width
        self.num_classes = cfg["num_classes"]
        self.dropout = cfg["dropout"]
        self.attn_dropout = cfg.get("attn_dropout_rate", 0.0)
        # see module docstring: reference's patch_dim²×C Linear is
        # non-functional for patch_dim>1; identical at patch_dim=1
        self.flatten_dim = self.patch_dim * self.input_dim

    # ---- parameters ----

    def init(self, key: jax.Array, dtype=jnp.float32) -> Params:
        n = self.num_layers
        ks = iter(jax.random.split(key, 4 + 5 * n))
        E = self.embedding_dim
        params: Params = {
            "embed": _linear_init(next(ks), self.flatten_dim, E, dtype),
            "cls_token": jnp.zeros((1, 1, E), dtype),  # ViT.py:56 zeros init
            "pos": jax.random.normal(next(ks), (self.num_patches + 1, E), dtype) * 0.02,
            "head": _linear_init(next(ks), E, self.num_classes, dtype),
            "ln_f": {"scale": jnp.ones((E,), dtype), "bias": jnp.zeros((E,), dtype)},
            "blocks": [],
        }
        for _ in range(n):
            qkv = _linear_init(next(ks), E, 3 * E, dtype)
            del qkv["b"]  # qkv_bias=False (Attention.py:16)
            params["blocks"].append(
                {
                    "ln1": {"scale": jnp.ones((E,), dtype), "bias": jnp.zeros((E,), dtype)},
                    "qkv": qkv,
                    "proj": _linear_init(next(ks), E, E, dtype),
                    "ln2": {"scale": jnp.ones((E,), dtype), "bias": jnp.zeros((E,), dtype)},
                    "mlp_in": _linear_init(next(ks), E, self.hidden_dim, dtype),
                    "mlp_out": _linear_init(next(ks), self.hidden_dim, E, dtype),
                }
            )
        return params

    # ---- blocks ----

    @staticmethod
    def _ln(x, p):
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True)
        return (x - mu) * jax.lax.rsqrt(var + 1e-5) * p["scale"] + p["bias"]

    def _encoder(self, params: Params, tokens: jax.Array, train: bool, rng) -> jax.Array:
        """tokens: (B, S, E) -> (B, S, E); pre-LN MHA + GELU MLP blocks."""
        B, S, E = tokens.shape
        H = self.num_heads
        hd = E // H
        x = tokens
        for li, blk in enumerate(params["blocks"]):
            y = self._ln(x, blk["ln1"])
            qkv = jnp.dot(y, blk["qkv"]["w"], preferred_element_type=jnp.float32)
            q, k, v = jnp.split(qkv.reshape(B, S, 3, H, hd), 3, axis=2)
            q, k, v = q[:, :, 0], k[:, :, 0], v[:, :, 0]  # (B, S, H, hd)
            scores = jnp.einsum("bshd,bthd->bhst", q, k, preferred_element_type=jnp.float32)
            scores = scores / jnp.sqrt(jnp.asarray(hd, jnp.float32))
            probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
            if train:
                rng, probs = _dropout(rng, self.attn_dropout, probs)
            attn = jnp.einsum("bhst,bthd->bshd", probs, v, preferred_element_type=jnp.float32)
            attn = attn.reshape(B, S, E).astype(x.dtype)
            out = (
                jnp.dot(attn, blk["proj"]["w"], preferred_element_type=jnp.float32)
                + blk["proj"]["b"]
            ).astype(x.dtype)
            if train:
                rng, out = _dropout(rng, self.attn_dropout, out)  # proj_drop
                rng, out = _dropout(rng, self.dropout, out)  # PreNormDrop
            x = x + out
            y = self._ln(x, blk["ln2"])
            h = jax.nn.gelu(
                jnp.dot(y, blk["mlp_in"]["w"], preferred_element_type=jnp.float32)
                + blk["mlp_in"]["b"],
                approximate=False,  # torch nn.GELU is exact erf (Transformer.py:40)
            )
            if train:
                rng, h = _dropout(rng, self.dropout, h)
            out = (
                jnp.dot(h, blk["mlp_out"]["w"], preferred_element_type=jnp.float32)
                + blk["mlp_out"]["b"]
            ).astype(x.dtype)
            if train:
                rng, out = _dropout(rng, self.dropout, out)
            x = x + out
        return self._ln(x, params["ln_f"])

    def _window_logits(self, params: Params, windows: jax.Array, train: bool, rng) -> jax.Array:
        """windows: (B, W, D_in) -> (B, K) logits from token 0 (first frame)."""
        B = windows.shape[0]
        patches = windows.reshape(B, self.num_patches, self.flatten_dim)
        emb = (
            jnp.dot(patches, params["embed"]["w"], preferred_element_type=jnp.float32)
            + params["embed"]["b"]
        ).astype(windows.dtype)
        cls = jnp.broadcast_to(params["cls_token"], (B, 1, self.embedding_dim))
        # CLS appended LAST (ViT.py:131); readout below is token 0 (ViT.py:138)
        tokens = jnp.concatenate([emb, cls], axis=1) + params["pos"][None]
        if train:
            rng, tokens = _dropout(rng, self.dropout, tokens)  # pe_dropout
        enc = self._encoder(params, tokens, train, rng)
        cls_out = enc[:, 0]
        return (
            jnp.dot(cls_out, params["head"]["w"], preferred_element_type=jnp.float32)
            + params["head"]["b"]
        )

    # ---- public forwards (MiniROAD-compatible surface) ----

    def _concat(self, rgb, flow, flow_is_zero):
        if self.use_rgb and self.use_flow:
            if flow_is_zero:
                flow = jnp.zeros_like(flow)
            return jnp.concatenate([rgb, flow], axis=-1)
        return rgb if self.use_rgb else flow

    def forward_train(
        self, params, rgb, flow, dropout_rng, flow_is_zero=False, backend=None
    ) -> jax.Array:
        x = self._concat(rgb, flow, flow_is_zero)
        return self._window_logits(params, x, True, dropout_rng)

    def forward_full(
        self, params, rgb, flow, flow_is_zero=False, softmax=True, unroll=None,
        frame_chunk: int = 64,
    ) -> jax.Array:
        """Per-frame causal scores for full sequences (B, T, D) -> (B, T, K).

        Frame t is classified from the window [t-W+1, t] (zero-padded at the
        start, mirroring the training zero-prefix); windows are materialized
        in fixed-size chunks so memory is constant in video length.
        """
        x = self._concat(rgb, flow, flow_is_zero)
        B, T, D = x.shape
        W = self.window_size
        pad = jnp.concatenate([jnp.zeros((B, W - 1, D), x.dtype), x], axis=1)

        chunk_fn = jax.jit(
            lambda p, wins: self._window_logits(
                p, wins.reshape(-1, W, D), False, None
            ).reshape(wins.shape[0], wins.shape[1], self.num_classes)
        )

        outs = []
        for t0 in range(0, T, frame_chunk):
            n = min(frame_chunk, T - t0)
            # windows for frames t0..t0+n-1: rows [t, t+W) of the padded seq
            idx = (t0 + jnp.arange(frame_chunk))[:, None] + jnp.arange(W)[None, :]
            idx = jnp.minimum(idx, T + W - 2)
            wins = pad[:, idx]  # (B, frame_chunk, W, D)
            logits = chunk_fn(params, wins)
            outs.append(np.asarray(logits[:, :n]))
        logits = jnp.asarray(np.concatenate(outs, axis=1))
        return jax.nn.softmax(logits, axis=-1) if softmax else logits
