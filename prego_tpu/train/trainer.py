"""Jitted training step + epoch loop.

Parity surface: train_one_epoch (step_recognition/trainer/train.py:5-29) and
the optimizer setup in main.py:60-67 (AdamW, lr 1e-4, weight decay 0.05,
torch defaults b1=0.9 b2=0.999 eps=1e-8, decay applied to all params).

TPU-first differences:
  * one jitted, shape-stable train step (partial batches are padded and
    masked, so XLA compiles once);
  * params/opt-state donated — updates happen in-place in HBM;
  * optional bf16 compute (the reference's --amp GradScaler has no TPU
    equivalent; bf16 needs no loss scaling);
  * optional data-parallel sharding: pass a Mesh and the batch axis is
    sharded over 'dp' with parameters replicated, gradients reduced by XLA
    collectives over ICI.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from prego_tpu.core.registry import TRAINERS
from prego_tpu.data.windowing import WindowSampler
from prego_tpu.models.miniroad import MiniROAD
from prego_tpu.train.loss import last_frame_mlce


def build_optimizer(cfg, schedule: Optional[Callable] = None) -> optax.GradientTransformation:
    lr = schedule if schedule is not None else cfg["lr"]
    if cfg["optimizer"] == "AdamW":
        return optax.adamw(lr, b1=0.9, b2=0.999, eps=1e-8, weight_decay=cfg["weight_decay"])
    if cfg["optimizer"] == "Adam":
        return optax.adam(lr, b1=0.9, b2=0.999, eps=1e-8)
    raise ValueError(f"unknown optimizer {cfg['optimizer']!r}")


def make_train_step(
    model: MiniROAD,
    optimizer: optax.GradientTransformation,
    flow_is_zero: bool,
    bf16: bool = False,
    mesh: Optional[Mesh] = None,
    gru_backend: str = "scan",
    logger=None,
):
    """Build the jitted train step.

    Signature: (params, opt_state, rgb, flow, target_last, valid, rng)
             -> (params, opt_state, loss)
    gru_backend='pallas_train' uses the fused custom-VJP recurrence
    (ops/gru_pallas_vjp.py); that path is FENCED — if the kernel fails to
    compile (this image's remote compile helper dies with "subprocess
    exit code 1" at B>=64 / H=1024, see scripts/repro_pallas_train_b64.py)
    the step transparently rebuilds on the lax.scan backend with a logged
    warning instead of crashing mid-training.
    """

    def build(backend: str):
        def loss_fn(params, rgb, flow, target_last, valid, rng):
            if bf16:
                rgb = rgb.astype(jnp.bfloat16)
                flow = flow.astype(jnp.bfloat16)
            logits = model.forward_train(
                params, rgb, flow, rng, flow_is_zero=flow_is_zero, backend=backend
            )
            return last_frame_mlce(logits.astype(jnp.float32), target_last, valid)

        def step(params, opt_state, rgb, flow, target_last, valid, rng):
            loss, grads = jax.value_and_grad(loss_fn)(
                params, rgb, flow, target_last, valid, rng
            )
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        if mesh is None:
            return jax.jit(step, donate_argnums=(0, 1))

        batch_sharding = NamedSharding(mesh, P("dp"))
        replicated = NamedSharding(mesh, P())
        return jax.jit(
            step,
            donate_argnums=(0, 1),
            in_shardings=(
                replicated,  # params
                replicated,  # opt_state
                batch_sharding,  # rgb
                batch_sharding,  # flow
                batch_sharding,  # target_last
                batch_sharding,  # valid
                replicated,  # rng
            ),
            out_shardings=(replicated, replicated, replicated),
        )

    if gru_backend != "pallas_train":
        return build(gru_backend)
    return _fence_compile_failure(build, "pallas_train", logger)


def _fence_compile_failure(build, backend: str, logger):
    """Wrap a jitted step so a *compile-time* failure of the custom-kernel
    backend falls back to the scan backend once, loudly, instead of
    killing the run.  Execution happens only after a successful compile,
    and donation consumes buffers only on execution, so the retry sees
    the original params/opt_state intact."""
    state = {"fn": build(backend), "fell_back": False}

    def fenced_step(*args):
        if state["fell_back"]:
            return state["fn"](*args)
        try:
            return state["fn"](*args)
        except Exception as e:  # noqa: BLE001 — filtered below
            name = type(e).__name__
            msg = str(e)
            is_compile_failure = "XlaRuntimeError" in name or any(
                s in msg
                for s in (
                    "compile",
                    "Compile",
                    "Mosaic",
                    "INTERNAL",
                    # pallas_call raises this at TRACE time on CPU (no
                    # interpret=True in the production path) — same remedy
                    "Only interpret mode is supported",
                )
            )
            if not is_compile_failure:
                raise
            warning = (
                f"gru_backend={backend!r} failed to compile for shapes "
                f"{[getattr(a, 'shape', None) for a in args[2:6]]}: {name}: "
                f"{msg.splitlines()[0][:200]} — falling back to the 'scan' "
                "backend (see scripts/repro_pallas_train_b64.py)"
            )
            if logger is not None:
                logger.warning(warning)
            else:  # pragma: no cover - logging always wired in the CLI
                print(f"WARNING: {warning}")
            state["fn"] = build("scan")
            state["fell_back"] = True
            return state["fn"](*args)

    return fenced_step


def make_ant_train_step(
    model,
    optimizer: optax.GradientTransformation,
    flow_is_zero: bool,
    bf16: bool = False,
):
    """ANTICIPATION-task train step (trainer/train.py:31-54 +
    criterions/loss.py:40-79): sum-reduced anticipation mlce on the last
    window frame's predicted future steps."""
    from prego_tpu.train.loss import anticipation_mlce

    def loss_fn(params, rgb, flow, ant_target, valid, rng):
        if bf16:
            rgb = rgb.astype(jnp.bfloat16)
            flow = flow.astype(jnp.bfloat16)
        _, ant_logits = model.forward_train(
            params, rgb, flow, rng, flow_is_zero=flow_is_zero
        )
        return anticipation_mlce(ant_logits.astype(jnp.float32), ant_target, valid)

    def step(params, opt_state, rgb, flow, ant_target, valid, rng):
        loss, grads = jax.value_and_grad(loss_fn)(
            params, rgb, flow, ant_target, valid, rng
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return jax.jit(step, donate_argnums=(0, 1))


@TRAINERS.register("ANTICIPATION")
def ant_train_one_epoch(
    sampler,
    model,
    train_step,
    params,
    opt_state,
    rng: jax.Array,
    batch_size: int,
    epoch: int,
    np_rng: Optional[np.random.Generator] = None,
    writer=None,
    log_every: int = 50,
    logger=None,
):
    epoch_loss, n_batches = 0.0, 0
    for it, batch in enumerate(sampler.iter_batches(batch_size, shuffle=True, rng=np_rng)):
        rng, drop_rng = jax.random.split(rng)
        params, opt_state, loss = train_step(
            params, opt_state,
            jnp.asarray(batch.rgb), jnp.asarray(batch.flow),
            jnp.asarray(batch.ant_target), jnp.asarray(batch.valid), drop_rng,
        )
        epoch_loss += float(loss)
        n_batches += 1
        if logger is not None and it % log_every == 0:
            logger.info(f"epoch {epoch} it {it} ant loss {float(loss):.4f}")
    return params, opt_state, rng, epoch_loss / max(n_batches, 1)


@TRAINERS.register("OAD")
def train_one_epoch(
    sampler: WindowSampler,
    model: MiniROAD,
    train_step,
    params,
    opt_state,
    rng: jax.Array,
    batch_size: int,
    epoch: int,
    np_rng: Optional[np.random.Generator] = None,
    writer=None,
    log_every: int = 50,
    logger=None,
) -> Tuple[Any, Any, jax.Array, float]:
    """One epoch over freshly resampled windows. Returns (params, opt_state, rng, epoch_loss)."""
    epoch_loss = 0.0
    n_batches = 0
    for it, batch in enumerate(sampler.iter_batches(batch_size, shuffle=True, rng=np_rng)):
        rng, drop_rng = jax.random.split(rng)
        params, opt_state, loss = train_step(
            params,
            opt_state,
            jnp.asarray(batch.rgb),
            jnp.asarray(batch.flow),
            jnp.asarray(batch.target[:, -1, :]),
            jnp.asarray(batch.valid),
            drop_rng,
        )
        epoch_loss += float(loss)
        n_batches += 1
        if writer is not None:
            writer.add_scalar("Train Loss", float(loss), it + epoch * sampler.num_batches(batch_size))
        if logger is not None and it % log_every == 0:
            logger.info(f"epoch {epoch} it {it} loss {float(loss):.4f}")
    return params, opt_state, rng, epoch_loss / max(n_batches, 1)
