"""Minimized repro: pallas_train GRU compile failure at B >= 64, H = 1024.

ROOT CAUSE (found in r3 by bisecting kernels and block configs): the
BACKWARD kernel (gru_bwd_pallas) carries five live (tb, bb, *) VMEM
windows (xg, hprev, dhs in; dxg, r out), each double-buffered by Mosaic,
beside the resident 6 MB bf16 W_hh scratch.  At the r2 block config
(time_block=8, batch_block=16) that overflows the 16 MB VMEM budget —
and this image's remote compile helper surfaces the Mosaic failure as an
opaque HTTP 500 "tpu_compile_helper subprocess exit code 1" instead of
a diagnostic.  The forward kernel (3 smaller windows) fits at 16-row
blocks, which is why inference never failed and why the failure looked
batch-dependent: small B capped batch_block to B and slipped under the
budget.

FIX: _fit_batch_block now enforces time_block*batch_block <= 64 for the
backward kernel at H >= 1024 (ops/gru_pallas_vjp.py).  B=64/128/256 all
compile in seconds.  The trainer additionally FENCES the backend: any
residual compile failure falls back to the lax.scan backend with a warning
(train/trainer.py) instead of dying mid-training.

Run:  python scripts/repro_pallas_train_b64.py [--batch 64] [--ok-batch 16]

Expected after the fix: both compiles succeed.  To reproduce the
original failure, call gru_bwd_pallas directly with time_block=8,
batch_block=16 at B >= 32 (or revert the product cap).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def build_and_compile(batch: int, window: int, emb: int, hidden: int) -> str:
    from prego_tpu.ops.gru import init_gru_params
    from prego_tpu.ops.gru_pallas_vjp import gru_trainable

    params = init_gru_params(jax.random.PRNGKey(0), emb, hidden)
    x = jnp.zeros((batch, window, emb), jnp.float32)
    h0 = jnp.zeros((batch, hidden), jnp.float32)

    def loss(params, x, h0):
        hs, hT = gru_trainable(x, h0, params, 8, 64, False, jnp.bfloat16)
        return jnp.sum(hs[:, -1]) + jnp.sum(hT)

    t0 = time.time()
    jax.jit(jax.grad(loss)).lower(params, x, h0).compile()
    return f"compiled in {time.time() - t0:.1f}s"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64, help="failing batch")
    ap.add_argument("--ok-batch", type=int, default=16, help="control batch")
    ap.add_argument("--window", type=int, default=128)
    ap.add_argument("--emb", type=int, default=2048)
    ap.add_argument("--hidden", type=int, default=1024)
    args = ap.parse_args()

    print(f"devices: {jax.devices()}")
    for label, b in (("control", args.ok_batch), ("repro", args.batch)):
        try:
            msg = build_and_compile(b, args.window, args.emb, args.hidden)
            print(f"[{label}] B={b}: OK ({msg})")
        except Exception as e:  # noqa: BLE001 — report, don't crash the pair
            print(f"[{label}] B={b}: FAILED: {type(e).__name__}: {str(e)[:400]}")
            if label == "repro":
                return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
