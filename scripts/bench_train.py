"""Training-step bench at the PREGO production recognition shape.

One command for the RESULTS.md training rows (previously measured ad hoc):
MiniROAD rgb_anet_resnet50 + structurally-zero flow, embedding 2048,
hidden 1024, 86 classes, W=128 windows, AdamW f32 — the configuration
`cli/train.py` runs for Assembly101-O (reference main.py:60-67 optimizer).

  python scripts/bench_train.py [--batch 16] [--backends scan,pallas_train]
                                [--reps 30] [--window 128]

Prints one JSON line per backend:
  {"case": "train_step_b16_scan", "value": ms, "unit": "ms/step",
   "frames_per_s": N}

Timing methodology matches bench.py: the tunneled TPU's
block_until_ready is unreliable, so each measurement closes with a
jitted scalar checksum fetch of the loss chain.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--window", type=int, default=128)
    ap.add_argument("--reps", type=int, default=30)
    ap.add_argument("--backends", default="scan,pallas_train")
    ap.add_argument("--tiny", action="store_true",
                    help="CPU smoke shapes (B=4, W=16, H=64)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from prego_tpu.core import RecognitionConfig
    from prego_tpu.models.miniroad import MiniROAD
    from prego_tpu.train.trainer import build_optimizer, make_train_step

    tiny = args.tiny
    cfg = RecognitionConfig.from_dict(
        {
            "rgb_type": "rgb_anet_resnet50",
            "flow_type": "flow_anet_resnet50",
            "embedding_dim": 128 if tiny else 2048,
            "hidden_dim": 64 if tiny else 1024,
            "num_layers": 1,
            "num_classes": 86,
            "dropout": 0.2,
            "optimizer": "AdamW",
            "lr": 1e-4,
            "weight_decay": 0.05,
        }
    )
    B = 4 if tiny else args.batch
    W = 16 if tiny else args.window
    model = MiniROAD(cfg)
    optimizer = build_optimizer(cfg)

    rng = np.random.default_rng(0)
    rgb = jnp.asarray(rng.normal(0, 1, (B, W, 2048)).astype(np.float32))
    flow = jnp.zeros((B, W, 2048), jnp.float32)
    target = jnp.asarray(
        (rng.random((B, 86)) < 0.05).astype(np.float32) + 1e-3
    )
    valid = jnp.ones((B,), jnp.float32)
    checksum = jax.jit(lambda x: jnp.sum(x))

    for backend in args.backends.split(","):
        step = make_train_step(
            model, optimizer, flow_is_zero=True, gru_backend=backend
        )
        params = model.init(jax.random.PRNGKey(0))
        opt_state = optimizer.init(params)
        key = jax.random.PRNGKey(1)
        t0 = time.perf_counter()
        params, opt_state, loss = step(
            params, opt_state, rgb, flow, target, valid, key
        )
        float(checksum(loss))
        compile_s = time.perf_counter() - t0

        t0 = time.perf_counter()
        for i in range(args.reps):
            key = jax.random.fold_in(key, i)
            params, opt_state, loss = step(
                params, opt_state, rgb, flow, target, valid, key
            )
        float(checksum(loss))
        ms = (time.perf_counter() - t0) / args.reps * 1e3
        print(
            json.dumps(
                {
                    "case": f"train_step_b{B}_{backend}",
                    "value": round(ms, 2),
                    "unit": "ms/step",
                    "frames_per_s": round(B * W / (ms / 1e3)),
                    "compile_s": round(compile_s, 1),
                    "final_loss": round(float(loss), 4),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
