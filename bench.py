"""Benchmark: streaming recognition throughput on one TPU chip.

Measures the flagship path — MiniROAD batched-causal streaming inference
(the PREGO production configuration: rgb_anet_resnet50 + structurally-zero
flow, embedding 2048, hidden 1024, 86 classes) — over a batch of synthetic
full-length videos, chunked through the jitted scan with carried state,
exactly as the evaluator runs it.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "frames/sec/chip", "vs_baseline": N/10000}
Baseline: the >10k frames/sec/chip north star from BASELINE.md (the
reference's own eval FPS logging is broken — eval.py:35-36,77).
"""

import json
import os
import sys
import threading
import time

import numpy as np


def _watchdog(seconds: float):
    """The tunneled TPU transport can wedge entirely (device ops hang
    forever); fail fast with a clear message instead of hanging the
    harness."""

    def trip():
        print(
            f"bench watchdog: no result within {seconds:.0f}s — "
            "TPU transport appears hung",
            file=sys.stderr,
        )
        os._exit(3)

    t = threading.Timer(seconds, trip)
    t.daemon = True
    t.start()
    return t


def main():
    _watchdog(480)
    import jax
    import jax.numpy as jnp

    from prego_tpu.core import RecognitionConfig
    from prego_tpu.models.miniroad import MiniROAD
    from prego_tpu.train.evaluator import make_chunk_fn

    cfg = RecognitionConfig.from_dict(
        {
            "rgb_type": "rgb_anet_resnet50",
            "flow_type": "flow_anet_resnet50",
            "embedding_dim": 2048,
            "hidden_dim": 1024,
            "num_layers": 1,
            "num_classes": 86,
            "dropout": 0.2,
        }
    )
    model = MiniROAD(cfg)
    params = model.init(jax.random.PRNGKey(0))

    B = 128  # videos streamed concurrently (test split scale)
    CHUNK = 512
    N_CHUNKS = 16  # measured frames = B * CHUNK * N_CHUNKS

    rng = np.random.default_rng(0)
    # one resident chunk re-fed each step: isolates device throughput from
    # synthetic-data generation; rotate two buffers so XLA can't CSE runs
    chunks = [
        jnp.asarray(rng.normal(0, 1, (B, CHUNK, 2048)).astype(np.float32))
        for _ in range(2)
    ]
    zero_flow = jnp.zeros((B, CHUNK, 2048), jnp.float32)
    # the fused Pallas recurrence (ops/gru_pallas.py) is the production path;
    # fall back to the XLA scan if the kernel can't compile on this platform
    chunk_fn = make_chunk_fn(model, flow_is_zero=True, backend="pallas")
    try:
        hidden = model.init_hidden(B)
        s, _ = chunk_fn(params, chunks[0], zero_flow, hidden)
        float(jnp.sum(s))
    except Exception:
        chunk_fn = make_chunk_fn(model, flow_is_zero=True, backend="scan")

    # NOTE: on the tunneled TPU platform block_until_ready returns before
    # execution finishes; a scalar checksum fetch is the only reliable sync
    # (and avoids timing the device->host transfer of the full scores).
    checksum = jax.jit(lambda s: jnp.sum(s))

    hidden = model.init_hidden(B)
    scores, hidden = chunk_fn(params, chunks[0], zero_flow, hidden)  # compile
    float(checksum(scores))

    hidden = model.init_hidden(B)
    t0 = time.perf_counter()
    for i in range(N_CHUNKS):
        scores, hidden = chunk_fn(params, chunks[i % 2], zero_flow, hidden)
    float(checksum(scores))  # forces the whole dependent chain
    elapsed = time.perf_counter() - t0

    frames = B * CHUNK * N_CHUNKS
    fps = frames / elapsed
    baseline = 10_000.0
    print(
        json.dumps(
            {
                "metric": "streaming_recognition_throughput",
                "value": round(fps, 1),
                "unit": "frames/sec/chip",
                "vs_baseline": round(fps / baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
