"""Sweep the int8 dequant-matmul n_block tiling at the 7B/13B decode
shapes (VERDICT r3 #3).

The post-flat-head profile pins ~1.24 ms/step of the 7B b8 gap on the
matmul core (9.31 ms vs the 8.07 ms weight-streaming floor); the
suspected residue is per-tile dequant edges / grid-program count, and
ops/quant.py's n_block default (512) has never been swept on chip.

For each decode projection shape (M=batch rows) the harness times an
in-jit chain of R dependent int8_matmul calls per candidate n_block,
INTERLEAVED round-robin so tunnel-weather drift hits every candidate
equally; medians of per-round readings decide.  Also prints the
EFFECTIVE (m, n) blocks after the VMEM-budget clamp, so a candidate that
_fit_blocks shrinks back is visibly identical to its smaller neighbor.

  python scripts/sweep_q8_nblock.py --batch 8 --shape 7b
  python scripts/sweep_q8_nblock.py --batch 8 --shape 7b --tiny  # CPU smoke

One JSON line per (proj, n_block): {"proj", "n_block", "eff", "ms"}.
"""

import argparse
import json
import os
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np


SHAPES = {
    # decode projections: (name, K, N) — fused single-chip serving layout
    "7b": [("wqkv", 4096, 12288), ("wo", 4096, 4096),
           ("w13", 4096, 22016), ("w2", 11008, 4096),
           ("lm_head", 4096, 32000)],
    "13b": [("wqkv", 5120, 15360), ("wo", 5120, 5120),
            ("w13", 5120, 27648), ("w2", 13824, 5120),
            ("lm_head", 5120, 32000)],
    "tiny": [("wqkv", 128, 384), ("w2", 352, 128)],
}


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--shape", default="7b", choices=sorted(SHAPES))
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--nblocks", type=int, nargs="*", default=[256, 512, 1024, 2048])
    p.add_argument("--chain", type=int, default=512, help="in-jit calls per timing")
    p.add_argument("--rounds", type=int, default=5)
    p.add_argument("--tiny", action="store_true", help="CPU smoke")
    args = p.parse_args()
    if args.tiny:
        import jax

        jax.config.update("jax_platforms", "cpu")
        args.shape = "tiny"
        args.nblocks = [128, 256]
        args.chain, args.rounds = 2, 2  # tiny keeps the smoke cheap

    import jax
    import jax.numpy as jnp

    from prego_tpu.ops.quant import _fit_blocks, _pick_n_block, int8_matmul

    rng = np.random.default_rng(0)
    results = []
    for proj, K, N in SHAPES[args.shape]:
        M = args.batch
        x = jnp.asarray(rng.normal(0, 1, (M, K)).astype(np.float32))
        q = jnp.asarray(rng.integers(-127, 128, (K, N)).astype(np.int8))
        s = jnp.asarray(np.full((1, N), 1e-3, np.float32))

        runners = {}
        for nb in args.nblocks:
            eff_n = _pick_n_block(N, nb)
            eff_m, eff_n = _fit_blocks(K, N, min(256, M), eff_n, 2, 1)

            def make(nb):
                interpret = args.tiny  # pallas on CPU runs interpret-only

                def chain(x, q, s):
                    def body(i, carry):
                        xc, acc = carry
                        y = int8_matmul(xc, q, s, n_block=nb,
                                        interpret=interpret)
                        # data dependency defeats CSE without extra work
                        xc = xc + y[0, 0] * 0.0
                        return (xc, acc + y[0, 0])

                    _, acc = jax.lax.fori_loop(
                        0, args.chain, body, (x, jnp.float32(0.0))
                    )
                    return acc

                return jax.jit(chain)

            runners[nb] = (make(nb), (eff_m, eff_n))

        # compile all first (off the clock)
        for nb, (fn, _) in runners.items():
            t_c = time.perf_counter()
            print(f"# compiling {proj} n_block={nb}", file=sys.stderr, flush=True)
            float(fn(x, q, s))
            print(f"# compiled {proj} n_block={nb} in "
                  f"{time.perf_counter() - t_c:.0f}s", file=sys.stderr, flush=True)
        times = {nb: [] for nb in runners}
        for _ in range(args.rounds):
            for nb, (fn, _) in runners.items():
                t0 = time.perf_counter()
                float(fn(x, q, s))  # scalar fetch = reliable sync
                times[nb].append((time.perf_counter() - t0) / args.chain)
        for nb, (fn, eff) in runners.items():
            results.append({
                "proj": proj, "K": K, "N": N, "M": M, "n_block": nb,
                "eff": list(eff),
                "ms": round(float(np.median(times[nb])) * 1e3, 4),
            })
            print(json.dumps(results[-1]), flush=True)

    # per-n_block whole-step estimate (32 layers at 7B, 40 at 13B)
    layers = {"7b": 32, "13b": 40, "tiny": 2}[args.shape]
    for nb in args.nblocks:
        per_layer = sum(r["ms"] for r in results
                        if r["n_block"] == nb and r["proj"] != "lm_head")
        head = sum(r["ms"] for r in results
                   if r["n_block"] == nb and r["proj"] == "lm_head")
        print(json.dumps({
            "summary_n_block": nb,
            "est_step_ms": round(per_layer * layers + head, 3),
        }), flush=True)


if __name__ == "__main__":
    main()
