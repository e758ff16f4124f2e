"""End-to-end metrics-level A/B of the flat-head decode-attention default
(VERDICT r3 #7): does flat-vs-perhead dispatch ever change a PREGO mistake
VERDICT, not just a bf16 near-tie token?

Runs the SAME anticipation workload (reference-shipped recognized
sequences, greedy decoding so the only divergence source is the kernel's
accumulation order) once with PREGO_HEAD_GROUP=8 (flat) and once with
PREGO_HEAD_GROUP=0 (per-head), each in its OWN child process — the env
gate is read at trace time, so a cached executable would otherwise shadow
the second variant.  Compares per-step membership verdicts (recognized
symbol in anticipated set) and the final one-class metrics.

  python scripts/ab_flat_verdicts.py --fabricated 7b --quantize --kv_quant \
      --videos 12            # on-chip spot check (fabricated weights:
                             # outputs are noise, but verdict-flip rate
                             # measures the SAME near-tie sensitivity the
                             # real weights would see)
  python scripts/ab_flat_verdicts.py --tiny   # hermetic CPU plumbing run
                             # (kernels are TPU-only: expect 0 flips)

Prints one JSON line: {"steps", "verdict_flips", "set_mismatch_steps",
"metrics_flat", "metrics_perhead"}.
"""

import argparse
import json
import os
import os.path as osp
import pickle
import subprocess
import sys
import tempfile

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

REFERENCE = os.environ.get("REFERENCE", "/root/reference")


def child(args, head_group_env: str, out_path: str) -> None:
    os.environ["PREGO_HEAD_GROUP"] = head_group_env
    from prego_tpu.anticipation.driver import run_anticipation
    from prego_tpu.anticipation.llm import JaxLlamaLLM
    from prego_tpu.metrics.mistake import get_metrics

    preds_path = osp.join(
        REFERENCE, "step_anticipation", "data", "predictions",
        "output_miniROAD_Assembly101-O.json",
    )
    with open(preds_path) as f:
        seqs = json.load(f)
    items = list(seqs.items())[: args.videos]
    seqs = dict(items)

    llm = JaxLlamaLLM(
        None, None,
        fabricated="tiny" if args.tiny else args.fabricated,
        max_seq_len=256 if args.tiny else 2048,
        max_batch_size=4,
        quantize=args.quantize and not args.tiny,
        kv_quant=args.kv_quant and not args.tiny,
    )
    result = run_anticipation(
        seqs, llm, dataset="assembly", contexts={},  # no-context prompts:
        # the numeric histories alone drive the decode — the kernel A/B
        # does not need the few-shot text
        temperature=0.0, num_samples=1, max_gen_len=8,
        step_batch=2, eval_metrics=False,
    )
    metrics = get_metrics(result.preds, result.gts)
    with open(out_path, "wb") as f:
        pickle.dump({"preds": result.preds, "gts": result.gts,
                     "metrics": metrics}, f)


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--fabricated", default="7b", choices=["7b", "13b", "1b", "tiny"])
    p.add_argument("--videos", type=int, default=12)
    p.add_argument("--quantize", action="store_true")
    p.add_argument("--kv_quant", action="store_true")
    p.add_argument("--tiny", action="store_true", help="CPU plumbing smoke")
    p.add_argument("--child", default=None, help=argparse.SUPPRESS)
    p.add_argument("--out", default=None, help=argparse.SUPPRESS)
    args = p.parse_args()

    if args.child is not None:
        if args.tiny:
            import jax

            jax.config.update("jax_platforms", "cpu")
        return child(args, args.child, args.out)

    results = {}
    with tempfile.TemporaryDirectory() as td:
        for name, env_val in (("flat", "8"), ("perhead", "0")):
            out = osp.join(td, f"{name}.pkl")
            cmd = [sys.executable, osp.abspath(__file__),
                   "--child", env_val, "--out", out,
                   "--fabricated", args.fabricated,
                   "--videos", str(args.videos)]
            for flag in ("quantize", "kv_quant", "tiny"):
                if getattr(args, flag):
                    cmd.append(f"--{flag}")
            proc = subprocess.run(cmd, timeout=3600)
            if proc.returncode != 0:
                print(f"variant {name} failed rc={proc.returncode}", file=sys.stderr)
                return 1
            with open(out, "rb") as f:
                results[name] = pickle.load(f)

    a, b = results["flat"], results["perhead"]
    steps = flips = set_mismatch = 0
    for vid in a["preds"]:
        pa, pb = a["preds"][vid], b["preds"][vid]
        ga = a["gts"][vid]
        for i in range(len(ga)):
            steps += 1
            if pa[i] != pb[i]:
                set_mismatch += 1
            if (ga[i] in pa[i]) != (ga[i] in pb[i]):
                flips += 1
    print(json.dumps({
        "case": "ab_flat_verdicts"
        + ("_tiny" if args.tiny else f"_{args.fabricated}"),
        "steps": steps,
        "verdict_flips": flips,
        "set_mismatch_steps": set_mismatch,
        "metrics_flat": {k: round(v, 4) for k, v in a["metrics"].items()},
        "metrics_perhead": {k: round(v, 4) for k, v in b["metrics"].items()},
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
