"""End-to-end SAMPLED-mode spot check for the r4 serving paths (VERDICT r4
#5): do speculative decoding and the continuous-batching slot loop change
PREGO mistake VERDICTS at the product sampling settings (temperature 0.6,
num_samples^2 anticipated-set union — llama_meta.py:163-180's regime), or
do they stay inside ordinary sampling noise?

Sampling means the token streams are NOT expected to match (spec's
rejection sampler and CB's chunked key-splits consume randomness
differently from the plain drain loop even at the same seed), so the
harness calibrates a NOISE FLOOR first: the plain path against itself
with a different PREGO_SAMPLE_SEED.  A variant whose verdict-flip rate is
at (or below) the reseed floor preserves the verdict distribution; one far
above it does not.

Each leg runs in its OWN child process (env seeds + trace-time gates), on
the SAME reference-shipped recognized sequences as ab_flat_verdicts.py.

  python scripts/ab_sampled_verdicts.py --fabricated 7b --quantize \
      --kv_quant --videos 12           # on-chip spot check (fabricated
                                       # weights: outputs are noise, but
                                       # flip rates measure the machinery)
  python scripts/ab_sampled_verdicts.py --tiny --legs spec   # CPU smoke

Prints one JSON line: {"steps", noise-floor flips, per-leg flips, metrics
per variant}.
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

# variant -> (extra JaxLlamaLLM kwargs, extra env)
#   spec uses the PARTIAL-depth self-draft (16 of 32 layers at 7b): the
#   distribution-preservation claim is only exercised when the verifier
#   actually REJECTS drafts, and a full-depth draft never rejects; the
#   auto-off guard is disabled so low fabricated acceptance keeps the
#   rejection path hot for the whole run.
VARIANTS = {
    "base": ({}, {"PREGO_SAMPLE_SEED": "1"}),
    "reseed": ({}, {"PREGO_SAMPLE_SEED": "2"}),
    "spec": (
        {"spec_k": 4, "spec_draft": None},  # draft depth filled per shape
        {"PREGO_SAMPLE_SEED": "1", "PREGO_SPEC_MIN_ACCEPT": "0"},
    ),
    "cb": ({"serving": "cb"}, {"PREGO_SAMPLE_SEED": "1"}),
}
SELF_DRAFT_DEPTH = {"7b": 16, "13b": 20, "1b": 8, "tiny": 1}


def child(args, variant: str, out_path: str) -> None:
    from prego_tpu.anticipation.driver import run_anticipation
    from prego_tpu.anticipation.llm import JaxLlamaLLM
    from prego_tpu.metrics.mistake import get_metrics

    preds_path = osp.join(
        REFERENCE, "step_anticipation", "data", "predictions",
        "output_miniROAD_Assembly101-O.json",
    )
    with open(preds_path) as f:
        seqs = json.load(f)
    seqs = dict(list(seqs.items())[: args.videos])

    kwargs, _ = VARIANTS[variant]
    kwargs = dict(kwargs)
    shape = "tiny" if args.tiny else args.fabricated
    if variant == "spec":
        kwargs["spec_draft"] = f"self-{SELF_DRAFT_DEPTH[shape]}"
    llm = JaxLlamaLLM(
        None, None,
        fabricated=shape,
        max_seq_len=256 if args.tiny else 2048,
        max_batch_size=4,
        quantize=args.quantize and not args.tiny,
        kv_quant=args.kv_quant and not args.tiny,
        **kwargs,
    )
    result = run_anticipation(
        seqs, llm, dataset="assembly", contexts={},
        temperature=0.6, num_samples=2,  # the product path IS sampled:
        # 2^2 = 4 generations per step, anticipated set = their union
        max_gen_len=8, step_batch=2, eval_metrics=False,
    )
    metrics = get_metrics(result.preds, result.gts)
    with open(out_path, "wb") as f:
        pickle.dump({"preds": result.preds, "gts": result.gts,
                     "metrics": metrics}, f)


def _flips(a, b):
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
    return steps, flips, set_mismatch


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--fabricated", default="7b",
                   choices=["7b", "13b", "1b", "tiny"])
    p.add_argument("--videos", type=int, default=12)
    p.add_argument("--quantize", action="store_true")
    p.add_argument("--kv_quant", action="store_true")
    p.add_argument("--legs", default="spec,cb",
                   help="comma list of variants beyond base+reseed")
    p.add_argument("--tiny", action="store_true", help="CPU plumbing smoke")
    p.add_argument("--child", default=None, help=argparse.SUPPRESS)
    p.add_argument("--out", default=None, help=argparse.SUPPRESS)
    args = p.parse_args()

    if args.child is not None:
        if args.tiny:
            import jax

            jax.config.update("jax_platforms", "cpu")
        return child(args, args.child, args.out)

    legs = [x for x in args.legs.split(",") if x]
    for leg in legs:
        if leg not in VARIANTS or leg in ("base", "reseed"):
            sys.exit(f"unknown leg {leg!r} (spec|cb)")
    results = {}
    with tempfile.TemporaryDirectory() as td:
        for name in ["base", "reseed"] + legs:
            out = osp.join(td, f"{name}.pkl")
            cmd = [sys.executable, osp.abspath(__file__),
                   "--child", name, "--out", out,
                   "--fabricated", args.fabricated,
                   "--videos", str(args.videos)]
            for flag in ("quantize", "kv_quant", "tiny"):
                if getattr(args, flag):
                    cmd.append(f"--{flag}")
            env = {**os.environ, **VARIANTS[name][1]}
            proc = subprocess.run(cmd, timeout=5400, env=env)
            if proc.returncode != 0:
                print(f"variant {name} failed rc={proc.returncode}",
                      file=sys.stderr)
                return 1
            with open(out, "rb") as f:
                results[name] = pickle.load(f)

    base = results["base"]
    out = {"case": "ab_sampled_verdicts"
           + ("_tiny" if args.tiny else f"_{args.fabricated}")}
    steps, nf_flips, nf_mismatch = _flips(base, results["reseed"])
    out["steps"] = steps
    out["noise_floor_flips"] = nf_flips
    out["noise_floor_set_mismatch"] = nf_mismatch
    for leg in legs:
        _, flips, mismatch = _flips(base, results[leg])
        out[f"{leg}_flips"] = flips
        out[f"{leg}_set_mismatch"] = mismatch
    for name, r in results.items():
        out[f"metrics_{name}"] = {
            k: round(v, 4) for k, v in r["metrics"].items()
        }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
