"""A/B the fused decode paths on the real chip (VERDICT r2 #4).

Runs bench_llm decode cases in SUBPROCESSES with the fusion kill
switches toggled (the supported() checks read the env at trace time, so
per-variant processes guarantee a fresh trace), plus a greedy-equality
check between variants.

  python scripts/ab_fused_decode.py [--case decode_b8] [--gen 64]

Variants: baseline (both fusions off), +ffn, +wo, +both.
"""

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

VARIANTS = {
    "baseline": {"PREGO_FUSED_FFN": "0", "PREGO_FUSED_ATTN_WO": "0"},
    "+ffn": {"PREGO_FUSED_FFN": "1", "PREGO_FUSED_ATTN_WO": "0"},
    "+wo": {"PREGO_FUSED_FFN": "0", "PREGO_FUSED_ATTN_WO": "1"},
    "+both": {"PREGO_FUSED_FFN": "1", "PREGO_FUSED_ATTN_WO": "1"},
}

EQ_SNIPPET = """
import sys; sys.path.insert(0, {repo!r})
import jax, jax.numpy as jnp
from prego_tpu.models.llama import ByteTokenizer, Llama, LlamaConfig, init_params
from prego_tpu.models.llama.model import fuse_projections
tok = ByteTokenizer()
cfg = LlamaConfig(dim=2048, n_layers=16, n_heads=16, n_kv_heads=16,
                  vocab_size=tok.n_words, multiple_of=256, norm_eps=1e-5,
                  max_batch_size=8, max_seq_len=512)
dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
params = fuse_projections(init_params(cfg, jax.random.PRNGKey(0), dtype=dtype))
llama = Llama(params, tok, cfg)
prompts = [[1,2,3,4,5,6,7,8]] * 4
out = llama.generate(prompts, max_gen_len={gen}, temperature=0.0)[0]
print("TOKENS:" + repr(out))
"""


def run_variant(name, env_over, case, gen):
    env = dict(os.environ, PYTHONPATH=REPO + ":" + os.environ.get("PYTHONPATH", ""))
    env.update(env_over)
    # perf
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts/bench_llm.py"),
         "--case", case, "--watchdog", "1500"],
        capture_output=True, text=True, env=env, timeout=1600,
    )
    perf = None
    for line in r.stdout.splitlines():
        if line.startswith("{"):
            perf = json.loads(line)
    # equality tokens
    r2 = subprocess.run(
        [sys.executable, "-c", EQ_SNIPPET.format(repo=REPO, gen=gen)],
        capture_output=True, text=True, env=env, timeout=1600,
    )
    toks = None
    for line in r2.stdout.splitlines():
        if line.startswith("TOKENS:"):
            toks = line[len("TOKENS:"):]
    return perf, toks, (r.stderr[-400:] if perf is None else ""), (
        r2.stderr[-400:] if toks is None else ""
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--case", default="decode_b8")
    ap.add_argument("--gen", type=int, default=64)
    ap.add_argument("--variants", default="baseline,+ffn,+wo,+both")
    args = ap.parse_args()

    token_sets = {}
    for name in args.variants.split(","):
        perf, toks, err1, err2 = run_variant(name, VARIANTS[name], args.case, args.gen)
        token_sets[name] = toks
        print(f"[{name:9s}] perf={perf} tokens_ok={toks is not None}", flush=True)
        if err1 or err2:
            print(f"  stderr: {err1} {err2}", flush=True)
    uniq = {t for t in token_sets.values() if t is not None}
    print(f"greedy outputs identical across variants: {len(uniq) <= 1}")


if __name__ == "__main__":
    main()
