#!/bin/bash
# Round-3 chip-job queue, take 3 — follow-ups gated on r3b's findings.
# Strictly SEQUENTIAL.  Run from the repo root:
#   bash scripts/chipq_r3c.sh 2>&1 | tee /tmp/chipq_r3c.log
set -u
cd "$(dirname "$0")/.."

run() {
  echo
  echo "#### $(date -u +%H:%M:%S) $*"
  timeout 5400 "$@"
  echo "#### rc=$? $(date -u +%H:%M:%S)"
  sleep 20   # let the axon server free the dead client's HBM
}

# 1. The FIXED cacheupd kernel (tile-aligned RMW cache write): does it
#    compile on chip now, and does the full attention-tail fusion help?
run python scripts/ab_fused_inproc.py --batch 8 --gen 128 --reps 3 \
    --variants baseline,+cacheupd

# 2. Structural profile of the B=8 bf16 decode step (VERDICT r2 #4's
#    "profile-backed negative result" leg): full vs matmuls_only vs
#    no_attention vs attention_only.
run python scripts/profile_decode.py --batch 8 --gen 128 --reps 3

# 3. decode_b8 marginal slope at HEAD (restates the 3.13 ms/step number
#    with the current kernels + the bench_llm methodology).
run python scripts/bench_llm.py --case decode_b8

# 4. 13B with int8 KV (only meaningful if r3b's 13B case fit).
run python scripts/bench_llm.py --case decode_13b_int8_kv8

echo QUEUE_DONE
