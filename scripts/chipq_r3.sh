#!/bin/bash
# Round-3 chip-job queue — strictly SEQUENTIAL (one v5e chip; concurrent
# runs contaminate each other's timings). Run from the repo root:
#   bash scripts/chipq_r3.sh 2>&1 | tee /tmp/chipq_r3.log
set -u
cd "$(dirname "$0")/.."

run() {
  echo
  echo "#### $(date -u +%H:%M:%S) $*"
  timeout 5400 "$@"
  echo "#### rc=$? $(date -u +%H:%M:%S)"
}

# 1. Full bench.py: recognition headline + NEW driver-attested LLM extras
#    (validates the extras plumbing end-to-end before the driver runs it)
run python bench.py

# 2. int8 fusion ladder at the 7B shape, batch 1 (marginal per-step +
#    greedy equality in one process; the 10.67 ms / 75.6%-of-floor row)
run python scripts/ab_fused_inproc.py --quantize --dim 4096 --layers 32 \
    --heads 32 --vocab 32000 --batch 1 --gen 64 --reps 3

# 3. Same ladder, batch 8 (only endpoints to save tunnel compiles)
run python scripts/ab_fused_inproc.py --quantize --dim 4096 --layers 32 \
    --heads 32 --vocab 32000 --batch 8 --gen 64 --reps 3 \
    --variants qbase,+allq8

# 4. kv8-composed 7B serving rows with the q8 fusions ON (env per process)
run env PREGO_FUSED_FFN_Q8=1 PREGO_FUSED_DENSE_Q8=1 \
    python scripts/bench_llm.py --case decode_7b_b8_int8_kv8
run env PREGO_FUSED_FFN_Q8=1 PREGO_FUSED_DENSE_Q8=1 \
    python scripts/bench_llm.py --case anticipation_step_7b_int8_kv8

# 5. The pending 7B step-batched anticipation case (baseline gates)
run python scripts/bench_llm.py --case anticipation_step_7b_int8_kv8_sb2

# 6. batch-folded attention at 7B b8 (per-(batch,head) overhead lever)
run env PREGO_FOLD_BATCH=1 \
    python scripts/bench_llm.py --case decode_7b_b8_int8_kv8

# 7. B=16 production train step re-measure (block-cap change follow-up)
run python scripts/bench_train.py --batch 16 --reps 50
