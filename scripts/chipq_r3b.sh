#!/bin/bash
# Round-3 chip-job queue, take 2 — strictly SEQUENTIAL (one v5e chip;
# concurrent runs contaminate each other's timings).  Differences from
# chipq_r3.sh: bench.py already validated (job dropped), ab_fused_inproc
# now passes params as jit args (no 6.9 GB captured constants), adds the
# 1B-bf16 fusion ladder (VERDICT r2 #4's direct target) and the 13B
# single-chip capacity demonstration.  Run from the repo root:
#   bash scripts/chipq_r3b.sh 2>&1 | tee /tmp/chipq_r3b.log
set -u
cd "$(dirname "$0")/.."

run() {
  echo
  echo "#### $(date -u +%H:%M:%S) $*"
  timeout 5400 "$@"
  echo "#### rc=$? $(date -u +%H:%M:%S)"
  sleep 20   # let the axon server free the dead client's HBM
}

# 1. VERDICT #4 target: 1B-class bf16 fusion ladder at B=8 (the
#    3.13 -> <=2.8 ms/step marginal question). gen 128 to match the
#    RESULTS methodology.
run python scripts/ab_fused_inproc.py --batch 8 --gen 128 --reps 3

# 2. int8 fusion ladder at the 7B shape, batch 1
run python scripts/ab_fused_inproc.py --quantize --dim 4096 --layers 32 \
    --heads 32 --vocab 32000 --batch 1 --gen 64 --reps 3

# 3. Same ladder, batch 8 (only endpoints to save tunnel compiles)
run python scripts/ab_fused_inproc.py --quantize --dim 4096 --layers 32 \
    --heads 32 --vocab 32000 --batch 8 --gen 64 --reps 3 \
    --variants qbase,+allq8

# 4. 13B on one chip: the reference's OTHER served size (capacity demo)
run python scripts/bench_llm.py --case decode_13b_int8

# 5. kv8-composed 7B serving rows with the q8 fusions ON (env per process)
run env PREGO_FUSED_FFN_Q8=1 PREGO_FUSED_DENSE_Q8=1 \
    python scripts/bench_llm.py --case decode_7b_b8_int8_kv8
run env PREGO_FUSED_FFN_Q8=1 PREGO_FUSED_DENSE_Q8=1 \
    python scripts/bench_llm.py --case anticipation_step_7b_int8_kv8

# 6. The pending 7B step-batched anticipation case (baseline gates)
run python scripts/bench_llm.py --case anticipation_step_7b_int8_kv8_sb2

# 7. batch-folded attention at 7B b8 (per-(batch,head) overhead lever)
run env PREGO_FOLD_BATCH=1 \
    python scripts/bench_llm.py --case decode_7b_b8_int8_kv8

# 8. B=16 production train step re-measure (block-cap change follow-up)
run python scripts/bench_train.py --batch 16 --reps 50
