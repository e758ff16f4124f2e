#!/bin/bash
# Round-3 chip-job queue, take 4 — throughput-batch sweep at 7B.
# The b8 rows sit at ~54-60% of the weight-streaming floor because R=1
# decode rows under-fill the MXU sublanes and the attention grid pays
# per-(batch,head) program overheads; if 16/32-row steps amortize those,
# the serving sweet spot (tok/s/chip) is at a larger batch.
# Strictly SEQUENTIAL.  Run from the repo root:
#   bash scripts/chipq_r3d.sh 2>&1 | tee /tmp/chipq_r3d.log
set -u
cd "$(dirname "$0")/.."

run() {
  echo
  echo "#### $(date -u +%H:%M:%S) $*"
  timeout 5400 "$@"
  echo "#### rc=$? $(date -u +%H:%M:%S)"
  sleep 20
}

run python scripts/bench_llm.py --case decode_7b_b16_int8_kv8
run python scripts/bench_llm.py --case decode_7b_b32_int8_kv8

# B=16 train-step re-measure: the r3b reading (scan 29.76 / pallas 9.24
# ms/step, compiles 149s/71s) was taken in an obvious tunnel slow patch
# (historical: scan 5.3 / pallas 3.39, compiles in seconds).
run python scripts/bench_train.py --batch 16 --reps 50

echo QUEUE_DONE
