#!/bin/bash
# Round-3 chip-job queue, take 8 — throughput-batch follow-ups on the
# r3g data (b16 19.70 / b32 29.66 ms/step UNfolded, 41%/27% of floor):
#   1. fold_batch A/B at b16/b32 — the auto-gate currently stops at
#      batch<=8 only because these compiles had never survived a
#      tunnel-outage window; r3g proved the shapes compile, so measure
#      whether the fold's one-program amortization extends.
#   2. Structural profile at the 7B int8 b8 shape (profile_decode
#      --shape 7b): decompose the 13.5 ms marginal into weight-stream
#      core / attention marginal / pointwise+sched residue, same
#      by-construction method as the 1B r3c profile.
# Strictly SEQUENTIAL; waits for chipq_r3g's QUEUE_DONE sentinel.
#   bash scripts/chipq_r3h.sh 2>&1 | tee /tmp/chipq_r3h.log
set -u
cd "$(dirname "$0")/.."

# chain on the previous queue (sentinel in its log, no pid watching)
for i in $(seq 1 720); do
  grep -q QUEUE_DONE /tmp/chipq_r3g.log 2>/dev/null && break
  sleep 30
done
grep -q QUEUE_DONE /tmp/chipq_r3g.log 2>/dev/null || {
  echo "r3g never finished; aborting"; exit 1; }

wait_for_tunnel() {
  for i in $(seq 1 60); do
    if timeout 180 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
      echo "tunnel live (probe $i)"; return 0
    fi
    echo "tunnel dark (probe $i), waiting 120s"
    sleep 120
  done
  echo "tunnel still dark after all probes; proceeding anyway"
}

run() {
  wait_for_tunnel
  echo
  echo "#### $(date -u +%H:%M:%S) $*"
  timeout 5400 "$@"
  echo "#### rc=$? $(date -u +%H:%M:%S)"
  sleep 20
}

run env PREGO_FOLD_BATCH=1 \
    python scripts/bench_llm.py --case decode_7b_b16_int8_kv8 --watchdog 1200
run env PREGO_FOLD_BATCH=1 \
    python scripts/bench_llm.py --case decode_7b_b32_int8_kv8 --watchdog 1200

# where does the b8 marginal (13.5 ms vs 8.9 ms floor+attn estimate) go?
run python scripts/profile_decode.py --shape 7b --quantize --batch 8
# and does the batch-16 overhead live in attention or the matmul core?
run python scripts/profile_decode.py --shape 7b --quantize --batch 16

echo QUEUE_DONE
