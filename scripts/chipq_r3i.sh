#!/bin/bash
# Round-3 chip-job queue, take 9 — FLAT-HEAD decode attention A/B
# (ops/decode_attention.py::_flat_group_update, PREGO_HEAD_GROUP env):
# stack G heads per score/value matmul pair instead of serializing
# kv_heads R=1-row dots per block.  Hypothesis from the batch sweep
# (55%/41%/27% of floor at b8/b16/b32): the residue is per-(batch,head)
# op-issue cost, which the fold kernel only partially amortizes.
# Each config is paired with a same-window control where the record
# number predates this queue (tunnel weather moves e2e readings ±50%).
# Strictly SEQUENTIAL; waits for chipq_r3h's QUEUE_DONE sentinel.
#   bash scripts/chipq_r3i.sh 2>&1 | tee /tmp/chipq_r3i.log
set -u
cd "$(dirname "$0")/.."

for i in $(seq 1 720); do
  grep -q QUEUE_DONE /tmp/chipq_r3h.log 2>/dev/null && break
  sleep 30
done
grep -q QUEUE_DONE /tmp/chipq_r3h.log 2>/dev/null || {
  echo "r3h never finished; aborting"; exit 1; }

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

# r3h's lost final job (the session restart killed the queue mid-run):
# does the b16 batch-scaling overhead live in attention or the matmul core?
run python scripts/profile_decode.py --shape 7b --quantize --batch 16

# b8: control (fold default) then flat at G=32 and G=8
run python scripts/bench_llm.py --case decode_7b_b8_int8_kv8 --watchdog 1200
run env PREGO_HEAD_GROUP=32 \
    python scripts/bench_llm.py --case decode_7b_b8_int8_kv8 --watchdog 1200
run env PREGO_HEAD_GROUP=8 \
    python scripts/bench_llm.py --case decode_7b_b8_int8_kv8 --watchdog 1200

# the batch-sweep shapes (controls measured in r3g: 19.70 / 29.66)
run env PREGO_HEAD_GROUP=32 \
    python scripts/bench_llm.py --case decode_7b_b16_int8_kv8 --watchdog 1200
run env PREGO_HEAD_GROUP=32 \
    python scripts/bench_llm.py --case decode_7b_b32_int8_kv8 --watchdog 1200

# b1 (75-83% of floor today: less headroom, but the 32-dot serial chain
# is still there) and 13B (40 heads, G=8)
run env PREGO_HEAD_GROUP=32 \
    python scripts/bench_llm.py --case decode_7b_int8 --watchdog 1200
run env PREGO_HEAD_GROUP=8 \
    python scripts/bench_llm.py --case decode_13b_int8_kv8 --watchdog 1800

# the PREGO serving step at 7B: control + flat
run python scripts/bench_llm.py --case anticipation_step_7b_int8_kv8_sb2 --watchdog 1800
run env PREGO_HEAD_GROUP=32 \
    python scripts/bench_llm.py --case anticipation_step_7b_int8_kv8_sb2 --watchdog 1800

echo QUEUE_DONE
