#!/bin/bash
# Round-3 chip-job queue, take 10 — DEFINITIVE attention-dispatch A/Bs
# via the in-process interleaved harness (ab_attention_inproc.py):
# one process, one weight set, round-robin timing, so tunnel-weather
# drift cancels out of the perhead/fold/flatG comparison that the r3i
# cross-window e2e readings can only bound loosely.  Shapes:
#   - 7B int8+kv8 at b8/b16/b32 (the serving sweep; gate decisions)
#   - 7B int8+kv8 at b1 (flat could lift the 75-83%-of-floor b1 too —
#     perhead serializes 32 R=1 dots per block even at batch 1)
#   - 1B bf16 at b8 (the VERDICT-#4 <=2.8 ms target: profile says the
#     residue is attention-program issue, which flat attacks)
# Strictly SEQUENTIAL; waits for chipq_r3i's QUEUE_DONE sentinel.
#   bash scripts/chipq_r3j.sh 2>&1 | tee /tmp/chipq_r3j.log
set -u
cd "$(dirname "$0")/.."

for i in $(seq 1 720); do
  grep -q QUEUE_DONE /tmp/chipq_r3i.log 2>/dev/null && break
  sleep 30
done
grep -q QUEUE_DONE /tmp/chipq_r3i.log 2>/dev/null || {
  echo "r3i never finished; aborting"; exit 1; }

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

Q7B="--quantize --kv_quant --dim 4096 --layers 32 --heads 32 --vocab 32000"

run python scripts/ab_attention_inproc.py $Q7B --batch 8 --groups 8,16,32
run python scripts/ab_attention_inproc.py $Q7B --batch 16 --groups 8,32
run python scripts/ab_attention_inproc.py $Q7B --batch 32 --groups 8,32
run python scripts/ab_attention_inproc.py $Q7B --batch 1 --groups 32
# 1B bf16 b8 — the <=2.8 ms/step question
run python scripts/ab_attention_inproc.py --batch 8 --groups 8,16

echo QUEUE_DONE
