#!/bin/bash
# Round-3 chip-job queue, take 16 — formal interleaved control pairs for
# the flat-head default at the larger serving batches, with the fixed
# harness (control legs pin PREGO_HEAD_GROUP=1 so the default cannot
# leak into them):
#   1. 7B b16 int8+kv8: perhead vs fold vs flat8.
#   2. 7B b32 int8+kv8 at max_seq 256 (the e2e sweep's shape; 512 would
#      put the b32 KV at ~8.6 GB beside 6.7 GB of weights).
#   nohup setsid bash scripts/chipq_r3p.sh > /tmp/chipq_r3p.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

wait_for_tunnel() {
  for i in $(seq 1 30); do
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
  timeout 3600 "$@"
  echo "#### rc=$? $(date -u +%H:%M:%S)"
  sleep 20
}

run python scripts/ab_attention_inproc.py --quantize --kv_quant \
    --dim 4096 --layers 32 --heads 32 --vocab 32000 --batch 16 \
    --groups 8 --rounds 5
run python scripts/ab_attention_inproc.py --quantize --kv_quant \
    --dim 4096 --layers 32 --heads 32 --vocab 32000 --batch 32 \
    --max_seq 256 --groups 8 --rounds 5

echo QUEUE_DONE
