#!/bin/bash
# Round-3 chip-job queue, take 14 — default-quality checks at larger
# batch:
#   1. Interleaved G-sweep at 7B b16 int8+kv8: the e2e b16/b32 wins
#      were measured with G=32, but the default is G=8 (proven ~= G=32
#      only at b8). If G=32 is clearly better at b16, the default
#      becomes batch-aware.
#   2. 7B anticipation step at sb1 (the 226.5 ms row predates the
#      flat-head default) — restate at HEAD.
# Strictly SEQUENTIAL, tunnel probe before each job.
#   nohup setsid bash scripts/chipq_r3n.sh > /tmp/chipq_r3n.log 2>&1 &
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
    --groups 8,32 --rounds 5
run python scripts/bench_llm.py --case anticipation_step_7b_int8_kv8 --watchdog 2400

echo QUEUE_DONE
