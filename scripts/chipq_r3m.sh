#!/bin/bash
# Round-3 chip-job queue, take 13 — final-state characterization:
#   1. 13B batched serving row (b8 int8+kv8, flat-head default) — the
#      largest-shape batch config that fits one v5e.
#   2. Post-flip structural decode profile at 7B b8: how much of the
#      2.90 ms perhead attention marginal does flat-head remove?
#   3. Full driver-shaped bench.py validation at HEAD (headline +
#      attested LLM extras, exactly as the driver runs it).
# Strictly SEQUENTIAL, one job per process, sleep 20 between, tunnel
# probe before each job.
#   nohup setsid bash scripts/chipq_r3m.sh > /tmp/chipq_r3m.log 2>&1 &
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

run python scripts/bench_llm.py --case decode_13b_b8_int8_kv8 --watchdog 1800
run python scripts/profile_decode.py --shape 7b --quantize --kv_quant --batch 8
run python bench.py

echo QUEUE_DONE
