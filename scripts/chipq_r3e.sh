#!/bin/bash
# Round-3 chip-job queue, take 5 — stragglers.
#   bash scripts/chipq_r3e.sh 2>&1 | tee /tmp/chipq_r3e.log
set -u
cd "$(dirname "$0")/.."

run() {
  echo
  echo "#### $(date -u +%H:%M:%S) $*"
  timeout 5400 "$@"
  echo "#### rc=$? $(date -u +%H:%M:%S)"
  sleep 20
}

# 13B + int8 KV retry: hit the default 900 s watchdog in a tunnel slow
# patch on the first try.
run python scripts/bench_llm.py --case decode_13b_int8_kv8 --watchdog 2400

# 7B b8 int8+kv8 with fold_batch now AUTO-ON (post-fc871b5 defaults):
# confirms the shipped default reproduces the 14.04 ms/step A/B row.
run python scripts/bench_llm.py --case decode_7b_b8_int8_kv8

# Final end-to-end bench.py exactly as the driver runs it: headline +
# extras + budget + OOM backoff, all at HEAD.
run python bench.py

echo QUEUE_DONE
