#!/bin/bash
# Round-5 chip-job queue, take 3.  Waits for chipq_r5b's QUEUE_DONE.
# (1) composed spec step self32, attempt 3: the r5b leg still AOT-refused
#     (args 13.71G — the draft pytree argument re-budgeted every shared
#     weight leaf); the draft now enters the jit as a STATIC layer count
#     and is sliced from the target tree inside the trace, so the
#     argument budget is one weight tree (~7.7G with both prefix slots).
# (2) spec_decode self32 re-read on the same static path (guards against
#     a regression from the arg-plumbing change at the measured case).
#   nohup setsid bash scripts/chipq_r5c.sh > /tmp/chipq_r5c.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

echo "waiting for chipq_r5b QUEUE_DONE"
for i in $(seq 1 300); do
  grep -qx QUEUE_DONE /tmp/chipq_r5b.log 2>/dev/null && break
  sleep 60
done
grep -qx QUEUE_DONE /tmp/chipq_r5b.log 2>/dev/null || echo "r5b sentinel missing; proceeding"

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
  timeout 5400 "$@"
  echo "#### rc=$? $(date -u +%H:%M:%S)"
  sleep 20
}

run python scripts/bench_llm.py --case anticipation_step_7b_spec_self32_k4 --watchdog 2400
run python scripts/bench_llm.py --case spec_decode_7b_self32_k4 --watchdog 2400

echo QUEUE_DONE
