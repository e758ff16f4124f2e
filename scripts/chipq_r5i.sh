#!/bin/bash
# Round-5 chip-job queue, take 9 — one more CB workload leg, chained on
# r5h's QUEUE_DONE.  r5h leg 1 (batch) is INVALID: the builder ran the
# full CPU test suite + the 8-dev TP tests concurrently, starving the
# driver's host process (1.422 s/call vs the 0.96-0.97 historical band —
# chip legs are host-CPU-sensitive too, not just chip-sensitive).  Legs
# 2 (CB) and 3 (batch) ran clean; this leg makes the clean sequence
# CB / batch / CB — an A/B/A with CB bracketing.
#   nohup setsid bash scripts/chipq_r5i.sh > /tmp/chipq_r5i.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

echo "waiting for chipq_r5h QUEUE_DONE"
while ! grep -qx QUEUE_DONE /tmp/chipq_r5h.log 2>/dev/null; do
  sleep 60
done
echo "r5h done; starting"

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

run python -m prego_tpu.cli.anticipate \
    --llm jax-llama --fabricated 7b --quantize --kv_quant \
    --serving cb --cb_slots 8 \
    --step_batch 2 --num_samples 2 --max_gen_len 8 \
    --max_seq_len 2048 --max_batch_size 8 \
    --dataset assembly --data_root /root/reference/step_anticipation/data \
    --results_root /tmp/fab7b_r5i_cb --temperature 0.6

echo QUEUE_DONE
