#!/bin/bash
# Round-5 chip-job queue, take 4.  Waits for chipq_r5c's QUEUE_DONE.
# Full 643-step Assembly101-O workload re-attested at HEAD: the CB
# admission machinery changed this round (unified pending queue,
# single-scatter prefix copy, piggyback default 4, window clamp) — the
# r4b workload-level claim (CB 8.6 min vs batch 10.2) must still hold.
# Batch control first, CB second, same window.
#   nohup setsid bash scripts/chipq_r5d.sh > /tmp/chipq_r5d.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

echo "waiting for chipq_r5c QUEUE_DONE"
for i in $(seq 1 400); do
  grep -qx QUEUE_DONE /tmp/chipq_r5c.log 2>/dev/null && break
  sleep 60
done
grep -qx QUEUE_DONE /tmp/chipq_r5c.log 2>/dev/null || echo "r5c sentinel missing; proceeding"

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
    --step_batch 2 --num_samples 2 --max_gen_len 8 \
    --max_seq_len 2048 --max_batch_size 8 \
    --dataset assembly --data_root /root/reference/step_anticipation/data \
    --results_root /tmp/fab7b_r5_batch --temperature 0.6
run python -m prego_tpu.cli.anticipate \
    --llm jax-llama --fabricated 7b --quantize --kv_quant \
    --serving cb --cb_slots 8 \
    --step_batch 2 --num_samples 2 --max_gen_len 8 \
    --max_seq_len 2048 --max_batch_size 8 \
    --dataset assembly --data_root /root/reference/step_anticipation/data \
    --results_root /tmp/fab7b_r5_cb --temperature 0.6

echo QUEUE_DONE
