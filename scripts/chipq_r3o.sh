#!/bin/bash
# Round-3 chip-job queue, take 15 — the full reference workload at the
# reference scale, at HEAD defaults: all 182 Assembly101-O videos / 643
# steps through the real anticipation driver with 7B int8+kv8 fabricated
# weights, step_batch 2, num_samples 2 (4 sampled generations per step —
# the num_samples^2 semantics of llama_meta.py:163-180 batched into one
# dispatch). Take 6 ran this pre-flat but its log died with the VM.
#   nohup setsid bash scripts/chipq_r3o.sh > /tmp/chipq_r3o.log 2>&1 &
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
  timeout 5400 "$@"
  echo "#### rc=$? $(date -u +%H:%M:%S)"
  sleep 20
}

run python -m prego_tpu.cli.anticipate \
    --llm jax-llama --fabricated 7b --quantize --kv_quant \
    --step_batch 2 --num_samples 2 --max_gen_len 8 \
    --max_seq_len 2048 --max_batch_size 8 \
    --dataset assembly --data_root /root/reference/step_anticipation/data \
    --results_root /tmp/fab7b --temperature 0.6

echo QUEUE_DONE
