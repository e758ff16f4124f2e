#!/bin/bash
# Round-5 chip-job queue, take 8 — re-attest the full-workload batch-vs-CB
# A/B at HEAD (the r5g legs were lost to a VM reboot before they ran).
# History: r4b same-window pair read batch 10.2 min (0.967 s/call) / CB 8.6
# (0.842); r5e read batch 0.960 / cb+overlap 1.187 / cb-no-overlap 1.382
# s/call in TIME ORDER (monotone worsening — weather suspect), and the
# isolated CB step at HEAD re-read 151.8 ms (r4c anchor 159.8: the slot
# loop is unregressed).  The per-serve overlap gate (6a9b97f) makes the
# driver's short step-bursts take the blocking path, which is the r5e
# reversal hypothesis.  A/B/A brackets the weather this time:
#   (1) batch control  (2) CB at HEAD defaults  (3) batch control again
#   nohup setsid bash scripts/chipq_r5h.sh > /tmp/chipq_r5h.log 2>&1 &
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
    --results_root /tmp/fab7b_r5h_batch1 --temperature 0.6

run python -m prego_tpu.cli.anticipate \
    --llm jax-llama --fabricated 7b --quantize --kv_quant \
    --serving cb --cb_slots 8 \
    --step_batch 2 --num_samples 2 --max_gen_len 8 \
    --max_seq_len 2048 --max_batch_size 8 \
    --dataset assembly --data_root /root/reference/step_anticipation/data \
    --results_root /tmp/fab7b_r5h_cb --temperature 0.6

run python -m prego_tpu.cli.anticipate \
    --llm jax-llama --fabricated 7b --quantize --kv_quant \
    --step_batch 2 --num_samples 2 --max_gen_len 8 \
    --max_seq_len 2048 --max_batch_size 8 \
    --dataset assembly --data_root /root/reference/step_anticipation/data \
    --results_root /tmp/fab7b_r5h_batch2 --temperature 0.6

echo QUEUE_DONE
