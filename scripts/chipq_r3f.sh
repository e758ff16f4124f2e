#!/bin/bash
# Round-3 chip-job queue, take 6 — the flagship demonstration: the FULL
# Assembly101-O anticipation workload (182 videos / 643 steps, real
# prompts from the reference's shipped predictions+context assets)
# through the real driver at the reference's 7B serving shape, on the
# one v5e, int8 weights + int8 KV + step_batch 2 + prefix cache.
# Fabricated weights (no assets in this image): the run is the timing.
#   bash scripts/chipq_r3f.sh 2>&1 | tee /tmp/chipq_r3f.log
set -u
cd "$(dirname "$0")/.."


wait_for_tunnel() {
  # the tunnel has multi-hour dark patches; do not burn per-job timeouts
  # against a dead backend — probe with a tiny op until it answers
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

run python -m prego_tpu.cli.anticipate \
    --llm jax-llama --fabricated 7b --quantize --kv_quant \
    --step_batch 2 --num_samples 2 --max_gen_len 8 \
    --max_seq_len 2048 --max_batch_size 8 \
    --dataset assembly --data_root /root/reference/step_anticipation/data \
    --results_root /tmp/fab7b --temperature 0.6

echo QUEUE_DONE
