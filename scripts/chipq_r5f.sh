#!/bin/bash
# Round-5 chip-job queue, take 6.  The clean r5e workload A/B REVERSED
# the r4b CB win (batch 0.960 s/call == r4b's 0.967; CB 1.187 vs r4b's
# 0.842).  Hypothesis: the overlap-fetch default flipped ON in r4d
# (AFTER the r4b workload measurement) on s16-burst evidence, but the
# driver's per-step serve bursts are 1-2 chunks long — there overlap is
# pure lag (admissions and emission processing each arrive one chunk
# late).  Leg: the same workload with PREGO_CB_OVERLAP=0.
#   nohup setsid bash scripts/chipq_r5f.sh > /tmp/chipq_r5f.log 2>&1 &
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

run env PREGO_CB_OVERLAP=0 python -m prego_tpu.cli.anticipate \
    --llm jax-llama --fabricated 7b --quantize --kv_quant \
    --serving cb --cb_slots 8 \
    --step_batch 2 --num_samples 2 --max_gen_len 8 \
    --max_seq_len 2048 --max_batch_size 8 \
    --dataset assembly --data_root /root/reference/step_anticipation/data \
    --results_root /tmp/fab7b_r5f_cb_noovl --temperature 0.6

echo QUEUE_DONE
