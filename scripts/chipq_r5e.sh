#!/bin/bash
# Round-5 chip-job queue, take 5 — CLEAN re-runs of the measurements the
# r5c/r5d sentinel bug invalidated.  (The chained queues used
# `grep -q QUEUE_DONE` on the previous log, which matched the log's own
# "waiting for ... QUEUE_DONE" echo line, so r5c and r5d launched
# IMMEDIATELY and ran concurrently with r5b on the one chip: the r5d
# full-workload legs are timing-invalid (both ~21 min under contention)
# and r5c's composed self-32 step overlapped the piggyback sweep.  Fixed
# to `grep -qx`; value-deterministic outputs — ab_sampled flip counts —
# were unaffected, and in-window ratios that match clean historical
# readings were kept with a caveat.)
# (1) composed spec step, full-depth self-32 (ceiling at real draft cost)
# (2) full 643-step workload: batch control, then --serving cb (the r4b
#     workload-level claim re-attested at HEAD)
#   nohup setsid bash scripts/chipq_r5e.sh > /tmp/chipq_r5e.log 2>&1 &
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

run python scripts/bench_llm.py --case anticipation_step_7b_spec_self32_k4 --watchdog 2400

run python -m prego_tpu.cli.anticipate \
    --llm jax-llama --fabricated 7b --quantize --kv_quant \
    --step_batch 2 --num_samples 2 --max_gen_len 8 \
    --max_seq_len 2048 --max_batch_size 8 \
    --dataset assembly --data_root /root/reference/step_anticipation/data \
    --results_root /tmp/fab7b_r5e_batch --temperature 0.6
run python -m prego_tpu.cli.anticipate \
    --llm jax-llama --fabricated 7b --quantize --kv_quant \
    --serving cb --cb_slots 8 \
    --step_batch 2 --num_samples 2 --max_gen_len 8 \
    --max_seq_len 2048 --max_batch_size 8 \
    --dataset assembly --data_root /root/reference/step_anticipation/data \
    --results_root /tmp/fab7b_r5e_cb --temperature 0.6

echo QUEUE_DONE
