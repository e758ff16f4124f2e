#!/bin/bash
# Round-5 chip-job queue, take 7 — diagnose the CB workload reversal.
# r5e/r5f read batch 0.960 (== r4b's 0.967) / cb+overlap 1.187 /
# cb-no-overlap 1.382 s/call in TIME ORDER — monotone worsening, so
# either the tunnel degraded across legs or the piggyback-era chunk
# program regressed the CB path.
# (1) isolated CB step case — r4c anchor is 159.8 ms/step: if HEAD reads
#     ~160 the chunk program is unregressed and the workload delta is
#     weather; if 200+ the program regressed.
# (2) batch workload control (weather anchor, expect ~0.96 s/call)
# (3) cb workload at HEAD defaults (the overlap gate makes short bursts
#     blocking) — the number that decides the RESULTS claim.
#   nohup setsid bash scripts/chipq_r5g.sh > /tmp/chipq_r5g.log 2>&1 &
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

run python scripts/bench_llm.py --case anticipation_step_7b_cb_sb2 --watchdog 2400

run python -m prego_tpu.cli.anticipate \
    --llm jax-llama --fabricated 7b --quantize --kv_quant \
    --step_batch 2 --num_samples 2 --max_gen_len 8 \
    --max_seq_len 2048 --max_batch_size 8 \
    --dataset assembly --data_root /root/reference/step_anticipation/data \
    --results_root /tmp/fab7b_r5g_batch --temperature 0.6
run python -m prego_tpu.cli.anticipate \
    --llm jax-llama --fabricated 7b --quantize --kv_quant \
    --serving cb --cb_slots 8 \
    --step_batch 2 --num_samples 2 --max_gen_len 8 \
    --max_seq_len 2048 --max_batch_size 8 \
    --dataset assembly --data_root /root/reference/step_anticipation/data \
    --results_root /tmp/fab7b_r5g_cb --temperature 0.6

echo QUEUE_DONE
