#!/bin/bash
# Round-4 chip-job queue, take 2 — chains after chipq_r4a (QUEUE_DONE
# sentinel). Steady-state serving bursts (the r4a serving numbers timed
# cold compiles inside the burst), the PREGO_T_BLOCK 128-vs-256 A/B/A
# on the bounded decode kernels, the 1B flat-head interleaved A/B
# (VERDICT r3 #4b), and the full 643-step Assembly101-O workload through
# --serving cb vs the r3 batch path.
#   nohup setsid bash scripts/chipq_r4b.sh > /tmp/chipq_r4b.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

echo "waiting for chipq_r4a QUEUE_DONE"
until grep -qx QUEUE_DONE /tmp/chipq_r4a.log 2>/dev/null; do sleep 60; done
echo "r4a done; starting r4b"

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

# steady-state serving bursts (warm pass then timed pass)
run python scripts/bench_llm.py --case serving_cb_7b_ctx --watchdog 2400
run python scripts/bench_llm.py --case serving_static_7b_ctx --watchdog 2400
run python scripts/bench_llm.py --case serving_cb_7b_s16_ctx --watchdog 2400
run python scripts/bench_llm.py --case serving_cb_7b --watchdog 2400
run python scripts/bench_llm.py --case serving_static_7b --watchdog 2400

# T_BLOCK A/B/A at the b8 decode shape and the 7B anticipation step
run python scripts/bench_llm.py --case decode_7b_b8_int8_kv8 --watchdog 2400
run env PREGO_T_BLOCK=128 python scripts/bench_llm.py --case decode_7b_b8_int8_kv8 --watchdog 2400
run python scripts/bench_llm.py --case decode_7b_b8_int8_kv8 --watchdog 2400
run env PREGO_T_BLOCK=128 python scripts/bench_llm.py --case anticipation_step_7b_int8_kv8_sb2 --watchdog 2400
run python scripts/bench_llm.py --case anticipation_step_7b_int8_kv8_sb2 --watchdog 2400

# 1B flat-head interleaved A/B (the shape still defaulting to per-head)
run python scripts/ab_attention_inproc.py --batch 8

# full Assembly101-O workload (182 videos / 643 steps): batch control,
# then the continuous-batching driver backend
run python -m prego_tpu.cli.anticipate \
    --llm jax-llama --fabricated 7b --quantize --kv_quant \
    --step_batch 2 --num_samples 2 --max_gen_len 8 \
    --max_seq_len 2048 --max_batch_size 8 \
    --dataset assembly --data_root /root/reference/step_anticipation/data \
    --results_root /tmp/fab7b_r4_batch --temperature 0.6
run python -m prego_tpu.cli.anticipate \
    --llm jax-llama --fabricated 7b --quantize --kv_quant \
    --serving cb --cb_slots 8 \
    --step_batch 2 --num_samples 2 --max_gen_len 8 \
    --max_seq_len 2048 --max_batch_size 8 \
    --dataset assembly --data_root /root/reference/step_anticipation/data \
    --results_root /tmp/fab7b_r4_cb --temperature 0.6

echo QUEUE_DONE
