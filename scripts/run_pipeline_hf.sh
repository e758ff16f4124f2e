#!/usr/bin/env bash
# Full pipeline from shipped recognizer predictions with an HF LLM
# (reference: run.sh — fixed to a path that exists, SURVEY.md §7 quirk)
set -euo pipefail

MODEL=${1:?usage: run_pipeline_hf.sh <hf-model-id>}
DATA_ROOT=${DATA_ROOT:-step_anticipation/data}

python -m prego_tpu.cli.pipeline \
  --skip_recognition \
  --seqs "$DATA_ROOT/predictions/output_miniROAD_Assembly101-O.json" \
  --already_aggregated \
  --llm hf \
  --model_name "$MODEL" \
  --data_root "$DATA_ROOT" \
  --dataset assembly \
  --num_samples 1 \
  --max_gen_len 20
