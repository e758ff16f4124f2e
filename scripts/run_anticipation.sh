#!/usr/bin/env bash
# TPU-native LLaMA anticipation + mistake detection
# (reference: step_anticipation/scripts/anticipation.sh — torchrun/NCCL
# replaced by the jax-llama backend; TP degree comes from the visible
# devices, not the shard-file count)
set -euo pipefail

CKPT_DIR=${CKPT_DIR:?set CKPT_DIR to a Meta or HF LLaMA checkpoint dir}
TOKENIZER=${TOKENIZER:?set TOKENIZER to tokenizer.model or tokenizer.json}
DATA_ROOT=${DATA_ROOT:-step_anticipation/data}

python -m prego_tpu.cli.anticipate \
  --llm jax-llama \
  --ckpt_dir "$CKPT_DIR" \
  --tokenizer_path "$TOKENIZER" \
  --data_root "$DATA_ROOT" \
  --temperature 0.6 \
  --num_samples 5 \
  --max_gen_len 8 \
  --max_seq_len 2048 \
  --dataset assembly \
  --type_prompt emoji \
  "$@"
