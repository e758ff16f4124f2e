#!/usr/bin/env bash
# One-command real-data regression: import reference assets -> train -> eval
# -> schema-check per-frame JSON -> aggregate -> schema-check aggregated ->
# anticipate -> one-class F1.
#
# Requires the real TSN feature trees (not shipped in this image). The moment
# assets are mounted this is a single invocation:
#
#   FEATURES_ROOT=/data/assembly101 ./scripts/real_data_regression.sh
#
# Env knobs:
#   REFERENCE      reference PREGO checkout for data assets  [/root/reference]
#   FEATURES_ROOT  root of the {rgb,flow,target}_perframe .npy trees (REQUIRED)
#   DATASET        assembly101-O | epic-tent-O                [assembly101-O]
#   WORKDIR        output workspace                           [regression_out]
#   LLM            fake | hf | jax-llama                      [fake]
#   CKPT_DIR, TOKENIZER   required when LLM=jax-llama
#   SPEC_K         optional: speculative decoding with k-token drafts
#                  (LLM=jax-llama only); SPEC_DRAFT selects the draft
#                  (self-N | fabricated-1b | a Meta ckpt dir), defaults
#                  to DRAFT_CKPT_DIR when that is set
#   DRAFT_CKPT_DIR optional real draft checkpoint — validated against
#                  the manifest's draft_checkpoint contract in step 0
#
# `--dry-run` validates the expected-asset MANIFEST (paths + shape
# contracts + pinned digests, configs/real_assets_manifest.json) against
# whatever is mounted and exits — no training, no assets required. The
# strict manifest check also runs as step 0 of a real invocation.
set -euo pipefail

REFERENCE=${REFERENCE:-/root/reference}
DATASET=${DATASET:-assembly101-O}
WORKDIR=${WORKDIR:-regression_out}
LLM=${LLM:-fake}

REPO_DIR=$(cd "$(dirname "$0")/.." && pwd)
if [ "${1:-}" = "--dry-run" ]; then
  exec python -m prego_tpu.cli.asset_manifest \
    --manifest "$REPO_DIR/configs/real_assets_manifest.json" \
    --dataset "$DATASET" \
    --features_root "${FEATURES_ROOT:-}" \
    --ckpt_dir "${CKPT_DIR:-}" \
    --draft_ckpt_dir "${DRAFT_CKPT_DIR:-}" \
    --tokenizer_path "${TOKENIZER:-}" \
    --dry-run
fi

FEATURES_ROOT=${FEATURES_ROOT:?set FEATURES_ROOT to the TSN feature tree}
case "$DATASET" in
  assembly101-O) ANT_DATASET=assembly ;;
  epic-tent-O)   ANT_DATASET=epictent ;;
  *) echo "unknown DATASET=$DATASET" >&2; exit 2 ;;
esac

REPO=$(cd "$(dirname "$0")/.." && pwd)
cd "$REPO"
mkdir -p "$WORKDIR"

echo "== 0/6 asset manifest (strict) =="
# features always validated; tokenizer/checkpoint validated when their
# paths are supplied (LLM=jax-llama), reported as skipped otherwise
python -m prego_tpu.cli.asset_manifest \
  --manifest "$REPO/configs/real_assets_manifest.json" \
  --dataset "$DATASET" \
  --features_root "$FEATURES_ROOT" \
  --ckpt_dir "${CKPT_DIR:-}" \
  --draft_ckpt_dir "${DRAFT_CKPT_DIR:-}" \
  --tokenizer_path "${TOKENIZER:-}"

echo "== 1/6 import reference data assets =="
python -m prego_tpu.cli.import_reference_data \
  --reference "$REFERENCE" --dest "$WORKDIR" --link

echo "== 2/6 train recognition (10 epochs, reference hyperparameters) =="
python -m prego_tpu.cli.train \
  --config "configs/miniroad_${DATASET}.yaml" \
  --root_path "$FEATURES_ROOT" \
  --video_list_path "$WORKDIR/data_info/video_list.json" \
  --output_path "$WORKDIR/out"

CKPT=$(ls "$WORKDIR"/out/*/ckpts/best_*.ckpt | head -1)
echo "== 3/6 eval + per-frame JSON export (ckpt: $CKPT) =="
python -m prego_tpu.cli.train \
  --config "configs/miniroad_${DATASET}.yaml" \
  --root_path "$FEATURES_ROOT" \
  --video_list_path "$WORKDIR/data_info/video_list.json" \
  --output_path "$WORKDIR/out" \
  --eval "$CKPT" --eval_output_dir "$WORKDIR/preds"

python -m prego_tpu.cli.schema_check perframe "$WORKDIR/preds/output_miniROAD.json" \
  --against "$REFERENCE/output_miniRoad/output_miniROAD.json" || true
# (--against key-set check only applies when evaluating the same split the
# reference exported; structural validation above is unconditional)
python -m prego_tpu.cli.schema_check perframe "$WORKDIR/preds/output_miniROAD.json"

echo "== 4/6 aggregate =="
python -m prego_tpu.aggregate \
  "$WORKDIR/preds/output_miniROAD.json" "$WORKDIR/aggregated.json"
python -m prego_tpu.cli.schema_check aggregated "$WORKDIR/aggregated.json"

echo "== 5/6 aggregation byte-parity on the reference's own shipped input =="
python -m prego_tpu.aggregate \
  "$REFERENCE/output_miniRoad/output_miniROAD.json" "$WORKDIR/agg_ref_input.json"
python -m prego_tpu.cli.schema_check aggregated "$WORKDIR/agg_ref_input.json" \
  --against "$REFERENCE/data/output/aggregated_data.json" --exact

echo "== 6/6 anticipation + one-class mistake F1 (LLM=$LLM) =="
ANT_ARGS=(--llm "$LLM" --dataset "$ANT_DATASET"
          --data_root "$WORKDIR/step_anticipation/data"
          --seqs "$WORKDIR/aggregated.json"
          --results_root "$WORKDIR/results")
if [ "$LLM" = "jax-llama" ]; then
  ANT_ARGS+=(--ckpt_dir "${CKPT_DIR:?}" --tokenizer_path "${TOKENIZER:?}"
             --num_samples 5 --max_gen_len 8 --max_seq_len 2048
             --type_prompt emoji)
  if [ -n "${SPEC_K:-}" ]; then
    ANT_ARGS+=(--spec_k "$SPEC_K"
               --spec_draft "${SPEC_DRAFT:-${DRAFT_CKPT_DIR:?set SPEC_DRAFT or DRAFT_CKPT_DIR with SPEC_K}}")
  fi
fi
python -m prego_tpu.cli.anticipate "${ANT_ARGS[@]}"

echo "regression complete — metrics under $WORKDIR/results/"
