#!/bin/bash
# Supervised CombinedNet classifier (reference: slurm/train-supervised.sh).
set -euo pipefail
IND=${IND:-data/indices}
DATAID=${DATAID:?e.g. lso-cipqrs-nosketchclasses}
python scripts/train_combined_captions.py --model "${MODEL:-rn50-clip}" \
  --train_index_path "$IND/combined-captions-train-$DATAID.tsv" \
  --val_index_path "$IND/combined-captions-val-$DATAID.tsv" \
  --in_class_index_path data/imagenet_class_index.json \
  --class_mapping_path data/in_to_dn_mapping.json \
  --experiment_name "supervised-$DATAID-lr${LR:-0.1}" \
  --learning_rate "${LR:-0.1}" --batch_size "${BATCH:-256}" --max_epochs "${EPOCHS:-90}"
