#!/bin/bash
# Zero-shot LSO evaluation of a checkpoint series (reference: slurm/evaluate-clip.sh).
set -euo pipefail
MODEL_DIR=${MODEL_DIR:?logs/clip/RN50-...}
DOMAIN=${DOMAIN:?clipart|infograph|painting|quickdraw|sketch}
IMAGENET=${IMAGENET:?}
DOMAINNET=${DOMAINNET:?}
python scripts/evaluate_domainnet_lso_openai.py --model "${MODEL:-RN50}" --domain "$DOMAIN" \
  --ckpt_files "$MODEL_DIR"/checkpoints/epoch_*.pt \
  --imagenet_path "$IMAGENET" --domainnet_path "$DOMAINNET" \
  --out_path "$MODEL_DIR/lso-eval-$DOMAIN"
