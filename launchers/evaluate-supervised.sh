#!/bin/bash
# Supervised LSO evaluation (reference: slurm/evaluate-supervised.sh).
set -euo pipefail
CKPT_DIR=${CKPT_DIR:?checkpoints dir}
DOMAIN=${DOMAIN:?}
DOMAINNET=${DOMAINNET:?}
python scripts/evaluate_domainnet_supervised_lso.py --model "${MODEL:-rn50-clip}" \
  --domain "$DOMAIN" --ckpt_files "$CKPT_DIR"/epoch=*.npz \
  --domainnet_path "$DOMAINNET" --out_path "$CKPT_DIR/lso-eval-$DOMAIN"
