#!/bin/bash
# SAE training over cached CLIP features (reference: slurm/train-sae.sh).
set -euo pipefail
CKPT=${CKPT:?path to epoch_32.pt}
DN=${DN:?domainnet path}
OUT=${OUT:-logs/sae}
python scripts/train_sae.py --out_dir "$OUT" --ckpt_path "$CKPT" \
  --domainnet_path "$DN" --cc12m_path "${CC12M:-}" ${CC12M:+} ${DOMAINNET_ONLY:+--domainnet_only} \
  --l1_coeff "${L1:-1e-4}" --lr 1e-4 --train_sae_bs "${BS:-4096}" \
  --expansion_factor 4 --num_epochs "${EPOCHS:-200}"
