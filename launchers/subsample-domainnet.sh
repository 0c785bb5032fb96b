#!/bin/bash
# Build all paper mixtures (reference: slurm/subsample-domainnet.sh).
set -euo pipefail
DN=${DN:?path to domainnet}
IND=${IND:-data/indices}
for D in clipart infograph painting quickdraw sketch; do
  python scripts/subsample_domainnet_lso.py --domainnet_path "$DN" --indices_path "$IND" \
    --exclude "$D" --single_domain --subsample            # CG low diversity
  python scripts/subsample_domainnet_lso.py --domainnet_path "$DN" --indices_path "$IND" \
    --exclude "$D" --exclude_domains --subsample           # CG high diversity
  python scripts/subsample_domainnet_lso.py --domainnet_path "$DN" --indices_path "$IND" \
    --exclude "$D" --exclude_domains "$D" --subsample      # leave-out-domain
done
python scripts/subsample_domainnet_lso.py --domainnet_path "$DN" --indices_path "$IND" --real_only
