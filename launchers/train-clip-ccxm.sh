#!/bin/bash
# CC3M/CC12M-merged mixture training (reference: slurm/train-clip-ccxm.sh —
# effective batch 2048, warmup 2000).
set -euo pipefail
MODE=${MODE:-cc3m}
DATAID=${DATAID:?e.g. lso-cipqrs-nosketchclasses}
SEED=${SEED:-0}
INDICES=${INDICES:-data/indices}
python -u -m xclip_tpu.train.main \
  --train-data "$INDICES/$MODE-train-$DATAID.tsv" \
  --save-frequency 1 --save-most-recent --report-to tensorboard \
  --lr 0.001 --warmup 2000 --batch-size=128 --accum-freq 2 \
  --epochs=32 --workers=6 --model RN50 --seed "$SEED" \
  --local-loss --gather-with-grad --grad-checkpointing \
  --name "clip-ccxm/RN50-$MODE-$DATAID-s$SEED"
