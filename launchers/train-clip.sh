#!/bin/bash
# TPU launcher for the paper's 45-experiment CLIP training grid
# (reference: slurm/train-clip.sh — SLURM array id -> domain-mixture TSV +
# seed, lockfile/resume logic). On TPU one process drives all local chips, so
# the srun/NCCL plumbing disappears; set TASK_ID (1..45) instead of
# SLURM_ARRAY_TASK_ID, or pass it as $1.
set -euo pipefail

TASK_ID=${1:-${TASK_ID:?set TASK_ID 1..45}}
INDICES=${INDICES:-data/indices}
EXPDIR=${EXPDIR:-clip}
MODEL=${MODEL:-RN50}

SEED=0
if [ "$TASK_ID" -gt 30 ]; then SEED=2; TASK_ID=$((TASK_ID - 30));
elif [ "$TASK_ID" -gt 15 ]; then SEED=1; TASK_ID=$((TASK_ID - 15)); fi

case $((TASK_ID % 5)) in
  1) DOMAIN=clipart;   LOW=cr;  ALL=cipqrs; LOD=ipqrs ;;
  2) DOMAIN=infograph; LOW=ir;  ALL=cipqrs; LOD=cpqrs ;;
  3) DOMAIN=painting;  LOW=pr;  ALL=cipqrs; LOD=ciqrs ;;
  4) DOMAIN=quickdraw; LOW=qr;  ALL=cipqrs; LOD=ciprs ;;
  0) DOMAIN=sketch;    LOW=rs;  ALL=cipqrs; LOD=cipqr ;;
esac
if [ "$TASK_ID" -le 5 ]; then DOMAINS=$LOW
elif [ "$TASK_ID" -le 10 ]; then DOMAINS=$ALL
else DOMAINS=$LOD; fi

if [ "$MODEL" == "RN50" ]; then BATCH_SIZE=128; ACC_FREQ=2
else BATCH_SIZE=256; ACC_FREQ=1; fi

SUFFIX=${SUFFIX:-classes}           # 'classes-pseudo' for upper bounds
DATAID=${DATAID:-"lso-$DOMAINS-no$DOMAIN$SUFFIX"}  # or 'lso-real-only'
IDENTIFIER="$DATAID-s$SEED"
echo "Identifier: $IDENTIFIER"

NAME="$EXPDIR/$MODEL-$IDENTIFIER"
RESUME=
if [ -f "logs/$NAME/checkpoints/epoch_32.pt" ]; then
  echo "Experiment $NAME fully trained. Aborting."; exit 0
elif [ -f "logs/$EXPDIR/.RUNNING_$MODEL-$IDENTIFIER" ]; then
  echo "Experiment $NAME running. Aborting."; exit 0
elif [ -f "logs/$NAME/checkpoints/epoch_latest.pt" ]; then
  RESUME="--resume latest"
elif [ -d "logs/$NAME" ]; then
  # exists, <1 epoch trained, not running: remove so the trainer gets a
  # fresh experiment dir (reference slurm/train-clip.sh:135-138)
  echo "Experiment $NAME exists, not fully trained and not running. Removing."
  rm -r "logs/$NAME"
fi

mkdir -p "logs/$EXPDIR"
touch "logs/$EXPDIR/.RUNNING_$MODEL-$IDENTIFIER"
trap 'rm -f "logs/$EXPDIR/.RUNNING_$MODEL-$IDENTIFIER"' EXIT

python -u -m xclip_tpu.train.main \
  --train-data "$INDICES/combined-captions-train-$DATAID.tsv" \
  --val-data "$INDICES/combined-captions-val-$DATAID.tsv" \
  --save-frequency 1 --save-most-recent --report-to tensorboard \
  --lr 0.001 --warmup 500 --batch-size=$BATCH_SIZE --accum-freq $ACC_FREQ \
  --epochs=32 --workers=6 --model "$MODEL" --seed $SEED \
  --local-loss --gather-with-grad --grad-checkpointing \
  --log-every-n-steps 50 --name "$NAME" $RESUME
