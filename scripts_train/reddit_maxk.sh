#!/bin/bash
# Reddit: 4 layers, hidden 256, dropout 0.5, lr 0.01, 400 epochs (timed), norm
# (reference scripts_train/reddit_maxk.sh:31-35)
K=${1:-32}; SEED=${2:-97}; MODEL=${3:-sage}
# drop the consumed positional args so "$@" forwards only extra flags
shift $(( $# < 3 ? $# : 3 ))
OUT=run/reddit_seed${SEED}; mkdir -p $OUT
time python train.py --dataset reddit --model $MODEL --nonlinear maxk --maxk $K \
  --hidden_layers 4 --hidden_dim 256 --dropout 0.5 --norm \
  --w_lr 0.01 --epochs 400 --seed $SEED --path $OUT "$@" \
  2>&1 | tee $OUT/${MODEL}_max${K}.txt
