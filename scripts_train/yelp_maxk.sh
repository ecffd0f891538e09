#!/bin/bash
# Yelp: 4 layers, hidden 384, dropout 0.1, lr 0.001, 400 epochs, norm, BCE
# (reference scripts_train/yelp_maxk.sh:14-18)
K=${1:-32}; SEED=${2:-97}; MODEL=${3:-sage}
# drop the consumed positional args so "$@" forwards only extra flags
shift $(( $# < 3 ? $# : 3 ))
OUT=run/yelp_seed${SEED}; mkdir -p $OUT
python train.py --dataset yelp --model $MODEL --nonlinear maxk --maxk $K \
  --hidden_layers 4 --hidden_dim 384 --dropout 0.1 --norm \
  --w_lr 0.001 --epochs 400 --seed $SEED --path $OUT "$@"
