#!/bin/bash
# Flickr: 3 layers, hidden 256, dropout 0.2, lr 0.001, 1000 epochs, selfloop+norm
# (reference scripts_train/flickr_maxk.sh:14-18)
K=${1:-32}; SEED=${2:-97}; MODEL=${3:-sage}
# drop the consumed positional args so "$@" forwards only extra flags
shift $(( $# < 3 ? $# : 3 ))
OUT=run/flickr_seed${SEED}; mkdir -p $OUT
python train.py --dataset flickr --model $MODEL --nonlinear maxk --maxk $K \
  --hidden_layers 3 --hidden_dim 256 --dropout 0.2 --norm --selfloop \
  --w_lr 0.001 --epochs 1000 --seed $SEED --path $OUT "$@"
