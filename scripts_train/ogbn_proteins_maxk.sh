#!/bin/bash
# ogbn-proteins: 3 layers, hidden 256, dropout 0.5, lr 0.01, 1000 epochs,
# ROC-AUC + BCE (reference scripts_train/ogbn_proteins_maxk.sh:13-18)
K=${1:-32}; SEED=${2:-97}; MODEL=${3:-sage}
# drop the consumed positional args so "$@" forwards only extra flags
shift $(( $# < 3 ? $# : 3 ))
OUT=run/ogbn-proteins_seed${SEED}; mkdir -p $OUT
python train.py --dataset ogbn-proteins --model $MODEL --nonlinear maxk --maxk $K \
  --hidden_layers 3 --hidden_dim 256 --dropout 0.5 --norm \
  --w_lr 0.01 --epochs 1000 --seed $SEED --path $OUT "$@"
