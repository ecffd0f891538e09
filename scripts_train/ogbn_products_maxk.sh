#!/bin/bash
# ogbn-products: 3 layers, hidden 256, dropout 0.5, lr 0.003, 500 epochs;
# selfloop iff model != sage (reference scripts_train/ogbn_products_maxk.sh:18-41)
K=${1:-32}; SEED=${2:-97}; MODEL=${3:-sage}
# drop the consumed positional args so "$@" forwards only extra flags
shift $(( $# < 3 ? $# : 3 ))
OUT=run/ogbn-products_seed${SEED}; mkdir -p $OUT
EXTRA=""; [ "$MODEL" != "sage" ] && EXTRA="--selfloop"
python train.py --dataset ogbn-products --model $MODEL --nonlinear maxk --maxk $K \
  --hidden_layers 3 --hidden_dim 256 --dropout 0.5 --norm $EXTRA \
  --w_lr 0.003 --epochs 500 --seed $SEED --path $OUT "$@"
