#!/bin/bash
# Dataset x model x k sweep with a per-run timeout (clean_train.sh role).
TIMEOUT=${TIMEOUT:-7200}
for ds in flickr reddit yelp ogbn_products ogbn_proteins; do
  for model in sage gcn gin; do
    for k in 8 16 32 64; do
      echo "=== $ds $model k=$k ==="
      timeout $TIMEOUT bash scripts_train/${ds}_maxk.sh $k 97 $model || true
    done
  done
done
