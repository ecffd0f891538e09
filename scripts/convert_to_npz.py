#!/usr/bin/env python
"""Convert DGL/OGB datasets to the framework's npz interchange format.

Run this on any machine with DGL + OGB installed (the training environment
itself is torch/DGL-free); copy the resulting npz files into --out. Schema in
spgemm_gnn_tpu/graphs/datasets.py. Mirrors the reference's dataset loading at
/root/reference/maxk_gnn_dgl.py:219-282 and utils/proteins_loader.py.

Usage:
  python scripts/convert_to_npz.py --dataset reddit --root ./data --out ./data
"""
import argparse
import os

import numpy as np


def convert(name: str, root: str, out: str) -> str:
    if name in ("reddit", "flickr", "yelp"):
        import dgl
        from dgl.data import RedditDataset, FlickrDataset, YelpDataset
        cls = {"reddit": RedditDataset, "flickr": FlickrDataset,
               "yelp": YelpDataset}[name]
        # The RAW graph is stored; the framework's --selfloop flag applies the
        # remove-then-add transform at load time, matching the reference's
        # AddSelfLoop at maxk_gnn_dgl.py:221-227. (Pass --selfloop when
        # training on reddit/flickr/yelp for reference parity.)
        data = cls(raw_dir=root)
        g = data[0]
        src, dst = g.edges()
        payload = dict(
            edge_src=src.numpy().astype(np.int64),
            edge_dst=dst.numpy().astype(np.int64),
            feat=g.ndata["feat"].numpy().astype(np.float32),
            label=g.ndata["label"].numpy(),
            train_mask=g.ndata["train_mask"].numpy().astype(bool),
            val_mask=g.ndata["val_mask"].numpy().astype(bool),
            test_mask=g.ndata["test_mask"].numpy().astype(bool),
            num_classes=np.int64(data.num_classes),
        )
    elif name in ("ogbn-arxiv", "ogbn-products"):
        from ogb.nodeproppred import DglNodePropPredDataset
        data = DglNodePropPredDataset(name=name, root=root)
        g, labels = data[0]
        split = data.get_idx_split()
        n = g.num_nodes()
        masks = {}
        for k2, key in (("train_mask", "train"), ("val_mask", "valid"),
                        ("test_mask", "test")):
            m = np.zeros(n, bool)
            m[split[key].numpy()] = True
            masks[k2] = m
        src, dst = g.edges()
        payload = dict(
            edge_src=src.numpy().astype(np.int64),
            edge_dst=dst.numpy().astype(np.int64),
            feat=g.ndata["feat"].numpy().astype(np.float32),
            label=labels.numpy().squeeze(-1).astype(np.int64),
            num_classes=np.int64(data.num_classes), **masks)
    elif name == "ogbn-proteins":
        from ogb.nodeproppred import DglNodePropPredDataset
        data = DglNodePropPredDataset(name=name, root=root)
        g, labels = data[0]
        split = data.get_idx_split()
        n = g.num_nodes()
        masks = {}
        for k2, key in (("train_mask", "train"), ("val_mask", "valid"),
                        ("test_mask", "test")):
            m = np.zeros(n, bool)
            m[split[key].numpy()] = True
            masks[k2] = m
        src, dst = g.edges()
        payload = dict(
            edge_src=src.numpy().astype(np.int64),
            edge_dst=dst.numpy().astype(np.int64),
            edge_feat=g.edata["feat"].numpy().astype(np.float32),
            label=labels.numpy().astype(np.float32),
            num_classes=np.int64(112), **masks)
    else:
        raise ValueError(name)

    os.makedirs(out, exist_ok=True)
    path = os.path.join(out, f"{name.replace('-', '_')}.npz")
    np.savez_compressed(path, **payload)
    return path


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", required=True)
    ap.add_argument("--root", default="./data")
    ap.add_argument("--out", default="./data")
    a = ap.parse_args()
    print(convert(a.dataset, a.root, a.out))
