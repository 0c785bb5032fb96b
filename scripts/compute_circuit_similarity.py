"""Circuit similarity across domains, paper Fig. 6c (reference:
scripts/compute_circuit_similarity.py): build top-k-edge DAGs per
domain x class; Jaccard edge-set or Weisfeiler-Lehman kernel similarity."""

import argparse
import itertools
import json
import os

import _common  # noqa: F401
import numpy as np

from xclip_tpu.data.datasets import ALL_DOMAINS
from xclip_tpu.evals.lso import LSO_CLASS_TO_IDX
from xclip_tpu.interp.graph import (
    build_circuit_graph,
    jaccard_graph_similarity,
    wl_kernel_similarity,
)


def load_npz(path):
    with np.load(path) as z:
        return {k: z[k] for k in z.files}


def load_graph(circuit_dir, domain, label, edge_k):
    base = os.path.join(circuit_dir, domain)
    nodes = load_npz(os.path.join(base, f"{label}_nodes.npz"))
    features = load_npz(os.path.join(base, f"{label}_features_by_submod.npz"))
    edges_flat = load_npz(os.path.join(base, f"{label}_edges.npz"))
    edges = {}
    for key, val in edges_flat.items():
        parent, child = key.split("->")
        edges.setdefault(parent, {})[child] = val
    return build_circuit_graph(nodes, edges, features, edge_k=edge_k)


def main(args):
    circuit_dir = os.path.join(args.model_dir, "circuit_analysis")
    files = sorted(
        f for f in os.listdir(os.path.join(circuit_dir, "real")) if f.endswith("_edges.npz")
    )
    labels = [int(f.split("_")[0]) for f in files]
    ood = set(LSO_CLASS_TO_IDX.values())

    results = {"all": {}, "ood": {}, "id": {}}
    for label in labels:
        graphs = {}
        for domain in ALL_DOMAINS:
            path = os.path.join(circuit_dir, domain, f"{label}_edges.npz")
            if os.path.isfile(path):
                graphs[domain] = load_graph(circuit_dir, domain, label, args.edge_k)
        if args.metric == "wl":
            doms = list(graphs)
            sim = wl_kernel_similarity([graphs[d] for d in doms], h=args.wl_iterations)
            pair_scores = {
                f"{a}|{b}": float(sim[i, j])
                for i, a in enumerate(doms)
                for j, b in enumerate(doms)
                if i < j
            }
        else:
            pair_scores = {
                f"{a}|{b}": jaccard_graph_similarity(graphs[a], graphs[b])
                for a, b in itertools.combinations(graphs, r=2)
            }
        for bucket in ["all", "ood" if label in ood else "id"]:
            for pair, score in pair_scores.items():
                results[bucket].setdefault(pair, []).append(score)

    summary = {
        split: {pair: float(np.mean(v)) for pair, v in pairs.items()}
        for split, pairs in results.items()
    }
    os.makedirs(args.out_path, exist_ok=True)
    with open(os.path.join(args.out_path, f"circuit_similarity_{args.metric}.json"), "w") as fh:
        json.dump(summary, fh)
    for split, pairs in summary.items():
        if pairs:
            print(f"{split}: mean circuit similarity {np.mean(list(pairs.values())):.4f}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--model_dir", type=str, required=True)
    parser.add_argument("--out_path", type=str, required=True)
    parser.add_argument("--metric", type=str, default="jaccard", choices=["jaccard", "wl"])
    parser.add_argument("--edge_k", type=int, default=3)
    parser.add_argument("--wl_iterations", type=int, default=3)
    main(parser.parse_args())
