"""Circuit graph construction + similarity measures.

Reference behaviour: xclip/feature_circuits/graph_utility.py:18-179
(graphviz/networkx DAG from node/edge tensors, top-k edges per node pair),
scripts/compute_node_similarity.py:141-200 (per-layer Jaccard of top-10%
important neurons across domain pairs), and
scripts/compute_circuit_similarity.py:71-140 (edge-set Jaccard and
Weisfeiler-Lehman graph-kernel similarity over top-k-edge DAGs).
"""

from __future__ import annotations

import math
from typing import Dict

import networkx as nx
import numpy as np


def build_circuit_graph(
    nodes: Dict[str, np.ndarray],
    edges: Dict[str, Dict[str, np.ndarray]],
    features_by_submod: Dict[str, np.ndarray],
    edge_k: int = 3,
) -> nx.DiGraph:
    """networkx DAG with the top-|edge_k| edges per (parent, child) pair,
    nodes named '{layer}/{neuron}' (reference create_dag semantics)."""
    g = nx.DiGraph()
    for layer_name, per_channel in nodes.items():
        if layer_name == "input":
            continue
        for neuron in np.asarray(features_by_submod[layer_name]).tolist():
            val = float(np.asarray(per_channel)[neuron])
            g.add_node(f"{layer_name}/{neuron}", node_label=str(neuron), effect=val)

    for parent, children in edges.items():
        if parent == "input":
            continue
        p_feats = np.asarray(features_by_submod[parent])
        for child, weight in children.items():
            w = np.asarray(weight)  # (n_down, n_up)
            c_feats = np.asarray(features_by_submod[child])
            k = min(edge_k, w.size)
            flat_idx = np.argsort(-np.abs(w), axis=None)[:k]
            for fi in flat_idx:
                d_i, u_i = np.unravel_index(fi, w.shape)
                g.add_edge(
                    f"{parent}/{p_feats[u_i]}",
                    f"{child}/{c_feats[d_i]}",
                    weight=float(w[d_i, u_i]),
                )
    return g


def jaccard_graph_similarity(g1: nx.DiGraph, g2: nx.DiGraph) -> float:
    """Edge-set Jaccard (reference compute_circuit_similarity.py:71-79)."""
    e1, e2 = set(g1.edges()), set(g2.edges())
    union = len(e1 | e2)
    return len(e1 & e2) / union if union else 0.0


def node_jaccard_similarity(nodes_a: np.ndarray, nodes_b: np.ndarray, fraction: float = 0.1) -> float:
    """Jaccard of the top-fraction most important neurons by |effect|
    (reference compute_node_similarity.py:171-178)."""
    n = np.asarray(nodes_a).shape[0]
    k = math.ceil(n * fraction)
    a = set(np.argsort(np.abs(np.asarray(nodes_a)))[-k:].tolist())
    b = set(np.argsort(np.abs(np.asarray(nodes_b)))[-k:].tolist())
    return len(a & b) / len(a | b)


def wl_kernel_similarity(graphs, h: int = 3, node_label: bool = True) -> np.ndarray:
    """Weisfeiler-Lehman graph-kernel similarity matrix (normalized), the
    GK_WL.compare_list equivalent (reference compute_circuit_similarity.py:
    85-260, after emanuele/jstsp2015)."""
    n = len(graphs)
    all_nodes = set()
    for g in graphs:
        all_nodes |= set(g.nodes)
    node_order = [list(g.nodes()) for g in graphs]
    adjacency = [[list(g.neighbors(node)) for node in g.nodes()] for g in graphs]

    # initial labels
    label_lookup: Dict = {}

    def lab_id(lab):
        if lab not in label_lookup:
            label_lookup[lab] = len(label_lookup)
        return label_lookup[lab]

    labels = []
    for gi, g in enumerate(graphs):
        if node_label:
            labels.append(np.array([lab_id(g.nodes[v].get("node_label", str(v))) for v in node_order[gi]]))
        else:
            labels.append(np.array([lab_id(str(g.degree(v))) for v in node_order[gi]]))

    def phi_matrix(labels_list):
        dim = len(label_lookup)
        phi = np.zeros((dim, n), dtype=np.float64)
        for gi, labs in enumerate(labels_list):
            for lab in labs:
                phi[lab, gi] += 1
        return phi

    k = phi_matrix(labels).T @ phi_matrix(labels)

    for _ in range(h):
        new_labels = []
        for gi, g in enumerate(graphs):
            index_of = {v: i for i, v in enumerate(node_order[gi])}
            labs = []
            for vi, v in enumerate(node_order[gi]):
                neigh = sorted(labels[gi][index_of[u]] for u in adjacency[gi][vi])
                labs.append(lab_id((int(labels[gi][vi]), tuple(int(x) for x in neigh))))
            new_labels.append(np.array(labs))
        labels = new_labels
        phi = phi_matrix(labels)
        k = k + phi.T @ phi

    diag = np.sqrt(np.outer(np.diag(k), np.diag(k)))
    with np.errstate(divide="ignore", invalid="ignore"):
        sim = np.where(diag > 0, k / diag, 0.0)
    return sim


def render_circuit_graphviz(
    g: nx.DiGraph,
    out_path: str,
    *,
    pen_thickness: float = 3.0,
    fmt: str = "pdf",
) -> str:
    """Render the circuit DAG with graphviz (reference plot_graphviz_dag /
    create_dag rendering, graph_utility.py:18-179): nodes colored by signed
    effect magnitude (blue positive, red negative), edge pen width by
    |weight|. Returns the written path."""
    from graphviz import Digraph

    effects = [abs(d.get("effect", 0.0)) for _, d in g.nodes(data=True)]
    scale = max(effects) if effects else 1.0
    weights = [abs(d.get("weight", 0.0)) for *_, d in g.edges(data=True)]
    wscale = max(weights) if weights else 1.0

    def to_hex(number: float):
        number = number / scale if scale else 0.0
        if number < 0:
            red, green = 255, int((1 + number) * 255)
            blue = green
        elif number > 0:
            blue = 255
            red = green = int((1 - number) * 255)
        else:
            red = green = blue = 255
        text = "#000000" if (red * 0.299 + green * 0.587 + blue * 0.114) > 170 else "#ffffff"
        return f"#{red:02X}{green:02X}{blue:02X}", text

    dot = Digraph(name="Feature circuit")
    dot.graph_attr.update(rankdir="BT", newrank="true")
    dot.node_attr.update(shape="box", style="rounded,filled")
    for node, data in g.nodes(data=True):
        fill, text = to_hex(data.get("effect", 0.0))
        dot.node(node, label=node, fillcolor=fill, fontcolor=text)
    for u, v, data in g.edges(data=True):
        w = abs(data.get("weight", 0.0)) / wscale if wscale else 0.0
        dot.edge(u, v, penwidth=str(max(0.3, w * pen_thickness)))
    try:
        return dot.render(out_path, format=fmt, cleanup=True)
    except Exception:
        # graphviz binaries absent: keep the dot source (still inspectable)
        dot.save(out_path + ".dot")
        return out_path + ".dot"
