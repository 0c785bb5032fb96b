"""Embedding-space analysis of cached features, paper Fig. 5 (reference:
scripts/embedding_analysis.py): 2-D embedding of features colored by domain,
inter-domain L2-mean heatmaps, per-dimension abs-diff analysis and the
quickdraw-separation statistics."""

import argparse
import json
import os

import _common  # noqa: F401
import numpy as np

from xclip_tpu.data.datasets import ALL_DOMAINS

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt


def embed_2d(feats, seed=0):
    """densMAP via umap-learn when available, otherwise the native JAX
    UMAP/densMAP implementation (xclip_tpu.evals.umap — clean-room, jitted
    kNN + layout; reference: umap.UMAP(densmap=True), embedding_analysis.py:49)."""
    try:
        import umap

        return umap.UMAP(densmap=True, random_state=seed).fit_transform(feats)
    except ImportError:
        from xclip_tpu.evals.umap import umap_embed

        return umap_embed(feats, densmap=True, seed=seed)


def main(args):
    img_feat = np.load(os.path.join(args.features_path, "img_feat.npy"))
    domain_ids = np.load(os.path.join(args.features_path, "domain_ids.npy"))
    if img_feat.ndim == 3:  # (steps, N, D): use the final checkpoint
        img_feat = img_feat[-1]

    os.makedirs(args.out_path, exist_ok=True)

    # 2-D embedding colored by domain
    if args.max_points and len(img_feat) > args.max_points:
        idx = np.random.RandomState(0).permutation(len(img_feat))[: args.max_points]
        emb = embed_2d(img_feat[idx])
        emb_domains = domain_ids[idx]
    else:
        emb = embed_2d(img_feat)
        emb_domains = domain_ids
    fig, ax = plt.subplots(figsize=(8, 8))
    for d_idx, d_name in enumerate(ALL_DOMAINS):
        mask = emb_domains == d_idx
        ax.scatter(emb[mask, 0], emb[mask, 1], s=2, label=d_name, alpha=0.5)
    ax.legend()
    fig.savefig(os.path.join(args.out_path, "embedding.png"), dpi=150)
    plt.close(fig)

    # inter-domain mean-embedding L2 distances
    means = np.stack([
        img_feat[domain_ids == d].mean(axis=0) if np.any(domain_ids == d) else np.zeros(img_feat.shape[1])
        for d in range(len(ALL_DOMAINS))
    ])
    dists = np.linalg.norm(means[:, None] - means[None, :], axis=-1)
    fig, ax = plt.subplots()
    im = ax.imshow(dists)
    ax.set_xticks(range(6), ALL_DOMAINS, rotation=45)
    ax.set_yticks(range(6), ALL_DOMAINS)
    fig.colorbar(im)
    fig.savefig(os.path.join(args.out_path, "domain_distances.png"), dpi=150, bbox_inches="tight")
    plt.close(fig)

    # quickdraw separation: per-dimension |mean difference| vs the rest
    qd = means[ALL_DOMAINS.index("quickdraw")]
    others = np.delete(means, ALL_DOMAINS.index("quickdraw"), axis=0).mean(axis=0)
    absdiff = np.abs(qd - others)
    order = np.argsort(-absdiff)
    fig, ax = plt.subplots()
    ax.plot(absdiff[order])
    ax.set_xlabel("embedding dimension (sorted)")
    ax.set_ylabel("|mean difference| quickdraw vs rest")
    fig.savefig(os.path.join(args.out_path, "quickdraw_separation.png"), dpi=150)
    plt.close(fig)

    summary = {
        "domain_distance_matrix": dists.tolist(),
        "quickdraw_top_dims": order[:10].tolist(),
        "quickdraw_max_absdiff": float(absdiff.max()),
    }
    with open(os.path.join(args.out_path, "embedding_analysis.json"), "w") as fh:
        json.dump(summary, fh)
    print(json.dumps({"quickdraw_max_absdiff": summary["quickdraw_max_absdiff"]}))


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--features_path", type=str, required=True,
                        help="directory with img_feat.npy etc. from save_domainnet_features.py")
    parser.add_argument("--out_path", type=str, required=True)
    parser.add_argument("--max_points", type=int, default=20000)
    main(parser.parse_args())
