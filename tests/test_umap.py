"""Native UMAP/densMAP (xclip_tpu/evals/umap.py) numerics.

The reference pipeline calls umap.UMAP(densmap=True) on cached CLIP features
(scripts/embedding_analysis.py:49-66); umap-learn is absent here, so the
native implementation must actually behave like UMAP: preserve neighborhood
structure far better than a linear projection, keep clusters separated, be
deterministic under a seed, and — with densmap=True — carry relative local
density into the embedding.
"""

import numpy as np
import pytest

from xclip_tpu.evals.umap import (exact_knn, fit_ab, fuzzy_simplicial_set,
                                  smooth_knn_dist, umap_embed)


def _blobs(n_per, centers, dim, scales, seed=0):
    rng = np.random.RandomState(seed)
    xs, ys = [], []
    for i, (c, s) in enumerate(zip(centers, scales)):
        mu = np.zeros(dim)
        mu[: len(c)] = c
        xs.append(mu + s * rng.randn(n_per, dim))
        ys.append(np.full(n_per, i))
    return np.concatenate(xs).astype(np.float32), np.concatenate(ys)


def test_exact_knn_matches_numpy():
    rng = np.random.RandomState(0)
    x = rng.randn(97, 8).astype(np.float32)  # non-divisible by block
    d, i = exact_knn(x, 5, block=32)
    full = np.linalg.norm(x[:, None] - x[None, :], axis=-1)
    np.fill_diagonal(full, np.inf)
    ref_i = np.argsort(full, axis=1)[:, :5]
    ref_d = np.take_along_axis(full, ref_i, axis=1)
    np.testing.assert_allclose(d, ref_d, rtol=1e-4, atol=1e-4)
    # indices may tie-swap; distances pin the semantics
    assert d.shape == (97, 5) and i.shape == (97, 5)


def test_smooth_knn_hits_log2k_target():
    rng = np.random.RandomState(1)
    x = rng.randn(200, 10).astype(np.float32)
    dists, _ = exact_knn(x, 12)
    rho, sigma = smooth_knn_dist(dists)
    np.testing.assert_allclose(rho, dists[:, 0])
    val = np.exp(-np.maximum(dists - rho[:, None], 0) / sigma[:, None]).sum(1)
    np.testing.assert_allclose(val, np.log2(12), atol=1e-3)


def test_fuzzy_graph_symmetric_and_bounded():
    rng = np.random.RandomState(2)
    x = rng.randn(80, 6).astype(np.float32)
    g = fuzzy_simplicial_set(x, 8)
    assert g.weight.min() > 0 and g.weight.max() <= 1.0 + 1e-6
    fwd = {(int(h), int(t)): float(w)
           for h, t, w in zip(g.head, g.tail, g.weight)}
    for (h, t), w in fwd.items():
        assert (t, h) in fwd and abs(fwd[(t, h)] - w) < 1e-6


def test_fit_ab_default_curve():
    a, b = fit_ab(0.1, 1.0)  # umap-learn's documented default fit
    assert abs(a - 1.577) < 0.05
    assert abs(b - 0.895) < 0.02


def test_embedding_preserves_clusters_beats_pca():
    x, labels = _blobs(
        60, centers=[(0, 0), (12, 0), (0, 12), (12, 12)], dim=40,
        scales=[1, 1, 1, 1])
    emb = umap_embed(x, n_neighbors=10, n_epochs=200, seed=3)
    assert emb.shape == (240, 2)
    assert np.isfinite(emb).all()

    from sklearn.manifold import trustworthiness
    from sklearn.metrics import silhouette_score

    assert silhouette_score(emb, labels) > 0.5
    assert trustworthiness(x, emb, n_neighbors=10) > 0.85


def test_embedding_deterministic_under_seed():
    x, _ = _blobs(40, centers=[(0, 0), (8, 0)], dim=16, scales=[1, 1])
    e1 = umap_embed(x, n_neighbors=8, n_epochs=60, seed=7)
    e2 = umap_embed(x, n_neighbors=8, n_epochs=60, seed=7)
    np.testing.assert_array_equal(e1, e2)


def _log_radius_corr(x, emb, k=10):
    """Pearson corr of log mean-kNN-distance between spaces (the density
    signal densMAP is defined to preserve)."""
    dx, _ = exact_knn(x, k)
    de, _ = exact_knn(emb.astype(np.float32), k)
    lx = np.log(np.maximum(dx.mean(1), 1e-12))
    le = np.log(np.maximum(de.mean(1), 1e-12))
    return np.corrcoef(lx, le)[0, 1]


def test_densmap_preserves_relative_density():
    # two well-separated clusters whose scales differ 6x: plain UMAP tends to
    # equalize their embedded extents; densMAP must keep the density ordering
    x, labels = _blobs(80, centers=[(0, 0), (60, 0)], dim=20,
                       scales=[0.5, 3.0], seed=5)
    plain = umap_embed(x, n_neighbors=10, n_epochs=200, seed=5)
    dens = umap_embed(x, n_neighbors=10, n_epochs=200, seed=5, densmap=True)

    c_plain = _log_radius_corr(x, plain)
    c_dens = _log_radius_corr(x, dens)
    assert c_dens > c_plain + 0.3
    assert c_dens > 0.5

    # and the loose cluster must actually embed looser
    def spread(e, m):
        return np.median(exact_knn(e[m].astype(np.float32), 5)[0])

    ratio = spread(dens, labels == 1) / spread(dens, labels == 0)
    assert ratio > 1.2


def test_script_embed_2d_uses_native_umap(tmp_path, monkeypatch):
    """scripts/embedding_analysis.embed_2d falls back to the native
    implementation (not PCA) when umap-learn is absent."""
    import importlib.util
    import sys

    monkeypatch.syspath_prepend("scripts")
    monkeypatch.setitem(sys.modules, "umap", None)  # force ImportError
    spec = importlib.util.spec_from_file_location(
        "emban_umap", "scripts/embedding_analysis.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    x, _ = _blobs(30, centers=[(0, 0), (6, 0)], dim=8, scales=[1, 1])
    emb = mod.embed_2d(x, seed=0)
    assert emb.shape == (60, 2)
    # PCA of zero-mean data is exactly linear: the native UMAP output is not
    # reproducible by any linear map of x — check residual of lstsq fit
    coef, *_ = np.linalg.lstsq(x - x.mean(0), emb - emb.mean(0), rcond=None)
    resid = emb - emb.mean(0) - (x - x.mean(0)) @ coef
    assert np.abs(resid).max() > 1e-3
