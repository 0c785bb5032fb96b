"""Interpretability stack tests: SparseAct algebra, CKA estimators,
feature sharing, IG attribution math (exact on a linear toy model), and the
full circuit protocol on a tiny RN tower."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from xclip_tpu.interp import cka
from xclip_tpu.interp.attribution import patching_effect, upstream_neuron_attribution
from xclip_tpu.interp.circuit_model import VisualCircuitModel
from xclip_tpu.interp.circuits import compute_class_circuit, compute_nodes, select_top_features
from xclip_tpu.interp.dictionary import IdentityDict, SAEDictionary
from xclip_tpu.interp.feature_sharing import evaluate_feature_sharing, mpct_shared, pct_shared
from xclip_tpu.interp.graph import (
    build_circuit_graph,
    jaccard_graph_similarity,
    node_jaccard_similarity,
    wl_kernel_similarity,
)
from xclip_tpu.interp.sparse_act import SparseAct
from xclip_tpu.models.clip import CLIPModel, clip_cfg_from_dict
from xclip_tpu.sae.model import SAECfg, sae_init


class TestSparseAct:
    def test_algebra(self):
        a = SparseAct(act=jnp.array([1.0, 2.0]), res=jnp.array([1.0, 1.0]))
        b = SparseAct(act=jnp.array([3.0, 4.0]), res=jnp.array([2.0, 2.0]))
        s = a + b
        np.testing.assert_array_equal(np.asarray(s.act), [4.0, 6.0])
        m = a @ b
        np.testing.assert_array_equal(np.asarray(m.act), [3.0, 8.0])  # elementwise
        np.testing.assert_array_equal(np.asarray(m.resc), [4.0])  # contracted res
        neg = -a
        np.testing.assert_array_equal(np.asarray(neg.act), [-1.0, -2.0])
        t = m.to_tensor()
        assert t.shape == (3,)

    def test_pytree(self):
        a = SparseAct(act=jnp.ones((2, 3)), res=jnp.zeros((2, 3)))
        doubled = jax.tree_util.tree_map(lambda x: 2 * x, a)
        np.testing.assert_array_equal(np.asarray(doubled.act), 2 * np.ones((2, 3)))


class TestCKA:
    def test_hsic1_against_naive(self):
        """HSIC1 unbiased estimator vs the explicit O(n^2) formula."""
        rng = np.random.RandomState(0)
        n = 12
        x = rng.randn(n, 5)
        k = x @ x.T
        l = (x + 0.1 * rng.randn(n, 5)) @ (x + 0.1 * rng.randn(n, 5)).T

        kt = k - np.diag(np.diag(k))
        lt = l - np.diag(np.diag(l))
        expected = (
            np.trace(kt @ lt)
            + kt.sum() * lt.sum() / ((n - 1) * (n - 2))
            - 2.0 / (n - 2) * (kt @ lt).sum()
        ) / (n * (n - 3))
        got = float(cka.hsic1(jnp.asarray(k), jnp.asarray(l)))
        np.testing.assert_allclose(got, expected, rtol=1e-5)

    def test_linear_cka_properties(self):
        rng = np.random.RandomState(0)
        x = rng.randn(20, 8)
        assert cka.linear_cka(x, x) == pytest.approx(1.0, abs=1e-5)
        # invariant to orthogonal transform + isotropic scaling
        q, _ = np.linalg.qr(rng.randn(8, 8))
        assert cka.linear_cka(x, 3.0 * x @ q) == pytest.approx(1.0, abs=1e-4)
        y = rng.randn(20, 8)
        assert cka.linear_cka(x, y) < 0.9

    def test_kernel_cka_runs(self):
        rng = np.random.RandomState(0)
        x = rng.randn(15, 4)
        assert cka.kernel_cka(x, x) == pytest.approx(1.0, abs=1e-4)

    def test_class_means(self):
        acts = np.arange(12).reshape(6, 2).astype(float)
        labels = np.array([0, 0, 1, 1, 2, 2])
        means = cka.class_mean_activations(acts, labels)
        np.testing.assert_array_equal(means[0], [1.0, 2.0])


class TestFeatureSharing:
    def test_pct_shared(self):
        a = np.zeros(50)
        b = np.zeros(50)
        a[[1, 2, 3]] = [5, 4, 3]
        b[[1, 2, 9]] = [5, 4, 3]
        assert pct_shared(a, b, k=3) == pytest.approx(2 / 3)
        assert 0 <= mpct_shared(a, b, ks=[3]) <= 1

    def test_protocol(self, tmp_path):
        cfg = SAECfg(16, 64, n_components=None)
        params = sae_init(jax.random.PRNGKey(0), cfg)
        rng = np.random.RandomState(0)
        n = 60
        feats = rng.randn(n, 16).astype(np.float32)
        labels = np.repeat([0, 11], n // 2)
        domain_ids = np.tile([4, 5], n // 2)
        res = evaluate_feature_sharing(
            params, feats, labels, domain_ids,
            {"aircraft carrier": 0, "axe": 11}, domain="sketch",
            out_path=str(tmp_path), n_learned_features=64,
        )
        assert "score" in res and "mpct_shared@20" in res["score"]
        assert (tmp_path / "feature-sharing.json").exists()
        assert (tmp_path / "aircraft carrier_real_hist.npy").exists()


class _LinearToy:
    """Minimal circuit-model protocol with known linear maps, so IG effects
    have closed-form values: layers 'a' -> 'b' -> logits."""

    def __init__(self):
        self.w1 = jnp.asarray(np.random.RandomState(0).randn(4, 5).astype(np.float32))
        self.w2 = jnp.asarray(np.random.RandomState(1).randn(5, 3).astype(np.float32))
        self.x = jnp.asarray(np.random.RandomState(2).randn(2, 1, 4).astype(np.float32))

    def activations(self, images):
        a = images
        b = jnp.einsum("bsc,cd->bsd", a, self.w1)
        return {"a": a, "b": b}

    def run_from(self, name, tokens):
        if name == "a":
            tokens = jnp.einsum("bsc,cd->bsd", tokens, self.w1)
        return jnp.einsum("bsd,de->be", tokens, self.w2)

    def run_segment(self, upstream, downstream, tokens):
        assert (upstream, downstream) == ("a", "b")
        return jnp.einsum("bsc,cd->bsd", tokens, self.w1)

    def metric_from(self, name, tokens, label):
        return self.run_from(name, tokens)[:, label]


class TestAttribution:
    def test_ig_exact_on_linear_model(self):
        """For a linear metric, IG node effect must equal -(w*x) exactly
        (every IG step gradient is the constant weight vector)."""
        toy = _LinearToy()
        dicts = {"a": IdentityDict(4), "b": IdentityDict(5)}
        effects, deltas, grads, total = patching_effect(
            toy.x, None, toy, ["a", "b"], dicts, metric_label=1, steps=5
        )
        acts = toy.activations(toy.x)
        # grad of sum_b logits[:,1] wrt b = w2[:,1]; effect = grad * (-act)
        expected_b = -np.asarray(acts["b"]) * np.asarray(toy.w2[:, 1])
        np.testing.assert_allclose(np.asarray(effects["b"].act), expected_b, rtol=1e-4, atol=1e-5)
        w_chain = np.asarray(toy.w1) @ np.asarray(toy.w2[:, 1])
        expected_a = -np.asarray(acts["a"]) * w_chain
        np.testing.assert_allclose(np.asarray(effects["a"].act), expected_a, rtol=1e-4, atol=1e-5)
        assert total is None

    def test_edge_attribution_shapes(self):
        toy = _LinearToy()
        dicts = {"a": IdentityDict(4), "b": IdentityDict(5)}
        e = upstream_neuron_attribution(
            toy.x, None, toy, "a", "b", dicts,
            upstream_neurons=np.array([0, 2]), downstream_neurons=np.array([1, 3, 4]),
            steps=4,
        )
        assert e.shape == (3, 2)
        assert np.isfinite(e).all()

    def test_edge_attribution_patch_input(self):
        """Patch-input IG edge effects: (1) a zero patch input must reproduce
        the patch=None path (the linear toy maps zero images to zero states),
        (2) a generic patch matches the closed-form value — the per-step MSE
        gradient is linear in alpha, so mean-grad = grad at alpha=(s-1)/2s."""
        toy = _LinearToy()
        dicts = {"a": IdentityDict(4), "b": IdentityDict(5)}
        up_idx = np.array([0, 1, 2, 3])
        down_idx = np.array([0, 1, 2, 3, 4])
        kw = dict(upstream_neurons=up_idx, downstream_neurons=down_idx, steps=4)

        e_none = upstream_neuron_attribution(toy.x, None, toy, "a", "b", dicts, **kw)
        e_zero = upstream_neuron_attribution(
            toy.x, jnp.zeros_like(toy.x), toy, "a", "b", dicts, **kw)
        np.testing.assert_allclose(e_zero, e_none, rtol=1e-5, atol=1e-6)

        patch = jnp.asarray(np.random.RandomState(3).randn(2, 1, 4).astype(np.float32))
        e = upstream_neuron_attribution(toy.x, patch, toy, "a", "b", dicts, **kw)

        a = np.asarray(toy.x)            # (B, S, 4) clean upstream state
        ap = np.asarray(patch)           # patch upstream state (IdentityDict)
        w1 = np.asarray(toy.w1)
        steps = 4
        alpha_bar = (steps - 1) / (2 * steps)
        n = a.shape[0] * a.shape[1]      # MSE mean over (B, S)
        diff_d = (a - ap) @ w1           # (B, S, 5): b_clean - f@w1 at alpha=1
        expected = np.zeros((len(down_idx), len(up_idx)))
        for di, d in enumerate(down_idx):
            # mean IG grad wrt f[..., c] = -2/n * alpha_bar * diff_d[..., d] * w1[c, d]
            grad = -2.0 / n * alpha_bar * diff_d[..., d][..., None] * w1[None, None, :, d]
            eff = grad * (ap - a)        # grad * delta
            expected[di] = eff.sum(axis=1).mean(axis=0)[up_idx]
        np.testing.assert_allclose(e, expected, rtol=1e-4, atol=1e-6)


TINY_RN = {
    "embed_dim": 16,
    "vision_cfg": {"image_size": 32, "layers": [1, 1, 1, 1], "width": 8, "patch_size": None},
    "text_cfg": {"context_length": 16, "vocab_size": 256, "width": 16, "heads": 2, "layers": 1},
}


class TestCircuitProtocol:
    @pytest.fixture(scope="class")
    def circuit_model(self):
        model = CLIPModel(clip_cfg_from_dict(TINY_RN))
        params, state = model.init(jax.random.PRNGKey(0))
        txt = np.random.RandomState(0).randn(7, 16).astype(np.float32)
        txt /= np.linalg.norm(txt, axis=1, keepdims=True)
        return VisualCircuitModel(model, params, state, txt)

    def test_stage_bookkeeping(self, circuit_model):
        names = [s.name for s in circuit_model.stages]
        assert names[0] == "input" and names[-1] == "attnpool"
        assert "resblock1" in names and "resblock4" in names
        assert len(names) == 1 + 4 + 4 + 1  # input + stem(4) + blocks(4) + attnpool

    def test_activations_and_resume(self, circuit_model):
        x = jnp.asarray(np.random.RandomState(0).randn(2, 32, 32, 3).astype(np.float32))
        acts = circuit_model.activations(x)
        assert acts["attnpool"].shape == (2, 1, 16)
        # resuming from a captured activation reproduces the direct logits
        direct = circuit_model.run_from("input", acts["input"])
        resumed = circuit_model.run_from("resblock2", acts["resblock2"])
        np.testing.assert_allclose(np.asarray(direct), np.asarray(resumed), atol=1e-4)

    def test_full_class_circuit(self, circuit_model, tmp_path):
        x = np.random.RandomState(0).randn(2, 32, 32, 3).astype(np.float32)
        nodes, features, edges = compute_class_circuit(
            circuit_model, x, label=3, node_threshold=0.25, steps=3,
            out_folder=str(tmp_path), compute_edge_effects=True,
        )
        assert set(nodes) == {s.name for s in circuit_model.stages}
        assert nodes["attnpool"].act.shape == (16,)
        # edges exist for each adjacent pair
        assert len(edges) == len(circuit_model.stages) - 1
        assert (tmp_path / "3_nodes.npz").exists()
        assert (tmp_path / "3_edges.npz").exists()

        g = build_circuit_graph(
            {k: np.asarray(v.act) for k, v in nodes.items()}, edges, features, edge_k=2
        )
        assert g.number_of_nodes() > 0 and g.number_of_edges() > 0
        assert jaccard_graph_similarity(g, g) == 1.0
        sim = wl_kernel_similarity([g, g], h=2)
        np.testing.assert_allclose(sim, np.ones((2, 2)), atol=1e-6)

    def test_sae_basis_circuit(self, circuit_model, tmp_path):
        """Feature-basis circuits: one layer gets a trained-SAE dictionary
        (loaded from disk via the --sae_dir resolution path), the rest stay
        in the neuron basis."""
        import jax

        from xclip_tpu.interp.dictionary import (
            IdentityDict,
            load_sae_dictionary,
            resolve_sae_checkpoint,
        )
        from xclip_tpu.sae.model import SAECfg, sae_init, sae_params_to_state_dict

        target = "resblock2"
        channels = {s.name: s.channels for s in circuit_model.stages}
        sae_params = sae_init(jax.random.PRNGKey(1), SAECfg(channels[target], channels[target] * 2))
        np.savez(tmp_path / f"{target}.npz", **sae_params_to_state_dict(sae_params))

        ckpt = resolve_sae_checkpoint(str(tmp_path), target)
        assert ckpt and ckpt.endswith(f"{target}.npz")
        assert resolve_sae_checkpoint(str(tmp_path), "resblock1") is None
        sae_dict = load_sae_dictionary(ckpt)
        assert sae_dict.dict_size == channels[target] * 2

        dictionaries = {
            name: sae_dict if name == target else IdentityDict(c) for name, c in channels.items()
        }
        x = np.random.RandomState(1).randn(2, 32, 32, 3).astype(np.float32)
        nodes, features, edges = compute_class_circuit(
            circuit_model, x, label=2, node_threshold=0.25, steps=3,
            dictionaries=dictionaries, compute_edge_effects=True,
        )
        # the SAE layer's nodes live in the (wider) feature basis
        assert nodes[target].act.shape == (channels[target] * 2,)
        assert nodes["resblock1"].act.shape == (channels["resblock1"],)
        assert features[target].max() < channels[target] * 2

    def test_node_similarity(self):
        rng = np.random.RandomState(0)
        a = rng.randn(40)
        assert node_jaccard_similarity(a, a) == 1.0
        assert 0 <= node_jaccard_similarity(a, rng.randn(40)) <= 1.0


def test_render_circuit_graphviz(tmp_path):
    import networkx as nx

    from xclip_tpu.interp.graph import render_circuit_graphviz

    g = nx.DiGraph()
    g.add_node("a/0", effect=1.0, node_label="0")
    g.add_node("b/1", effect=-0.5, node_label="1")
    g.add_edge("a/0", "b/1", weight=0.7)
    out = render_circuit_graphviz(g, str(tmp_path / "circuit"))
    import os

    assert os.path.exists(out)
