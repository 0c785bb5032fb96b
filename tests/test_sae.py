"""SAE stack tests: forward/loss golden parity vs reference torch package,
unit-norm invariants, resampler math parity, Adam moment reset, and an
end-to-end pipeline smoke run with resampling + checkpointing."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from xclip_tpu.sae import optim as sae_optim
from xclip_tpu.sae.losses import SAELossCfg, itemwise_losses, sae_loss
from xclip_tpu.sae.model import (
    SAECfg,
    constrain_decoder_unit_norm,
    remove_parallel_gradient,
    sae_apply,
    sae_init,
    sae_params_to_state_dict,
    sae_state_dict_to_params,
)
from xclip_tpu.sae.pipeline import Pipeline
from xclip_tpu.sae.resampler import ActivationResampler, apply_parameter_updates

HAS_REFERENCE = os.path.exists("/root/reference")


def _params(d=8, m=16, components=1, seed=0):
    cfg = SAECfg(d, m, n_components=components)
    return cfg, sae_init(jax.random.PRNGKey(seed), cfg)


class TestModel:
    def test_shapes_and_unit_norm_init(self):
        cfg, params = _params()
        w = np.asarray(params["decoder"]["weight"])
        np.testing.assert_allclose(np.linalg.norm(w, axis=-2), 1.0, atol=1e-5)
        x = np.random.RandomState(0).randn(4, 1, 8).astype(np.float32)
        learned, decoded = sae_apply(params, x)
        assert learned.shape == (4, 1, 16)
        assert decoded.shape == (4, 1, 8)

    def test_constrain_and_parallel_grad(self):
        cfg, params = _params(components=None)
        params["decoder"]["weight"] = params["decoder"]["weight"] * 3.0
        fixed = constrain_decoder_unit_norm(params)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(fixed["decoder"]["weight"]), axis=-2), 1.0, atol=1e-5
        )
        grads = jax.tree_util.tree_map(jnp.ones_like, params)
        g2 = remove_parallel_gradient(fixed, grads)
        w = np.asarray(fixed["decoder"]["weight"])
        g = np.asarray(g2["decoder"]["weight"])
        dots = np.sum(g * w, axis=-2)
        np.testing.assert_allclose(dots, 0.0, atol=1e-5)

    @pytest.mark.skipif(not HAS_REFERENCE, reason="reference tree not mounted")
    def test_golden_forward_and_loss_parity(self):
        from ref_compat import import_reference_sae

        sa = import_reference_sae()
        import torch

        torch.manual_seed(0)
        ref = sa.SparseAutoencoder(8, 16, n_components=1)
        sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
        # reference state dict keys use private names via property mapping
        cfg = SAECfg(8, 16, n_components=1)
        params = sae_state_dict_to_params(sd, cfg)

        x = np.random.RandomState(0).randn(6, 1, 8).astype(np.float32)
        with torch.no_grad():
            ref_learned, ref_decoded = ref(torch.from_numpy(x))
        learned, decoded = sae_apply(params, x)
        np.testing.assert_allclose(np.asarray(learned), ref_learned.numpy(), atol=1e-5)
        np.testing.assert_allclose(np.asarray(decoded), ref_decoded.numpy(), atol=1e-5)

        # loss parity
        from sparse_autoencoder import (
            L2ReconstructionLoss,
            LearnedActivationsL1Loss,
            LossReducer,
        )
        from sparse_autoencoder.loss.abstract_loss import LossReductionType

        ref_loss_fn = LossReducer(LearnedActivationsL1Loss(1e-4), L2ReconstructionLoss())
        ref_total, _ = ref_loss_fn.scalar_loss_with_log(
            torch.from_numpy(x), ref_learned, ref_decoded,
            component_reduction=LossReductionType.MEAN,
        )
        loss, metrics = sae_loss(SAELossCfg(1e-4), x, learned, decoded)
        np.testing.assert_allclose(float(loss), float(ref_total), rtol=1e-5)

    def test_state_dict_roundtrip(self):
        cfg, params = _params()
        sd = sae_params_to_state_dict(params)
        params2 = sae_state_dict_to_params(sd, cfg)
        for a, b in zip(jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(params2)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestResampler:
    def test_sampling_probabilities(self):
        p = ActivationResampler.assign_sampling_probabilities(np.array([1.0, 2.0, 3.0]))
        np.testing.assert_allclose(np.round(p, 2), [0.07, 0.29, 0.64])

    def test_renormalize_and_scale(self):
        sampled = np.array([[3.0, 4.0]])
        neuron_activity = np.array([3, 0, 5, 0, 1, 3])
        encoder_weight = np.ones((6, 2))
        out = ActivationResampler.renormalize_and_scale(sampled, neuron_activity, encoder_weight)
        np.testing.assert_allclose(np.round(out, 1), [[0.2, 0.2]])

    def test_dead_neuron_detection_and_updates(self):
        cfg, params = _params(d=8, m=16, components=None)
        r = ActivationResampler(
            n_learned_features=16, resample_interval=100, max_n_resamples=2,
            n_activations_activity_collate=100, resample_dataset_size=64,
        )
        store = np.random.RandomState(0).randn(128, 8).astype(np.float32)
        fired = np.ones(16, np.int64) * 5
        fired[[2, 7]] = 0  # dead
        updates = r.step_resampler(fired, store, params, SAELossCfg(1e-4), batch_size=32)
        assert updates is not None
        np.testing.assert_array_equal(updates.dead_neuron_indices, [2, 7])
        assert updates.dead_encoder_weight_updates.shape == (2, 8)
        assert updates.dead_decoder_weight_updates.shape == (8, 2)
        # decoder columns unit norm
        np.testing.assert_allclose(
            np.linalg.norm(updates.dead_decoder_weight_updates, axis=0), 1.0, atol=1e-5
        )
        new_params = apply_parameter_updates(params, updates)
        np.testing.assert_allclose(
            np.asarray(new_params["encoder"]["bias"])[[2, 7]], 0.0, atol=1e-7
        )
        np.testing.assert_allclose(
            np.asarray(new_params["decoder"]["weight"])[:, 2],
            updates.dead_decoder_weight_updates[:, 0], atol=1e-6,
        )

    def test_moment_reset(self):
        cfg, params = _params(components=None)
        tx = sae_optim.adam(1e-3)
        opt_state = tx.init(params)
        # one step to build nonzero moments
        grads = jax.tree_util.tree_map(jnp.ones_like, params)
        _, opt_state = tx.update(grads, opt_state, params)
        opt_state = sae_optim.reset_neuron_moments(opt_state, np.array([1, 3]))
        import optax

        adam_state = [s for s in opt_state if isinstance(s, optax.ScaleByAdamState)][0]
        mu = np.asarray(adam_state.mu["encoder"]["weight"])
        assert np.all(mu[[1, 3]] == 0) and np.any(mu[0] != 0)
        mu_d = np.asarray(adam_state.mu["decoder"]["weight"])
        assert np.all(mu_d[:, [1, 3]] == 0) and np.any(mu_d[:, 0] != 0)


def test_pipeline_end_to_end(tmp_path):
    cfg, params = _params(d=16, m=32, components=None, seed=1)
    resampler = ActivationResampler(
        n_learned_features=32, resample_interval=512, max_n_resamples=1,
        n_activations_activity_collate=512, resample_dataset_size=128,
        resample_epoch_freq=1,
    )
    pipe = Pipeline(
        params, SAELossCfg(1e-4), sae_optim.adam(1e-3), str(tmp_path),
        activation_resampler=resampler, log_frequency=10,
    )
    rng = np.random.RandomState(0)
    shards = []
    for i in range(2):
        path = tmp_path / f"shard{i}.npy"
        np.save(path, rng.randn(512, 16).astype(np.float16))
        shards.append(str(path))

    store0 = pipe.get_activation_store(shards[0])
    l0 = pipe.validation(store0, 64)["total_loss"]
    pipe.run_pipeline(
        train_batch_size=64, num_epochs=3, train_fnames=shards,
        train_val_fnames=[shards[0]], val_frequency=0, checkpoint_frequency=0,
    )
    l1 = pipe.validation(store0, 64)["total_loss"]
    assert l1 < l0
    # decoder stayed unit-norm through training
    w = np.asarray(pipe.params["decoder"]["weight"])
    np.testing.assert_allclose(np.linalg.norm(w, axis=0), 1.0, atol=1e-4)
    # final checkpoint saved and loadable
    final = tmp_path / "sparse_autoencoder_final.pt"
    assert final.exists()
    import torch

    sd = torch.load(str(final), weights_only=False)
    params2 = sae_state_dict_to_params({k: v.numpy() for k, v in sd.items()}, cfg)
    x = rng.randn(4, 16).astype(np.float32)
    a, b = sae_apply(pipe.params, x)
    a2, b2 = sae_apply(params2, x)
    np.testing.assert_allclose(np.asarray(b), np.asarray(b2), atol=1e-6)


def test_discover_then_name(tmp_path):
    """Concept naming: unit decoder columns vs vocab embeddings, argmax name
    (reference DiscoverThenName / name_concepts.py)."""
    from xclip_tpu.sae.naming import DiscoverThenName, decode_sae_config

    cfg, params = _params(d=8, m=6, components=None)
    # craft vocab embeddings so feature j matches concept j exactly
    dec = np.asarray(params["decoder"]["weight"])  # (8, 6) unit columns
    vocab = dec.T.copy()  # concept i == direction of feature i
    texts = [f"concept {i}" for i in range(6)]
    dtn = DiscoverThenName(params, vocab, texts)
    sim = dtn.get_concept_name_similarity_matrix()
    assert sim.shape == (6, 6)
    names = dtn.get_concept_names()
    assert names == texts
    out = tmp_path / "concepts" / "concept_names.csv"
    dtn.write_concept_names_csv(str(out))
    assert out.read_text().splitlines()[0] == "0,concept 0"

    cfgd = decode_sae_config("lr0.0005_l1coeff3e-05_ef8_rf10_hookout_bs4096_epo200")
    assert cfgd == {
        "lr": 0.0005, "l1_coeff": 3e-05, "expansion_factor": 8, "resample_freq": 10,
        "hook_points": ["out"], "train_sae_bs": 4096, "num_epochs": 200,
    }
