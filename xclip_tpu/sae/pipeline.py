"""SAE training pipeline over pre-cached activation shards.

Reference behaviour: xclip/sparse_autoencoder/pipeline.py:58-419 — per epoch:
load a shard -> shuffled batches -> forward/loss/backward -> decoder
unit-norm -> dead-neuron resampling -> validation (4-way loss vector) ->
checkpointing.

TPU design: the whole shard lives on device; one jitted train step
(value_and_grad + parallel-gradient removal + Adam + unit-norm projection +
firing-count accumulation) is driven by a host loop over shuffled batch
indices. Shards are fp16 on disk, upcast on device.
"""

from __future__ import annotations

import logging
import os
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from xclip_tpu.sae.losses import SAELossCfg, itemwise_losses, sae_loss
from xclip_tpu.sae.model import (
    constrain_decoder_unit_norm,
    remove_parallel_gradient,
    sae_apply,
    sae_params_to_state_dict,
)
from xclip_tpu.sae.optim import reset_neuron_moments
from xclip_tpu.sae.resampler import ActivationResampler, apply_parameter_updates


def load_activation_shard(path: str) -> np.ndarray:
    """Load one cached activation shard (.npy, .npz or torch .pth)."""
    if path.endswith(".npy"):
        return np.load(path)
    if path.endswith(".npz"):
        with np.load(path) as z:
            return z[z.files[0]]
    import torch

    t = torch.load(path, map_location="cpu", weights_only=False)
    return t.numpy() if hasattr(t, "numpy") else np.asarray(t)


class Pipeline:
    """Drives SAE training; mirrors the reference Pipeline surface."""

    def __init__(
        self,
        autoencoder_params: Dict,
        loss_cfg: SAELossCfg,
        optimizer: optax.GradientTransformation,
        checkpoint_directory: str,
        activation_resampler: Optional[ActivationResampler] = None,
        log_frequency: int = 100,
        logger=None,
        seed: int = 0,
    ):
        self.params = autoencoder_params
        self.loss_cfg = loss_cfg
        self.optimizer = optimizer
        self.opt_state = optimizer.init(autoencoder_params)
        self.activation_resampler = activation_resampler
        self.checkpoint_directory = checkpoint_directory
        self.log_frequency = log_frequency
        self.logger = logger
        self.total_activations_trained_on = 0
        self._rng = np.random.RandomState(seed)
        self._has_components = np.asarray(autoencoder_params["encoder"]["weight"]).ndim == 3

        loss_cfg_ = loss_cfg

        @jax.jit
        def train_step(params, opt_state, batch):
            def loss_fn(p):
                learned, decoded = sae_apply(p, batch)
                loss, metrics = sae_loss(loss_cfg_, batch, learned, decoded)
                return loss, (learned, metrics)

            (loss, (learned, metrics)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            grads = remove_parallel_gradient(params, grads)
            updates, opt_state = self.optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            params = constrain_decoder_unit_norm(params)
            fired = jnp.sum(learned > 0, axis=0)  # ([components,] m)
            return params, opt_state, metrics, fired

        self._train_step = train_step

        @jax.jit
        def val_step(params, batch):
            learned, decoded = sae_apply(params, batch)
            items = itemwise_losses(loss_cfg_, batch, learned, decoded)
            return {k: jnp.mean(v) for k, v in items.items()}

        self._val_step = val_step

    # ------------------------------------------------------------------
    def get_activation_store(self, activation_fname: str) -> np.ndarray:
        acts = load_activation_shard(activation_fname)
        acts = np.asarray(acts)
        if self._has_components and acts.ndim == 2:
            acts = acts[:, None, :]
        return acts

    def train_autoencoder(self, store: np.ndarray, train_batch_size: int) -> np.ndarray:
        """One pass over a shard; returns per-neuron firing counts."""
        n = len(store)
        order = self._rng.permutation(n)
        device_store = jnp.asarray(store, jnp.float32)
        m = (
            self.params["encoder"]["bias"].shape[-1]
        )
        fired_total = np.zeros(m, np.int64)
        for i in range(0, n - train_batch_size + 1, train_batch_size):
            idx = jnp.asarray(order[i : i + train_batch_size])
            batch = device_store[idx]
            self.params, self.opt_state, metrics, fired = self._train_step(
                self.params, self.opt_state, batch
            )
            f = np.asarray(fired)
            fired_total += (f[0] if f.ndim > 1 else f).astype(np.int64)
            self.total_activations_trained_on += train_batch_size
            step_no = self.total_activations_trained_on // train_batch_size
            if self.logger is not None and step_no % self.log_frequency == 0:
                self.logger.add_scalar(
                    "Loss/train", float(metrics["total_loss"]), self.total_activations_trained_on
                )
        return fired_total

    def validation(self, store: np.ndarray, train_batch_size: int):
        keys = ["learned_activations_l1_loss", "learned_activations_l1_loss_penalty",
                "l2_reconstruction_loss", "total_loss"]
        sums = {k: 0.0 for k in keys}
        count = 0
        for i in range(0, len(store), train_batch_size):
            batch = jnp.asarray(store[i : i + train_batch_size], jnp.float32)
            m = self._val_step(self.params, batch)
            for k in keys:
                sums[k] += float(m[k])
            count += 1
        means = {k: v / max(count, 1) for k, v in sums.items()}
        if self.logger is not None:
            for i, k in enumerate(keys):
                self.logger.add_scalar(f"Loss/val_{i}", means[k], self.total_activations_trained_on)
            self.logger.add_scalar("Loss/val_total", means["total_loss"], self.total_activations_trained_on)
        return means

    def update_parameters(self, updates) -> None:
        self.params = apply_parameter_updates(self.params, updates)
        self.opt_state = reset_neuron_moments(
            self.opt_state, updates.dead_neuron_indices, has_components=self._has_components
        )

    def save_checkpoint(self, *, is_final: bool = False) -> str:
        os.makedirs(self.checkpoint_directory, exist_ok=True)
        name = f"sparse_autoencoder_{'final' if is_final else self.total_activations_trained_on}"
        path = os.path.join(self.checkpoint_directory, f"{name}.pt")
        try:
            import torch

            sd = {
                k: torch.from_numpy(np.ascontiguousarray(v).copy())
                for k, v in sae_params_to_state_dict(self.params).items()
            }
            torch.save(sd, path)
        except ImportError:  # pragma: no cover
            path = path.replace(".pt", ".npz")
            np.savez(path, **sae_params_to_state_dict(self.params))
        return path

    def run_pipeline(
        self,
        train_batch_size: int,
        val_frequency: int = 0,
        checkpoint_frequency: int = 0,
        num_epochs: int = 1,
        train_fnames: Optional[List[str]] = None,
        train_val_fnames: Optional[List[str]] = None,
        resample_epoch_freq: int = 0,
    ) -> None:
        """Epoch loop over shard files (reference run_pipeline:276-419)."""
        assert train_fnames
        piece_order = self._rng.permutation(len(train_fnames))
        piece_idx = 0
        actual_epochs = num_epochs * len(train_fnames)
        last_validated = last_checkpoint = 0

        for epoch in range(actual_epochs):
            fname = train_fnames[piece_order[piece_idx]]
            piece_idx += 1
            if piece_idx == len(train_fnames):
                piece_idx = 0
                piece_order = self._rng.permutation(len(train_fnames))

            store = self.get_activation_store(fname)
            fired = self.train_autoencoder(store, train_batch_size)

            if self.activation_resampler is not None:
                updates = self.activation_resampler.step_resampler(
                    fired, store, self.params, self.loss_cfg, train_batch_size
                )
                if updates is not None:
                    logging.info("Resampling %d dead neurons", len(updates.dead_neuron_indices))
                    self.update_parameters(updates)

            last_validated += len(store)
            last_checkpoint += len(store)
            if val_frequency and last_validated >= val_frequency and train_val_fnames:
                last_validated = 0
                val_store = self.get_activation_store(train_val_fnames[0])
                means = self.validation(val_store, train_batch_size)
                logging.info("epoch %d validation: %s", epoch, means)
            if checkpoint_frequency and last_checkpoint >= checkpoint_frequency:
                last_checkpoint = 0
                self.save_checkpoint()

        self.save_checkpoint(is_final=True)
