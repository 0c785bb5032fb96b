"""CLIP feature caching for SAE training.

Reference behaviour: scripts/train_sae.py:68-195 — encode DomainNet (or
DomainNet+CC12M) with the trained CLIP, L2-normalize, shuffle, and store
fp16 shards (single shard for DomainNet-only; 32 shards of ~295 batches for
CC12M) as train_activations[_i] / train_val_activations files.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence

import jax
import numpy as np

from xclip_tpu.data.loader import DataLoader


class _ConcatDataset:
    def __init__(self, datasets: Sequence):
        self.datasets = list(datasets)
        self._offsets = np.cumsum([0] + [len(d) for d in self.datasets])

    def __len__(self):
        return int(self._offsets[-1])

    def __getitem__(self, index):
        ds_idx = int(np.searchsorted(self._offsets, index, side="right") - 1)
        return self.datasets[ds_idx][index - self._offsets[ds_idx]]


def concat_datasets(datasets: Sequence) -> _ConcatDataset:
    return _ConcatDataset(datasets)


def cache_image_features(
    model,
    params,
    state,
    dataset,
    out_path: str,
    *,
    batch_size: int = 1024,
    num_threads: int = 8,
    shard_batches: Optional[int] = None,
    seed: int = 0,
    prefix: str = "train_activations",
) -> List[str]:
    """Encode every image -> normalized features; write shuffled fp16 shards.

    ``shard_batches=None`` writes one ``{prefix}.npy``; otherwise a new shard
    is flushed every ``shard_batches`` batches (reference's 295-batch CC12M
    shards).
    """
    os.makedirs(out_path, exist_ok=True)

    @jax.jit
    def encode(p, s, images):
        feats, _, _ = model.encode_image(p, images, state=s, normalize=True)
        return feats

    loader = DataLoader(dataset, batch_size, shuffle=True, seed=seed, num_threads=num_threads)
    rng = np.random.RandomState(seed)
    paths: List[str] = []
    buf: List[np.ndarray] = []
    shard_idx = 0

    def flush(final: bool):
        nonlocal shard_idx, buf
        if not buf:
            return
        feats = np.concatenate(buf).astype(np.float16)
        feats = feats[rng.permutation(len(feats))]
        if shard_batches is None:
            name = f"{prefix}.npy"
        else:
            name = f"{prefix}_{shard_idx}.npy"
        path = os.path.join(out_path, name)
        np.save(path, feats)
        paths.append(path)
        shard_idx += 1
        buf = []

    pad_to = batch_size
    for batch in loader:
        images = batch[0] if isinstance(batch, tuple) else batch
        n = images.shape[0]
        if n < pad_to:
            images = np.concatenate([images, np.zeros((pad_to - n, *images.shape[1:]), images.dtype)])
        feats = np.asarray(encode(params, state, images))[:n]
        buf.append(feats)
        if shard_batches is not None and len(buf) >= shard_batches:
            flush(final=False)
    flush(final=True)
    return paths
