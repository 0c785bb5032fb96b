"""Batched image-feature extraction (the eval hot loop).

Reference behaviour: scripts/evaluate_domainnet_lso_openai.py:18-36 get_data
(DataLoader -> encode_image -> F.normalize, fp16) and
scripts/save_domainnet_features.py:35-46 (feature caching for checkpoint
series). One fixed-shape jitted encoder serves every batch (tail padded), so
the whole pass is a single compiled program; decode runs on host threads via
the DataLoader.
"""

from __future__ import annotations

from typing import Dict, List

import jax
import numpy as np

from xclip_tpu.data.loader import DataLoader, default_collate


def extract_image_features(
    model,
    params,
    state,
    dataset,
    *,
    batch_size: int = 250,
    num_threads: int = 16,
    dtype=None,
    extra_columns: int = 1,
) -> Dict[str, np.ndarray]:
    """Encode every image of ``dataset`` -> dict with normalized ``img_feat``
    (N, E) plus stacked extra columns (labels etc.)."""

    @jax.jit
    def encode(p, s, images):
        feats, _, _ = model.encode_image(p, images, state=s, normalize=True, dtype=dtype)
        return feats

    loader = DataLoader(
        dataset, batch_size, shuffle=False, num_threads=num_threads, collate=default_collate
    )
    feats: List[np.ndarray] = []
    extras: List[tuple] = []
    pad_to = batch_size
    for batch in loader:
        images = batch[0] if isinstance(batch, tuple) else batch
        cols = batch[1:] if isinstance(batch, tuple) else ()
        n = images.shape[0]
        if n < pad_to:
            images = np.concatenate(
                [images, np.zeros((pad_to - n, *images.shape[1:]), images.dtype)]
            )
        out = np.asarray(encode(params, state, images))[:n]
        feats.append(out)
        extras.append(cols)

    result: Dict[str, np.ndarray] = {"img_feat": np.concatenate(feats, axis=0)}
    if extras and extras[0]:
        for i in range(min(extra_columns, len(extras[0]))):
            col = [e[i] for e in extras]
            result[f"col{i}"] = (
                np.concatenate(col) if isinstance(col[0], np.ndarray) else sum(map(list, col), [])
            )
    if "col0" in result:
        result["clss"] = result.pop("col0")
    return result
