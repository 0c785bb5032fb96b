"""Functional circuit model: the nnsight replacement.

Reference behaviour: scripts/compute_circuits.py:33-227 builds an
NNsight-wrapped zero-shot classifier (RN50 visual tower + frozen text
classifier) and 22 Submodules with get/set-activation hooks
(xclip/feature_circuits/submodule.py adapters ``b c h w -> b (h w) c`` and
``b c -> b 1 c``).

TPU design: the model is decomposed into named *segments*; every layer's
activation is first-class. ``activations(images)`` returns all of them in
one jitted pass; ``metric_from(layer, act, label)`` resumes the network from
a (modified) activation and returns the zero-shot logit for the label — the
exact quantity the reference obtains by tracing + patching hooks. Gradients
through a segment are just ``jax.grad`` of these pure functions.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List

import jax.numpy as jnp
import numpy as np

from xclip_tpu.models import resnet as R


@dataclasses.dataclass(frozen=True)
class StageInfo:
    name: str
    index: int  # index into the resnet stage list; -1 = model input
    spatial: int  # H (=W) of the NHWC activation; 0 for vector stages
    channels: int


class VisualCircuitModel:
    """RN50 visual tower + frozen zero-shot text head, stage-addressable.

    ``stages`` mirrors the reference submodule list: input, stem act1-3,
    stem avgpool, every bottleneck block, attnpool (compute_circuits.py:
    159-204)."""

    def __init__(self, model, params, state, text_features: np.ndarray):
        assert model.cfg.is_resnet, "circuit analysis targets the RN50 tower"
        self.model = model
        self.cfg = model.cfg.vision
        self.params = params["visual"]
        self.state = state["visual"]
        self.text_features = jnp.asarray(text_features, jnp.float32)  # (C, E) normalized

        g = self.cfg.image_size
        stem_hw = g // 2
        pooled = g // 4
        stages: List[StageInfo] = [StageInfo("input", -1, g, 3)]
        names = R.resnet_stage_names(self.cfg)
        w = self.cfg.width
        hw = stem_hw
        channels = {"stem.act1": w // 2, "stem.act2": w // 2, "stem.act3": w, "stem.avgpool": w}
        for i, name in enumerate(names):
            if name.startswith("stem"):
                if name == "stem.avgpool":
                    hw = pooled
                stages.append(StageInfo(name.replace("stem.", ""), i, hw, channels[name]))
            elif name.startswith("layer"):
                stage_idx = int(name.split(".")[0][-1])
                block = int(name.split(".")[1])
                if block == 0 and stage_idx > 1:
                    hw = hw // 2
                stages.append(
                    StageInfo(
                        f"resblock{self._block_number(stage_idx, block)}", i, hw,
                        w * (2 ** (stage_idx - 1)) * R.EXPANSION,
                    )
                )
            else:  # attnpool
                stages.append(StageInfo("attnpool", i, 0, self.cfg.output_dim))
        self.stages = stages
        self.name_to_stage = {s.name: s for s in stages}

    def _block_number(self, stage_idx: int, block: int) -> int:
        return sum(self.cfg.layers[: stage_idx - 1]) + block + 1

    # ------------------------------------------------------------------
    def _to_tokens(self, x: jnp.ndarray) -> jnp.ndarray:
        """NHWC activation -> (B, S, C); vectors -> (B, 1, C)."""
        if x.ndim == 4:
            b, h, w, c = x.shape
            return x.reshape(b, h * w, c)
        return x[:, None, :]

    def _from_tokens(self, tokens: jnp.ndarray, stage: StageInfo) -> jnp.ndarray:
        if stage.spatial == 0:
            return tokens[:, 0, :]
        b, s, c = tokens.shape
        return tokens.reshape(b, stage.spatial, stage.spatial, c)

    def activations(self, images: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        """All stage activations in the (B, S, C) adapter layout, one pass."""
        capture = [s for s in R.resnet_stage_names(self.cfg)]
        _, _, inters = R.resnet_apply(
            self.params, self.state, images, self.cfg, train=False, capture=capture
        )
        out = {"input": self._to_tokens(images)}
        for info in self.stages[1:]:
            raw = inters[R.resnet_stage_names(self.cfg)[info.index]]
            out[info.name] = self._to_tokens(raw)
        return out

    def run_from(self, stage_name: str, tokens: jnp.ndarray) -> jnp.ndarray:
        """Resume the tower from stage ``stage_name``'s (modified) activation
        -> zero-shot logits (B, num_classes)."""
        stage = self.name_to_stage[stage_name]
        x = self._from_tokens(tokens, stage)
        if stage.name != "attnpool":
            start = stage.index + 1
            x, _, _ = R.resnet_apply(
                self.params, self.state, x, self.cfg, train=False, start=start
            )
        feats = x.astype(jnp.float32)
        feats = feats / jnp.maximum(jnp.linalg.norm(feats, axis=-1, keepdims=True), 1e-12)
        return feats @ self.text_features.T

    def run_segment(self, upstream: str, downstream: str, tokens: jnp.ndarray) -> jnp.ndarray:
        """Downstream activation (B, S, C) given the upstream activation."""
        up = self.name_to_stage[upstream]
        down = self.name_to_stage[downstream]
        x = self._from_tokens(tokens, up)
        out, _, inters = R.resnet_apply(
            self.params, self.state, x, self.cfg, train=False,
            start=up.index + 1, stop=down.index + 1,
            capture=[R.resnet_stage_names(self.cfg)[down.index]],
        )
        return self._to_tokens(out)

    def metric_from(self, stage_name: str, tokens: jnp.ndarray, label: int) -> jnp.ndarray:
        """Per-sample zero-shot logit of ``label`` (the reference metric_fn,
        compute_circuits.py:276-279), resumed from a stage activation."""
        logits = self.run_from(stage_name, tokens)
        return logits[:, label]
