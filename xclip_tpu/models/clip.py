"""CLIP model bundle: vision tower + text tower + logit scale.

Functional equivalent of open_clip's CLIP module (reference behaviour:
deps/open_clip/src/open_clip/model.py:220-315). A :class:`CLIPModel` holds
only configuration; parameters/state are explicit pytrees so the same object
drives training (pjit), evaluation, SAE feature caching and circuits.

Param pytree layout::

    {"visual": <resnet|vit params>,
     "text":   <text transformer params>,
     "logit_scale": f32 scalar}
    state = {"visual": <batchnorm running stats>}  (empty for ViT towers)
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp

from xclip_tpu.models import resnet as R
from xclip_tpu.models import transformer as T

LOG_LOGIT_SCALE_MAX = math.log(100.0)


@dataclasses.dataclass(frozen=True)
class CLIPCfg:
    embed_dim: int
    vision: Union[R.ResNetCfg, T.VisionTransformerCfg]
    text: T.TextTransformerCfg
    init_logit_scale: float = math.log(1 / 0.07)
    # SigLIP-style bias; None = plain CLIP (reference model.py:250-254)
    init_logit_bias: Optional[float] = None
    # reference CustomTextCLIP (model.py:318): the text tower is a submodule,
    # so torch checkpoints carry "text."-prefixed keys
    custom_text: bool = False

    @property
    def is_resnet(self) -> bool:
        return isinstance(self.vision, R.ResNetCfg)

    @property
    def is_convnext(self) -> bool:
        from xclip_tpu.models.convnext import ConvNeXtCfg

        return isinstance(self.vision, ConvNeXtCfg)

    @property
    def is_timm_vit(self) -> bool:
        from xclip_tpu.models.timm_vit import TimmViTCfg

        return isinstance(self.vision, TimmViTCfg)

    @property
    def is_eva(self) -> bool:
        from xclip_tpu.models.eva import EvaCfg

        return isinstance(self.vision, EvaCfg)

    @property
    def is_native_timm(self) -> bool:
        """Any of the native timm-tower families (models/native_timm.py)."""
        from xclip_tpu.models import native_timm

        return native_timm.is_native_timm(self.vision)

    @property
    def image_size(self) -> int:
        return self.vision.image_size

    @property
    def is_hf_text(self) -> bool:
        return getattr(self.text, "is_hf", False)

    @property
    def context_length(self) -> int:
        # both TextTransformerCfg and HFTextCfg carry context_length; for HF
        # towers it is the 77-token padding length (reference factory.py:110),
        # not the HF model's max_position_embeddings
        return self.text.context_length


def clip_cfg_from_dict(d: dict, quick_gelu: bool = False) -> CLIPCfg:
    """Build a CLIPCfg from an open_clip-style JSON model config dict."""
    embed_dim = d["embed_dim"]
    init_logit_bias = d.get("init_logit_bias")
    v = dict(d["vision_cfg"])
    t = dict(d["text_cfg"])
    act = "quick_gelu" if quick_gelu else "gelu"
    if "timm_model_name" in v:
        # timm towers: native JAX implementations only (timm absent from
        # this image) — dispatched per-family through models/native_timm.py
        # (convnext, timm-ViT/SigLIP, EVA01/02, swin, ...)
        from xclip_tpu.models import native_timm

        vision = native_timm.cfg_from_vision_dict(v, embed_dim)
    elif isinstance(v.get("layers"), (list, tuple)):
        head_width = v.get("head_width", 64)
        vision = R.ResNetCfg(
            layers=tuple(v["layers"]),
            width=v.get("width", 64),
            output_dim=embed_dim,
            heads=v.get("width", 64) * 32 // head_width,
            image_size=v.get("image_size", 224),
        )
    else:
        head_width = v.get("head_width", 64)
        vision = T.VisionTransformerCfg(
            image_size=v.get("image_size", 224),
            patch_size=v["patch_size"],
            width=v["width"],
            layers=v["layers"],
            heads=v["width"] // head_width,
            mlp_ratio=v.get("mlp_ratio", 4.0),
            output_dim=embed_dim,
            act=act,
            patch_dropout=v.get("patch_dropout", 0.0),
            attentional_pool=bool(v.get("attentional_pool", False)),
            attn_pooler_queries=v.get("attn_pooler_queries", 256),
            attn_pooler_heads=v.get("attn_pooler_heads", 8),
            pool_type=v.get("pool_type", "tok"),
            final_ln_after_pool=bool(v.get("final_ln_after_pool", False)),
            no_ln_pre=bool(v.get("no_ln_pre", False)),
            ls_init_value=v.get("ls_init_value"),
            pos_embed_type=v.get("pos_embed_type", "learnable"),
        )
    if "hf_model_name" in t:
        from xclip_tpu.models.hf_text import hf_text_cfg_from_dict

        text = hf_text_cfg_from_dict(t, embed_dim)
        kwargs = {}
        if "init_logit_scale" in d:
            kwargs["init_logit_scale"] = float(d["init_logit_scale"])
        return CLIPCfg(embed_dim=embed_dim, vision=vision, text=text,
                       init_logit_bias=init_logit_bias, **kwargs)
    text = T.TextTransformerCfg(
        context_length=t.get("context_length", 77),
        vocab_size=t.get("vocab_size", 49408),
        width=t.get("width", 512),
        heads=t.get("heads", 8),
        layers=t.get("layers", 12),
        mlp_ratio=t.get("mlp_ratio", 4.0),
        output_dim=embed_dim,
        act=act,
        no_causal_mask=t.get("no_causal_mask", False),
        pool_type=t.get("pool_type", "argmax"),
        ls_init_value=t.get("ls_init_value"),
        proj_bias=t.get("proj_bias", False),
        norm_eps=(t.get("norm_kwargs") or {}).get("eps", 1e-5),
    )
    kwargs = {}
    if "init_logit_scale" in d:
        kwargs["init_logit_scale"] = float(d["init_logit_scale"])
    return CLIPCfg(embed_dim=embed_dim, vision=vision, text=text,
                   init_logit_bias=init_logit_bias,
                   custom_text=bool(d.get("custom_text", False)), **kwargs)


import functools


@functools.lru_cache(maxsize=8)
def _hf_tower(text_cfg):
    """Cached HFTextTower per HFTextCfg (flax module construction is
    expensive; the cfg is a frozen hashable dataclass)."""
    from xclip_tpu.models.hf_text import HFTextTower

    return HFTextTower(text_cfg)


def _l2_normalize(x, axis=-1, eps: float = 1e-12):
    x = x.astype(jnp.float32)
    norm = jnp.sqrt(jnp.sum(x * x, axis=axis, keepdims=True))
    return x / jnp.maximum(norm, eps)


@dataclasses.dataclass(frozen=True)
class CLIPModel:
    cfg: CLIPCfg

    # -- init ---------------------------------------------------------------
    def init(self, rng) -> Tuple[Dict, Dict]:
        kv, kt = jax.random.split(rng)
        if self.cfg.is_resnet:
            vparams, vstate = R.resnet_init(kv, self.cfg.vision)
        elif self.cfg.is_native_timm:
            from xclip_tpu.models import native_timm

            vparams, vstate = native_timm.init(kv, self.cfg.vision)
        else:
            vparams, vstate = T.vit_init(kv, self.cfg.vision), {}
        if self.cfg.is_hf_text:
            text_params = _hf_tower(self.cfg.text).init(kt)
        else:
            text_params = T.text_init(kt, self.cfg.text)
        params = {
            "visual": vparams,
            "text": text_params,
            "logit_scale": jnp.asarray(self.cfg.init_logit_scale, jnp.float32),
        }
        if self.cfg.init_logit_bias is not None:
            params["logit_bias"] = jnp.asarray(self.cfg.init_logit_bias, jnp.float32)
        return params, {"visual": vstate}

    # -- towers ---------------------------------------------------------------
    def encode_image(
        self,
        params,
        x,
        *,
        state: Optional[Dict] = None,
        normalize: bool = False,
        train: bool = False,
        dtype=None,
        capture: Optional[Sequence[str]] = None,
        remat: bool = False,
        rng: Optional[jax.Array] = None,
    ):
        """Returns (features, new_state, intermediates)."""
        state = state if state is not None else {"visual": {}}
        if self.cfg.is_resnet:
            feats, vstate, inters = R.resnet_apply(
                params["visual"], state["visual"], x, self.cfg.vision,
                train=train, dtype=dtype, capture=capture, remat=remat,
            )
        elif self.cfg.is_native_timm:
            from xclip_tpu.models import native_timm

            feats, vstate, inters = native_timm.apply(
                params["visual"], state["visual"], x, self.cfg.vision,
                dtype=dtype, capture=capture, remat=remat, train=train, rng=rng,
            )
        else:
            feats, inters = T.vit_apply(
                params["visual"], x, self.cfg.vision, dtype=dtype, capture=capture,
                remat=remat, train=train, rng=rng,
            )
            vstate = state["visual"]
        if normalize:
            feats = _l2_normalize(feats)
        return feats, {"visual": vstate}, inters

    def encode_text(
        self,
        params,
        text_ids,
        *,
        normalize: bool = False,
        dtype=None,
        capture: Optional[Sequence[str]] = None,
        remat: bool = False,
    ):
        if self.cfg.is_hf_text:
            feats = _hf_tower(self.cfg.text).apply(params["text"], text_ids, dtype=dtype)
            inters = {}
        else:
            feats, inters = T.text_apply(
                params["text"], text_ids, self.cfg.text, dtype=dtype, capture=capture, remat=remat
            )
        if normalize:
            feats = _l2_normalize(feats)
        return feats, inters

    # -- joint forward --------------------------------------------------------
    def forward(
        self,
        params,
        images,
        text_ids,
        *,
        state: Optional[Dict] = None,
        train: bool = False,
        dtype=None,
        remat: bool = False,
        rng: Optional[jax.Array] = None,
    ) -> Dict:
        """Contrastive forward -> dict(image_features, text_features,
        logit_scale, state); features are L2-normalized fp32. ``rng`` drives
        patch dropout in ViT towers during training."""
        img, new_state, _ = self.encode_image(
            params, images, state=state, normalize=True, train=train, dtype=dtype, remat=remat,
            rng=rng,
        )
        txt, _ = self.encode_text(params, text_ids, normalize=True, dtype=dtype, remat=remat)
        out = {
            "image_features": img,
            "text_features": txt,
            "logit_scale": jnp.exp(params["logit_scale"]),
            "state": new_state,
        }
        if "logit_bias" in params:
            out["logit_bias"] = params["logit_bias"]
        return out

    def get_logits(self, params, images, text_ids, *, state: Optional[Dict] = None):
        out = self.forward(params, images, text_ids, state=state)
        logits_per_image = out["logit_scale"] * out["image_features"] @ out["text_features"].T
        return logits_per_image, logits_per_image.T

    # -- misc -----------------------------------------------------------------
    def clamp_logit_scale(self, params):
        """In-place-equivalent clamp of log-logit-scale to ln(100)
        (reference: training/train.py:190-191)."""
        params = dict(params)
        params["logit_scale"] = jnp.clip(params["logit_scale"], 0.0, LOG_LOGIT_SCALE_MAX)
        return params

    def visual_stage_names(self):
        if self.cfg.is_resnet:
            return R.resnet_stage_names(self.cfg.vision)
        if self.cfg.is_native_timm:
            from xclip_tpu.models import native_timm

            return native_timm.stage_names(self.cfg.vision)
        return T.vit_stage_names(self.cfg.vision)
