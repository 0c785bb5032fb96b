"""HuggingFace text towers for CLIP — the JAX equivalent of the reference's
hf_model.py (deps/open_clip/src/open_clip/hf_model.py:1-193).

The reference wraps torch ``AutoModel``; here the tower is a
``FlaxAutoModel`` whose parameters live inside the CLIP param pytree like
any other leaf (so the pjit/shard_map train step, AdamW masking and
checkpointing all work unchanged). Poolers and the linear/mlp projection
mirror the reference exactly (hf_model.py:44-95,140-152).

Offline behaviour (this box has no egress): configs for the reference's
roberta/xlm-roberta families are bundled, so ``hf_model_pretrained=false``
towers build with random init anywhere; pretrained weights load from a
LOCAL HF directory path (torch checkpoints are converted by transformers'
own from_pt path). Encoder-decoder archs: mt5/t5 use the flax encoder-only
classes; m2m_100 (nllb) uses the native JAX encoder in models/m2m100.py.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

# reference arch_dict defaults (hf_configs.py): default pooler per arch
_DEFAULT_POOLER = {
    "roberta": "mean_pooler",
    "xlm-roberta": "mean_pooler",
    "mt5": "mean_pooler",
    "bert": "cls_pooler",
    "m2m_100": "cls_pooler",
}

# public architecture configs for the HF models the reference's
# model_configs reference, so config-only towers build with zero egress
_BUNDLED_CONFIGS = {
    "roberta-base": dict(
        model_type="roberta", vocab_size=50265, hidden_size=768,
        num_hidden_layers=12, num_attention_heads=12, intermediate_size=3072,
        max_position_embeddings=514, type_vocab_size=1, layer_norm_eps=1e-5,
        pad_token_id=1, bos_token_id=0, eos_token_id=2,
    ),
    "xlm-roberta-base": dict(
        model_type="xlm-roberta", vocab_size=250002, hidden_size=768,
        num_hidden_layers=12, num_attention_heads=12, intermediate_size=3072,
        max_position_embeddings=514, type_vocab_size=1, layer_norm_eps=1e-5,
        pad_token_id=1, bos_token_id=0, eos_token_id=2,
    ),
    "xlm-roberta-large": dict(
        model_type="xlm-roberta", vocab_size=250002, hidden_size=1024,
        num_hidden_layers=24, num_attention_heads=16, intermediate_size=4096,
        max_position_embeddings=514, type_vocab_size=1, layer_norm_eps=1e-5,
        pad_token_id=1, bos_token_id=0, eos_token_id=2,
    ),
    "google/mt5-base": dict(
        model_type="mt5", vocab_size=250112, d_model=768, d_kv=64, d_ff=2048,
        num_layers=12, num_heads=12, feed_forward_proj="gated-gelu",
        pad_token_id=0, eos_token_id=1, decoder_start_token_id=0,
        tie_word_embeddings=False,
    ),
    "google/mt5-xl": dict(
        model_type="mt5", vocab_size=250112, d_model=2048, d_kv=64, d_ff=5120,
        num_layers=24, num_heads=32, feed_forward_proj="gated-gelu",
        pad_token_id=0, eos_token_id=1, decoder_start_token_id=0,
        tie_word_embeddings=False,
    ),
    # nllb text towers (reference nllb-clip-base/-large configs). Hyperparams
    # reconstructed from the published parameter counts (zero-egress box —
    # can't fetch the hub config); a local HF directory path overrides these.
    "facebook/nllb-200-distilled-600M": dict(
        model_type="m2m_100", vocab_size=256206, d_model=1024,
        encoder_layers=12, decoder_layers=12, encoder_attention_heads=16,
        decoder_attention_heads=16, encoder_ffn_dim=4096, decoder_ffn_dim=4096,
        max_position_embeddings=1024, scale_embedding=True,
        activation_function="relu", pad_token_id=1, bos_token_id=0,
        eos_token_id=2, decoder_start_token_id=2,
    ),
    "facebook/nllb-200-distilled-1.3B": dict(
        model_type="m2m_100", vocab_size=256206, d_model=1024,
        encoder_layers=24, decoder_layers=24, encoder_attention_heads=16,
        decoder_attention_heads=16, encoder_ffn_dim=8192, decoder_ffn_dim=8192,
        max_position_embeddings=1024, scale_embedding=True,
        activation_function="relu", pad_token_id=1, bos_token_id=0,
        eos_token_id=2, decoder_start_token_id=2,
    ),
}


@dataclasses.dataclass(frozen=True)
class HFTextCfg:
    """Text-tower config for hf_model_name text_cfgs (reference
    CLIPTextCfg.hf_* fields, model.py:58-85)."""

    hf_model_name: str
    output_dim: int
    hf_model_pretrained: bool = True
    pooler_type: Optional[str] = None
    proj_type: Optional[str] = "mlp"  # reference hf_proj_type default
    hf_config_json: Optional[str] = None  # explicit config dict (offline)
    # tokenizer/eval padding length — the reference pads HF-tower batches to
    # text_cfg context_length (default 77, factory.py:110-111), NOT to the HF
    # model's max_position_embeddings (514 for roberta) — see
    # HFTextTower.max_positions for the latter.
    context_length: int = 77

    @property
    def is_hf(self) -> bool:  # cheap discriminator for CLIPModel dispatch
        return True


def _resolve_config(cfg: HFTextCfg):
    import os

    from transformers import AutoConfig

    if cfg.hf_config_json:
        return AutoConfig.for_model(**json.loads(cfg.hf_config_json))
    if os.path.isdir(cfg.hf_model_name):
        return AutoConfig.from_pretrained(cfg.hf_model_name)
    if cfg.hf_model_name in _BUNDLED_CONFIGS:
        return AutoConfig.for_model(**_BUNDLED_CONFIGS[cfg.hf_model_name])
    # last resort: hub lookup (fails fast on zero-egress boxes)
    return AutoConfig.from_pretrained(cfg.hf_model_name)


class HFTextTower:
    """Functional facade over a FlaxAutoModel + pooler + projection."""

    def __init__(self, cfg: HFTextCfg):
        import os
        import warnings

        self.cfg = cfg
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            from transformers import FlaxAutoModel

            config = _resolve_config(cfg)
            self.config = config
            self.pooler_type = cfg.pooler_type or _DEFAULT_POOLER.get(
                config.model_type, "cls_pooler"
            )
            # encoder-decoder archs: use the encoder-only flax class (the
            # reference takes model.encoder, hf_model.py:124-127); m2m_100
            # (nllb) has no flax class at all -> native JAX encoder
            # (models/m2m100.py)
            self._flax = None
            self._native_cfg = None
            self._native_pretrained_dir = None
            if config.model_type == "m2m_100":
                from xclip_tpu.models.m2m100 import cfg_from_hf_config

                self._native_cfg = cfg_from_hf_config(config)
                if cfg.hf_model_pretrained:
                    if os.path.isdir(cfg.hf_model_name):
                        self._native_pretrained_dir = cfg.hf_model_name
                    else:
                        raise RuntimeError(
                            f"pretrained weights for {cfg.hf_model_name!r} are "
                            "not available offline — pass a local HF directory "
                            "path as hf_model_name, or set hf_model_pretrained=false"
                        )
            else:
                if config.model_type in ("mt5", "t5"):
                    if config.model_type == "mt5":
                        from transformers import FlaxMT5EncoderModel as _Cls
                    else:
                        from transformers import FlaxT5EncoderModel as _Cls
                    kw = {}
                elif getattr(config, "is_encoder_decoder", False):
                    raise NotImplementedError(
                        f"encoder-decoder HF arch {config.model_type!r} has no "
                        "flax encoder-only class"
                    )
                else:
                    _Cls = FlaxAutoModel
                    kw = {"add_pooling_layer": self.pooler_type == "cls_pooler"}
                if cfg.hf_model_pretrained and os.path.isdir(cfg.hf_model_name):
                    self._flax = _Cls.from_pretrained(cfg.hf_model_name, from_pt=None, **kw)
                elif cfg.hf_model_pretrained and cfg.hf_model_name not in _BUNDLED_CONFIGS:
                    self._flax = _Cls.from_pretrained(cfg.hf_model_name, **kw)
                else:
                    if cfg.hf_model_pretrained:
                        raise RuntimeError(
                            f"pretrained weights for {cfg.hf_model_name!r} are not "
                            "available offline — pass a local HF directory path as "
                            "hf_model_name, or set hf_model_pretrained=false"
                        )
                    if hasattr(_Cls, "from_config"):  # Auto classes only
                        self._flax = _Cls.from_config(config, **kw)
                    else:
                        # concrete Flax classes (FlaxT5EncoderModel etc.)
                        # construct directly from the config
                        self._flax = _Cls(config, **kw)
        self.width = getattr(config, "hidden_size", None) or getattr(config, "d_model", None)
        self.vocab_size = getattr(config, "vocab_size", 0)
        # model capacity; batches are padded to cfg.context_length (77), not this
        self.max_positions = getattr(config, "max_position_embeddings", 0)
        self.context_length = cfg.context_length

    # -- params --------------------------------------------------------------
    def init(self, rng) -> Dict:
        from xclip_tpu.models import layers as L

        if self._native_cfg is not None:
            from xclip_tpu.models.m2m100 import (
                load_encoder_from_local_dir,
                m2m100_encoder_init,
            )

            hf_params = None
            if self._native_pretrained_dir is not None:
                hf_params = load_encoder_from_local_dir(
                    self._native_pretrained_dir, self._native_cfg)
            if hf_params is None:
                hf_params = m2m100_encoder_init(rng, self._native_cfg)
            params: Dict = {"hf": hf_params}
        else:
            params = {"hf": jax.tree_util.tree_map(jnp.asarray, dict(self._flax.params))}
        d, out = self.width, self.cfg.output_dim
        if self.cfg.proj_type is None and d == out:
            pass  # identity
        elif self.cfg.proj_type == "linear" or (self.cfg.proj_type is None and d != out):
            params["proj"] = {"linear": L.linear_init(rng, d, out, bias=False)}
        elif self.cfg.proj_type == "mlp":
            hidden = (d + out) // 2
            k1, k2 = jax.random.split(rng)
            params["proj"] = {
                "fc1": L.linear_init(k1, d, hidden, bias=False),
                "fc2": L.linear_init(k2, hidden, out, bias=False),
            }
        else:
            raise ValueError(f"unknown proj_type {self.cfg.proj_type!r}")
        return params

    # -- forward -------------------------------------------------------------
    def apply(self, params, text_ids, *, dtype=None) -> jnp.ndarray:
        projected, _ = self.apply_with_tokens(params, text_ids, dtype=dtype)
        return projected

    def apply_with_tokens(self, params, text_ids, *, dtype=None):
        """-> (projected pooled (B, out), token hiddens (B, L', width)).

        Token semantics follow the reference forward (hf_model.py:155-169):
        the cls position is dropped from the token stream only for the
        cls_pooler; mean/max/cls_last poolers pass the full sequence."""
        from xclip_tpu.models import layers as L

        del dtype  # HF tower computes in its own dtype (fp32)
        ids = jnp.asarray(text_ids)
        mask = (ids != self.config.pad_token_id).astype(jnp.int32)
        if self._native_cfg is not None:
            from xclip_tpu.models.m2m100 import m2m100_encoder_apply

            last_hidden = m2m100_encoder_apply(params["hf"], ids, self._native_cfg)
            pooler_output = None
        else:
            out = self._flax(input_ids=ids, attention_mask=mask, params=dict(params["hf"]))
            last_hidden = out.last_hidden_state
            pooler_output = getattr(out, "pooler_output", None)

        if self.pooler_type == "mean_pooler":
            m = mask[..., None].astype(last_hidden.dtype)
            pooled = (last_hidden * m).sum(axis=1) / m.sum(axis=1)
        elif self.pooler_type == "max_pooler":
            neg = jnp.where(mask[..., None] == 0, -jnp.inf, 0.0)
            pooled = (last_hidden + neg).max(axis=1)
        elif self.pooler_type == "cls_pooler":
            pooled = pooler_output if pooler_output is not None else last_hidden[:, 0]
        elif self.pooler_type == "cls_last_hidden_state_pooler":
            pooled = last_hidden[:, 0]
        else:
            raise ValueError(f"unknown pooler {self.pooler_type!r}")

        tokens = (last_hidden[:, 1:]
                  if self.pooler_type == "cls_pooler" else last_hidden)

        if "proj" not in params:
            return pooled, tokens
        p = params["proj"]
        if "linear" in p:
            return L.linear_apply(p["linear"], pooled), tokens
        h = L.linear_apply(p["fc1"], pooled)
        h = L.gelu(h)
        return L.linear_apply(p["fc2"], h), tokens


def _torch_shell(tower: "HFTextTower"):
    """Matching torch module for conversion (same config/class family)."""
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        if tower.config.model_type in ("mt5", "t5"):
            from transformers import MT5EncoderModel, T5EncoderModel

            cls = MT5EncoderModel if tower.config.model_type == "mt5" else T5EncoderModel
            return cls(tower.config)
        from transformers import AutoModel

        return AutoModel.from_config(
            tower.config, add_pooling_layer=tower.pooler_type == "cls_pooler"
        )


def hf_text_params_to_state_dict(tower: HFTextTower, params: Dict) -> Dict[str, np.ndarray]:
    """Our params -> the reference CustomTextCLIP text-tower state dict
    ("text.transformer.*" torch naming via transformers' flax->torch
    conversion, or the native m2m100 bridge; "text.proj[.N].weight" for the
    projection, hf_model.py:140-152)."""
    if tower._native_cfg is not None:
        from xclip_tpu.models.m2m100 import m2m100_params_to_torch_sd

        sd = {f"text.transformer.{k}": v
              for k, v in m2m100_params_to_torch_sd(params["hf"]).items()}
    else:
        from transformers.modeling_flax_pytorch_utils import (
            load_flax_weights_in_pytorch_model,
        )

        tm = _torch_shell(tower)
        load_flax_weights_in_pytorch_model(tm, dict(params["hf"]))
        sd = {f"text.transformer.{k}": v.detach().numpy() for k, v in tm.state_dict().items()}
    if "proj" in params:
        p = params["proj"]
        if "linear" in p:
            sd["text.proj.weight"] = np.asarray(p["linear"]["kernel"]).T
        else:
            sd["text.proj.0.weight"] = np.asarray(p["fc1"]["kernel"]).T
            sd["text.proj.2.weight"] = np.asarray(p["fc2"]["kernel"]).T
    return sd


def hf_text_state_dict_to_params(tower: HFTextTower, sd: Dict[str, np.ndarray]) -> Dict:
    """Inverse: a reference CustomTextCLIP "text.*" state dict -> our param
    pytree (torch->flax via transformers' converter, or the native m2m100
    bridge)."""
    prefix = "text.transformer."
    if tower._native_cfg is not None:
        from xclip_tpu.models.m2m100 import m2m100_torch_sd_to_params

        enc_sd = {k[len(prefix):]: np.asarray(v)
                  for k, v in sd.items() if k.startswith(prefix)}
        params: Dict = {"hf": m2m100_torch_sd_to_params(enc_sd, tower._native_cfg)}
    else:
        import torch
        from transformers.modeling_flax_pytorch_utils import (
            convert_pytorch_state_dict_to_flax,
        )

        pt_sd = {k[len(prefix):]: torch.as_tensor(np.ascontiguousarray(v))
                 for k, v in sd.items() if k.startswith(prefix)}
        flax_params = convert_pytorch_state_dict_to_flax(pt_sd, tower._flax)
        flax_params = jax.tree_util.tree_map(jnp.asarray, dict(flax_params))
        params = {"hf": flax_params}
    if "text.proj.weight" in sd:
        params["proj"] = {"linear": {"kernel": jnp.asarray(np.asarray(sd["text.proj.weight"]).T)}}
    elif "text.proj.0.weight" in sd:
        params["proj"] = {
            "fc1": {"kernel": jnp.asarray(np.asarray(sd["text.proj.0.weight"]).T)},
            "fc2": {"kernel": jnp.asarray(np.asarray(sd["text.proj.2.weight"]).T)},
        }
    return params


def hf_text_cfg_from_dict(t: dict, embed_dim: int) -> HFTextCfg:
    """text_cfg dict with hf_model_name -> HFTextCfg (reference
    _build_text_tower, model.py:375-392)."""
    return HFTextCfg(
        hf_model_name=t["hf_model_name"],
        output_dim=embed_dim,
        hf_model_pretrained=bool(t.get("hf_model_pretrained", True)),
        pooler_type=t.get("hf_pooler_type"),
        proj_type=t.get("hf_proj_type", "mlp"),
        hf_config_json=json.dumps(t["hf_model_config"]) if t.get("hf_model_config") else None,
        context_length=int(t.get("context_length", 77)),
    )
