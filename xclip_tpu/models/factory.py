"""Model factory: JSON config registry + creation + pretrained loading.

Mirrors the reference factory surface (deps/open_clip/src/open_clip/
factory.py:33-54 config scan, :180-335 create_model, :375
create_model_and_transforms) with a JAX-native result: ``create_model``
returns ``(model, params, state)`` where params/state are pytrees.
"""

from __future__ import annotations

import json
import os
import pathlib
from copy import deepcopy
from typing import Dict, Optional, Tuple

import jax

from xclip_tpu.core.precision import get_policy
from xclip_tpu.models.clip import CLIPCfg, CLIPModel, clip_cfg_from_dict

_CONFIG_DIR = pathlib.Path(__file__).parent / "configs"
_MODEL_CONFIGS: Dict[str, dict] = {}


def _rescan_model_configs() -> None:
    _MODEL_CONFIGS.clear()
    for path in sorted(_CONFIG_DIR.glob("*.json")):
        with open(path) as fh:
            cfg = json.load(fh)
        if "embed_dim" in cfg and "vision_cfg" in cfg and "text_cfg" in cfg:
            _MODEL_CONFIGS[path.stem] = cfg


_rescan_model_configs()


def list_models():
    return list(_MODEL_CONFIGS)


def get_model_config(model_name: str) -> Optional[dict]:
    cfg = _MODEL_CONFIGS.get(model_name)
    return deepcopy(cfg) if cfg is not None else None


def get_clip_cfg(
    model_name: str,
    force_quick_gelu: bool = False,
    force_image_size: Optional[int] = None,
    force_patch_dropout: Optional[float] = None,
    load_hf_weights: Optional[bool] = None,
) -> CLIPCfg:
    cfg = get_model_config(model_name)
    if cfg is None:
        raise RuntimeError(f"Model config for {model_name} not found; available: {list_models()}")
    quick_gelu = bool(cfg.pop("quick_gelu", False)) or force_quick_gelu
    # config overrides (reference create_model, factory.py:224-238)
    if force_image_size is not None:
        cfg["vision_cfg"]["image_size"] = force_image_size
    if force_patch_dropout is not None:
        cfg["vision_cfg"]["patch_dropout"] = force_patch_dropout
    if load_hf_weights is not None and "hf_model_name" in cfg["text_cfg"]:
        # reference factory.py:257: hf_model_pretrained = pretrained_hf and
        # not pretrained — a CLIP checkpoint supersedes HF-hub tower weights
        cfg["text_cfg"]["hf_model_pretrained"] = bool(load_hf_weights)
    return clip_cfg_from_dict(cfg, quick_gelu=quick_gelu)


def is_coca_model(model_name: str) -> bool:
    cfg = get_model_config(model_name)
    return cfg is not None and "multimodal_cfg" in cfg


def create_coca_model(model_name: str, pretrained: Optional[str] = None, seed: int = 0,
                      force_quick_gelu: bool = False, pretrained_hf: bool = True):
    """CoCa factory -> (CoCaModel, params). Reference checkpoints load via
    the CoCa state-dict bridge."""
    import jax as _jax

    from xclip_tpu.models.coca import CoCaModel, coca_cfg_from_dict, coca_state_dict_to_params

    cfg = get_model_config(model_name)
    if cfg is None:
        raise RuntimeError(f"Model config for {model_name} not found")
    quick_gelu = bool(cfg.pop("quick_gelu", False)) or force_quick_gelu
    if "hf_model_name" in cfg["text_cfg"]:
        # reference factory.py:257: a CLIP checkpoint supersedes HF-hub weights
        cfg["text_cfg"]["hf_model_pretrained"] = bool(pretrained_hf and not pretrained)
    model = CoCaModel(coca_cfg_from_dict(cfg, quick_gelu=quick_gelu))
    params = model.init(_jax.random.PRNGKey(seed))
    if pretrained:
        from xclip_tpu.core.checkpoint import _load_torch_state_dict

        params = coca_state_dict_to_params(_load_torch_state_dict(pretrained), model)
    return model, params


def create_model(
    model_name: str,
    pretrained: Optional[str] = None,
    precision: str = "fp32",
    force_quick_gelu: bool = False,
    force_image_size: Optional[int] = None,
    force_patch_dropout: Optional[float] = None,
    pretrained_hf: bool = True,
    seed: int = 0,
) -> Tuple[CLIPModel, Dict, Dict]:
    """Create a model. ``pretrained`` may be a path to a torch ``.pt``
    open_clip/OpenAI checkpoint or an orbax/npz checkpoint saved by this
    framework. Returns (model, params, state). CoCa configs dispatch to
    :func:`create_coca_model` (which returns (model, params)). With
    ``force_image_size``, pretrained ViT positional embeddings are resized
    to the new grid (the reference's resize_pos_embed, model.py:523-553).
    ``pretrained_hf`` mirrors the reference's --hf-model-pretrained: HF-hub
    tower weights load only when no CLIP checkpoint is given
    (factory.py:257)."""
    if is_coca_model(model_name):
        if force_image_size or force_patch_dropout:
            raise ValueError("--force-image-size/--force-patch-dropout are not "
                             "supported for CoCa configs")
        model, params = create_coca_model(
            model_name, pretrained=pretrained, seed=seed, force_quick_gelu=force_quick_gelu
        )
        policy = get_policy(precision)
        if policy.param_dtype != params["logit_scale"].dtype:
            params = jax.tree_util.tree_map(lambda p: p.astype(policy.param_dtype), params)
        return model, params, {}
    load_hf_weights = pretrained_hf and not pretrained
    model = CLIPModel(get_clip_cfg(model_name, force_quick_gelu, force_image_size,
                                   force_patch_dropout, load_hf_weights=load_hf_weights))
    params, state = model.init(jax.random.PRNGKey(seed))
    if pretrained:
        from xclip_tpu.core.checkpoint import load_checkpoint

        if not os.path.exists(pretrained) and "/" not in pretrained and "\\" not in pretrained:
            # registry tag like 'openai' (reference create_model pretrained
            # resolution, factory.py:244-269)
            from xclip_tpu.models.pretrained import download_pretrained

            pretrained = download_pretrained(model_name, pretrained)
        params, state = load_checkpoint(pretrained, model, params, state)
    policy = get_policy(precision)
    if policy.param_dtype != params["logit_scale"].dtype:
        params = jax.tree_util.tree_map(lambda p: p.astype(policy.param_dtype), params)
    return model, params, state


def create_model_and_transforms(
    model_name: str,
    pretrained: Optional[str] = None,
    precision: str = "fp32",
    force_quick_gelu: bool = False,
    force_image_size: Optional[int] = None,
    force_patch_dropout: Optional[float] = None,
    pretrained_hf: bool = True,
    seed: int = 0,
):
    """Returns (model, params, state, preprocess_train, preprocess_val).

    Transforms honor the pretrained tag's preprocess settings (SigLIP/CLIPA/
    MobileCLIP mean/std, interpolation, squash resize — reference
    factory.py:382-396 merging the _pcfg fields)."""
    from xclip_tpu.data.transforms import image_transform
    from xclip_tpu.models.pretrained import get_preprocess_cfg

    model, params, state = create_model(
        model_name, pretrained=pretrained, precision=precision,
        force_quick_gelu=force_quick_gelu, force_image_size=force_image_size,
        force_patch_dropout=force_patch_dropout, pretrained_hf=pretrained_hf,
        seed=seed,
    )
    # a tag (not a path) selects that checkpoint's preprocess settings;
    # unknown/absent tags fall back to the OpenAI-CLIP defaults
    tag = pretrained if (pretrained and not os.path.exists(pretrained)) else None
    pp = get_preprocess_cfg(model_name, tag)
    image_size = model.cfg.image_size
    kw = dict(mean=pp["mean"], std=pp["std"], resize_mode=pp["resize_mode"],
              interpolation=pp["interpolation"])
    return (
        model,
        params,
        state,
        image_transform(image_size, is_train=True, **kw),
        image_transform(image_size, is_train=False, **kw),
    )
