"""Dispatch registry for the native JAX timm-tower families.

The reference routes every ``vision_cfg.timm_model_name`` through timm
(deps/open_clip/src/open_clip/timm_model.py); timm is absent from this
image, so each family is a from-scratch functional implementation. Every
family module exposes the same uniform surface under its ``<prefix>_``
namespace::

    VARIANTS                      # timm_model_name -> variant kwargs
    <p>Cfg                        # frozen dataclass, CLIPModel-facing shims
    <p>_cfg_from_vision_dict(v, embed_dim)
    <p>_init(rng, cfg)            # stateless towers: params only
    <p>_apply(params, x, cfg, *, dtype, capture, remat, train, rng)
    <p>_stage_names(cfg)
    <p>_params_to_state_dict(params, cfg)   # open_clip TimmModel naming
    <p>_state_dict_to_params(sd, cfg)

Stateful families (BatchNorm towers — MobileCLIP) set a module-level
``HAS_STATE = True`` and instead expose::

    <p>_init(rng, cfg) -> (params, state)
    <p>_apply(params, state, x, cfg, *, train, ...) -> (feats, state, inters)
    <p>_pytrees_to_state_dict(params, state, cfg)
    <p>_state_dict_to_pytrees(sd, cfg) -> (params, state)

The registry's init/apply/pytrees_to_state_dict/state_dict_to_pytrees
wrappers present ONE uniform stateful-shaped interface for all families.

This module is the single place that knows the family list; CLIPModel and
the checkpoint bridge dispatch through it instead of growing per-family
elif chains.
"""

from __future__ import annotations

import functools
from typing import Optional


@functools.lru_cache(maxsize=1)
def _families():
    """[(CfgClass, module, fn_prefix), ...] — lazy to avoid import cycles."""
    from xclip_tpu.models import (convnext, eva, fastvit, mci_vit, swin,
                                  timm_vit, vitamin)

    return (
        (convnext.ConvNeXtCfg, convnext, "convnext"),
        (timm_vit.TimmViTCfg, timm_vit, "timm_vit"),
        (eva.EvaCfg, eva, "eva"),
        (swin.SwinCfg, swin, "swin"),
        (vitamin.ViTaminCfg, vitamin, "vitamin"),
        (mci_vit.MciViTCfg, mci_vit, "mci_vit"),
        (fastvit.FastViTCfg, fastvit, "fastvit"),
    )


def _entry_of(vision_cfg):
    for cls, mod, prefix in _families():
        if isinstance(vision_cfg, cls):
            return mod, prefix
    return None


def is_native_timm(vision_cfg) -> bool:
    return _entry_of(vision_cfg) is not None


def cfg_from_vision_dict(v: dict, embed_dim: int):
    """Route a timm vision_cfg to the family owning its timm_model_name."""
    name = v["timm_model_name"]
    for _, mod, prefix in _families():
        if name in mod.VARIANTS:
            return getattr(mod, f"{prefix}_cfg_from_vision_dict")(v, embed_dim)
    known = sorted(n for _, mod, _ in _families() for n in mod.VARIANTS)
    raise NotImplementedError(
        f"timm tower {name!r} is not natively implemented (timm is absent "
        f"from this environment); native variants: {known}"
    )


def _entry(vision_cfg):
    entry = _entry_of(vision_cfg)
    if entry is None:
        raise TypeError(f"not a native timm tower cfg: {type(vision_cfg)!r}")
    return entry


def _fn(vision_cfg, suffix: str):
    mod, prefix = _entry(vision_cfg)
    return getattr(mod, f"{prefix}_{suffix}")


def has_state(vision_cfg) -> bool:
    """True for towers with BatchNorm running statistics (MobileCLIP)."""
    mod, _ = _entry(vision_cfg)
    return getattr(mod, "HAS_STATE", False)


def init(rng, vision_cfg):
    """-> (params, state); state is {} for the stateless (LN-only) families."""
    out = _fn(vision_cfg, "init")(rng, vision_cfg)
    return out if has_state(vision_cfg) else (out, {})


def apply(params, state, x, vision_cfg, *, train=False, **kw):
    """-> (features, new_state, intermediates)."""
    if has_state(vision_cfg):
        return _fn(vision_cfg, "apply")(params, state, x, vision_cfg,
                                        train=train, **kw)
    feats, inters = _fn(vision_cfg, "apply")(params, x, vision_cfg,
                                             train=train, **kw)
    return feats, state, inters


def stage_names(vision_cfg):
    return _fn(vision_cfg, "stage_names")(vision_cfg)


def pytrees_to_state_dict(params, state, vision_cfg):
    if has_state(vision_cfg):
        return _fn(vision_cfg, "pytrees_to_state_dict")(params, state, vision_cfg)
    return _fn(vision_cfg, "params_to_state_dict")(params, vision_cfg)


def state_dict_to_pytrees(sd, vision_cfg):
    """-> (params, state); state is {} for the stateless families."""
    if has_state(vision_cfg):
        return _fn(vision_cfg, "state_dict_to_pytrees")(sd, vision_cfg)
    return _fn(vision_cfg, "state_dict_to_params")(sd, vision_cfg), {}
