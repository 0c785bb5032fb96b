"""Test-only helper: import the read-only reference implementation for golden
parity checks. Stubs the reference's missing optional deps (ftfy, timm,
torchvision, webdataset) with minimal shims so that `open_clip` model modules
import on this box. Used exclusively to *verify* our independent
implementation produces identical numerics; never shipped."""

from __future__ import annotations

import importlib.machinery
import importlib.util
import sys
import types

REFERENCE_ROOT = "/root/reference"
OPEN_CLIP_SRC = f"{REFERENCE_ROOT}/deps/open_clip/src"


def _stub(name: str, **attrs) -> types.ModuleType:
    mod = sys.modules.get(name)
    if mod is None:
        mod = types.ModuleType(name)
        mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
        sys.modules[name] = mod
    for k, v in attrs.items():
        setattr(mod, k, v)
    return mod


def _missing(name: str) -> bool:
    if name in sys.modules:
        return False
    try:
        return importlib.util.find_spec(name) is None
    except (ValueError, ModuleNotFoundError):
        return False


def install_stubs() -> None:
    if _missing("ftfy"):
        _stub("ftfy", fix_text=lambda x: x)
    if _missing("torchvision"):
        import torch
        from torch import nn

        class FrozenBatchNorm2d(nn.Module):
            def __init__(self, num_features, eps=1e-5):
                super().__init__()
                self.eps = eps
                self.register_buffer("weight", torch.ones(num_features))
                self.register_buffer("bias", torch.zeros(num_features))
                self.register_buffer("running_mean", torch.zeros(num_features))
                self.register_buffer("running_var", torch.ones(num_features))

            def forward(self, x):
                scale = self.weight * (self.running_var + self.eps).rsqrt()
                bias = self.bias - self.running_mean * scale
                return x * scale[None, :, None, None] + bias[None, :, None, None]

        tv = _stub("torchvision")
        ops = _stub("torchvision.ops")
        misc = _stub("torchvision.ops.misc", FrozenBatchNorm2d=FrozenBatchNorm2d)
        transforms = _stub("torchvision.transforms")
        tv.ops = ops
        ops.misc = misc
        tv.transforms = transforms
        for cls in (
            "Normalize", "Compose", "RandomResizedCrop", "ToTensor", "Resize",
            "CenterCrop", "InterpolationMode", "ColorJitter", "Grayscale",
        ):
            setattr(transforms, cls, type(cls, (), {"BICUBIC": "bicubic", "BILINEAR": "bilinear"}))
        _stub("torchvision.transforms.v2")
        _stub("torchvision.transforms.functional", get_image_size=lambda img: img.size)
    if _missing("timm"):
        _stub("timm", create_model=None)
        sys.modules["timm.layers"] = _stub(
            "timm.layers",
            Mlp=object, to_2tuple=lambda x: (x, x) if isinstance(x, int) else x,
            RotAttentionPool2d=object, AttentionPool2d=object,
        )
        _stub("timm.models.layers", Mlp=object, to_2tuple=lambda x: x)


def import_reference_open_clip():
    install_stubs()
    if OPEN_CLIP_SRC not in sys.path:
        sys.path.insert(0, OPEN_CLIP_SRC)
    import open_clip  # noqa: F401

    return open_clip


def import_reference_module(name: str, path: str):
    """Load a single reference module file without its package __init__."""
    install_stubs()
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod
