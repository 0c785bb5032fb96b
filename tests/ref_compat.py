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


def install_sae_stubs() -> None:
    """Stubs for the reference sparse_autoencoder package deps."""
    import enum

    if _missing("strenum"):
        m = _stub("strenum")

        class StrEnum(str, enum.Enum):
            __str__ = str.__str__
            __format__ = str.__format__

            @staticmethod
            def _generate_next_value_(name, start, count, last_values):
                return name.lower()

        for n in ("StrEnum", "LowercaseStrEnum", "SnakeCaseStrEnum", "UppercaseStrEnum"):
            setattr(m, n, StrEnum)
    if _missing("wandb"):
        w = _stub("wandb", run=None, log=lambda *a, **k: None)
        dt = _stub("wandb.data_types")
        for n in ("Audio", "Bokeh", "Histogram", "Html", "Image", "Molecule",
                  "Object3D", "Plotly", "Table", "Video", "WBTraceTree"):
            setattr(dt, n, type(n, (), {"__init__": lambda self, *a, **k: None}))
        w.data_types = dt
        for n in ("Histogram", "Table", "Image", "Plot"):
            setattr(w, n, getattr(dt, n, type(n, (), {"__init__": lambda self, *a, **k: None})))
        w.plot = _stub("wandb.plot", line=None, bar=None)
        w.sdk = _stub("wandb.sdk")
    if _missing("datasets"):
        _stub("datasets", Dataset=object, DatasetDict=object, IterableDataset=object,
              load_dataset=None)
    if _missing("transformer_lens"):
        tl = _stub("transformer_lens", HookedTransformer=object)
        tl.__path__ = []  # mark as package so submodule stubs resolve
        _stub("transformer_lens.hook_points", HookPoint=object)
        _stub("transformer_lens.utils", get_act_name=lambda *a, **k: "", get_device=lambda *a, **k: "cpu")
    if _missing("transformers") is False:
        pass


SAE_SRC = f"{REFERENCE_ROOT}/deps/sparse_autoencoder"


def import_reference_sae():
    install_stubs()
    install_sae_stubs()
    if SAE_SRC not in sys.path:
        sys.path.insert(0, SAE_SRC)
    import sparse_autoencoder  # noqa: F401

    return sparse_autoencoder


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
