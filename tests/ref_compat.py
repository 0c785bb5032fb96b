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

        # Functional minimal re-implementations of the torchvision pieces the
        # reference eval path uses (PIL-backed, matching torchvision's own
        # PIL dispatch bit-for-bit) so reference scripts can actually *run*
        # here for cross-stack protocol parity, not just import.
        import os as _os

        from PIL import Image as _Image

        class InterpolationMode:
            BICUBIC = _Image.BICUBIC
            BILINEAR = _Image.BILINEAR
            NEAREST = _Image.NEAREST

        def _interp(mode):
            return mode if isinstance(mode, int) else {"bicubic": _Image.BICUBIC,
                                                       "bilinear": _Image.BILINEAR}[str(mode)]

        class Compose:
            def __init__(self, transforms):
                self.transforms = list(transforms)

            def __call__(self, img):
                for t in self.transforms:
                    img = t(img)
                return img

        class Resize:
            def __init__(self, size, interpolation=InterpolationMode.BILINEAR, **kw):
                self.size = size
                self.interpolation = _interp(interpolation)

            def __call__(self, img):
                if isinstance(self.size, (tuple, list)):
                    h, w = self.size
                    return img.resize((w, h), self.interpolation)
                w, h = img.size  # int size: resize shortest edge, keep ratio
                short, long = (w, h) if w <= h else (h, w)
                if short == self.size:
                    return img
                new_short = self.size
                new_long = int(round(self.size * long / short))
                nw, nh = (new_short, new_long) if w <= h else (new_long, new_short)
                return img.resize((nw, nh), self.interpolation)

        class CenterCrop:
            def __init__(self, size):
                self.size = (size, size) if isinstance(size, int) else tuple(size)

            def __call__(self, img):
                th, tw = self.size
                w, h = img.size
                if w < tw or h < th:  # torchvision zero-pads short sides
                    padded = _Image.new(img.mode, (max(w, tw), max(h, th)))
                    padded.paste(img, ((max(w, tw) - w) // 2, (max(h, th) - h) // 2))
                    img, (w, h) = padded, padded.size
                left = int(round((w - tw) / 2.0))
                top = int(round((h - th) / 2.0))
                return img.crop((left, top, left + tw, top + th))

        class ToTensor:
            def __call__(self, img):
                import numpy as _np
                arr = _np.asarray(img, dtype=_np.uint8)
                if arr.ndim == 2:
                    arr = arr[:, :, None]
                t = torch.from_numpy(arr.copy()).permute(2, 0, 1).contiguous()
                return t.to(torch.float32).div(255.0)

        class Normalize:
            def __init__(self, mean, std, **kw):
                self.mean = torch.tensor(mean).view(-1, 1, 1)
                self.std = torch.tensor(std).view(-1, 1, 1)

            def __call__(self, t):
                return (t - self.mean) / self.std

        class RandomResizedCrop:
            # constructible for import-time; eval path never calls it
            def __init__(self, *a, **kw):
                pass

            def __call__(self, img):
                raise NotImplementedError("train-path transform not stubbed")

        class ColorJitter(RandomResizedCrop):
            pass

        class Grayscale(RandomResizedCrop):
            pass

        tv = _stub("torchvision")
        ops = _stub("torchvision.ops")
        misc = _stub("torchvision.ops.misc", FrozenBatchNorm2d=FrozenBatchNorm2d)
        transforms = _stub(
            "torchvision.transforms",
            Normalize=Normalize, Compose=Compose, RandomResizedCrop=RandomResizedCrop,
            ToTensor=ToTensor, Resize=Resize, CenterCrop=CenterCrop,
            InterpolationMode=InterpolationMode, ColorJitter=ColorJitter, Grayscale=Grayscale,
        )
        tv.ops = ops
        ops.misc = misc
        tv.transforms = transforms
        _stub("torchvision.transforms.v2")
        _stub("torchvision.transforms.functional", get_image_size=lambda img: img.size)

        class ImageFolder(torch.utils.data.Dataset):
            """Minimal torchvision ImageFolder: sorted class dirs -> indices,
            sorted files, PIL RGB loader."""

            def __init__(self, root, transform=None, target_transform=None, **kw):
                self.root = root
                self.transform = transform
                self.target_transform = target_transform
                self.classes = sorted(
                    d for d in _os.listdir(root) if _os.path.isdir(_os.path.join(root, d))
                )
                self.class_to_idx = {c: i for i, c in enumerate(self.classes)}
                self.samples = []
                for c in self.classes:
                    cdir = _os.path.join(root, c)
                    for f in sorted(_os.listdir(cdir)):
                        self.samples.append((_os.path.join(cdir, f), self.class_to_idx[c]))
                self.imgs = self.samples

            def __len__(self):
                return len(self.samples)

            def __getitem__(self, idx):
                path, target = self.samples[idx]
                with _Image.open(path) as img:
                    sample = img.convert("RGB")
                if self.transform is not None:
                    sample = self.transform(sample)
                if self.target_transform is not None:
                    target = self.target_transform(target)
                return sample, target

        datasets_mod = _stub("torchvision.datasets", ImageFolder=ImageFolder)
        _stub("torchvision.datasets.folder", ImageFolder=ImageFolder,
              default_loader=lambda p: _Image.open(p).convert("RGB"))
        tv.datasets = datasets_mod
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


def setup_reference_xclip() -> None:
    """Make ``import xclip.<mod>`` work WITHOUT executing xclip/__init__.py
    (which pulls pytorch_lightning, absent here): installs a package shell
    whose __path__ points at the reference tree, plus a textacy stub
    (only used for html-tag stripping in a caption path)."""
    install_stubs()
    if _missing("textacy"):
        tx = _stub("textacy")
        pre = _stub("textacy.preprocessing")
        rem = _stub("textacy.preprocessing.remove", html_tags=lambda s: s)
        pre.remove = rem
        tx.preprocessing = pre
    if OPEN_CLIP_SRC not in sys.path:
        sys.path.insert(0, OPEN_CLIP_SRC)
    if "xclip" not in sys.modules:
        pkg = types.ModuleType("xclip")
        pkg.__path__ = [f"{REFERENCE_ROOT}/xclip"]
        pkg.__spec__ = importlib.machinery.ModuleSpec("xclip", None, is_package=True)
        sys.modules["xclip"] = pkg


def import_reference_module(name: str, path: str):
    """Load a single reference module file without its package __init__."""
    install_stubs()
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod
