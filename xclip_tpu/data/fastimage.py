"""Python wrapper over the native fastimage extension (csrc/fastimage.cpp).

One C++ pass fuses the host input hot path — JPEG decode (with DCT-domain
prescale), RandomResizedCrop / Resize+CenterCrop, bilinear resize, and
mean/std normalization — replacing the reference's PIL + torchvision
transform stack (reference: training/data.py:35-53 CsvDataset __getitem__ +
open_clip/transform.py:274). Falls back to the PIL transforms when the
extension isn't built (``make -C csrc``).
"""

from __future__ import annotations

import math
import os
import random
from typing import Optional, Tuple

import numpy as np

from xclip_tpu.data.transforms import (
    OPENAI_DATASET_MEAN,
    OPENAI_DATASET_STD,
    ImageTransform,
    PreprocessCfg,
)

def _try_build_extension() -> bool:
    """Build the C extension in-tree (seconds; the .so is not committed)."""
    import subprocess

    csrc = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "csrc")
    if not os.path.isfile(os.path.join(csrc, "Makefile")):
        return False
    try:
        subprocess.run(
            ["make", "-C", csrc], check=True,
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL, timeout=120,
        )
        return True
    except Exception:
        return False


try:
    from xclip_tpu.data import _fastimage  # type: ignore

    HAVE_FASTIMAGE = True
except ImportError:  # pragma: no cover - built on demand
    if _try_build_extension():
        try:
            from xclip_tpu.data import _fastimage  # type: ignore

            HAVE_FASTIMAGE = True
        except ImportError:
            _fastimage = None
            HAVE_FASTIMAGE = False
    else:
        _fastimage = None
        HAVE_FASTIMAGE = False


def _sample_rrc_box(width: int, height: int, rng, scale=(0.9, 1.0), ratio=(3 / 4, 4 / 3)):
    """torchvision RandomResizedCrop box sampling (same math as
    transforms.random_resized_crop)."""
    area = width * height
    log_ratio = (math.log(ratio[0]), math.log(ratio[1]))
    for _ in range(10):
        target_area = area * rng.uniform(scale[0], scale[1])
        aspect = math.exp(rng.uniform(*log_ratio))
        w = int(round(math.sqrt(target_area * aspect)))
        h = int(round(math.sqrt(target_area / aspect)))
        if 0 < w <= width and 0 < h <= height:
            i = rng.randint(0, height - h)
            j = rng.randint(0, width - w)
            return float(j), float(i), float(w), float(h)
    in_ratio = width / height
    if in_ratio < ratio[0]:
        w, h = width, int(round(width / ratio[0]))
    elif in_ratio > ratio[1]:
        w, h = int(round(height * ratio[1])), height
    else:
        w, h = width, height
    return float((width - w) // 2), float((height - h) // 2), float(w), float(h)


class FastImageTransform:
    """bytes-of-JPEG -> normalized float32 HWC, all in C++.

    Train: RandomResizedCrop box sampled host-side, decode+crop+resize fused.
    Eval: shortest-side resize + center crop expressed as one crop box.
    """

    def __init__(self, size: int, is_train: bool,
                 mean=OPENAI_DATASET_MEAN, std=OPENAI_DATASET_STD,
                 seed: Optional[int] = None, to_uint8: bool = False):
        if not HAVE_FASTIMAGE:
            raise RuntimeError("fastimage extension not built; run `make -C csrc`")
        self.size = size
        self.is_train = is_train
        self.mean = tuple(float(m) for m in mean)
        self.std = tuple(float(s) for s in std)
        self.rng = random.Random(seed) if seed is not None else random
        self.to_uint8 = to_uint8  # uint8 HWC out; normalize happens on-device

    def _eval_box(self, w: int, h: int) -> Tuple[float, float, float, float]:
        # shortest-side resize to `size` then center crop `size` == center
        # crop of (min_dim x min_dim)... more precisely the crop in source
        # coords is size/scale where scale = size/min(w,h)
        crop = float(min(w, h))
        x0 = (w - crop) / 2.0
        y0 = (h - crop) / 2.0
        return x0, y0, crop, crop

    def __call__(self, jpeg_bytes: bytes) -> np.ndarray:
        if self.is_train:
            w, h = _fastimage.probe_size(jpeg_bytes)
            x0, y0, cw, ch = _sample_rrc_box(w, h, self.rng)
        else:
            w, h = _fastimage.probe_size(jpeg_bytes)
            x0, y0, cw, ch = self._eval_box(w, h)
        if self.to_uint8:
            raw, _, _ = _fastimage.decode_crop_resize_u8(
                jpeg_bytes, x0, y0, cw, ch, self.size, self.size
            )
            return np.frombuffer(raw, np.uint8).reshape(self.size, self.size, 3)
        raw, _, _ = _fastimage.decode_crop_resize(
            jpeg_bytes, x0, y0, cw, ch, self.size, self.size, self.mean, self.std
        )
        return np.frombuffer(raw, np.float32).reshape(self.size, self.size, 3)


class FastFileTransform:
    """Path -> array transform usable as a drop-in dataset transform: native
    path for .jpg/.jpeg files, PIL fallback otherwise."""

    wants_path = True  # datasets hand over the raw path instead of a PIL image

    def __init__(self, size: int, is_train: bool, seed: Optional[int] = None,
                 to_uint8: bool = False):
        self.fast = (FastImageTransform(size, is_train, seed=seed, to_uint8=to_uint8)
                     if HAVE_FASTIMAGE else None)
        self.fallback = ImageTransform(PreprocessCfg(size=size), is_train, seed,
                                       to_uint8=to_uint8)

    def __call__(self, img_or_path):
        if self.fast is not None and isinstance(img_or_path, (str, bytes)):
            try:
                data = (
                    img_or_path
                    if isinstance(img_or_path, bytes)
                    else open(img_or_path, "rb").read()
                )
                return self.fast(data)
            except (ValueError, OSError):
                pass
        if isinstance(img_or_path, str):
            from PIL import Image

            img_or_path = Image.open(img_or_path)
        return self.fallback(img_or_path)
