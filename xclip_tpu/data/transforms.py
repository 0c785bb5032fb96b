"""Host-side image preprocessing -> NHWC float32 numpy.

Reference behaviour: deps/open_clip/src/open_clip/transform.py:274-391 —
train = RandomResizedCrop(scale 0.9-1.0, bicubic) + normalize; val =
Resize(shortest side, bicubic) + CenterCrop + normalize, with the OpenAI
mean/std (deps/open_clip/src/open_clip/constants.py:1-2).

This runs on the host CPU (PIL decode + resize); the device only ever sees
ready NHWC float tensors. NHWC is the TPU-native conv layout.
"""

from __future__ import annotations

import dataclasses
import math
import random
from typing import Optional, Tuple

import numpy as np
from PIL import Image

OPENAI_DATASET_MEAN = (0.48145466, 0.4578275, 0.40821073)
OPENAI_DATASET_STD = (0.26862954, 0.26130258, 0.27577711)


@dataclasses.dataclass(frozen=True)
class PreprocessCfg:
    size: int = 224
    mean: Tuple[float, float, float] = OPENAI_DATASET_MEAN
    std: Tuple[float, float, float] = OPENAI_DATASET_STD
    interpolation: str = "bicubic"
    resize_mode: str = "shortest"


_PIL_INTERP = {"bicubic": Image.BICUBIC, "bilinear": Image.BILINEAR, "nearest": Image.NEAREST}


def _to_rgb(img: Image.Image) -> Image.Image:
    return img.convert("RGB") if img.mode != "RGB" else img


def normalize(arr: np.ndarray, mean=OPENAI_DATASET_MEAN, std=OPENAI_DATASET_STD) -> np.ndarray:
    """uint8/float HWC -> normalized float32 HWC."""
    arr = arr.astype(np.float32) / 255.0 if arr.dtype == np.uint8 else arr.astype(np.float32)
    return (arr - np.asarray(mean, np.float32)) / np.asarray(std, np.float32)


def random_resized_crop(
    img: Image.Image,
    size: int,
    *,
    scale: Tuple[float, float] = (0.9, 1.0),
    ratio: Tuple[float, float] = (3.0 / 4.0, 4.0 / 3.0),
    interpolation: str = "bicubic",
    rng: Optional[random.Random] = None,
) -> Image.Image:
    """torchvision-equivalent RandomResizedCrop sampling."""
    rng = rng or random
    width, height = img.size
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
            return img.resize((size, size), _PIL_INTERP[interpolation], box=(j, i, j + w, i + h))
    # fallback: center crop to in-range aspect
    in_ratio = width / height
    if in_ratio < ratio[0]:
        w, h = width, int(round(width / ratio[0]))
    elif in_ratio > ratio[1]:
        w, h = int(round(height * ratio[1])), height
    else:
        w, h = width, height
    i, j = (height - h) // 2, (width - w) // 2
    return img.resize((size, size), _PIL_INTERP[interpolation], box=(j, i, j + w, i + h))


def resize_shortest(img: Image.Image, size: int, interpolation: str = "bicubic") -> Image.Image:
    w, h = img.size
    if w <= h:
        new_w, new_h = size, max(1, int(round(size * h / w)))
    else:
        new_w, new_h = max(1, int(round(size * w / h))), size
    return img.resize((new_w, new_h), _PIL_INTERP[interpolation])


def center_crop(img: Image.Image, size: int) -> Image.Image:
    w, h = img.size
    left = int(round((w - size) / 2.0))
    top = int(round((h - size) / 2.0))
    if left < 0 or top < 0:  # pad if smaller (CenterCropOrPad semantics)
        canvas = Image.new(img.mode, (max(w, size), max(h, size)))
        canvas.paste(img, ((canvas.width - w) // 2, (canvas.height - h) // 2))
        img, (w, h) = canvas, canvas.size
        left = int(round((w - size) / 2.0))
        top = int(round((h - size) / 2.0))
    return img.crop((left, top, left + size, top + size))


@dataclasses.dataclass(frozen=True)
class AugmentationCfg:
    """Optional train-time augmentation (reference transform.py:62-77 AugmentationCfg
    + color_jitter/gray_scale wrappers :242-271). Defaults reproduce the plain
    RandomResizedCrop pipeline.

    ``use_timm=True`` mirrors the reference's timm branch (transform.py:
    309-332: ``timm.data.create_transform(is_training=True, hflip=0.,
    re_mode='pixel', ...)``) natively — timm is absent from this image, so
    the equivalent pipeline (RandomResizedCrop with an aspect-``ratio``
    range, color_jitter disabled by default, per-pixel-noise RandomErasing
    via ``re_prob``/``re_count``) is implemented here instead."""

    scale: Tuple[float, float] = (0.9, 1.0)
    color_jitter: Optional[Tuple[float, float, float]] = None  # brightness/contrast/saturation
    color_jitter_prob: float = 0.8
    gray_scale_prob: float = 0.0
    # timm-branch extras (ignored unless use_timm)
    use_timm: bool = False
    ratio: Optional[Tuple[float, float]] = None  # RRC aspect range
    re_prob: float = 0.0  # RandomErasing probability (timm re_mode='pixel')
    re_count: int = 1


def random_erasing(arr: np.ndarray, rng, *, count: int = 1,
                   area: Tuple[float, float] = (0.02, 1 / 3),
                   ratio: Tuple[float, float] = (0.3, 10 / 3)) -> np.ndarray:
    """timm RandomErasing(mode='pixel'): fill up to ``count`` random boxes
    with per-pixel gaussian noise. Operates on the float HWC array AFTER
    normalization (timm applies it post-Normalize); on uint8 arrays
    (device-side normalize) the fill is uniform random bytes — noise either
    way, documented approximation."""
    h, w = arr.shape[:2]
    out = arr.copy()
    log_ratio = (math.log(ratio[0]), math.log(ratio[1]))
    for _ in range(count):
        for _attempt in range(10):
            target = h * w * rng.uniform(*area)
            aspect = math.exp(rng.uniform(*log_ratio))
            eh = int(round(math.sqrt(target * aspect)))
            ew = int(round(math.sqrt(target / aspect)))
            if eh < h and ew < w and eh > 0 and ew > 0:
                top = rng.randint(0, h - eh)
                left = rng.randint(0, w - ew)
                np_rng = np.random.RandomState(rng.randrange(2 ** 31))
                if out.dtype == np.uint8:
                    fill = np_rng.randint(0, 256, (eh, ew, arr.shape[2]), np.uint8)
                else:
                    fill = np_rng.randn(eh, ew, arr.shape[2]).astype(arr.dtype)
                out[top:top + eh, left:left + ew] = fill
                break
    return out


def apply_color_jitter(img: Image.Image, strengths, rng) -> Image.Image:
    """torchvision ColorJitter equivalent via PIL ImageEnhance: factors drawn
    uniform from [max(0, 1-v), 1+v], applied in random order."""
    from PIL import ImageEnhance

    ops = []
    for enhancer, v in zip(
        (ImageEnhance.Brightness, ImageEnhance.Contrast, ImageEnhance.Color), strengths
    ):
        if v and v > 0:
            ops.append((enhancer, rng.uniform(max(0.0, 1.0 - v), 1.0 + v)))
    rng.shuffle(ops)
    for enhancer, factor in ops:
        img = enhancer(img).enhance(factor)
    return img


class ImageTransform:
    """Callable PIL.Image -> float32 HWC array."""

    def __init__(
        self,
        cfg: PreprocessCfg,
        is_train: bool,
        seed: Optional[int] = None,
        aug_cfg: Optional[AugmentationCfg] = None,
        to_uint8: bool = False,
    ):
        self.cfg = cfg
        self.is_train = is_train
        self.aug = aug_cfg or AugmentationCfg()
        self.rng = random.Random(seed) if seed is not None else random
        # uint8 HWC output (normalize happens on-device; numerically
        # identical — PIL resize returns uint8 before ToTensor/Normalize)
        self.to_uint8 = to_uint8

    def __call__(self, img: Image.Image) -> np.ndarray:
        img = _to_rgb(img)
        if self.is_train and self.aug.use_timm:
            # native timm create_transform equivalence (hflip=0, jitter off
            # by default, post-normalize pixel-noise erasing)
            img = random_resized_crop(
                img, self.cfg.size, scale=self.aug.scale,
                ratio=self.aug.ratio or (3.0 / 4.0, 4.0 / 3.0),
                interpolation=self.cfg.interpolation, rng=self.rng,
            )
            if self.aug.color_jitter:
                img = apply_color_jitter(img, self.aug.color_jitter, self.rng)
            arr = (np.asarray(img, dtype=np.uint8) if self.to_uint8
                   else normalize(np.asarray(img), self.cfg.mean, self.cfg.std))
            if self.aug.re_prob and self.rng.random() < self.aug.re_prob:
                arr = random_erasing(arr, self.rng, count=self.aug.re_count)
            return arr
        if self.is_train:
            img = random_resized_crop(
                img, self.cfg.size, scale=self.aug.scale,
                interpolation=self.cfg.interpolation, rng=self.rng,
            )
            if self.aug.color_jitter and self.rng.random() < self.aug.color_jitter_prob:
                img = apply_color_jitter(img, self.aug.color_jitter, self.rng)
            if self.aug.gray_scale_prob and self.rng.random() < self.aug.gray_scale_prob:
                img = img.convert("L").convert("RGB")
        elif self.cfg.resize_mode == "squash":
            # direct WxH resize, no aspect preservation (reference :365-369)
            img = img.resize((self.cfg.size, self.cfg.size), _PIL_INTERP[self.cfg.interpolation])
        elif self.cfg.resize_mode == "longest":
            # ResizeKeepRatio(longest)+CenterCropOrPad (reference :360-364)
            w, h = img.size
            s = self.cfg.size / max(w, h)
            img = img.resize(
                (max(1, int(round(w * s))), max(1, int(round(h * s)))),
                _PIL_INTERP[self.cfg.interpolation],
            )
            img = center_crop(img, self.cfg.size)  # pads the short side
        else:
            img = resize_shortest(img, self.cfg.size, self.cfg.interpolation)
            img = center_crop(img, self.cfg.size)
        if self.to_uint8:
            return np.asarray(img, dtype=np.uint8)
        return normalize(np.asarray(img), self.cfg.mean, self.cfg.std)


def image_transform(
    image_size: int,
    is_train: bool,
    mean: Tuple[float, float, float] = OPENAI_DATASET_MEAN,
    std: Tuple[float, float, float] = OPENAI_DATASET_STD,
    seed: Optional[int] = None,
    aug_cfg: Optional[AugmentationCfg] = None,
    resize_mode: str = "shortest",
    interpolation: str = "bicubic",
    to_uint8: bool = False,
) -> ImageTransform:
    if resize_mode not in ("shortest", "longest", "squash"):
        raise ValueError(f"unknown resize_mode {resize_mode!r}")
    if interpolation not in _PIL_INTERP:
        raise ValueError(f"unknown interpolation {interpolation!r}")
    return ImageTransform(
        PreprocessCfg(size=image_size, mean=mean, std=std, resize_mode=resize_mode,
                      interpolation=interpolation),
        is_train, seed, aug_cfg=aug_cfg, to_uint8=to_uint8,
    )


def aug_cfg_from_dict(d: Optional[dict]) -> Optional[AugmentationCfg]:
    """Build an AugmentationCfg from --aug-cfg key=value pairs (reference
    params.py:259 ParseKwargs). color_jitter accepts a single float
    (replicated to brightness/contrast/saturation) or a 3-tuple."""
    if not d:
        return None
    d = dict(d)
    cj = d.get("color_jitter")
    if isinstance(cj, (int, float)):
        d["color_jitter"] = (float(cj),) * 3
    elif isinstance(cj, (list, tuple)):
        d["color_jitter"] = tuple(float(v) for v in cj)
    for key in ("scale", "ratio"):
        if key in d and isinstance(d[key], (list, tuple)):
            d[key] = tuple(float(v) for v in d[key])
    allowed = {f.name for f in dataclasses.fields(AugmentationCfg)}
    unknown = set(d) - allowed
    if unknown:
        raise ValueError(f"unknown aug_cfg keys: {sorted(unknown)} (allowed: {sorted(allowed)})")
    return AugmentationCfg(**d)
