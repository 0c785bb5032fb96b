"""Pretrained checkpoint registry + download plumbing.

Reference behaviour: deps/open_clip/src/open_clip/pretrained.py:29-659 —
(model, tag) -> URL catalog with sha256-prefixed OpenAI URLs, cache-dir
download, and list_pretrained helpers. Only the tags whose weights load
through this framework's bridges are catalogued (the OpenAI originals for
every architecture we ship). In zero-egress environments pass a local path
to ``create_model(pretrained=...)`` instead.
"""

from __future__ import annotations

import hashlib
import os
import urllib.request
import warnings
from typing import Dict, List, Optional

_CATALOG_PATH = os.path.join(os.path.dirname(__file__), "pretrained_catalog.json")

# (model, tag) -> {"url": ..., "hf_hub": ..., optional preprocess overrides}.
# Extracted from the reference catalog (deps/open_clip/src/open_clip/
# pretrained.py:29-659) restricted to the model configs this framework
# ships: sha256-prefixed OpenAI releases, open_clip GitHub-release weights
# (yfcc15m/cc12m/laion400m/laion2b_e16), and HF-hub ids (laion2b/datacomp/
# commonpool/dfn/CLIPA/CoCa). hf_hub-only tags are catalogued for
# list_pretrained parity; downloading them needs huggingface_hub, absent in
# zero-egress environments — pass a local path instead.
import json as _json

with open(_CATALOG_PATH) as _fh:
    _PRETRAINED: Dict[str, Dict[str, dict]] = _json.load(_fh)


def list_pretrained(as_str: bool = False) -> List:
    """All (model, tag) pairs (reference list_pretrained)."""
    pairs = [(m, t) for m, tags in _PRETRAINED.items() for t in tags]
    return [f"{m} {t}" for m, t in pairs] if as_str else pairs


def list_pretrained_tags_by_model(model: str) -> List[str]:
    return list(_PRETRAINED.get(model, {}))


def list_pretrained_models_by_tag(tag: str) -> List[str]:
    return [m for m, tags in _PRETRAINED.items() if tag in tags]


def get_pretrained_cfg(model: str, tag: str) -> dict:
    """Catalog entry for (model, tag) (reference get_pretrained_cfg)."""
    return dict(_PRETRAINED.get(model, {}).get(tag, {}))


def get_pretrained_url(model: str, tag: str) -> str:
    return _PRETRAINED.get(model, {}).get(tag, {}).get("url", "")


# open_clip/constants.py defaults; catalog entries without explicit fields
# use these (the reference's _pcfg, pretrained.py:29-39)
OPENAI_DATASET_MEAN = (0.48145466, 0.4578275, 0.40821073)
OPENAI_DATASET_STD = (0.26862954, 0.26130258, 0.27577711)


def get_preprocess_cfg(model: str, tag: Optional[str] = None) -> dict:
    """Preprocess settings for a (model, pretrained-tag) pair — the
    reference bakes mean/std/interpolation/resize_mode into each pretrained
    entry (_pcfg/_slpcfg/_apcfg/_mccfg, pretrained.py:29-78) and
    create_model_and_transforms applies them (factory.py:382-396). Catalog
    entries omit the OpenAI-default fields; absent (model, tag) -> defaults."""
    entry = _PRETRAINED.get(model, {}).get(tag or "", {})
    return {
        "mean": tuple(entry.get("mean", OPENAI_DATASET_MEAN)),
        "std": tuple(entry.get("std", OPENAI_DATASET_STD)),
        "interpolation": entry.get("interpolation", "bicubic"),
        "resize_mode": entry.get("resize_mode", "shortest"),
    }


def _cache_dir() -> str:
    return os.path.expanduser(os.environ.get("XCLIP_TPU_CACHE", "~/.cache/xclip_tpu"))


def download_pretrained_from_url(url: str, cache_dir: Optional[str] = None) -> str:
    """Download with the sha256-prefix check (reference
    download_pretrained_from_url); returns the local path."""
    cache_dir = cache_dir or _cache_dir()
    os.makedirs(cache_dir, exist_ok=True)
    filename = os.path.basename(url)
    expected_sha256 = url.split("/")[-2] if "openaipublic" in url else ""
    target = os.path.join(cache_dir, filename)

    def sha_ok(path: str) -> bool:
        if not expected_sha256:
            return True
        digest = hashlib.sha256(open(path, "rb").read()).hexdigest()
        return digest.startswith(expected_sha256)

    if os.path.exists(target):
        if sha_ok(target):
            return target
        warnings.warn(f"{target} exists but the SHA256 does not match; re-downloading")
        os.remove(target)

    urllib.request.urlretrieve(url, target)
    if not sha_ok(target):
        raise RuntimeError(f"Downloaded {filename} has wrong SHA256 checksum")
    return target


def download_pretrained(model: str, tag: str = "openai", cache_dir: Optional[str] = None) -> str:
    cfg = get_pretrained_cfg(model, tag)
    if not cfg:
        raise ValueError(
            f"No pretrained weights for ({model}, {tag}); "
            f"available: {list_pretrained_tags_by_model(model)}"
        )
    if cfg.get("url"):
        return download_pretrained_from_url(cfg["url"], cache_dir)
    raise RuntimeError(
        f"({model}, {tag}) is distributed via the Hugging Face hub "
        f"({cfg.get('hf_hub')}); huggingface_hub is unavailable here — "
        f"download the open_clip .pt/.bin manually and pass its local path "
        f"to create_model(pretrained=...)"
    )
