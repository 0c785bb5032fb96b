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

_OPENAI_BASE = "https://openaipublic.azureedge.net/clip/models"

# sha256-prefixed public OpenAI CLIP releases (the hash is embedded in the URL)
_PRETRAINED: Dict[str, Dict[str, str]] = {
    "RN50": {
        "openai": f"{_OPENAI_BASE}/afeb0e10f9e5a86da6080e35cf09123aca3b358a0c3e3b6c78a7b63bc04b6762/RN50.pt"
    },
    "RN101": {
        "openai": f"{_OPENAI_BASE}/8fa8567bab74a42d41c5915025a8e4538c3bdbe8804a470a72f30b0d94fab599/RN101.pt"
    },
    "RN50x4": {
        "openai": f"{_OPENAI_BASE}/7e526bd135e493cef0776de27d5f42653e6b4c8bf9e0f653bb11773263205fdd/RN50x4.pt"
    },
    "RN50x16": {
        "openai": f"{_OPENAI_BASE}/52378b407f34354e150460fe41077663dd5b39c54cd0bfd2b27167a4a06ec9aa/RN50x16.pt"
    },
    "RN50x64": {
        "openai": f"{_OPENAI_BASE}/be1cfb55d75a9666199fb2206c106743da0f6468c9d327f3e0d0a543a9919d9c/RN50x64.pt"
    },
    "ViT-B-32": {
        "openai": f"{_OPENAI_BASE}/40d365715913c9da98579312b702a82c18be219cc2a73407c4526f58eba950af/ViT-B-32.pt"
    },
    "ViT-B-16": {
        "openai": f"{_OPENAI_BASE}/5806e77cd80f8b59890b7e101eabd078d9fb84e6937f9e85e4ecb61988df416f/ViT-B-16.pt"
    },
    "ViT-L-14": {
        "openai": f"{_OPENAI_BASE}/b8cca3fd41ae0c99ba7e8951adf17d267cdb84cd88be6f7c2e0eca1737a03836/ViT-L-14.pt"
    },
    "ViT-L-14-336": {
        "openai": f"{_OPENAI_BASE}/3035c92b350959924f9f00213499208652fc7ea050643e8b385c2dac08641f02/ViT-L-14-336px.pt"
    },
}
# quickgelu variants load the same OpenAI weights
for _name in ("RN50", "RN101", "ViT-B-32", "ViT-B-16", "ViT-L-14"):
    _PRETRAINED[f"{_name}-quickgelu"] = dict(_PRETRAINED[_name])


def list_pretrained(as_str: bool = False) -> List:
    """All (model, tag) pairs (reference list_pretrained)."""
    pairs = [(m, t) for m, tags in _PRETRAINED.items() for t in tags]
    return [f"{m} {t}" for m, t in pairs] if as_str else pairs


def list_pretrained_tags_by_model(model: str) -> List[str]:
    return list(_PRETRAINED.get(model, {}))


def list_pretrained_models_by_tag(tag: str) -> List[str]:
    return [m for m, tags in _PRETRAINED.items() if tag in tags]


def get_pretrained_url(model: str, tag: str) -> str:
    return _PRETRAINED.get(model, {}).get(tag, "")


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
    url = get_pretrained_url(model, tag)
    if not url:
        raise ValueError(
            f"No pretrained weights for ({model}, {tag}); "
            f"available: {list_pretrained_tags_by_model(model)}"
        )
    return download_pretrained_from_url(url, cache_dir)
