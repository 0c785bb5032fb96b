"""Regenerate models/pretrained_catalog.json from the reference registry.

The (model, tag) -> URL/hf-hub table is factual data (download locations +
preprocess constants, reference deps/open_clip/src/open_clip/pretrained.py:
82-516), so it is extracted programmatically rather than re-typed: this tool
imports the reference module read-only, normalizes each entry (dropping
fields equal to the OpenAI defaults that our get_preprocess_cfg re-applies),
and rewrites the JSON catalog. Run whenever the reference registry moves.

Usage: python tools/sync_pretrained_catalog.py [--check]
  --check: exit 1 if the committed catalog differs (no write).
"""

import importlib.util
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
REF = "/root/reference/deps/open_clip/src/open_clip/pretrained.py"
OUT = os.path.join(REPO, "xclip_tpu", "models", "pretrained_catalog.json")

# _pcfg defaults (reference pretrained.py:29-39): omitted from entries and
# re-applied by xclip_tpu.models.pretrained.get_preprocess_cfg
DEFAULTS = {
    "mean": (0.48145466, 0.4578275, 0.40821073),
    "std": (0.26862954, 0.26130258, 0.27577711),
    "interpolation": "bicubic",
    "resize_mode": "shortest",
}


def load_reference_registry() -> dict:
    """Execute the reference pretrained.py in isolation and return its
    _PRETRAINED table. The fake ``open_clip`` package entries needed for
    its relative imports are restored afterwards — leaking them breaks any
    later real `import open_clip` (e.g. tests/ref_compat.py consumers in
    the same pytest session)."""
    from tests.ref_compat import install_stubs

    install_stubs()
    spec = importlib.util.spec_from_file_location("ref_pretrained", REF)
    mod = importlib.util.module_from_spec(spec)
    import types

    touched = ("open_clip", "open_clip.constants", "open_clip.version")
    saved = {name: sys.modules.get(name) for name in touched}
    try:
        pkg = types.ModuleType("open_clip")
        consts = importlib.util.module_from_spec(importlib.util.spec_from_file_location(
            "open_clip.constants", os.path.join(os.path.dirname(REF), "constants.py")))
        consts.__spec__.loader.exec_module(consts)
        version = importlib.util.module_from_spec(importlib.util.spec_from_file_location(
            "open_clip.version", os.path.join(os.path.dirname(REF), "version.py")))
        version.__spec__.loader.exec_module(version)
        if saved["open_clip"] is None:
            sys.modules["open_clip"] = pkg
        sys.modules["open_clip.constants"] = consts
        sys.modules["open_clip.version"] = version
        mod.__package__ = "open_clip"
        spec.loader.exec_module(mod)
        return mod._PRETRAINED
    finally:
        for name in touched:
            if saved[name] is None:
                sys.modules.pop(name, None)
            else:
                sys.modules[name] = saved[name]


def normalize(registry: dict) -> dict:
    out = {}
    for model, tags in sorted(registry.items()):
        m = {}
        for tag, cfg in tags.items():
            entry = {}
            for key, val in cfg.items():
                if key in DEFAULTS:
                    default = DEFAULTS[key]
                    same = (tuple(val) == tuple(default)
                            if isinstance(val, (tuple, list)) else val == default)
                    if same:
                        continue
                if val in ("", None):
                    continue
                entry[key] = list(val) if isinstance(val, tuple) else val
            m[tag] = entry
        out[model] = m
    return out


def main() -> int:
    catalog = normalize(load_reference_registry())
    n_pairs = sum(len(t) for t in catalog.values())
    text = json.dumps(catalog, indent=1, sort_keys=True) + "\n"
    if "--check" in sys.argv:
        current = open(OUT).read() if os.path.exists(OUT) else ""
        if current != text:
            print(f"catalog stale: regenerate with python {sys.argv[0]}")
            return 1
        print(f"catalog up to date ({len(catalog)} models, {n_pairs} tags)")
        return 0
    with open(OUT, "w") as fh:
        fh.write(text)
    print(f"wrote {OUT}: {len(catalog)} models, {n_pairs} (model, tag) pairs")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
