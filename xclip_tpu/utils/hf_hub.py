"""Hugging Face Hub export — the reference's push_to_hf_hub.py surface
(deps/open_clip/src/open_clip/push_to_hf_hub.py:40-260).

``save_for_hf`` materializes the complete hub folder LOCALLY — the
open_clip torch weights file (``open_clip_pytorch_model.bin``), the
``open_clip_config.json`` (model_cfg + preprocess_cfg) and a generated
model-card README — so the artifact is byte-compatible with what open_clip
publishes. ``push_to_hf_hub`` then uploads it when ``huggingface_hub`` is
installed; in zero-egress environments it raises with the folder path so
the user can upload out of band. This keeps the full reference CLI surface
(``python -m xclip_tpu.utils.hf_hub --model ... --repo-id ...``) while the
actual network call stays optional.
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Optional

HF_WEIGHTS_NAME = "open_clip_pytorch_model.bin"
HF_CONFIG_NAME = "open_clip_config.json"


def generate_readme(model_card: dict, model_name: str) -> str:
    """Model-card README with the open_clip hub front-matter layout
    (tags / library_name / pipeline_tag / license / datasets, then
    Details / Usage / Comparison / Citation sections)."""
    card = dict(model_card)
    tags = card.pop("tags", ("clip",))
    pipeline_tag = card.pop("pipeline_tag", "zero-shot-image-classification")
    lines = ["---"]
    if tags:
        lines.append("tags:")
        lines += [f"- {t}" for t in tags]
    lines.append("library_name: open_clip")
    lines.append(f"pipeline_tag: {pipeline_tag}")
    lines.append(f"license: {card.get('license', 'mit')}")
    details = card.get("details", {})
    if "Dataset" in details:
        lines.append("datasets:")
        lines.append(f"- {details['Dataset'].lower()}")
    lines.append("---")
    lines.append(f"# Model card for {model_name}")
    if "description" in card:
        lines += ["", card["description"]]
    if details:
        lines += ["", "## Model Details"]
        for k, v in details.items():
            if isinstance(v, (list, tuple)):
                lines.append(f"- **{k}:**")
                lines += [f"  - {vi}" for vi in v]
            elif isinstance(v, dict):
                lines.append(f"- **{k}:**")
                lines += [f"  - {ki}: {vi}" for ki, vi in v.items()]
            else:
                lines.append(f"- **{k}:** {v}")
    for section, title in (("usage", "## Model Usage"),
                           ("comparison", "## Model Comparison")):
        if section in card:
            lines += ["", title, card[section]]
    if "citation" in card:
        lines += ["", "## Citation"]
        cites = card["citation"]
        if not isinstance(cites, (list, tuple)):
            cites = [cites]
        for c in cites:
            lines.append(f"```bibtex\n{c}\n```")
    return "\n".join(lines) + "\n"


def save_config_for_hf(model_name: str, config_path: str,
                       pretrained_tag: Optional[str] = None) -> dict:
    """open_clip_config.json: {'model_cfg': <registry config>,
    'preprocess_cfg': {mean, std[, interpolation, resize_mode]}}."""
    from xclip_tpu.models.factory import get_model_config
    from xclip_tpu.models.pretrained import get_preprocess_cfg

    model_cfg = get_model_config(model_name)
    if model_cfg is None:
        raise ValueError(f"unknown model {model_name!r}")
    pp = get_preprocess_cfg(model_name, pretrained_tag)
    hf_config = {
        "model_cfg": model_cfg,
        "preprocess_cfg": {
            "mean": list(pp["mean"]),
            "std": list(pp["std"]),
            "interpolation": pp["interpolation"],
            "resize_mode": pp["resize_mode"],
        },
    }
    with open(config_path, "w") as fh:
        json.dump(hf_config, fh, indent=2)
    return hf_config


def save_for_hf(model, params, state, model_name: str, save_directory: str,
                *, pretrained_tag: Optional[str] = None,
                model_card: Optional[dict] = None,
                skip_weights: bool = False) -> str:
    """Materialize the hub folder (weights + config + README); returns the
    directory. The weights file is the raw open_clip state_dict (no
    epoch/optimizer wrapper), loadable by open_clip's HF path."""
    os.makedirs(save_directory, exist_ok=True)
    if not skip_weights:
        import numpy as np
        import torch

        from xclip_tpu.core.checkpoint import pytrees_to_open_clip_state_dict

        sd = pytrees_to_open_clip_state_dict(model, params, state)
        tensors = {k: torch.from_numpy(np.ascontiguousarray(v).copy())
                   for k, v in sd.items()}
        tmp = os.path.join(save_directory, HF_WEIGHTS_NAME + ".tmp")
        torch.save(tensors, tmp)
        os.replace(tmp, os.path.join(save_directory, HF_WEIGHTS_NAME))
    save_config_for_hf(model_name, os.path.join(save_directory, HF_CONFIG_NAME),
                       pretrained_tag=pretrained_tag)
    readme = os.path.join(save_directory, "README.md")
    if not os.path.exists(readme):
        with open(readme, "w") as fh:
            fh.write(generate_readme(model_card or {}, model_name))
    return save_directory


def push_to_hf_hub(model, params, state, model_name: str, repo_id: str,
                   *, commit_message: str = "Add model",
                   token: Optional[str] = None, private: bool = False,
                   model_card: Optional[dict] = None,
                   folder: Optional[str] = None):
    """Build the folder, then upload via huggingface_hub. Without
    huggingface_hub (zero-egress), raises RuntimeError naming the prepared
    folder so it can be uploaded out of band."""
    import tempfile

    folder = folder or tempfile.mkdtemp(prefix="xclip_hf_")
    save_for_hf(model, params, state, model_name, folder, model_card=model_card)
    try:
        from huggingface_hub import create_repo, upload_folder
    except ImportError:
        raise RuntimeError(
            f"huggingface_hub is not installed (zero-egress environment); the "
            f"hub folder is fully prepared at {folder} — upload it with "
            f"`huggingface-cli upload {repo_id} {folder}` from a connected "
            f"machine")
    create_repo(repo_id, token=token, private=private, exist_ok=True)
    return upload_folder(repo_id=repo_id, folder_path=folder,
                         commit_message=commit_message)


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description="Push to Hugging Face Hub")
    parser.add_argument("--model", type=str, required=True)
    parser.add_argument("--pretrained", type=str, default=None,
                        help="pretrained tag or local checkpoint path")
    parser.add_argument("--repo-id", type=str, required=True)
    parser.add_argument("--precision", type=str, default="fp32")
    parser.add_argument("--save-dir", type=str, default=None,
                        help="materialize the folder here instead of a tempdir")
    args = parser.parse_args(argv)

    from xclip_tpu.models.factory import create_model

    model, params, state = create_model(
        args.model, pretrained=args.pretrained, precision=args.precision)
    if args.save_dir:
        save_for_hf(model, params, state, args.model, args.save_dir,
                    pretrained_tag=args.pretrained)
        print(f"hub folder written to {args.save_dir}")
        return 0
    push_to_hf_hub(model, params, state, args.model, args.repo_id)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
