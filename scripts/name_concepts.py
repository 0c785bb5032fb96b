"""Name SAE features by nearest vocabulary concept (reference:
scripts/name_concepts.py)."""

import argparse
import os

import _common  # noqa: F401
import numpy as np

from xclip_tpu.models.factory import create_model
from xclip_tpu.sae.model import SAECfg, sae_state_dict_to_params
from xclip_tpu.sae.naming import DiscoverThenName, embed_vocab
from xclip_tpu.tokenizer import get_tokenizer


def load_sae_params(out_dir, input_dim, expansion_factor, n_components):
    import torch

    path = os.path.join(out_dir, "checkpoints", "sparse_autoencoder_final.pt")
    sd = torch.load(path, map_location="cpu", weights_only=False)
    cfg = SAECfg(input_dim, int(input_dim * expansion_factor), n_components=n_components)
    return sae_state_dict_to_params({k: v.numpy() for k, v in sd.items()}, cfg)


def main(args):
    vocab_name = os.path.splitext(os.path.split(args.vocab_file)[1])[0]
    emb_path = os.path.join(args.out_dir, "concepts", f"embeddings_{vocab_name}.npy")
    with open(args.vocab_file) as fh:
        concept_names = [line.strip() for line in fh.readlines()]

    if not os.path.exists(emb_path):
        model, params, _ = create_model(args.img_enc_name, pretrained=args.ckpt_path, precision="fp32")
        tokenizer = get_tokenizer(args.img_enc_name)
        emb = embed_vocab(model, params, tokenizer, concept_names)
        os.makedirs(os.path.dirname(emb_path), exist_ok=True)
        np.save(emb_path, emb)
    else:
        emb = np.load(emb_path)

    sae_params = load_sae_params(args.out_dir, args.input_dim, args.expansion_factor, len(args.hook_points))
    method = DiscoverThenName(sae_params, emb, concept_names)
    names = method.write_concept_names_csv(os.path.join(args.out_dir, "concepts", "concept_names.csv"))
    for idx, name in enumerate(names[:20]):
        print(f"{idx},{name}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--img_enc_name", type=str, default="RN50")
    parser.add_argument("--out_dir", type=str, required=True)
    parser.add_argument("--vocab_file", type=str, required=True)
    parser.add_argument("--ckpt_path", type=str, required=True)
    parser.add_argument("--input_dim", type=int, default=1024)
    parser.add_argument("--expansion_factor", type=int, default=4)
    parser.add_argument("--hook_points", nargs="*", default=["out"])
    main(parser.parse_args())
