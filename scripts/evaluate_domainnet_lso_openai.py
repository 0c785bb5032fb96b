"""Zero-shot DomainNet-LSO evaluation of a checkpoint series (reference:
scripts/evaluate_domainnet_lso_openai.py)."""

import argparse

import _common  # noqa: F401

from xclip_tpu.evals.run_lso import run_lso_evaluation

if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="Configure CLIP models to evaluate.")
    parser.add_argument("--model", type=str, required=True, help="CLIP model type")
    parser.add_argument("--domain", type=str, required=True,
                        choices=["clipart", "infograph", "painting", "quickdraw", "sketch"])
    parser.add_argument("--ckpt_files", type=str, nargs="+", help="checkpoints to evaluate")
    parser.add_argument("--out_path", type=str, required=True)
    parser.add_argument("--imagenet_path", type=str, required=True)
    parser.add_argument("--domainnet_path", type=str, required=True)
    parser.add_argument("--num_workers", type=int, default=8)
    parser.add_argument("--domain_invariant", action="store_true")
    parser.add_argument("--precision", type=str, default="fp32", choices=["fp32", "bf16", "fp16"],
                        help="eval encoder precision; fp16 reproduces the reference's "
                             ".half() eval numerics (fp16 storage rounding)")
    args = parser.parse_args()
    run_lso_evaluation(
        args.model, args.ckpt_files, args.out_path, args.imagenet_path,
        args.domainnet_path, args.domain, domain_invariant=args.domain_invariant,
        num_workers=args.num_workers, precision=args.precision,
    )
