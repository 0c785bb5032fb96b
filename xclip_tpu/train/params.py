"""Training CLI flags — reference-compatible names.

Reference behaviour: deps/open_clip/src/training/params.py:17-476 (~80
argparse flags). The meaningful subset is implemented with identical names
and defaults so reference launch commands work unchanged; flags tied to
torch-specific machinery (horovod, torchcompile, DDP static graph...) are
accepted and ignored with a warning, because on TPU a single pjit program
replaces them.
"""

from __future__ import annotations

import argparse
import ast


class ParseKwargs(argparse.Action):
    """key=value list -> dict, values literal-eval'd with string fallback
    (reference params.py:14-23, used by --aug-cfg)."""

    def __call__(self, parser, namespace, values, option_string=None):
        kw = {}
        for value in values:
            key, value = value.split("=", 1)
            try:
                kw[key] = ast.literal_eval(value)
            except (ValueError, SyntaxError):
                kw[key] = str(value)
        setattr(namespace, self.dest, kw)


def parse_args(args=None) -> argparse.Namespace:
    parser = argparse.ArgumentParser("xclip_tpu CLIP training")
    # data
    parser.add_argument("--train-data", type=str, default=None)
    parser.add_argument("--val-data", type=str, default=None)
    parser.add_argument(
        "--dataset-type",
        choices=["csv", "tsv", "webdataset", "synthetic", "auto"],
        default="auto",
    )
    parser.add_argument("--dataset-resampled", default=False, action="store_true")
    parser.add_argument(
        "--json-captions", default=False, action="store_true",
        help="load webdataset captions from json files (key 'caption') instead of txt",
    )
    parser.add_argument(
        "--train-data-upsampling-factors", type=str, default=None,
        help="'::'-separated per-source sampling weights for resampled webdataset "
        "(e.g. 1::2::0.5); requires --dataset-resampled",
    )
    parser.add_argument("--csv-separator", type=str, default="\t")
    parser.add_argument("--csv-img-key", type=str, default="filepath")
    parser.add_argument("--csv-caption-key", type=str, default="title")
    parser.add_argument("--imagenet-val", type=str, default=None)
    parser.add_argument("--imagenet-v2", type=str, default=None,
                        help="path to an extracted ImageNet-V2 tree for zero-shot eval")
    parser.add_argument("--workers", type=int, default=8)
    parser.add_argument("--train-num-samples", type=int, default=None)
    parser.add_argument("--batch-prefetch", type=int, default=2,
                        help="batches to device_put ahead of the step on a "
                        "background thread (transfer/compute overlap, the "
                        "pinned-memory non_blocking copy equivalent); 0 "
                        "disables and feeds host batches synchronously")
    # model
    parser.add_argument("--model", type=str, default="RN50")
    parser.add_argument("--pretrained", type=str, default="")
    parser.add_argument("--force-quick-gelu", action="store_true")
    parser.add_argument("--aug-cfg", nargs="*", default={}, action=ParseKwargs)
    parser.add_argument("--image-mean", type=float, nargs="+", default=None,
                        help="override dataset image mean (3 floats)")
    parser.add_argument("--image-std", type=float, nargs="+", default=None,
                        help="override dataset image std (3 floats)")
    parser.add_argument("--image-interpolation", choices=["bicubic", "bilinear", "nearest"],
                        default=None)
    parser.add_argument("--image-resize-mode", choices=["shortest", "longest", "squash"],
                        default=None, help="val-preprocess resize mode")
    parser.add_argument("--lock-image", default=False, action="store_true")
    parser.add_argument("--lock-image-unlocked-groups", type=int, default=0)
    parser.add_argument("--lock-image-freeze-bn-stats", default=False, action="store_true")
    parser.add_argument("--lock-text", default=False, action="store_true")
    parser.add_argument("--lock-text-unlocked-layers", type=int, default=0)
    parser.add_argument("--lock-text-freeze-layer-norm", default=False, action="store_true")
    parser.add_argument("--precision", type=str, default="amp",
                        choices=["amp", "amp_bf16", "amp_bfloat16", "bf16", "fp16", "pure_bf16", "fp32"])
    # optimization
    parser.add_argument("--batch-size", type=int, default=64)
    parser.add_argument("--epochs", type=int, default=32)
    parser.add_argument("--epochs-cooldown", type=int, default=None)
    parser.add_argument("--lr", type=float, default=None)
    parser.add_argument("--beta1", type=float, default=None)
    parser.add_argument("--beta2", type=float, default=None)
    parser.add_argument("--eps", type=float, default=None)
    parser.add_argument("--wd", type=float, default=0.2)
    parser.add_argument("--warmup", type=int, default=10000)
    parser.add_argument("--lr-scheduler", type=str, default="cosine",
                        choices=["cosine", "const", "const-cooldown"])
    parser.add_argument("--lr-cooldown-end", type=float, default=0.0)
    parser.add_argument("--lr-cooldown-power", type=float, default=1.0)
    parser.add_argument("--accum-freq", type=int, default=1)
    parser.add_argument("--grad-clip-norm", type=float, default=None)
    parser.add_argument("--grad-checkpointing", action="store_true")
    # loss
    parser.add_argument("--local-loss", action="store_true")
    parser.add_argument("--gather-with-grad", action="store_true")
    parser.add_argument("--siglip", action="store_true")
    parser.add_argument("--device-normalize", action=argparse.BooleanOptionalAction,
                        default=True,
                        help="ship uint8 images to the TPU and normalize on-device "
                             "(4x smaller host transfers; numerically identical)")
    parser.add_argument("--coca-caption-loss-weight", type=float, default=2.0,
                        help="Weight assigned to caption loss in CoCa.")
    parser.add_argument("--coca-contrastive-loss-weight", type=float, default=1.0,
                        help="Weight assigned to contrastive loss when training CoCa.")
    parser.add_argument("--distill-model", type=str, default=None,
                        help="teacher model config name for distillation")
    parser.add_argument("--distill-pretrained", type=str, default=None,
                        help="teacher checkpoint path")
    # logging / checkpointing
    parser.add_argument("--logs", type=str, default="./logs/")
    parser.add_argument("--log-local", action="store_true")
    parser.add_argument("--name", type=str, default=None)
    parser.add_argument("--resume", type=str, default=None)
    parser.add_argument("--save-frequency", type=int, default=1)
    parser.add_argument("--save-most-recent", action="store_true")
    parser.add_argument("--delete-previous-checkpoint", default=False, action="store_true",
                        help="delete the previous epoch checkpoint after saving a new one")
    parser.add_argument("--save-log-step", action="store_true",
                        help="save log-spaced (power-of-2) step checkpoints (fork feature)")
    parser.add_argument("--torch-compat-ckpt", dest="torch_compat_ckpt", action="store_true", default=True,
                        help="save checkpoints in open_clip torch format (default)")
    parser.add_argument("--native-ckpt", dest="torch_compat_ckpt", action="store_false",
                        help="save native .npz checkpoints instead")
    parser.add_argument("--zeroshot-frequency", type=int, default=2)
    parser.add_argument("--val-frequency", type=int, default=1)
    parser.add_argument("--profile-steps", type=int, default=0,
                        help="capture a jax.profiler trace of the first N train "
                             "steps of each run into <logs>/<name>/profile/ "
                             "(view with tensorboard; the torch-tb-profiler "
                             "equivalent, SURVEY §5)")
    parser.add_argument("--parallelism", choices=["shard_map", "zero", "tp", "pp", "sp"],
                        default="shard_map",
                        help="training-step parallelism: shard_map data-parallel "
                             "(default, reference DDP semantics), 'zero' = pjit with "
                             "ZeRO param/optimizer sharding (FSDP-equivalent), 'tp' = "
                             "tensor parallel over a 2D (data, model) mesh, 'pp' = "
                             "GPipe pipeline over a ('pipe',) mesh, 'sp' = sequence "
                             "parallel: tower tokens sharded over a ('seq',) mesh")
    parser.add_argument("--tensor-parallel-size", type=int, default=0,
                        help="model-axis size for --parallelism tp "
                             "(0 = all devices on the model axis)")
    parser.add_argument("--pipeline-parallel-size", type=int, default=0,
                        help="stage count for --parallelism pp (0 = all devices; "
                             "must divide the towers' block counts)")
    parser.add_argument("--pp-microbatches", type=int, default=4,
                        help="microbatches per step for --parallelism pp")
    parser.add_argument("--sequence-parallel-size", type=int, default=0,
                        help="token-axis shard count for --parallelism sp "
                             "(0 = all devices on the seq axis)")
    parser.add_argument("--report-to", type=str, default="")
    parser.add_argument("--wandb-notes", type=str, default="",
                        help="notes for the wandb run (reference params.py)")
    parser.add_argument("--wandb-project-name", type=str, default="open-clip",
                        help="wandb project (reference default)")
    parser.add_argument("--remote-sync", type=str, default=None,
                        help="remote dir to sync checkpoints/logs to")
    parser.add_argument("--remote-sync-frequency", type=int, default=300)
    parser.add_argument("--remote-sync-protocol", choices=["s3", "fsspec"], default="fsspec")
    parser.add_argument("--log-every-n-steps", type=int, default=100)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--debug", action="store_true")
    parser.add_argument("--detect-anomaly", default=False, action="store_true",
                        help="abort on NaN/Inf in any jitted computation "
                             "(jax_debug_nans; torch.autograd.set_detect_anomaly "
                             "equivalent — reference train_combined_captions.py:157)")
    parser.add_argument("--copy-codebase", default=False, action="store_true")
    # accepted-but-inert torch flags (single pjit program replaces them)
    parser.add_argument("--use-bnb-linear", default=None,
                        help="int8 MLP linears (reference: bitsandbytes SwitchBack modules, "
                             "params.py:456). TPU-native: SwitchBack int8 MXU matmuls on "
                             "c_fc/c_proj during training; eval-only runs pre-quantize the "
                             "weights to int8 inference mode (core/quant.py)")
    for flag in ["--horovod", "--ddp-static-graph", "--torchcompile", "--trace",
                 "--use-bn-sync", "--skip-scheduler", "--torchscript",
                 "--no-set-device-rank", "--force-custom-text"]:
        parser.add_argument(flag, action="store_true", help="accepted for CLI compat; no-op on TPU")
    parser.add_argument("--dist-backend", type=str, default=None, help="no-op: JAX ICI/DCN")
    parser.add_argument("--dist-url", type=str, default=None,
                        help="multi-host coordinator ('env://' or 'tcp://host:port'); "
                             "with launcher env vars set (SLURM/torchrun/OMPI) the "
                             "coordinator is auto-discovered (reference distributed.py:63-99)")
    parser.add_argument("--device", type=str, default=None, help="no-op: uses jax.devices()")
    parser.add_argument("--force-image-size", type=int, default=None)
    parser.add_argument("--force-patch-dropout", type=float, default=None)

    ns = parser.parse_args(args)

    # reference default LR/betas/eps depend on model family (params.py:477-496)
    if ns.lr is None:
        ns.lr = 5.0e-4
    if ns.beta1 is None:
        ns.beta1 = 0.9
    if ns.beta2 is None:
        ns.beta2 = 0.98 if not ns.siglip else 0.95
    if ns.eps is None:
        ns.eps = 1.0e-6 if not ns.siglip else 1.0e-8
    return ns
