"""Cache CLIP features, then train the SAE (reference: scripts/train_sae.py:
feature shards -> Pipeline with L1+L2 loss, AdamWithReset, dead-neuron
resampling)."""

import argparse
import os
import shutil

import _common  # noqa: F401
import numpy as np

from xclip_tpu.data.datasets import DomainNetCaptions, TsvDataset
from xclip_tpu.data.transforms import image_transform
from xclip_tpu.models.factory import create_model
from xclip_tpu.sae import optim as sae_optim
from xclip_tpu.sae.cache import cache_image_features, concat_datasets
from xclip_tpu.sae.losses import SAELossCfg
from xclip_tpu.sae.model import SAECfg, sae_init
from xclip_tpu.sae.pipeline import Pipeline
from xclip_tpu.sae.resampler import ActivationResampler

import jax


def save_activations(args):
    acts_dir = os.path.join(args.out_dir, "activations")
    os.makedirs(acts_dir, exist_ok=True)
    model, params, state = create_model(args.img_enc_name, pretrained=args.ckpt_path)
    preprocess_val = image_transform(model.cfg.image_size, is_train=False)

    def has(prefix):
        return any(f.startswith(prefix) for f in os.listdir(acts_dir))

    if args.domainnet_only:
        if not has("train_activations"):
            ds = DomainNetCaptions(args.domainnet_path, "train", transform=preprocess_val, mode="none")
            cache_image_features(model, params, state, ds, acts_dir,
                                 batch_size=args.activations_bs, num_threads=args.num_workers)
        if not has("train_val_activations"):
            ds = DomainNetCaptions(args.domainnet_path, "val", transform=preprocess_val, mode="none")
            cache_image_features(model, params, state, ds, acts_dir, prefix="train_val_activations",
                                 batch_size=args.activations_bs, num_threads=args.num_workers)
    else:
        if not has("train_activations"):
            ds = concat_datasets([
                DomainNetCaptions(args.domainnet_path, "train", transform=preprocess_val, mode="none"),
                TsvDataset(os.path.join(args.cc12m_path, "cc12m-train.tsv"),
                           img_transform=preprocess_val, return_caption=False),
            ])
            cache_image_features(model, params, state, ds, acts_dir, shard_batches=295,
                                 batch_size=args.activations_bs, num_threads=args.num_workers)
        if not has("train_val_activations"):
            ds = concat_datasets([
                DomainNetCaptions(args.domainnet_path, "val", transform=preprocess_val, mode="none"),
                TsvDataset(os.path.join(args.cc12m_path, "cc12m-val.tsv"),
                           img_transform=preprocess_val, return_caption=False),
            ])
            cache_image_features(model, params, state, ds, acts_dir, prefix="train_val_activations",
                                 batch_size=args.activations_bs, num_threads=args.num_workers)


def train_sae(args):
    ckpt_dir = os.path.join(args.out_dir, "checkpoints")
    shutil.rmtree(ckpt_dir, ignore_errors=True)
    os.makedirs(ckpt_dir, exist_ok=False)

    n_learned = int(args.input_dim * args.expansion_factor)
    cfg = SAECfg(args.input_dim, n_learned, n_components=len(args.hook_points))
    params = sae_init(jax.random.PRNGKey(args.seed), cfg)

    resampler = ActivationResampler(
        n_learned_features=n_learned,
        resample_interval=1,
        n_activations_activity_collate=1,
        max_n_resamples=10**9,
        resample_epoch_freq=args.resample_freq,
        resample_dataset_size=args.resample_dataset_size,
        seed=args.seed,
    )
    logger = None
    try:
        from torch.utils.tensorboard.writer import SummaryWriter

        logger = SummaryWriter(log_dir=os.path.join(args.out_dir, "tensorboard"))
    except ImportError:
        pass
    wandb_run = None
    if "wandb" in args.report_to:
        # reference SAE pipeline logs to TB and wandb (pipeline.py:142-175)
        from xclip_tpu.utils.wandb_logger import ScalarFanout, init_wandb

        wandb_run = init_wandb(args, args.out_dir)
        logger = ScalarFanout(logger, wandb_run)

    pipe = Pipeline(
        params,
        SAELossCfg(l1_coefficient=args.l1_coeff),
        sae_optim.adam(args.lr, b1=args.adam_beta_1, b2=args.adam_beta_2, eps=args.adam_epsilon),
        ckpt_dir,
        activation_resampler=resampler,
        logger=logger,
        seed=args.seed,
    )

    acts_dir = os.path.join(args.out_dir, "activations")
    fnames = os.listdir(acts_dir)
    train_fnames = [os.path.join(acts_dir, f) for f in fnames
                    if f.startswith("train") and not f.startswith("train_val")]
    train_val_fnames = [os.path.join(acts_dir, f) for f in fnames if f.startswith("train_val")]
    if args.val_freq == 0:
        train_fnames, train_val_fnames = train_fnames + train_val_fnames, None

    pipe.run_pipeline(
        train_batch_size=args.train_sae_bs,
        checkpoint_frequency=args.ckpt_freq,
        val_frequency=args.val_freq,
        num_epochs=args.num_epochs,
        train_fnames=train_fnames,
        train_val_fnames=train_val_fnames,
        resample_epoch_freq=args.resample_freq,
    )
    if wandb_run is not None:
        wandb_run.finish()  # flushes the offline summary.json


def main(args):
    np.random.seed(args.seed)
    save_activations(args)
    train_sae(args)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--l1_coeff", type=float, default=3e-4)
    parser.add_argument("--lr", type=float, default=1e-4)
    parser.add_argument("--adam_beta_1", type=float, default=0.9)
    parser.add_argument("--adam_beta_2", type=float, default=0.999)
    parser.add_argument("--adam_epsilon", type=float, default=1e-8)
    parser.add_argument("--adam_weight_decay", type=float, default=0.0)
    parser.add_argument("--img_enc_name", type=str, default="RN50")
    parser.add_argument("--out_dir", type=str, required=True)
    parser.add_argument("--ckpt_path", type=str, required=True)
    parser.add_argument("--domainnet_path", type=str, required=True)
    parser.add_argument("--cc12m_path", type=str, default="")
    parser.add_argument("--domainnet_only", action="store_true", default=False)
    parser.add_argument("--activations_bs", type=int, default=1024)
    parser.add_argument("--num_workers", type=int, default=6)
    parser.add_argument("--hook_points", nargs="*", default=["out"])
    parser.add_argument("--resample_freq", type=int, default=500_000)
    parser.add_argument("--resample_dataset_size", type=int, default=819_200)
    parser.add_argument("--val_freq", type=int, default=50_000)
    parser.add_argument("--ckpt_freq", type=int, default=500_000)
    parser.add_argument("--input_dim", type=int, default=1024)
    parser.add_argument("--train_sae_bs", type=int, default=4096)
    parser.add_argument("--expansion_factor", type=int, default=4)
    parser.add_argument("--num_epochs", type=int, default=200)
    parser.add_argument("--seed", type=int, default=49)
    parser.add_argument("--report_to", type=str, default="",
                        help="'wandb' adds a wandb run (offline fallback) next to tensorboard")
    main(parser.parse_args())
