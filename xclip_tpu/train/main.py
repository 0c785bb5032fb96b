"""Training session orchestrator — the `training.main.main()` equivalent.

Reference behaviour: deps/open_clip/src/training/main.py:71-503 — experiment
naming, resume-latest scan, model + data construction, optimizer, per-epoch
train/eval loop, checkpoint saving (epoch_{N}.pt, atomic epoch_latest.pt via
tmp+os.replace, log-spaced step checkpoints) — and train.py:64-264
(train_one_epoch with data/gpu/batch-time meters and samples/s logging).

TPU differences: one process drives all local chips (no process-per-device),
the train step is one pjit-compiled program (see train/step.py), there is no
GradScaler, and checkpoints are written in the open_clip torch format by
default so reference tooling can read them (--native-ckpt switches to .npz).
"""

from __future__ import annotations

import glob
import json
import logging
import math
import os
import re
import time
from datetime import datetime
from typing import Dict, Optional

import jax
import numpy as np

from xclip_tpu.data.datasets import SyntheticDataset, TsvDataset
from xclip_tpu.data.loader import DataLoader, tokenizing_collate
from xclip_tpu.models.factory import create_model_and_transforms
from xclip_tpu.parallel.mesh import DistInfo, create_mesh
from xclip_tpu.tokenizer import get_tokenizer
from xclip_tpu.train import optim, schedule
from xclip_tpu.train.evaluate import evaluate
from xclip_tpu.train.params import parse_args
from xclip_tpu.train.step import TrainStepCfg, make_train_step
from xclip_tpu.utils.meters import AverageMeter, setup_logging

LATEST_CHECKPOINT_NAME = "epoch_latest.pt"


def natural_key(s):
    return [int(t) if t.isdigit() else t for t in re.split(r"(\d+)", s.lower())]


def get_latest_checkpoint(path: str) -> Optional[str]:
    files = glob.glob(os.path.join(path, "**/*.pt"), recursive=True)
    files += glob.glob(os.path.join(path, "**/*.npz"), recursive=True)
    if files:
        return sorted(files, key=natural_key)[-1]
    return None


def get_data(args, preprocess_train, preprocess_val, tokenizer) -> Dict:
    data = {}
    collate = tokenizing_collate(tokenizer)
    dataset_type = args.dataset_type
    if dataset_type == "auto" and args.train_data:
        ext = args.train_data.split(".")[-1]
        if ext == "tar":
            dataset_type = "webdataset"  # reference get_dataset_fn data.py:560
        else:
            dataset_type = "csv" if ext in ("csv", "tsv") else "synthetic"

    info = DistInfo.current()
    if args.train_data and dataset_type == "webdataset":
        from xclip_tpu.data.wds import WdsLoader, WebDatasetReader

        weights = None
        if args.train_data_upsampling_factors:
            assert getattr(args, "dataset_resampled", False), (
                "--train-data-upsampling-factors is only supported when sampling with "
                "replacement (with --dataset-resampled)"
            )
            weights = [float(w) for w in args.train_data_upsampling_factors.split("::")]
        reader = WebDatasetReader(
            args.train_data,
            transform=preprocess_train,
            resampled=getattr(args, "dataset_resampled", False),
            weights=weights,
            json_caption_key="caption" if getattr(args, "json_captions", False) else None,
            shuffle=True,
            seed=args.seed,
            rank=jax.process_index(),
            world_size=jax.process_count(),
            num_workers=args.workers,
        )
        # per-PROCESS batch: this host's local devices only; shard_batch
        # assembles the global array across hosts (the reader is already
        # rank/world sharded above)
        data["train"] = WdsLoader(
            reader, args.batch_size * args.accum_freq * jax.local_device_count(),
            tokenizer=tokenizer,
            num_samples=(args.train_num_samples or 0) // jax.process_count(),
        )
    elif args.train_data and dataset_type in ("csv", "tsv"):
        ds = TsvDataset(args.train_data, img_transform=preprocess_train)
        # per-step, per-PROCESS batch over this host's local devices
        # (reference --batch-size is per device: effective global batch =
        # batch * accum * world); samples are rank-sharded like the
        # reference's DistributedSampler
        data["train"] = DataLoader(
            ds, args.batch_size * args.accum_freq * jax.local_device_count(),
            shuffle=True, seed=args.seed, drop_last=True, num_threads=args.workers,
            collate=collate, rank=jax.process_index(), world_size=jax.process_count(),
        )
    elif dataset_type == "synthetic":
        ds = SyntheticDataset(
            preprocess_train,
            image_size=preprocess_train.cfg.size,
            dataset_size=args.train_num_samples or 100,
        )
        data["train"] = DataLoader(
            ds, args.batch_size * args.accum_freq * jax.local_device_count(),
            shuffle=True, seed=args.seed, drop_last=True, num_threads=args.workers,
            collate=collate, rank=jax.process_index(), world_size=jax.process_count(),
        )
    if args.val_data:
        ds = TsvDataset(args.val_data, img_transform=preprocess_val)
        data["val"] = DataLoader(ds, args.batch_size, num_threads=args.workers, collate=collate)
    if args.imagenet_val:
        from xclip_tpu.data.datasets import ImageNet

        root = args.imagenet_val
        split = "val"
        if root.rstrip("/").endswith("val"):
            root, split = os.path.dirname(root.rstrip("/")), "val"
        ds = ImageNet(root, split=split, transform=preprocess_val)
        data["imagenet-val"] = DataLoader(ds, args.batch_size, num_threads=args.workers)
    if getattr(args, "imagenet_v2", None):
        from xclip_tpu.data.datasets import ImageNetV2

        ds = ImageNetV2(args.imagenet_v2, transform=preprocess_val)
        data["imagenet-v2"] = DataLoader(ds, args.batch_size, num_threads=args.workers)
    return data


def save_checkpoint(args, model, params, state, opt_state, epoch: int, step_tag: str = "") -> None:
    name = f"epoch_{epoch}{step_tag}"
    torch_compat = args.torch_compat_ckpt
    if torch_compat:
        from xclip_tpu.core.checkpoint import save_open_clip_checkpoint

        save_open_clip_checkpoint(
            os.path.join(args.checkpoint_path, f"{name}.pt"), model, params, state,
            epoch=epoch, name=args.name, opt_state=opt_state,
        )
    else:
        from xclip_tpu.core.checkpoint import save_native

        save_native(
            os.path.join(args.checkpoint_path, f"{name}.npz"), params, state,
            extras={"epoch": epoch, "name": args.name}, opt_state=opt_state,
        )
    if args.save_most_recent:
        # atomic latest (reference main.py:478-483)
        if torch_compat:
            from xclip_tpu.core.checkpoint import save_open_clip_checkpoint

            tmp = os.path.join(args.checkpoint_path, "tmp.pt")
            save_open_clip_checkpoint(
                tmp, model, params, state, epoch=epoch, name=args.name, opt_state=opt_state
            )
            os.replace(tmp, os.path.join(args.checkpoint_path, LATEST_CHECKPOINT_NAME))
        else:
            from xclip_tpu.core.checkpoint import save_native

            tmp = os.path.join(args.checkpoint_path, "tmp.npz")
            save_native(tmp, params, state, extras={"epoch": epoch, "name": args.name},
                        opt_state=opt_state)
            os.replace(tmp, os.path.join(args.checkpoint_path, "epoch_latest.npz"))


def train_one_epoch(model, step_fn, params, state, opt_state, data, epoch, args, info,
                    tb_writer=None, wandb_run=None, place_batch=None) -> tuple:
    data["train"].set_epoch(epoch)
    loader = data["train"]
    num_batches_per_epoch = loader.num_batches
    sample_digits = math.ceil(math.log10(loader.num_samples + 1))

    losses_m = AverageMeter()
    batch_time_m = AverageMeter()
    data_time_m = AverageMeter()
    gpu_time_m = AverageMeter()
    end = time.time()

    next_log_step = getattr(args, "next_log_ckpt_step", 0)

    # --profile-steps: device trace of the first N steps of epoch 0
    # (jax.profiler == the reference's torch-tb-profiler dev dep, SURVEY §5)
    profile_steps = getattr(args, "profile_steps", 0) if epoch == 0 else 0
    profiling = False
    if profile_steps > 0:
        trace_dir = os.path.join(os.path.dirname(args.checkpoint_path), "profile")
        jax.profiler.start_trace(trace_dir)
        profiling = True
        logging.info(f"profiling {profile_steps} steps -> {trace_dir}")

    # Input overlap + deferred sync: with place_batch set, host->device
    # transfers of batch N+1 run on a background thread while the device
    # executes step N (the reference's pinned-memory non_blocking=True copy,
    # train.py:98-101), and the per-step hard sync (float(loss)) is deferred
    # to the log boundary — steps chain device-side through donated params,
    # so the host never serializes transfer+compute+fetch. Per-step losses
    # are kept as device scalars and fetched in ONE device_get per window,
    # preserving the reference's every-step loss meter updates exactly.
    batches = loader
    depth = getattr(args, "batch_prefetch", 2) or 0
    if place_batch is not None and depth > 0:
        from xclip_tpu.data.device_prefetch import DevicePrefetcher

        batches = DevicePrefetcher(loader, place_batch, depth=depth)
    pending = []  # [(device_loss, device_logit_scale)] since the last sync
    last = {"scale": 0.0}

    def sync_pending():
        if pending:
            vals = jax.device_get(pending)
            for loss, _scale in vals:
                losses_m.update(float(loss), n=args.batch_size)
            del pending[:]
            last["scale"] = float(vals[-1][1])
        return last["scale"]  # last synced step's logit scale, for the log line

    needs_rng = getattr(step_fn, "needs_rng", False)
    for i, batch in enumerate(batches):
        step = num_batches_per_epoch * epoch + i
        data_time_m.update(time.time() - end)
        gpu_start = time.time()

        if needs_rng:  # patch dropout: per-step rng seed (fold_in of step idx)
            batch = {**batch, "step": np.int32(step)}
        params, new_state, opt_state, metrics = step_fn(params, state, opt_state, batch)
        # --lock-image-freeze-bn-stats: keep the locked tower's BN running
        # stats fixed (all model state IS visual BN stats)
        if not (args.lock_image and args.lock_image_freeze_bn_stats):
            state = new_state
        pending.append((metrics["loss"], metrics["logit_scale"]))
        if profiling:
            sync_pending()  # per-step sync keeps the trace window faithful

        gpu_time_m.update(time.time() - gpu_start)

        if profiling and i + 1 >= profile_steps:
            jax.profiler.stop_trace()
            profiling = False

        batch_count = i + 1
        logging_now = (
            batch_count % args.log_every_n_steps == 0 or batch_count == num_batches_per_epoch
        )
        if logging_now:
            scale_val = sync_pending()  # hard sync: the window's device time
            # lands in this step's batch_time, so the window AVG is exact
        batch_time_m.update(time.time() - end)
        end = time.time()

        if logging_now:
            num_samples = batch_count * args.batch_size * args.accum_freq * info.world_size
            samples_per_epoch = loader.num_samples
            percent_complete = 100.0 * batch_count / num_batches_per_epoch
            # .avg, not .val: with deferred sync the whole window's device
            # time is attributed to the boundary step, so only the windowed
            # mean is meaningful (== the reference's steady-state .val)
            samples_per_second = args.accum_freq * args.batch_size * info.world_size / batch_time_m.avg
            samples_per_second_per_gpu = args.accum_freq * args.batch_size / batch_time_m.avg
            logging.info(
                f"Train Epoch: {epoch} [{num_samples:>{sample_digits}}/{samples_per_epoch} ({percent_complete:.0f}%)] "
                f"Loss: {losses_m.val:#.5g} ({losses_m.avg:#.4g}) "
                f"Data (t): {data_time_m.avg:.3f} "
                f"Batch (t): {batch_time_m.avg:.3f}, {samples_per_second:#g}/s, "
                f"{samples_per_second_per_gpu:#g}/s/gpu "
                f"Scale: {scale_val:.3f}"
            )
            if tb_writer is not None or wandb_run is not None:
                log_data = [
                    ("train/loss", losses_m.val),
                    ("train/logit_scale", scale_val),
                    ("train/samples_per_second", samples_per_second),
                    ("train/samples_per_second_per_gpu", samples_per_second_per_gpu),
                    ("train/data_time", data_time_m.avg),
                    ("train/batch_time", batch_time_m.avg),
                ]
                if tb_writer is not None:
                    for name, val in log_data:
                        tb_writer.add_scalar(name, val, step)
                if wandb_run is not None:  # reference train.py:241-248
                    wandb_run.log(dict(log_data), step=step)
            batch_time_m.reset()
            gpu_time_m.reset()
            data_time_m.reset()

        if args.save_logs and args.save_log_step and next_log_step and (
            step >= next_log_step or batch_count == num_batches_per_epoch
        ):
            args.next_log_ckpt_step = next_log_step = next_log_step * 2
            save_checkpoint(args, model, params, state, opt_state, epoch, step_tag=f"_step_{step}")

    sync_pending()  # loaders may yield != num_batches; never drop meter updates
    if profiling:  # epoch shorter than --profile-steps
        jax.profiler.stop_trace()
    return params, state, opt_state


def copy_codebase(args) -> int:
    """Snapshot the framework source into <logs>/<name>/code for
    reproducibility (reference training/main.py:506-520, --copy-codebase)."""
    from shutil import copytree, ignore_patterns

    new_code_path = os.path.join(args.logs, args.name, "code")
    if os.path.exists(new_code_path):
        print(f"Error. Experiment already exists at {new_code_path}. Use --name to specify a new experiment.")
        return -1
    logging.info(f"Copying codebase to {new_code_path}")
    package_root = os.path.dirname(os.path.dirname(os.path.realpath(__file__)))
    copytree(package_root, new_code_path, ignore=ignore_patterns("log", "logs", "wandb", "__pycache__"))
    logging.info("Done copying code.")
    return 1


def main(argv=None) -> int:
    args = parse_args(argv)
    # multi-host bootstrap from launcher env (SLURM/torchrun/OMPI), the
    # reference's init_distributed_device env path (distributed.py:63-99);
    # a no-op for single-process runs
    from xclip_tpu.parallel.mesh import init_distributed_from_env

    init_distributed_from_env(getattr(args, "dist_url", None))
    info = DistInfo.current()

    if getattr(args, "detect_anomaly", False):
        # torch.autograd.set_detect_anomaly equivalent: error out (with the
        # offending primitive) as soon as any jitted value turns NaN/Inf
        jax.config.update("jax_debug_nans", True)

    if args.name is None:
        model_name_safe = args.model.replace("/", "-")
        date_str = datetime.now().strftime("%Y_%m_%d-%H_%M_%S")
        args.name = "-".join([
            date_str,
            f"model_{model_name_safe}",
            f"lr_{args.lr}",
            f"b_{args.batch_size}",
            f"j_{args.workers}",
            f"p_{args.precision}",
        ])

    resume_latest = args.resume == "latest"
    log_base_path = os.path.join(args.logs, args.name)
    os.makedirs(log_base_path, exist_ok=True)
    args.log_path = os.path.join(log_base_path, "out.log")
    if os.path.exists(args.log_path) and not resume_latest:
        print(f"Error. Experiment already exists. Use --name {args.name}-new to specify a new experiment.")
        return -1

    setup_logging(args.log_path, logging.DEBUG if args.debug else logging.INFO)
    if getattr(args, "copy_codebase", False):
        if copy_codebase(args) == -1:
            return -1
    args.checkpoint_path = os.path.join(log_base_path, "checkpoints")
    os.makedirs(args.checkpoint_path, exist_ok=True)
    args.save_logs = True
    args.tensorboard = "tensorboard" in args.report_to or "all" in args.report_to
    tb_writer = None
    if args.tensorboard:
        try:
            from torch.utils.tensorboard.writer import SummaryWriter

            tb_writer = SummaryWriter(log_dir=os.path.join(log_base_path, "tensorboard"))
        except ImportError:
            logging.warning("tensorboard unavailable; skipping --report-to tensorboard")
    args.wandb = "wandb" in args.report_to or "all" in args.report_to
    wandb_run = None
    if args.wandb and info.process_index == 0:
        from xclip_tpu.utils.wandb_logger import init_wandb

        wandb_run = init_wandb(args, log_base_path)
    args.next_log_ckpt_step = 1 if args.save_log_step else 0

    if resume_latest:
        args.resume = get_latest_checkpoint(args.checkpoint_path)
        if args.resume:
            logging.info(f"Found latest resume checkpoint at {args.resume}.")
        else:
            logging.info(f"No latest resume checkpoint found in {args.checkpoint_path}.")

    logging.info(
        f"Running on {jax.device_count()} device(s) ({jax.devices()[0].platform}); "
        f"process {info.process_index}/{info.world_size // max(jax.local_device_count(), 1)}."
    )

    remote_sync_process = None
    if args.remote_sync is not None:
        from xclip_tpu.utils.file_utils import remote_sync, start_sync_process

        # verify once, then sync in the background (reference main.py:168-189)
        if not remote_sync(log_base_path, os.path.join(args.remote_sync, args.name),
                           args.remote_sync_protocol):
            logging.error("Error: remote sync failed. Exiting.")
            return -1
        remote_sync_process = start_sync_process(
            args.remote_sync_frequency, log_base_path,
            os.path.join(args.remote_sync, args.name), args.remote_sync_protocol,
        )
        remote_sync_process.start()

    from xclip_tpu.models.factory import is_coca_model

    is_coca = is_coca_model(args.model)
    model, params, state, preprocess_train, preprocess_val = create_model_and_transforms(
        args.model, pretrained=args.pretrained or None, precision="fp32",
        force_quick_gelu=args.force_quick_gelu,
        force_image_size=args.force_image_size,
        force_patch_dropout=args.force_patch_dropout,
        seed=args.seed,
    )
    if getattr(args, "use_bnb_linear", None):
        # TPU-native int8: SwitchBack matmuls on the MLP c_fc/c_proj linears
        # (reference main.py:251-259 swaps in bnb triton SwitchBack modules)
        from xclip_tpu.core import quant

        logging.info(f"=> replacing linear layers with {args.use_bnb_linear}")
        quant.set_switchback(True)
    if (getattr(args, "aug_cfg", None) or args.image_mean or args.image_std
            or args.image_resize_mode or args.image_interpolation):
        from xclip_tpu.data.transforms import (
            OPENAI_DATASET_MEAN,
            OPENAI_DATASET_STD,
            aug_cfg_from_dict,
            image_transform,
        )

        mean = tuple(args.image_mean) if args.image_mean else OPENAI_DATASET_MEAN
        std = tuple(args.image_std) if args.image_std else OPENAI_DATASET_STD
        interp = args.image_interpolation or "bicubic"
        preprocess_train = image_transform(
            model.cfg.image_size, is_train=True, mean=mean, std=std,
            aug_cfg=aug_cfg_from_dict(args.aug_cfg), interpolation=interp,
        )
        preprocess_val = image_transform(
            model.cfg.image_size, is_train=False, mean=mean, std=std,
            resize_mode=args.image_resize_mode or "shortest", interpolation=interp,
        )
    if getattr(args, "device_normalize", True) and getattr(preprocess_train, "to_uint8", None) is False:
        # ship uint8 images and normalize on-device: 4x smaller host->device
        # transfers; numerically identical to the host path (PIL resize
        # already returns uint8 before ToTensor/Normalize)
        preprocess_train.to_uint8 = True
    # get_tokenizer reads context_length from the config's text_cfg (default
    # 77) exactly like the reference factory: 76 for CoCa's cls-token towers,
    # 77 for HF towers with no explicit context_length (e.g. coca_roberta)
    tokenizer = get_tokenizer(args.model)
    model_vocab = getattr(getattr(model.cfg, "text", None), "vocab_size", None)
    tok_vocab = getattr(tokenizer, "vocab_size", None)
    if model_vocab and tok_vocab and tok_vocab > model_vocab:
        # out-of-range ids turn into NaN-filled gathers inside jit (torch
        # would raise an IndexError at the embedding lookup); fail loudly on
        # the host instead
        raise ValueError(
            f"tokenizer vocab ({tok_vocab}) exceeds the model's text "
            f"vocab_size ({model_vocab}) — token ids would index out of "
            f"range. Fix the model config or pass a matching tokenizer."
        )
    data = get_data(args, preprocess_train, preprocess_val, tokenizer)
    assert "train" in data or args.val_data, "no data"

    start_epoch = 0
    mesh = create_mesh()
    opt_state = None
    step_fn = None

    if "train" in data:
        total_steps = data["train"].num_batches * args.epochs
        if args.lr_scheduler == "cosine":
            sched = schedule.cosine_lr(args.lr, args.warmup, total_steps)
        elif args.lr_scheduler == "const":
            sched = schedule.const_lr(args.lr, args.warmup, total_steps)
        else:
            cooldown_steps = data["train"].num_batches * (args.epochs_cooldown or 0)
            sched = schedule.const_lr_cooldown(
                args.lr, args.warmup, total_steps, cooldown_steps,
                args.lr_cooldown_power, args.lr_cooldown_end,
            )
        tx = optim.adamw(
            sched, beta1=args.beta1, beta2=args.beta2, eps=args.eps,
            weight_decay=args.wd, grad_clip_norm=args.grad_clip_norm or 0.0,
        )
        if args.lock_image or args.lock_text:
            # LiT-style tower locking (reference main.py:268-276)
            tx = optim.with_frozen(tx, optim.lock_mask(
                params,
                lock_image=args.lock_image,
                lock_image_unlocked_groups=args.lock_image_unlocked_groups,
                lock_text=args.lock_text,
                lock_text_unlocked_layers=args.lock_text_unlocked_layers,
                lock_text_freeze_layer_norm=args.lock_text_freeze_layer_norm,
            ))
        if getattr(getattr(model.cfg, "vision", None), "pos_embed_type", "learnable") == "sin_cos_2d":
            # fixed sin-cos pos embed never updates (reference
            # transformer.py:472-476, requires_grad=False)
            tx = optim.with_frozen(tx, optim.sincos_freeze_mask(params))
        distill = bool(args.distill_model and args.distill_pretrained)
        step_cfg = TrainStepCfg(
            precision="bf16" if args.precision in ("amp", "amp_bf16", "amp_bfloat16", "bf16", "fp16") else "fp32",
            local_loss=True,  # the TPU layout is always the local row-block
            # differentiable gather is free on TPU, so it is the default;
            # an explicit --gather-with-grad keeps reference CLIs working
            gather_with_grad=True,
            grad_checkpointing=args.grad_checkpointing,
            accum_freq=args.accum_freq,
            siglip=args.siglip,
            seed=args.seed,
            coca=is_coca,
            coca_caption_loss_weight=args.coca_caption_loss_weight,
            coca_contrastive_loss_weight=args.coca_contrastive_loss_weight,
            image_mean=tuple(args.image_mean) if args.image_mean else None,
            image_std=tuple(args.image_std) if args.image_std else None,
        )
        if args.parallelism != "shard_map":
            # the pjit-family steps implement the contrastive/SigLIP/CoCa
            # step (incl. cached-negatives --accum-freq and CoCa+accum,
            # step_pjit.accum_grads) and distill (make_distill_train_step_pjit)
            unsupported = [
                name for name, on in [
                    # CoCa + distill run under zero (global-math losses); the
                    # tp/pp/sp shardings target the CLIP tower layout
                    ("CoCa models", is_coca and args.parallelism != "zero"),
                    ("--distill-*", distill and args.parallelism != "zero"),
                ] if on
            ]
            if unsupported:
                raise ValueError(
                    f"--parallelism {args.parallelism} does not support: "
                    + ", ".join(unsupported) + " (use the default shard_map step)"
                )
        if args.parallelism == "zero":
            from xclip_tpu.train.step_pjit import make_train_step_pjit, zero_sharding

            params = jax.device_put(params, zero_sharding(mesh, params))
            opt_state = tx.init(params)  # moments inherit the param shardings
            step_fn = make_train_step_pjit(
                model, tx, mesh, step_cfg, shard_params=True,
                example_params=params, example_opt_state=opt_state,
            )
        elif args.parallelism == "tp":
            from xclip_tpu.parallel.tp import (
                create_mesh_2d, make_train_step_tp, shard_params_tp)

            n_model = args.tensor_parallel_size or jax.device_count()
            if jax.device_count() % n_model != 0:
                raise ValueError(
                    f"--tensor-parallel-size {n_model} does not divide "
                    f"{jax.device_count()} devices")
            mesh = create_mesh_2d(jax.device_count() // n_model, n_model)
            params = shard_params_tp(mesh, params)
            opt_state = tx.init(params)
            step_fn = make_train_step_tp(model, tx, mesh, step_cfg)
        elif args.parallelism == "pp":
            from xclip_tpu.parallel.pp import create_pipe_mesh, make_train_step_pp

            n_stages = args.pipeline_parallel_size or jax.device_count()
            mesh = create_pipe_mesh(n_stages)
            opt_state = tx.init(params)
            step_fn = make_train_step_pp(
                model, tx, mesh, step_cfg, n_micro=args.pp_microbatches)
        elif args.parallelism == "sp":
            from xclip_tpu.parallel.sp import create_seq_mesh, make_train_step_sp

            n_seq = args.sequence_parallel_size or jax.device_count()
            mesh = create_seq_mesh(n_seq)
            opt_state = tx.init(params)
            step_fn = make_train_step_sp(model, tx, mesh, step_cfg)
        else:
            opt_state = tx.init(params)
            step_fn = make_train_step(model, tx, mesh, step_cfg)
        if distill:
            from xclip_tpu.models.factory import create_model as _create

            teacher_model, t_params, t_state = _create(
                args.distill_model, pretrained=args.distill_pretrained
            )
            # distill runs at accum_freq 1 like the reference: train.py's
            # accumulation branch (115-164) never forwards dist_model, so
            # --distill-* + --accum-freq>1 has no reference semantics
            dcfg = TrainStepCfg(
                precision="bf16" if args.precision in ("amp", "amp_bf16", "amp_bfloat16", "bf16", "fp16") else "fp32",
                local_loss=True,
                grad_checkpointing=args.grad_checkpointing,
            )
            if args.parallelism == "zero":
                from xclip_tpu.train.step_pjit import make_distill_train_step_pjit

                raw_step = make_distill_train_step_pjit(
                    model, teacher_model, tx, mesh, dcfg, shard_params=True,
                    example_params=params, example_opt_state=opt_state,
                )
            else:
                from xclip_tpu.train.step import make_distill_train_step

                raw_step = make_distill_train_step(model, teacher_model, tx, mesh, dcfg)
            step_fn = lambda p, s, o, b: raw_step(p, s, o, t_params, t_state, b)

    if args.resume:
        from xclip_tpu.core.checkpoint import load_checkpoint_full

        params, state, opt_state, extras = load_checkpoint_full(
            args.resume, model, params, state, opt_state
        )
        if args.parallelism == "tp" and step_fn is not None:
            # re-commit the loaded (host) params to their TP shardings; the
            # loaded moments stay replicated (correct, memory-suboptimal)
            from xclip_tpu.parallel.tp import shard_params_tp

            params = shard_params_tp(mesh, params)
        if isinstance(extras.get("epoch"), int):
            # authoritative: the stored epoch (covers epoch_latest.pt, whose
            # filename carries no number — reference main.py:342-346)
            start_epoch = extras["epoch"]
        else:
            m = re.search(r"epoch_(\d+)", os.path.basename(args.resume))
            if m:
                start_epoch = int(m.group(1))
        logging.info(f"=> resuming checkpoint '{args.resume}' (epoch {start_epoch})")

    if "train" not in data:
        if getattr(args, "use_bnb_linear", None):
            # int8 inference mode: pre-quantize the MLP weights (reference
            # main.py:422-425 convert_int8_model_to_inference_mode)
            from xclip_tpu.core import quant

            quant.set_switchback(False)
            params = quant.quantize_params(params)
        metrics = evaluate(model, params, state, data, start_epoch, args, tokenizer)
        _append_results(args, metrics)
        if wandb_run is not None:
            wandb_run.log({f"val/{k}": v for k, v in metrics.items()
                           if isinstance(v, (int, float))})
            wandb_run.finish()
        return 0

    # transfer/compute overlap: the dp and ZeRO steps consume data-axis
    # sharded batches (step.py/step_pjit.py in_shardings), so the prefetch
    # thread can place them ahead of dispatch; the tp/pp/sp research steps
    # keep their own (mesh-specific) placement inside jit
    place_batch = None
    if args.parallelism in ("shard_map", "zero") and getattr(args, "batch_prefetch", 2):
        from xclip_tpu.parallel.mesh import shard_batch

        place_batch = lambda b: shard_batch(mesh, b)

    for epoch in range(start_epoch, args.epochs):
        logging.info(f"Start epoch {epoch}")
        params, state, opt_state = train_one_epoch(
            model, step_fn, params, state, opt_state, data, epoch, args, info, tb_writer,
            wandb_run=wandb_run, place_batch=place_batch,
        )
        completed_epoch = epoch + 1

        if any(k in data for k in ("val", "imagenet-val", "imagenet-v2")):
            metrics = evaluate(model, params, state, data, completed_epoch, args, tokenizer)
            _append_results(args, metrics)
            if wandb_run is not None:  # reference train.py:241-248
                wandb_run.log({f"val/{k}": v for k, v in metrics.items()
                               if isinstance(v, (int, float))},
                              step=completed_epoch * data["train"].num_batches)

        if args.save_logs and (
            completed_epoch == args.epochs or (args.save_frequency > 0 and completed_epoch % args.save_frequency == 0)
        ):
            save_checkpoint(args, model, params, state, opt_state, completed_epoch)
            if args.delete_previous_checkpoint:
                # reference main.py:472-475
                ext = "pt" if args.torch_compat_ckpt else "npz"
                prev = os.path.join(args.checkpoint_path, f"epoch_{completed_epoch - 1}.{ext}")
                if os.path.exists(prev):
                    os.remove(prev)

    if wandb_run is not None:
        wandb_run.finish()
    if remote_sync_process is not None:
        from xclip_tpu.utils.file_utils import remote_sync

        remote_sync_process.terminate()
        remote_sync(log_base_path, os.path.join(args.remote_sync, args.name),
                    args.remote_sync_protocol)
    return 0


def _append_results(args, metrics: Dict) -> None:
    if metrics and args.save_logs:
        with open(os.path.join(args.checkpoint_path, "results.jsonl"), "a+") as fh:
            fh.write(json.dumps(metrics) + "\n")


if __name__ == "__main__":
    raise SystemExit(main())
