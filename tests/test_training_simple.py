"""End-to-end training smoke tests through the real main() entry point on
synthetic data — the reference's CPU test pattern
(deps/open_clip/tests/test_training_simple.py:17-103), here on an 8-virtual-
device CPU mesh so the sharded step, meters, checkpointing and resume all
exercise for real."""

import os

import numpy as np
import pytest

from xclip_tpu.train.main import main

SMALL_MODEL = "ViT-S-32"  # smallest bundled config


def _args(tmp_path, name, extra=()):
    return [
        "--save-frequency", "1",
        "--zeroshot-frequency", "1",
        "--dataset-type", "synthetic",
        "--train-num-samples", "32",
        "--warmup", "1",
        "--batch-size", "2",
        "--lr", "1e-3",
        "--wd", "0.1",
        "--epochs", "1",
        "--workers", "2",
        "--model", SMALL_MODEL,
        "--logs", str(tmp_path),
        "--name", name,
        "--log-every-n-steps", "1",
        *extra,
    ]


def test_training_synthetic(tmp_path):
    assert main(_args(tmp_path, "smoke")) == 0
    ckpt = tmp_path / "smoke" / "checkpoints" / "epoch_1.pt"
    assert ckpt.exists()
    # checkpoint is readable by torch in open_clip format
    import torch

    d = torch.load(str(ckpt), map_location="cpu", weights_only=False)
    assert d["epoch"] == 1
    assert "state_dict" in d and "logit_scale" in d["state_dict"]


def test_training_accum_and_remat(tmp_path):
    assert main(_args(tmp_path, "smoke-accum", ["--accum-freq", "2", "--grad-checkpointing"])) == 0


def test_training_resume_latest(tmp_path):
    assert main(_args(tmp_path, "resume")) == 0
    # second run resumes from epoch_1 and trains epoch 2
    args = _args(tmp_path, "resume", ["--resume", "latest"])
    idx = args.index("--epochs")
    args[idx + 1] = "2"
    assert main(args) == 0
    assert (tmp_path / "resume" / "checkpoints" / "epoch_2.pt").exists()
    # epoch 0 must have trained exactly once across both runs (the resume
    # read the stored epoch, not the filename)
    log = (tmp_path / "resume" / "out.log").read_text()
    assert log.count("Start epoch 0") == 1 and log.count("Start epoch 1") == 1


def test_training_resume_from_epoch_latest(tmp_path):
    """--save-most-recent + --resume latest picks epoch_latest.pt (no epoch
    number in the filename): start_epoch must come from the stored epoch so
    completed epochs are not silently re-run (ADVICE r1)."""
    assert main(_args(tmp_path, "resume-ml", ["--save-most-recent"])) == 0
    assert (tmp_path / "resume-ml" / "checkpoints" / "epoch_latest.pt").exists()
    args = _args(tmp_path, "resume-ml", ["--save-most-recent", "--resume", "latest"])
    idx = args.index("--epochs")
    args[idx + 1] = "2"
    assert main(args) == 0
    import torch

    latest = torch.load(str(tmp_path / "resume-ml" / "checkpoints" / "epoch_latest.pt"),
                        map_location="cpu", weights_only=False)
    assert latest["epoch"] == 2
    assert "optimizer" in latest  # Adam moments persisted for the next resume
    log = (tmp_path / "resume-ml" / "out.log").read_text()
    assert log.count("Start epoch 0") == 1 and log.count("Start epoch 1") == 1


def test_opt_state_roundtrip(tmp_path):
    """Optimizer state (Adam moments + schedule step count) survives both
    checkpoint formats; resume does not restart warmup (ADVICE r1, reference
    training/main.py:355-360)."""
    import jax
    import jax.numpy as jnp

    from xclip_tpu.core.checkpoint import (
        load_checkpoint_full,
        save_native,
        save_open_clip_checkpoint,
    )
    from xclip_tpu.models.clip import CLIPModel, clip_cfg_from_dict
    from xclip_tpu.parallel.mesh import create_mesh
    from xclip_tpu.train import optim, schedule
    from xclip_tpu.train.step import TrainStepCfg, make_train_step

    cfg = {
        "embed_dim": 32,
        "vision_cfg": {"image_size": 32, "layers": 2, "width": 32, "patch_size": 16, "head_width": 8},
        "text_cfg": {"context_length": 16, "vocab_size": 512, "width": 32, "heads": 4, "layers": 2},
    }
    model = CLIPModel(clip_cfg_from_dict(cfg))
    params, state = model.init(jax.random.PRNGKey(0))
    tx = optim.adamw(schedule.cosine_lr(1e-3, 5, 100), weight_decay=0.1, grad_clip_norm=1.0)
    opt_state = tx.init(params)
    step = make_train_step(model, tx, mesh=create_mesh(), cfg=TrainStepCfg(precision="fp32"))
    rng = np.random.RandomState(0)
    batch = {
        "images": rng.randn(16, 32, 32, 3).astype(np.float32),
        "texts": rng.randint(1, 400, size=(16, 16)).astype(np.int32),
    }
    for _ in range(3):
        params, state, opt_state, _ = step(params, state, opt_state, dict(batch))

    want = [np.asarray(x) for x in jax.tree_util.tree_leaves(opt_state)]
    for fmt in ("pt", "npz"):
        path = str(tmp_path / f"ck.{fmt}")
        if fmt == "pt":
            save_open_clip_checkpoint(path, model, params, state, epoch=3, name="t",
                                      opt_state=opt_state)
        else:
            save_native(path, params, state, extras={"epoch": 3, "name": "t"},
                        opt_state=opt_state)
        p0, s0 = model.init(jax.random.PRNGKey(1))
        template = tx.init(p0)
        p1, s1, opt1, extras = load_checkpoint_full(path, model, p0, s0, template)
        assert extras["epoch"] == 3
        got = [np.asarray(x) for x in jax.tree_util.tree_leaves(opt1)]
        assert len(got) == len(want)
        for g, w in zip(got, want):
            np.testing.assert_allclose(g, w, rtol=1e-6, err_msg=fmt)
        # params restored too (moments belong to these weights)
        np.testing.assert_allclose(
            np.asarray(p1["logit_scale"]), np.asarray(params["logit_scale"]), rtol=1e-6
        )


def test_training_native_ckpt(tmp_path):
    assert main(_args(tmp_path, "native", ["--native-ckpt"])) == 0
    assert (tmp_path / "native" / "checkpoints" / "epoch_1.npz").exists()


def test_training_with_val_data(tmp_path):
    """--val-data drives the in-training evaluate() path: contrastive val
    loss + retrieval metrics -> results.jsonl (reference train.py:267-373)."""
    import json

    from PIL import Image

    rng = np.random.RandomState(0)
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rows = ["filepath\ttitle"]
    for i in range(6):
        p = img_dir / f"{i}.jpg"
        Image.fromarray(rng.randint(0, 255, (40, 40, 3), np.uint8)).save(p)
        rows.append(f"{p}\ta photo number {i}")
    tsv = tmp_path / "val.tsv"
    tsv.write_text("\n".join(rows) + "\n")

    assert main(_args(tmp_path, "with-val", ["--val-data", str(tsv), "--val-frequency", "1"])) == 0
    results = tmp_path / "with-val" / "checkpoints" / "results.jsonl"
    assert results.exists()
    rec = json.loads(results.read_text().splitlines()[-1])
    assert "clip_val_loss" in rec and np.isfinite(rec["clip_val_loss"])
    assert "image_to_text_R@1" in rec


def test_training_webdataset(tmp_path):
    """--dataset-type webdataset end-to-end: tar shards -> parallel reader ->
    WdsLoader -> sharded train step (reference get_wds_dataset path)."""
    import io
    import tarfile

    from PIL import Image

    shard_dir = tmp_path / "shards"
    shard_dir.mkdir()
    rng = np.random.RandomState(0)
    for s in range(2):
        with tarfile.open(shard_dir / f"train-{s:03d}.tar", "w") as tf:
            for i in range(16):
                img = Image.fromarray(rng.randint(0, 255, (64, 64, 3), np.uint8))
                buf = io.BytesIO()
                img.save(buf, format="JPEG")
                info = tarfile.TarInfo(f"{s:03d}{i:04d}.jpg")
                info.size = len(buf.getvalue())
                tf.addfile(info, io.BytesIO(buf.getvalue()))
                cap = ('{"caption": "a photo number %d"}' % i).encode()
                info = tarfile.TarInfo(f"{s:03d}{i:04d}.json")
                info.size = len(cap)
                tf.addfile(info, io.BytesIO(cap))

    args = _args(tmp_path, "wds-smoke", [
        "--train-data", str(shard_dir / "train-{000..001}.tar"),
        "--json-captions",
    ])
    idx = args.index("--dataset-type")
    args[idx + 1] = "webdataset"
    assert main(args) == 0
    assert (tmp_path / "wds-smoke" / "checkpoints" / "epoch_1.pt").exists()


def test_training_webdataset_requires_num_samples(tmp_path):
    args = _args(tmp_path, "wds-missing", ["--train-data", str(tmp_path / "x-{000..001}.tar")])
    idx = args.index("--dataset-type")
    args[idx + 1] = "webdataset"
    idx = args.index("--train-num-samples")
    del args[idx:idx + 2]
    with pytest.raises(ValueError, match="train-num-samples"):
        main(args)


def test_get_data_tar_autodetect(tmp_path):
    """--dataset-type auto with .tar train data dispatches to the webdataset
    loader (reference get_dataset_fn extension rule, data.py:560)."""
    from xclip_tpu.data.wds import WdsLoader
    from xclip_tpu.train.main import get_data
    from xclip_tpu.train.params import parse_args

    args = parse_args([
        "--train-data", str(tmp_path / "x-{000..001}.tar"),
        "--train-num-samples", "64",
        "--batch-size", "2",
        "--model", SMALL_MODEL,
    ])
    assert args.dataset_type == "auto"

    from xclip_tpu.data.transforms import image_transform
    from xclip_tpu.tokenizer import get_tokenizer

    pre = image_transform(32, is_train=True)
    data = get_data(args, pre, image_transform(32, is_train=False), get_tokenizer(SMALL_MODEL))
    assert isinstance(data["train"], WdsLoader)
    assert data["train"].num_batches == 64 // (2 * __import__("jax").device_count())


def test_training_wandb_offline(tmp_path):
    """--report-to wandb works without the wandb package: the offline
    fallback records config + the train metric stream (reference wandb
    wiring: training/main.py:388-411, train.py:241-248)."""
    import json

    assert main(_args(tmp_path, "smoke-wandb", ["--report-to", "wandb"])) == 0
    wdir = tmp_path / "smoke-wandb" / "wandb-offline"
    assert (wdir / "config.json").exists()
    cfg = json.loads((wdir / "config.json").read_text())
    assert cfg["model"] == SMALL_MODEL
    rows = [json.loads(l) for l in (wdir / "history.jsonl").read_text().splitlines()]
    assert rows and all("train/loss" in r and "_step" in r for r in rows)
    summary = json.loads((wdir / "summary.json").read_text())
    assert "train/samples_per_second" in summary


def test_training_parallelism_zero(tmp_path):
    """--parallelism zero: the ZeRO-sharded pjit step through the real CLI."""
    assert main(_args(tmp_path, "smoke-zero", ["--parallelism", "zero"])) == 0
    assert (tmp_path / "smoke-zero" / "checkpoints" / "epoch_1.pt").exists()


def test_training_parallelism_tp(tmp_path):
    """--parallelism tp: tensor-parallel 2x4 mesh through the real CLI."""
    assert main(_args(tmp_path, "smoke-tp",
                      ["--parallelism", "tp", "--tensor-parallel-size", "4"])) == 0
    assert (tmp_path / "smoke-tp" / "checkpoints" / "epoch_1.pt").exists()


def test_training_parallelism_guard(tmp_path):
    """The remaining shard_map/zero-only features are rejected loudly under
    the tower-layout parallelisms (distill + CoCa compose with zero since
    round 4; tp/pp/sp shardings target the plain CLIP tower layout)."""
    import pytest as _pytest

    with _pytest.raises(ValueError, match="distill"):
        main(_args(tmp_path, "smoke-guard",
                   ["--parallelism", "tp", "--tensor-parallel-size", "4",
                    "--distill-model", "ViT-S-32",
                    "--distill-pretrained", "x.pt"]))


def test_training_parallelism_zero_accum(tmp_path):
    """--parallelism zero composes with --accum-freq (cached-negatives
    accumulation in the pjit step, step_pjit.accum_grads)."""
    assert main(_args(tmp_path, "smoke-zero-accum",
                      ["--parallelism", "zero", "--accum-freq", "2"])) == 0
    assert (tmp_path / "smoke-zero-accum" / "checkpoints" / "epoch_1.pt").exists()


def test_training_profile_steps(tmp_path):
    """--profile-steps captures a jax.profiler trace of the first steps."""
    assert main(_args(tmp_path, "smoke-prof", ["--profile-steps", "2"])) == 0
    prof = tmp_path / "smoke-prof" / "profile"
    assert prof.exists()
    # the trace lands as plugins/profile/<run>/*.xplane.pb
    assert list(prof.rglob("*.xplane.pb")), list(prof.rglob("*"))


def test_training_parallelism_pp(tmp_path):
    """--parallelism pp: GPipe 4-stage pipeline through the real CLI."""
    assert main(_args(tmp_path, "smoke-pp",
                      ["--parallelism", "pp", "--pipeline-parallel-size", "4",
                       "--pp-microbatches", "2"])) == 0
    assert (tmp_path / "smoke-pp" / "checkpoints" / "epoch_1.pt").exists()


def test_training_parallelism_sp(tmp_path):
    """--parallelism sp: sequence-parallel 4-way token sharding through the
    real CLI (tower sequences pad up to the mesh size)."""
    assert main(_args(tmp_path, "smoke-sp",
                      ["--parallelism", "sp", "--sequence-parallel-size", "4"])) == 0
    assert (tmp_path / "smoke-sp" / "checkpoints" / "epoch_1.pt").exists()
