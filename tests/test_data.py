"""Data-layer tests: transforms, TSV datasets, DomainNet semantics, loader
ordering/sharding/prefetch, synthetic smoke data."""

import os

import numpy as np
import pytest
from PIL import Image

from xclip_tpu.data.datasets import (
    DomainNetCaptions,
    ImageNet,
    SyntheticDataset,
    TsvDataset,
)
from xclip_tpu.data.loader import DataLoader, default_collate, tokenizing_collate
from xclip_tpu.data.transforms import (
    OPENAI_DATASET_MEAN,
    OPENAI_DATASET_STD,
    image_transform,
)
from xclip_tpu.tokenizer import SimpleTokenizer


@pytest.fixture(scope="module")
def image_tree(tmp_path_factory):
    """A tiny ImageNet-style tree + DomainNet TSVs."""
    root = tmp_path_factory.mktemp("data")
    rng = np.random.RandomState(0)
    # imagenet: 3 classes x 4 val images
    for split in ("train", "val"):
        for ci in range(3):
            d = root / "imagenet" / split / f"n{ci:08d}"
            d.mkdir(parents=True)
            for j in range(4):
                Image.fromarray(rng.randint(0, 255, (40, 50, 3), np.uint8)).save(d / f"im{j}.jpg")
    # domainnet: 2 domains x 2 classes
    dn = root / "domainnet"
    for domain in ("real", "sketch"):
        rows = []
        for ci, cls in enumerate(("banana", "candle")):
            d = dn / domain / cls
            d.mkdir(parents=True)
            for j in range(3):
                p = d / f"{j}.jpg"
                Image.fromarray(rng.randint(0, 255, (32, 32, 3), np.uint8)).save(p)
                rows.append(f"{domain}/{cls}/{j}.jpg\t{ci}\ta photo of a {cls}.")
        for split in ("train", "test"):
            (dn / f"{domain}_{split}.tsv").write_text("\n".join(rows) + "\n")
    return root


def test_image_transform_val_shape():
    tf = image_transform(32, is_train=False)
    img = Image.fromarray(np.zeros((48, 64, 3), np.uint8))
    out = tf(img)
    assert out.shape == (32, 32, 3)
    expected = (0.0 - np.array(OPENAI_DATASET_MEAN)) / np.array(OPENAI_DATASET_STD)
    np.testing.assert_allclose(out[0, 0], expected, atol=1e-5)


def test_image_transform_train_shape():
    tf = image_transform(32, is_train=True, seed=0)
    img = Image.fromarray(np.random.RandomState(0).randint(0, 255, (64, 80, 3), np.uint8))
    assert tf(img).shape == (32, 32, 3)


def test_imagenet_dataset(image_tree):
    tf = image_transform(16, is_train=False)
    ds = ImageNet(str(image_tree / "imagenet"), split="val", transform=tf)
    assert len(ds) == 12
    img, label = ds[0]
    assert img.shape == (16, 16, 3)
    assert label == 0
    # class subset remap
    ds2 = ImageNet(str(image_tree / "imagenet"), split="val", transform=tf, class_idcs=[2])
    assert len(ds2) == 4 and ds2[0][1] == 0


MISSING = ["clipart", "infograph", "painting", "quickdraw"]


def test_domainnet_captions(image_tree):
    tf = image_transform(16, is_train=False)
    ds = DomainNetCaptions(
        str(image_tree / "domainnet"), "val", tf, exclude_domains=MISSING, mode="label+caption"
    )
    assert len(ds) == 12
    assert ds.samples_per_domain["real"] == 6
    img, label, caption = ds[0]
    assert caption.startswith("a photo of a")
    excl = DomainNetCaptions(
        str(image_tree / "domainnet"), "val", tf, exclude_domains=MISSING + ["sketch"]
    )
    assert len(excl) == 6
    filt = DomainNetCaptions(
        str(image_tree / "domainnet"), "val", tf, exclude_domains=MISSING,
        filter_classes={"real": {0}},
    )
    assert len(filt) == 9


def test_domainnet_to_tsv_roundtrip(image_tree, tmp_path):
    tf = image_transform(16, is_train=False)
    ds = DomainNetCaptions(
        str(image_tree / "domainnet"), "val", tf, exclude_domains=MISSING, mode="label+caption"
    )
    out = tmp_path / "out.tsv"
    ds.to_tsv(str(out))
    ds2 = TsvDataset(str(out), img_transform=tf)
    assert len(ds2) == len(ds)
    img, caption = ds2[0]
    assert img.shape == (16, 16, 3)


def test_loader_order_and_sharding(image_tree):
    tf = image_transform(8, is_train=False)
    ds = ImageNet(str(image_tree / "imagenet"), split="val", transform=tf)
    loader = DataLoader(ds, batch_size=5)
    batches = list(loader)
    assert len(batches) == 3
    labels = np.concatenate([b[1] for b in batches])
    np.testing.assert_array_equal(labels, ds.targets)
    # sharded loaders partition the data
    l0 = DataLoader(ds, batch_size=4, rank=0, world_size=2)
    l1 = DataLoader(ds, batch_size=4, rank=1, world_size=2)
    n = sum(len(b[1]) for b in l0) + sum(len(b[1]) for b in l1)
    assert n == len(ds)
    # shuffle determinism
    la = DataLoader(ds, batch_size=12, shuffle=True, seed=3)
    lb = DataLoader(ds, batch_size=12, shuffle=True, seed=3)
    np.testing.assert_array_equal(next(iter(la))[1], next(iter(lb))[1])
    lb.set_epoch(1)
    assert not np.array_equal(next(iter(la))[1], next(iter(lb))[1])


def test_synthetic_dataset_with_tokenizing_collate():
    tok = SimpleTokenizer()
    tf = image_transform(16, is_train=True, seed=0)
    ds = SyntheticDataset(tf, image_size=16, dataset_size=10)
    loader = DataLoader(ds, batch_size=4, collate=tokenizing_collate(tok), drop_last=True)
    batches = list(loader)
    assert len(batches) == 2
    assert batches[0]["images"].shape == (4, 16, 16, 3)
    assert batches[0]["texts"].shape == (4, 77)
    assert batches[0]["texts"][0, 0] == tok.sot_token_id


def test_subsample_per_class(image_tree):
    from xclip_tpu.data.datasets import subsample_per_class

    tf = image_transform(8, is_train=False)
    ds = ImageNet(str(image_tree / "imagenet"), split="val", transform=tf)
    subsample_per_class(ds, k=2, seed=0)
    counts = np.bincount(ds.targets)
    assert (counts == 2).all() and len(ds) == 6


def test_aug_cfg_color_jitter_and_grayscale():
    """--aug-cfg pipeline (reference transform.py:62-77, 242-271): color
    jitter bounded by strength, grayscale collapses channels, deterministic
    under a seed, and disabled-by-default path unchanged."""
    from PIL import Image

    from xclip_tpu.data.transforms import AugmentationCfg, aug_cfg_from_dict, image_transform

    rng = np.random.RandomState(0)
    img = Image.fromarray(rng.randint(0, 255, (96, 96, 3), np.uint8))

    plain = image_transform(32, is_train=True, seed=4)(img)
    plain2 = image_transform(32, is_train=True, seed=4, aug_cfg=AugmentationCfg())(img)
    np.testing.assert_array_equal(plain, plain2)  # default aug == no aug

    cfg = aug_cfg_from_dict({"color_jitter": 0.4, "color_jitter_prob": 1.0})
    assert cfg.color_jitter == (0.4, 0.4, 0.4)
    a = image_transform(32, is_train=True, seed=4, aug_cfg=cfg)(img)
    b = image_transform(32, is_train=True, seed=4, aug_cfg=cfg)(img)
    np.testing.assert_array_equal(a, b)  # deterministic
    assert np.abs(a - plain).max() > 1e-3  # jitter actually changed pixels

    gray = aug_cfg_from_dict({"gray_scale_prob": 1.0})
    g = image_transform(32, is_train=True, seed=4, aug_cfg=gray)(img)
    # un-normalize per channel; all channels equal after grayscale
    from xclip_tpu.data.transforms import OPENAI_DATASET_MEAN, OPENAI_DATASET_STD

    px = g * np.array(OPENAI_DATASET_STD) + np.array(OPENAI_DATASET_MEAN)
    assert np.abs(px[..., 0] - px[..., 1]).max() < 1e-6
    assert np.abs(px[..., 1] - px[..., 2]).max() < 1e-6

    assert aug_cfg_from_dict({"use_timm": True}).use_timm  # native timm branch
    with pytest.raises(ValueError, match="unknown aug_cfg"):
        aug_cfg_from_dict({"auto_augment": "rand-m9"})


def test_resize_modes():
    """val resize_mode variants (reference transform.py:297-369): 'longest'
    pads the short side (full image visible), 'squash' ignores aspect."""
    from PIL import Image

    from xclip_tpu.data.transforms import image_transform

    wide = Image.fromarray(np.full((40, 120, 3), 200, np.uint8))  # 120x40

    longest = image_transform(32, is_train=False, resize_mode="longest")(wide)
    assert longest.shape == (32, 32, 3)
    # top/bottom rows are padding (zeros -> normalized to -mean/std)
    from xclip_tpu.data.transforms import OPENAI_DATASET_MEAN, OPENAI_DATASET_STD

    pad_val = (0 - np.array(OPENAI_DATASET_MEAN)) / np.array(OPENAI_DATASET_STD)
    np.testing.assert_allclose(longest[0], np.broadcast_to(pad_val, (32, 3)), atol=1e-5)
    assert np.abs(longest[16] - pad_val).max() > 0.5  # middle rows are image

    squash = image_transform(32, is_train=False, resize_mode="squash")(wide)
    assert np.abs(squash[0] - pad_val).max() > 0.5  # no padding anywhere

    shortest = image_transform(32, is_train=False)(wide)
    assert np.abs(shortest[0] - pad_val).max() > 0.5  # cropped, no padding

    with pytest.raises(ValueError, match="resize_mode"):
        image_transform(32, is_train=False, resize_mode="stretch")


def test_uint8_transform_matches_float_path():
    """to_uint8 + on-device-style normalize == the host float path exactly
    (the float path normalizes the same post-resize uint8 array)."""
    from PIL import Image

    from xclip_tpu.data.transforms import (
        OPENAI_DATASET_MEAN,
        OPENAI_DATASET_STD,
        image_transform,
    )

    rng = np.random.RandomState(0)
    img = Image.fromarray(rng.randint(0, 255, (80, 100, 3), np.uint8))
    tf_f32 = image_transform(64, is_train=False)
    tf_u8 = image_transform(64, is_train=False, to_uint8=True)
    ref = tf_f32(img)
    u8 = tf_u8(img)
    assert u8.dtype == np.uint8 and u8.shape == (64, 64, 3)
    mean = np.asarray(OPENAI_DATASET_MEAN, np.float32)
    std = np.asarray(OPENAI_DATASET_STD, np.float32)
    renorm = (u8.astype(np.float32) / 255.0 - mean) / std
    np.testing.assert_allclose(renorm, ref, atol=1e-6)


@pytest.mark.skipif(
    not __import__("xclip_tpu.data.fastimage", fromlist=["HAVE_FASTIMAGE"]).HAVE_FASTIMAGE,
    reason="fastimage extension not built (make -C csrc)",
)
def test_fastimage_uint8_matches_float(tmp_path):
    """Native uint8 decode path tracks the float path within the post-resize
    quantization step (1/255)."""
    from PIL import Image

    from xclip_tpu.data.fastimage import FastImageTransform
    from xclip_tpu.data.transforms import OPENAI_DATASET_MEAN, OPENAI_DATASET_STD

    rng = np.random.RandomState(1)
    p = tmp_path / "x.jpg"
    Image.fromarray(rng.randint(0, 255, (120, 160, 3), np.uint8)).save(p, quality=95)
    data = p.read_bytes()

    f32 = FastImageTransform(64, is_train=False)(data)
    u8 = FastImageTransform(64, is_train=False, to_uint8=True)(data)
    assert u8.dtype == np.uint8
    mean = np.asarray(OPENAI_DATASET_MEAN, np.float32)
    std = np.asarray(OPENAI_DATASET_STD, np.float32)
    renorm = (u8.astype(np.float32) / 255.0 - mean) / std
    # one quantization step of slack, scaled by 1/std
    np.testing.assert_allclose(renorm, f32, atol=(0.5 / 255.0) / std.min() + 1e-6)


def test_imagenet_v2_dataset(tmp_path):
    """ImageNet-V2 numeric-dirname labels (int(dirname), NOT alphabetical —
    the imagenetv2_pytorch contract, reference training/data.py:130-131),
    including the package's download-layout subdirectory."""
    from PIL import Image

    from xclip_tpu.data.datasets import ImageNetV2

    tree = tmp_path / "imagenetv2-matched-frequency-format-val"
    rng = np.random.RandomState(0)
    for cls in ("0", "5", "10"):
        d = tree / cls
        d.mkdir(parents=True)
        Image.fromarray(rng.randint(0, 255, (8, 8, 3), np.uint8)).save(d / "a.jpeg")

    for root in (tree, tmp_path):  # direct tree and package layout
        ds = ImageNetV2(str(root))
        labels = sorted(t for _, t in ds.samples)
        assert labels == [0, 5, 10]  # alphabetical sort would give 0,10,5 -> 0,1,2
        img, target = ds[0]
        assert target in (0, 5, 10)


def test_aug_cfg_timm_branch_native():
    """use_timm=True runs the reference's timm create_transform pipeline
    natively (transform.py:309-332): RRC with an aspect-ratio range,
    color_jitter off by default, post-normalize pixel-noise RandomErasing."""
    from xclip_tpu.data.transforms import (AugmentationCfg, aug_cfg_from_dict,
                                           image_transform, random_erasing)

    cfg = aug_cfg_from_dict({"use_timm": True, "scale": (0.4, 1.0),
                             "ratio": (0.75, 4 / 3), "re_prob": 1.0,
                             "re_count": 2})
    assert cfg.use_timm and cfg.ratio == (0.75, 4 / 3) and cfg.re_prob == 1.0
    img = Image.fromarray(np.full((64, 80, 3), 128, np.uint8))
    t = image_transform(32, is_train=True, seed=0, aug_cfg=cfg)
    out = t(img)
    assert out.shape == (32, 32, 3) and out.dtype == np.float32
    # re_prob=1: at least one erased box -> high-variance noise pixels exist
    # in the otherwise-constant image
    assert float(np.std(out)) > 0.05

    # uint8 shipping path: erasing fills with random bytes
    t8 = image_transform(32, is_train=True, seed=0, aug_cfg=cfg, to_uint8=True)
    out8 = t8(img)
    assert out8.dtype == np.uint8 and int(out8.std()) > 0

    # deterministic per-seed
    o1 = image_transform(32, is_train=True, seed=7, aug_cfg=cfg)(img)
    o2 = image_transform(32, is_train=True, seed=7, aug_cfg=cfg)(img)
    np.testing.assert_allclose(o1, o2)

    # erasing geometry: boxes stay in bounds, count respected (statistically)
    import random as _random
    arr = np.zeros((32, 32, 3), np.float32)
    erased = random_erasing(arr, _random.Random(0), count=1)
    changed = np.any(erased != 0, axis=-1)
    assert 0 < changed.sum() < 32 * 32  # some but not all pixels

    # re_prob=0 -> timm branch without erasing is still deterministic RRC
    cfg0 = AugmentationCfg(use_timm=True, scale=(0.9, 1.0))
    outs = image_transform(32, is_train=True, seed=3, aug_cfg=cfg0)(img)
    assert outs.shape == (32, 32, 3)


def test_device_prefetcher_order_and_early_exit():
    """DevicePrefetcher yields placed batches in order, propagates placement
    errors, and shuts its worker down on early exit (train/main.py
    --batch-prefetch path)."""
    import jax

    from xclip_tpu.data.device_prefetch import DevicePrefetcher, prefetch_to_device
    from xclip_tpu.parallel.mesh import create_mesh, shard_batch

    batches = [{"images": np.full((8, 4), i, np.float32),
                "texts": np.full((8, 3), i, np.int32)} for i in range(6)]
    mesh = create_mesh()
    got = list(prefetch_to_device(iter(batches), mesh, depth=2))
    assert len(got) == 6
    for i, b in enumerate(got):
        assert isinstance(b["images"], jax.Array)
        np.testing.assert_array_equal(np.asarray(b["images"]), batches[i]["images"])
        assert b["images"].sharding == shard_batch(mesh, batches[i])["images"].sharding

    # early exit: breaking mid-iteration must not hang or leak
    pre = DevicePrefetcher(iter(batches), lambda b: shard_batch(mesh, b), depth=1)
    it = iter(pre)
    next(it), next(it)
    it.close()  # generator close runs the finally-block drain

    # placement errors surface on the consumer side
    def boom(b):
        raise RuntimeError("bad placement")

    with pytest.raises(RuntimeError, match="bad placement"):
        list(DevicePrefetcher(iter(batches), boom, depth=2))
