"""Dataset zoo: filesystem/TSV-indexed datasets producing numpy samples.

Reference behaviour: xclip/datasets.py:1017-1469 (ImageNet/CorruptedImageNet/
ImageNetSketch ImageFolder wrappers with class-subset remapping,
ImageNetCaptions JSON shards, DomainNetCaptions per-domain TSVs with
exclude_domains/filter_classes, TsvDataset ``filepath\ttitle`` contract,
CombinedNet 1345-class joint label space, CompositionDataset) and the
training engine's CsvDataset/SyntheticDataset
(deps/open_clip/src/training/data.py:35-53,511-535).

These are plain-Python index objects (no torch dependency): ``__getitem__``
returns dicts of numpy arrays / python scalars; batching + device transfer is
the loader's job (xclip_tpu/data/loader.py). Image decode/augment runs on
host CPU threads.
"""

from __future__ import annotations

import json
import os
from typing import Callable, Dict, List, Optional, Sequence, Set, Tuple

import numpy as np
from PIL import Image

ALL_DOMAINS = ["clipart", "infograph", "painting", "quickdraw", "real", "sketch"]
DOMAIN_TO_IDX = {d: i for i, d in enumerate(ALL_DOMAINS)}

IMG_EXTENSIONS = (".jpg", ".jpeg", ".png", ".ppm", ".bmp", ".pgm", ".tif", ".tiff", ".webp")


def _imagenet_class_labels():
    # imported lazily: evals.metadata pulls in the evals package, which
    # imports this module (avoid the cycle at import time)
    from xclip_tpu.evals.metadata import XCLIP_IMAGENET_CLASSES

    return dict(enumerate(XCLIP_IMAGENET_CLASSES))


def _open_rgb(path: str) -> Image.Image:
    return Image.open(path).convert("RGB")


class ImageFolderIndex:
    """torchvision-ImageFolder-equivalent directory index: classes are the
    sorted subdirectory names; samples are (path, class_idx)."""

    def __init__(self, root: str, transform: Optional[Callable] = None,
                 target_transform: Optional[Callable] = None):
        self.root = root
        self.transform = transform
        self.target_transform = target_transform
        self.classes = sorted(
            d.name for d in os.scandir(root) if d.is_dir()
        )
        self.class_to_idx = {c: i for i, c in enumerate(self.classes)}
        self.samples: List[Tuple[str, int]] = []
        for cls in self.classes:
            cdir = os.path.join(root, cls)
            files = sorted(
                os.path.join(cdir, f)
                for f in os.listdir(cdir)
                if f.lower().endswith(IMG_EXTENSIONS)
            )
            self.samples.extend((f, self.class_to_idx[cls]) for f in files)

    def __len__(self) -> int:
        return len(self.samples)

    def __getitem__(self, index: int):
        path, label = self.samples[index]
        img = _open_rgb(path)
        if self.transform:
            img = self.transform(img)
        if self.target_transform:
            label = self.target_transform(label)
        return img, label


def _remap_classes(ds: ImageFolderIndex, class_idcs: Sequence[int]) -> None:
    class_idcs = sorted(class_idcs)
    tgt_map = {c: i for i, c in enumerate(class_idcs)}
    ds.classes = [ds.classes[c] for c in class_idcs]
    ds.samples = [(p, tgt_map[t]) for p, t in ds.samples if t in tgt_map]
    ds.class_to_idx = {k: tgt_map[v] for k, v in ds.class_to_idx.items() if v in tgt_map}
    ds.class_labels = {tgt_map[k]: v for k, v in ds.class_labels.items() if k in tgt_map}


class ImageNet(ImageFolderIndex):
    """ImageNet train/val with OpenAI classname labels and optional
    class-subset remapping (xclip/datasets.py:1017-1041)."""

    def __init__(self, root: str, split: str = "train", transform=None,
                 target_transform=None, class_idcs: Optional[Sequence[int]] = None, **_):
        assert split in ("train", "val")
        super().__init__(os.path.join(root, split), transform, target_transform)
        self.class_labels = _imagenet_class_labels()
        if class_idcs is not None:
            _remap_classes(self, class_idcs)
        self.targets = np.array([t for _, t in self.samples])


class ImageNetV2(ImageFolderIndex):
    """ImageNet-V2 tree: class subdirectories are NUMERIC ImageNet indices
    ("0".."999"), so labels come from int(dirname), not alphabetical order
    (the imagenetv2_pytorch ImageNetV2Dataset contract the reference uses,
    training/data.py:130-131 — that package only adds downloading, which a
    zero-egress box can't do; point this at the extracted tree)."""

    def __init__(self, root: str, transform=None, target_transform=None, **_):
        if not any(d.name.isdigit() for d in os.scandir(root) if d.is_dir()):
            # accept the package's download layout: root/imagenetv2-*-val/
            subs = [d.path for d in os.scandir(root)
                    if d.is_dir() and d.name.startswith("imagenetv2-")]
            assert len(subs) == 1, f"no imagenetv2 class tree under {root}"
            root = subs[0]
        super().__init__(root, transform, target_transform)
        # relabel: int(dirname) is the ImageNet class index
        relabel = {self.class_to_idx[c]: int(c) for c in self.classes}
        self.samples = [(p, relabel[t]) for p, t in self.samples]
        self.class_to_idx = {c: int(c) for c in self.classes}
        self.class_labels = _imagenet_class_labels()
        self.targets = np.array([t for _, t in self.samples])


class CorruptedImageNet(ImageFolderIndex):
    """ImageNet-C: root/<corruption>/<severity>/ (xclip/datasets.py:1044)."""

    def __init__(self, root: str, corruption: str, severity: int = 3, transform=None,
                 target_transform=None, class_idcs: Optional[Sequence[int]] = None, **_):
        path = os.path.join(root, corruption, str(severity))
        assert os.path.isdir(path), path
        super().__init__(path, transform, target_transform)
        self.class_labels = _imagenet_class_labels()
        if class_idcs is not None:
            _remap_classes(self, class_idcs)
        self.targets = np.array([t for _, t in self.samples])


class ImageNetSketch(ImageFolderIndex):
    """ImageNet-Sketch (xclip/datasets.py:1074)."""

    def __init__(self, root: str, split: str = "sketch", transform=None,
                 target_transform=None, class_idcs: Optional[Sequence[int]] = None, **_):
        assert split == "sketch"
        path = root if root.endswith("sketch") else os.path.join(root, split)
        super().__init__(path, transform, target_transform)
        self.class_labels = _imagenet_class_labels()
        if class_idcs is not None:
            _remap_classes(self, class_idcs)
        self.targets = np.array([t for _, t in self.samples])


class ImageNetCaptions:
    """ImageNet-Captions JSON shards -> (image, label/caption) samples with a
    ``to_tsv`` exporter (xclip/datasets.py:1101-1175)."""

    def __init__(self, shard_path: str, imagenet_path: str, split: str,
                 transform: Callable, target_transform=None, mode: str = "label"):
        shard_path = os.path.abspath(shard_path)
        imagenet_path = os.path.abspath(imagenet_path)
        self.class_to_idx = ImageNet(imagenet_path, "train").class_to_idx

        with open(shard_path) as fh:
            json_data = json.load(fh)
        if any(s in json_data for s in ("train", "val")):
            assert split in ("train", "val")
            shards = json_data[split]
            img_paths = [p for shard in shards for p in shard]
            img_labels = [self.class_to_idx[self._wnid_from_path(p)] for p in img_paths]
        else:
            img_paths = [os.path.join("captions", d["wnid"], d["filename"]) for d in json_data]
            img_labels = [self.class_to_idx[d["wnid"]] for d in json_data]
        self.samples = [
            (os.path.join(imagenet_path, p), lab) for p, lab in zip(img_paths, img_labels)
        ]

        assert mode in ("label", "caption", "label+caption", "path")
        self.return_label = "label" in mode
        self.return_caption = "caption" in mode
        self.return_path = "path" in mode
        self.transform = transform
        self.target_transform = target_transform

    @staticmethod
    def _wnid_from_path(path: str) -> str:
        _, wnid, _ = path.split("/")
        assert len(wnid) == 9
        return wnid

    def _caption_from_path(self, path: str) -> str:
        with open(f"{os.path.splitext(path)[0]}.json") as fh:
            return json.load(fh)["caption"]

    def to_tsv(self, path: str, preprocess_text: bool = True) -> None:
        from xclip_tpu.data.text_clean import remove_html_tags

        with open(path, "w") as fh:
            fh.write("filepath\ttitle\n")
            for img_path, _ in self.samples:
                caption = self._caption_from_path(img_path).replace("\n", " ")
                if preprocess_text:
                    caption = remove_html_tags(caption)
                fh.write(f"{img_path}\t{caption}\n")

    def __len__(self) -> int:
        return len(self.samples)

    def __getitem__(self, index: int):
        path, label = self.samples[index]
        img = self.transform(_open_rgb(path))
        if self.target_transform:
            label = self.target_transform(label)
        if self.return_path:
            return img, path
        sample = (img, label) if self.return_label else (img,)
        if self.return_caption:
            sample += (self._caption_from_path(path),)
        return sample


class DomainNetCaptions:
    """Per-domain DomainNet TSV index with domain exclusion and class
    filtering (xclip/datasets.py:1177-1234). TSV rows: path\tlabel\tcaption."""

    def __init__(self, domainnet_path: str, split: str, transform: Callable,
                 exclude_domains: Sequence[str] = (), filter_classes: Dict[str, Set[int]] = {},
                 mode: str = "label"):
        domainnet_path = os.path.abspath(domainnet_path)
        assert split in ("train", "val")
        split = "test" if split == "val" else split
        assert mode in ("none", "label", "caption", "label+caption")
        self.return_label = "label" in mode
        self.return_caption = "caption" in mode

        self.samples_per_domain = {d: 0 for d in ALL_DOMAINS}
        self.samples: List[Tuple[str, int, str]] = []
        for domain in ALL_DOMAINS:
            if domain in exclude_domains:
                continue
            with open(os.path.join(domainnet_path, f"{domain}_{split}.tsv")) as fh:
                rows = [line.split("\t") for line in fh.readlines()]
            samples = [
                (os.path.join(domainnet_path, p), int(label), caption.strip())
                for p, label, caption in rows
            ]
            if domain in filter_classes:
                samples = [s for s in samples if s[1] not in filter_classes[domain]]
            self.samples_per_domain[domain] = len(samples)
            self.samples.extend(samples)
        self.transform = transform

    def to_tsv(self, path: str) -> None:
        with open(path, "w") as fh:
            fh.write("filepath\ttitle\n")
            fh.writelines(f"{p}\t{caption}\n" for p, _, caption in self.samples)

    def __len__(self) -> int:
        return len(self.samples)

    def __getitem__(self, index: int):
        path, label, caption = self.samples[index]
        img = self.transform(Image.open(path))
        sample = (img, label) if self.return_label else (img,)
        sample += (caption,) if self.return_caption else ()
        assert sample
        return sample if len(sample) > 1 else sample[0]


class TsvDataset:
    """``filepath\ttitle`` contract (xclip/datasets.py:1237-1264; the
    training-engine CsvDataset equivalent, training/data.py:35-53)."""

    def __init__(self, tsv_path: str, img_transform: Callable,
                 txt_transform: Optional[Callable] = None, return_caption: bool = True):
        with open(tsv_path) as fh:
            lines = fh.readlines()
        assert lines[0].strip("\n") == "filepath\ttitle", tsv_path
        self.samples = [line.strip("\n").split("\t") for line in lines[1:]]
        self.img_transform = img_transform
        self.txt_transform = txt_transform
        self.return_caption = return_caption

    def __len__(self) -> int:
        return len(self.samples)

    def __getitem__(self, index: int):
        path, caption = self.samples[index]
        if getattr(self.img_transform, "wants_path", False):
            img = self.img_transform(path)  # native decode path (fastimage)
        else:
            img = self.img_transform(_open_rgb(path))
        if not self.return_caption:
            return img
        if self.txt_transform:
            caption = self.txt_transform(caption)
        return img, caption


class CombinedNet:
    """Joint 1345-class ImageNet+DomainNet label space
    (xclip/datasets.py:1267-1326): labels derived from the parent directory —
    wnid dirs map through the IN class index (DN-overlapping IN classes fold
    into their DN class + 1000), plain-name dirs map to DN idx + 1000."""

    def __init__(self, index_path: str, in_class_index_path: str, class_mapping_path: str,
                 transform: Callable, target_transform=None):
        with open(in_class_index_path) as fh:
            in_class_index = json.load(fh)
        self.wnid_to_idx = {wnid: int(label) for label, (wnid, _) in in_class_index.items()}

        with open(class_mapping_path) as fh:
            class_mapping = json.load(fh)
        self.cls_to_idx = {c: i for i, c in enumerate(class_mapping)}
        assert self.cls_to_idx["banana"] == 13
        assert self.cls_to_idx["candle"] == 58
        assert self.cls_to_idx["lion"] == 174

        self.in_to_dn_idx = {
            in_idx: self.cls_to_idx[dn_cls]
            for dn_cls, in_indices in class_mapping.items()
            if in_indices is not None
            for in_idx in in_indices
        }

        with open(index_path) as fh:
            lines = fh.readlines()
        assert lines[0] == "filepath\ttitle\n"
        paths = [line.strip("\n").split("\t")[0] for line in lines[1:]]
        self.samples = [(p, self._label_from_path(p)) for p in paths]
        self.transform = transform
        self.target_transform = target_transform

    def _label_from_path(self, path: str) -> int:
        identifier = path.split("/")[-2].replace("_", " ").lower()
        if identifier in self.wnid_to_idx:
            assert identifier not in self.cls_to_idx
            in_label = self.wnid_to_idx[identifier]
            return self.in_to_dn_idx[in_label] + 1000 if in_label in self.in_to_dn_idx else in_label
        assert identifier in self.cls_to_idx
        return self.cls_to_idx[identifier] + 1000

    def __len__(self) -> int:
        return len(self.samples)

    def __getitem__(self, index: int):
        path, label = self.samples[index]
        img = self.transform(_open_rgb(path))
        if self.target_transform:
            label = self.target_transform(label)
        return img, label


class SyntheticDataset:
    """In-memory random images + fixed caption, for smoke tests without any
    data on disk (reference: training/data.py:511-535)."""

    def __init__(self, transform: Callable, image_size: int = 224,
                 caption: str = "Dummy caption", dataset_size: int = 100, seed: int = 0):
        self.transform = transform
        self.caption = caption
        rng = np.random.RandomState(seed)
        self._images = [
            Image.fromarray(rng.randint(0, 256, (image_size, image_size, 3), np.uint8))
            for _ in range(min(dataset_size, 16))
        ]
        self.size = dataset_size

    def __len__(self) -> int:
        return self.size

    def __getitem__(self, index: int):
        img = self.transform(self._images[index % len(self._images)])
        return img, self.caption


class CompositionDataset:
    """MIT-States / UT-Zappos attribute-object compositions
    (xclip/datasets.py:1329-1446). Metadata is the published torch ``.t7``
    file; torch (CPU) is used only to deserialize it."""

    def __init__(self, root: str, split: str, transform: Callable, target_transform=None,
                 antonym_prompts: bool = False, also_return_obj_label: bool = False):
        import torch

        self.root = root
        self.split = split
        self.metadata = torch.load(
            os.path.join(root, "metadata_compositional-split-natural.t7"), weights_only=False
        )

        all_info, split_info = self._parse_split()
        self.attrs, self.objs, self.pairs = all_info
        self.train_pairs, self.valid_pairs, self.test_pairs = split_info

        self.obj2idx = {o: i for i, o in enumerate(self.objs)}
        self.attr2idx = {a: i for i, a in enumerate(self.attrs)}
        self.pair2idx = {p: i for i, p in enumerate(self.pairs)}
        self.idx2obj = {i: o for o, i in self.obj2idx.items()}
        self.idx2attr = {i: a for a, i in self.attr2idx.items()}
        self.idx2pair = {i: p for p, i in self.pair2idx.items()}
        self.unique_objs = list({noun for _, noun in self.pairs})
        self.unique_attrs = list({attr for attr, _ in self.pairs})
        self.antonym_data = load_antonym_data(root)
        assert (antonym_prompts and self.antonym_data) or not antonym_prompts

        self.train_data, self.valid_data, self.test_data = self._get_split_info()
        self.data = {"train": self.train_data, "valid": self.valid_data}.get(split, self.test_data)
        self.sample_indices = list(range(len(self.data)))
        self.sample_pairs = self.train_pairs

        self.transform = transform
        self.target_transform = target_transform
        self.antonym_prompts = antonym_prompts
        self.also_return_obj_label = also_return_obj_label

    def _parse_split(self):
        def parse_pairs(path):
            with open(path) as fh:
                pairs = [tuple(t.split()) for t in fh.read().strip().split("\n")]
            attrs, objs = zip(*pairs)
            return attrs, objs, pairs

        base = os.path.join(self.root, "compositional-split-natural")
        tr = parse_pairs(os.path.join(base, "train_pairs.txt"))
        vl = parse_pairs(os.path.join(base, "val_pairs.txt"))
        ts = parse_pairs(os.path.join(base, "test_pairs.txt"))
        all_attrs = sorted(set(tr[0] + vl[0] + ts[0]))
        all_objs = sorted(set(tr[1] + vl[1] + ts[1]))
        all_pairs = sorted(set(tr[2] + vl[2] + ts[2]))
        return (all_attrs, all_objs, all_pairs), (tr[2], vl[2], ts[2])

    def _get_split_info(self):
        train, val, test = [], [], []
        for inst in self.metadata:
            image, attr, obj, settype = inst["image"], inst["attr"], inst["obj"], inst["set"]
            image = image.split("/")[1]
            image = os.path.join(self.root, "images", f"{attr} {obj}", image)
            if attr == "NA" or (attr, obj) not in self.pairs or settype == "NA":
                continue
            rec = {
                "image_path": image, "attr": attr, "obj": obj, "pair": (attr, obj),
                "attr_id": self.attr2idx[attr], "obj_id": self.obj2idx[obj],
                "pair_id": self.pair2idx[(attr, obj)],
            }
            {"train": train, "val": val}.get(settype, test).append(rec)
        return train, val, test

    def __len__(self) -> int:
        return len(self.data)

    def __getitem__(self, index: int):
        rec = self.data[self.sample_indices[index]]
        img = self.transform(Image.open(rec["image_path"]))
        if self.target_transform:
            if self.antonym_prompts:
                captions = self.target_transform(
                    rec["pair"], self.antonym_data[rec["attr"]], self.unique_objs
                )
            else:
                captions = self.target_transform(rec["pair"], self.unique_attrs, self.unique_objs)
            return img, (captions, self.attr2idx[rec["pair"][0]])
        if self.also_return_obj_label:
            return img, self.attr2idx[rec["pair"][0]], rec["obj_id"]
        return img, self.attr2idx[rec["pair"][0]]


def subsample_per_class(dataset, k: int = 50, seed: int = 0):
    """Keep at most k random samples per class (the reference's 50/class
    imagenet-train eval subset, training/data.py:143-156). Mutates and
    returns the dataset."""
    rng = np.random.RandomState(seed)
    targets = np.array([t for _, t in dataset.samples])
    keep = np.zeros(len(targets), bool)
    for c in np.unique(targets):
        idx = np.where(targets == c)[0]
        rng.shuffle(idx)
        keep[idx[:k]] = True
    dataset.samples = [s for s, kp in zip(dataset.samples, keep) if kp]
    dataset.targets = np.array([t for _, t in dataset.samples])
    return dataset


def load_antonym_data(data_root: str) -> dict:
    antonyms = {}
    path = os.path.join(data_root, "adj_ants.csv")
    if not os.path.isfile(path):
        return antonyms
    with open(path) as fh:
        for line in fh:
            words = line.strip(",\n").split(",")
            antonyms[words[0]] = words[1:] if len(words) > 1 else []
    return antonyms
