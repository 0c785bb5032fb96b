"""Auxiliary subsystems: tar-shard pipeline (webdataset equivalent), SAE
metrics, profiler, memory monitor, supervised classifier."""

import io
import json
import os
import tarfile

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from xclip_tpu.data.wds import (
    ResampledShards,
    WebDatasetReader,
    expand_urls,
    group_by_keys_nothrow,
)
from xclip_tpu.sae import metrics as sae_metrics
from xclip_tpu.utils.monitor import get_memory_stats
from xclip_tpu.utils.profiler import count_params, profile_model


def _build_tar(path, n, prefix="sample", start=0, with_json=False, corrupt_one=False):
    """Synthetic tar shards (the reference test pattern,
    deps/open_clip/tests/test_wds.py:19-53)."""
    from PIL import Image

    rng = np.random.RandomState(start)
    with tarfile.open(path, "w") as tf:
        for i in range(start, start + n):
            img = Image.fromarray(rng.randint(0, 255, (24, 24, 3), np.uint8))
            buf = io.BytesIO()
            img.save(buf, format="JPEG")
            data = buf.getvalue()
            if corrupt_one and i == start:
                data = data[: len(data) // 2]
            info = tarfile.TarInfo(f"{prefix}{i:06d}.jpg")
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
            if with_json:
                payload = ('{"caption": "caption %d", "url": "u"}' % i).encode()
                info = tarfile.TarInfo(f"{prefix}{i:06d}.json")
            else:
                payload = f"caption {i}".encode()
                info = tarfile.TarInfo(f"{prefix}{i:06d}.txt")
            info.size = len(payload)
            tf.addfile(info, io.BytesIO(payload))


class TestWds:
    def test_expand_urls(self):
        assert expand_urls("s-{000..003}.tar") == [f"s-{i:03d}.tar" for i in range(4)]
        assert expand_urls("a.tar::b.tar") == ["a.tar", "b.tar"]

    def test_basic_iteration(self, tmp_path):
        _build_tar(tmp_path / "shard-000.tar", 8)
        _build_tar(tmp_path / "shard-001.tar", 8, start=8)
        reader = WebDatasetReader(str(tmp_path / "shard-{000..001}.tar"))
        samples = list(reader)
        assert len(samples) == 16
        assert samples[0]["image"].shape == (24, 24, 3)
        assert samples[0]["text"].startswith("caption")

    def test_corrupt_sample_skipped(self, tmp_path):
        _build_tar(tmp_path / "bad.tar", 6, corrupt_one=True)
        reader = WebDatasetReader(str(tmp_path / "bad.tar"))
        samples = list(reader)
        assert len(samples) == 5  # corrupt image dropped, stream continues

    def test_json_captions(self, tmp_path):
        _build_tar(tmp_path / "j.tar", 4, with_json=True)
        reader = WebDatasetReader(str(tmp_path / "j.tar"), json_caption_key="caption")
        samples = list(reader)
        assert samples[0]["text"] == "caption 0"

    def test_parallel_workers(self, tmp_path):
        """num_workers>0: disjoint shard slices read by threads; every
        sample arrives exactly once, and early consumer exit (epoch_size
        truncation) unblocks the workers."""
        import itertools as it

        for i in range(4):
            _build_tar(tmp_path / f"p-{i:03d}.tar", 6, start=i * 6)
        url = str(tmp_path / "p-{000..003}.tar")
        keys = sorted(s["__key__"] for s in WebDatasetReader(url, num_workers=3))
        assert keys == sorted(s["__key__"] for s in WebDatasetReader(url))
        assert len(keys) == 24 == len(set(keys))
        # more workers than shards is clamped; still exact coverage
        assert len(list(WebDatasetReader(url, num_workers=16))) == 24
        # early exit: take 5 of 24 then drop the iterator
        reader = WebDatasetReader(url, num_workers=2, prefetch=2)
        first5 = list(it.islice(iter(reader), 5))
        assert len(first5) == 5
        # batched() over the parallel reader still yields full batches
        batches = list(WebDatasetReader(url, num_workers=2).batched(6))
        assert len(batches) == 4 and batches[0]["images"].shape[0] == 6

    def test_rank_world_shard_split(self, tmp_path):
        """Multi-host split: rank r of world W reads shards[r::W]; the union
        over ranks covers every sample exactly once (reference per-worker
        shard assignment), and composes with num_workers threading."""
        for i in range(4):
            _build_tar(tmp_path / f"w-{i:03d}.tar", 5, start=i * 5)
        url = str(tmp_path / "w-{000..003}.tar")
        all_keys = []
        for rank in range(2):
            keys = [
                s["__key__"]
                for s in WebDatasetReader(url, rank=rank, world_size=2, num_workers=2)
            ]
            assert len(keys) == 10
            all_keys += keys
        assert sorted(all_keys) == sorted(
            s["__key__"] for s in WebDatasetReader(url)
        )

    def test_weighted_resampling_frequencies(self, tmp_path):
        """Weighted shard upsampling within tolerance (reference
        test_wds.py:80-130)."""
        _build_tar(tmp_path / "a.tar", 4, prefix="a")
        _build_tar(tmp_path / "b.tar", 4, prefix="b")
        shards = ResampledShards(
            [str(tmp_path / "a.tar"), str(tmp_path / "b.tar")], weights=[0.25, 0.75], seed=0
        )
        it = iter(shards)
        picks = [next(it) for _ in range(2000)]
        frac_b = sum("b.tar" in p for p in picks) / len(picks)
        assert abs(frac_b - 0.75) < 0.05

    def test_deterministic_shuffle_and_batching(self, tmp_path):
        _build_tar(tmp_path / "s.tar", 12)
        from xclip_tpu.tokenizer import SimpleTokenizer

        tok = SimpleTokenizer()
        r1 = WebDatasetReader(str(tmp_path / "s.tar"), shuffle=True, seed=5, epoch=0)
        r2 = WebDatasetReader(str(tmp_path / "s.tar"), shuffle=True, seed=5, epoch=0)
        k1 = [s["__key__"] for s in r1]
        assert k1 == [s["__key__"] for s in r2]
        r2.set_epoch(1)
        assert k1 != [s["__key__"] for s in r2]

        batches = list(WebDatasetReader(str(tmp_path / "s.tar")).batched(4, tokenizer=tok))
        assert len(batches) == 3
        assert batches[0]["texts"].shape == (4, 77)


class TestSAEMetrics:
    def test_capacity_orthogonal(self):
        feats = jnp.asarray(np.eye(3, dtype=np.float32)[:, None, :])
        caps = sae_metrics.capacities(feats)
        np.testing.assert_allclose(np.asarray(caps), [1.0, 1.0, 1.0])

    def test_capacity_identical(self):
        feats = jnp.ones((4, 1, 3), jnp.float32)
        caps = sae_metrics.capacities(feats)
        np.testing.assert_allclose(np.asarray(caps), 0.25 * np.ones(4), atol=1e-6)

    def test_feature_density(self):
        acts = jnp.asarray([[[0.5, 0.5, 0.0]], [[0.5, 0.0, 0.0001]]])
        dens = sae_metrics.feature_density(acts, threshold=0.001)
        np.testing.assert_allclose(np.asarray(dens), [[1.0, 0.5, 0.0]])

    def test_l0(self):
        acts = jnp.asarray([[1.0, 0.0, 2.0], [0.0, 0.0, 1.0]])
        assert float(sae_metrics.l0_norm(acts)) == 1.5

    def test_reconstruction_score(self):
        out = sae_metrics.model_reconstruction_score(
            np.array([2.0, 2.0, 2.0]), np.array([3.0, 3.0, 3.0]), np.array([5.0, 5.0, 5.0])
        )
        assert round(out["model_reconstruction_score"], 3) == 0.667


def test_profiler_and_monitor():
    from xclip_tpu.models.clip import CLIPModel, clip_cfg_from_dict

    cfg = {
        "embed_dim": 32,
        "vision_cfg": {"image_size": 32, "layers": 2, "width": 32, "patch_size": 16, "head_width": 8},
        "text_cfg": {"context_length": 16, "vocab_size": 128, "width": 32, "heads": 4, "layers": 2},
    }
    model = CLIPModel(clip_cfg_from_dict(cfg))
    params, state = model.init(jax.random.PRNGKey(0))
    prof = profile_model(model, params, state)
    assert prof["mparams"] > 0
    assert count_params(params) == int(prof["mparams"] * 1e6)
    stats = get_memory_stats()
    assert isinstance(stats, list) and "memory.used" in stats[0]


def test_supervised_classifier_smoke(tmp_path):
    from xclip_tpu.parallel.mesh import create_mesh
    from xclip_tpu.train.learner import (
        Classifier,
        ClassifierCfg,
        classifier_predictions,
        load_classifier,
        make_classifier_train_step,
        save_classifier,
    )

    # tiny RN backbone via a custom config registered on the fly
    import xclip_tpu.models.factory as F

    tiny = {
        "embed_dim": 16,
        "vision_cfg": {"image_size": 32, "layers": [1, 1, 1, 1], "width": 8, "patch_size": None},
        "text_cfg": {"context_length": 16, "vocab_size": 128, "width": 16, "heads": 2, "layers": 1},
    }
    F._MODEL_CONFIGS["TinyRN"] = tiny

    class TinyClassifierCfg(ClassifierCfg):
        pass

    cfg = ClassifierCfg(model="rn50-clip", num_classes=7, lr=0.01)
    object.__setattr__(cfg, "model", "rn50-clip")
    # monkeypatch backbone resolution to the tiny config
    orig = ClassifierCfg.backbone_name
    try:
        ClassifierCfg.backbone_name = property(lambda self: "TinyRN")
        ClassifierCfg.feature_dim = property(lambda self: 16)
        model = Classifier(cfg)
        params, state = model.init(jax.random.PRNGKey(0))
        mesh = create_mesh()
        step, tx = make_classifier_train_step(model, mesh, steps_per_epoch=2, precision="fp32")
        opt_state = tx.init(params)
        rng = np.random.RandomState(0)
        for _ in range(2):
            batch = {
                "images": rng.randn(16, 32, 32, 3).astype(np.float32),
                "labels": rng.randint(0, 7, 16).astype(np.int32),
            }
            params, state, opt_state, metrics = step(params, state, opt_state, batch)
        assert np.isfinite(float(metrics["loss"]))

        path = str(tmp_path / "clf.npz")
        save_classifier(path, model, params, state, {"epoch": 1})
        params2, state2, extras = load_classifier(path, model)
        assert extras["epoch"] == 1

        class DS:
            def __len__(self):
                return 10

            def __getitem__(self, i):
                r = np.random.RandomState(i)
                return r.randn(32, 32, 3).astype(np.float32), i % 7

        out = classifier_predictions(model, params2, state2, DS(), batch_size=4, logit_slice=(2, 7))
        assert out["pred"].shape == (10,)
        assert out["pred"].max() < 5
    finally:
        ClassifierCfg.backbone_name = orig


@pytest.mark.skipif(
    not __import__("xclip_tpu.data.fastimage", fromlist=["HAVE_FASTIMAGE"]).HAVE_FASTIMAGE,
    reason="fastimage extension not built (make -C csrc)",
)
class TestFastImage:
    def _jpeg(self, w=640, h=480):
        from PIL import Image

        y, x = np.mgrid[0:h, 0:w]
        arr = np.stack([x / w * 255, y / h * 255, 128 + 100 * np.sin(x / 40)], -1)
        img = Image.fromarray(arr.clip(0, 255).astype(np.uint8))
        buf = io.BytesIO()
        img.save(buf, format="JPEG", quality=95)
        return buf.getvalue(), img

    def test_eval_matches_pil_pipeline(self):
        from xclip_tpu.data.fastimage import FastImageTransform
        from xclip_tpu.data.transforms import image_transform

        data, img = self._jpeg()
        a = FastImageTransform(224, is_train=False)(data)
        b = image_transform(224, is_train=False)(img)
        assert a.shape == b.shape == (224, 224, 3)
        assert np.abs(a - b).mean() < 0.05  # bilinear-vs-bicubic tolerance

    def test_train_crop_shape_and_determinism(self):
        from xclip_tpu.data.fastimage import FastImageTransform

        data, _ = self._jpeg()
        t1 = FastImageTransform(64, is_train=True, seed=3)
        t2 = FastImageTransform(64, is_train=True, seed=3)
        np.testing.assert_array_equal(t1(data), t2(data))

    def test_corrupt_jpeg_raises_and_fallback(self, tmp_path):
        from xclip_tpu.data.fastimage import FastFileTransform, FastImageTransform

        data, img = self._jpeg()
        # truncated JPEGs decode partially (libjpeg pads); garbage raises
        with pytest.raises(ValueError):
            FastImageTransform(64, is_train=False)(b"\x00" * 100)
        # file-transform falls back to PIL for non-jpeg input
        p = tmp_path / "x.png"
        img.save(p)
        out = FastFileTransform(32, is_train=False)(str(p))
        assert out.shape == (32, 32, 3)

    def test_train_crop_prescale_matches_pil(self):
        """Large source -> DCT prescale kicks in for train crops; the crop box
        is rescaled into the decoded frame, so output must still match the
        same-seed PIL RandomResizedCrop pipeline."""
        from xclip_tpu.data.fastimage import FastImageTransform
        from xclip_tpu.data.transforms import image_transform

        data, img = self._jpeg(1600, 1200)  # crop_min/2 >= 2*224 -> denom 2
        a = FastImageTransform(224, is_train=True, seed=11)(data)
        b = image_transform(224, is_train=True, seed=11)(img)
        assert a.shape == b.shape == (224, 224, 3)
        assert np.abs(a - b).mean() < 0.05

    def test_dataset_integration(self, tmp_path):
        from xclip_tpu.data.datasets import TsvDataset
        from xclip_tpu.data.fastimage import FastFileTransform

        data, img = self._jpeg(64, 64)
        p = tmp_path / "img.jpg"
        p.write_bytes(data)
        tsv = tmp_path / "d.tsv"
        tsv.write_text(f"filepath\ttitle\n{p}\ta caption\n")
        ds = TsvDataset(str(tsv), img_transform=FastFileTransform(32, is_train=False))
        arr, caption = ds[0]
        assert arr.shape == (32, 32, 3) and caption == "a caption"


def test_remote_sync_fsspec(tmp_path):
    from xclip_tpu.utils.file_utils import remote_sync

    src = tmp_path / "src"
    (src / "checkpoints").mkdir(parents=True)
    (src / "checkpoints" / "epoch_1.pt").write_bytes(b"abc")
    (src / "checkpoints" / "epoch_latest.pt").write_bytes(b"skip-me")
    dst = tmp_path / "dst"
    dst.mkdir()
    assert remote_sync(str(src), str(dst), "fsspec")
    assert (dst / "checkpoints" / "epoch_1.pt").read_bytes() == b"abc"
    assert not (dst / "checkpoints" / "epoch_latest.pt").exists()


def test_pretrained_registry_catalog():
    """Catalog parity with the reference pretrained.py restricted to shipped
    configs: OpenAI sha256 URLs, GitHub-release weights, HF-hub tags."""
    from xclip_tpu.models import pretrained as P

    pairs = P.list_pretrained()
    assert len(pairs) >= 80
    assert ("RN50", "openai") in pairs and ("RN50", "cc12m") in pairs
    assert P.get_pretrained_url("RN50", "openai").endswith("RN50.pt")
    assert "openaipublic" in P.get_pretrained_url("ViT-L-14-336", "openai")
    # laion/datacomp hf-hub tags catalogued; download gated with guidance
    assert "laion2b_s34b_b79k" in P.list_pretrained_tags_by_model("ViT-B-32")
    cfg = P.get_pretrained_cfg("ViT-B-32", "laion2b_s34b_b79k")
    assert cfg["hf_hub"].startswith("laion/")
    with pytest.raises(RuntimeError, match="local path"):
        P.download_pretrained("ViT-B-32", "laion2b_s34b_b79k")
    with pytest.raises(ValueError, match="No pretrained weights"):
        P.download_pretrained("RN50", "nope")
    # quickgelu aliases resolve to the same OpenAI weights
    assert P.get_pretrained_url("RN50-quickgelu", "openai") == P.get_pretrained_url("RN50", "openai")


def test_download_pretrained_plumbing(tmp_path, monkeypatch):
    """download_pretrained_from_url: caching + sha256-prefix verification
    (reference tests/test_download_pretrained.py, without network)."""
    import hashlib

    from xclip_tpu.models import pretrained as P

    blob = b"weights-bytes"
    sha = hashlib.sha256(blob).hexdigest()
    src = tmp_path / "src" / sha / "model.pt"
    src.parent.mkdir(parents=True)
    src.write_bytes(blob)
    url = "https://openaipublic.example/" + sha + "/model.pt"

    def fake_retrieve(u, target):
        assert u == url
        import shutil
        shutil.copy(src, target)

    monkeypatch.setattr(P.urllib.request, "urlretrieve", fake_retrieve)
    cache = tmp_path / "cache"
    got = P.download_pretrained_from_url(url, cache_dir=str(cache))
    assert os.path.exists(got)
    # second call: served from cache (no retrieval)
    monkeypatch.setattr(P.urllib.request, "urlretrieve",
                        lambda *a: (_ for _ in ()).throw(AssertionError("re-downloaded")))
    assert P.download_pretrained_from_url(url, cache_dir=str(cache)) == got

    # corrupted cache entry with a sha-bearing URL -> re-download attempted
    (cache / "model.pt").write_bytes(b"corrupt")
    with pytest.raises(AssertionError, match="re-downloaded"):
        with pytest.warns(UserWarning, match="SHA256"):
            P.download_pretrained_from_url(url, cache_dir=str(cache))


def test_preprocess_cfg_from_pretrained_tag():
    """Pretrained tags select their checkpoint's preprocess settings
    (reference _pcfg/_slpcfg/_apcfg/_mccfg, pretrained.py:29-78, applied in
    create_model_and_transforms factory.py:382-396)."""
    from xclip_tpu.models.pretrained import get_preprocess_cfg

    # OpenAI default (fields absent from the catalog entry)
    d = get_preprocess_cfg("RN50", "openai")
    assert abs(d["mean"][0] - 0.48145466) < 1e-6
    assert d["interpolation"] == "bicubic" and d["resize_mode"] == "shortest"
    # SigLIP: inception mean/std + squash
    d = get_preprocess_cfg("ViT-B-16-SigLIP", "webli")
    assert d["mean"] == (0.5, 0.5, 0.5) and d["resize_mode"] == "squash"
    # CLIPA: imagenet mean/std + bilinear + squash
    d = get_preprocess_cfg("ViT-L-14-CLIPA", "datacomp1b")
    assert abs(d["mean"][0] - 0.485) < 1e-6
    assert d["interpolation"] == "bilinear" and d["resize_mode"] == "squash"
    # MobileCLIP: identity normalization
    d = get_preprocess_cfg("MobileCLIP-S1", "datacompdr")
    assert d["mean"] == (0.0, 0.0, 0.0) and d["std"] == (1.0, 1.0, 1.0)
    # unknown tag / no tag -> defaults
    d = get_preprocess_cfg("ViT-B-16-SigLIP", None)
    assert abs(d["mean"][0] - 0.48145466) < 1e-6

    # end-to-end: transforms built by create_model_and_transforms honor it
    from xclip_tpu.models.factory import create_model_and_transforms

    _, _, _, t_train, t_val = create_model_and_transforms("ViT-S-32")
    assert abs(t_val.cfg.mean[0] - 0.48145466) < 1e-6


def test_world_info_from_env(monkeypatch):
    """Launcher env discovery follows the reference's variable order
    (training/distributed.py:43-60)."""
    from xclip_tpu.parallel.mesh import world_info_from_env

    for v in ("LOCAL_RANK", "RANK", "WORLD_SIZE", "SLURM_PROCID", "SLURM_NTASKS",
              "SLURM_LOCALID", "PMI_RANK", "PMI_SIZE", "OMPI_COMM_WORLD_RANK",
              "OMPI_COMM_WORLD_SIZE", "OMPI_COMM_WORLD_LOCAL_RANK",
              "MPI_LOCALRANKID"):
        monkeypatch.delenv(v, raising=False)
    assert world_info_from_env() == (0, 0, 1)

    # SLURM style
    monkeypatch.setenv("SLURM_PROCID", "3")
    monkeypatch.setenv("SLURM_NTASKS", "8")
    monkeypatch.setenv("SLURM_LOCALID", "1")
    assert world_info_from_env() == (1, 3, 8)

    # torchrun RANK/WORLD_SIZE take precedence over SLURM
    monkeypatch.setenv("RANK", "5")
    monkeypatch.setenv("WORLD_SIZE", "16")
    monkeypatch.setenv("LOCAL_RANK", "2")
    assert world_info_from_env() == (2, 5, 16)


def test_init_distributed_from_env(monkeypatch):
    """Coordinator resolution: tcp:// dist-url wins, then MASTER_ADDR, then
    the SLURM nodelist head; single-process is a no-op."""
    from xclip_tpu.parallel import mesh as M

    for v in ("RANK", "WORLD_SIZE", "MASTER_ADDR", "MASTER_PORT",
              "SLURM_PROCID", "SLURM_NTASKS", "SLURM_NODELIST",
              "SLURM_STEP_NODELIST"):
        monkeypatch.delenv(v, raising=False)
    calls = []
    monkeypatch.setattr(M.jax.distributed, "initialize",
                        lambda coord, n, pid: calls.append((coord, n, pid)))
    assert M.init_distributed_from_env() == (0, 0, 1)
    assert calls == []  # single-process: never initializes

    monkeypatch.setenv("RANK", "1")
    monkeypatch.setenv("WORLD_SIZE", "4")
    monkeypatch.setenv("MASTER_ADDR", "10.0.0.2")
    assert M.init_distributed_from_env() == (0, 1, 4)
    assert calls[-1] == ("10.0.0.2:29500", 4, 1)

    assert M.init_distributed_from_env("tcp://host9:1234") == (0, 1, 4)
    assert calls[-1] == ("host9:1234", 4, 1)

    monkeypatch.delenv("MASTER_ADDR")
    monkeypatch.setenv("SLURM_NODELIST", "node[12-15],node20")
    assert M.init_distributed_from_env() == (0, 1, 4)
    assert calls[-1] == ("node12:29500", 4, 1)


@pytest.mark.skipif(not os.path.exists("/root/reference"), reason="reference tree not mounted")
def test_pretrained_catalog_full_reference_parity():
    """EVERY reference (model, tag) resolves here with the identical URL /
    hf-hub id and preprocess constants (VERDICT r4: complete the zoo). The
    catalog is regenerated programmatically by tools/sync_pretrained_catalog
    from the reference registry (pretrained.py:82-516); this pins the
    committed JSON to it."""
    import importlib.util

    from xclip_tpu.models import pretrained as P

    spec = importlib.util.spec_from_file_location(
        "sync_cat", os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "tools", "sync_pretrained_catalog.py"))
    sync = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(sync)
    ref = sync.load_reference_registry()
    assert sum(len(t) for t in ref.values()) >= 140

    for model, tags in ref.items():
        got_tags = P.list_pretrained_tags_by_model(model)
        for tag, rcfg in tags.items():
            assert tag in got_tags, f"({model}, {tag}) missing from catalog"
            mine = P.get_pretrained_cfg(model, tag)
            assert mine.get("url", "") == rcfg.get("url", ""), (model, tag)
            assert mine.get("hf_hub", "") == rcfg.get("hf_hub", ""), (model, tag)
            pre = P.get_preprocess_cfg(model, tag)
            assert pre["mean"] == pytest.approx(tuple(rcfg["mean"])), (model, tag)
            assert pre["std"] == pytest.approx(tuple(rcfg["std"])), (model, tag)
            assert pre["interpolation"] == rcfg["interpolation"], (model, tag)
            assert pre["resize_mode"] == rcfg["resize_mode"], (model, tag)

    # and the committed JSON is exactly what the sync tool would write
    assert sync.normalize(ref) == P._PRETRAINED


def test_pretrained_catalog_models_have_configs():
    """Every catalogued model resolves to a shipped config, except the two
    hub-config-only ViTamin-384 entries the reference also has no local
    config for (model_configs/ has no ViTamin-L-384/L2-384 either)."""
    from xclip_tpu.models import pretrained as P
    from xclip_tpu.models.factory import list_models

    known = set(list_models())
    hub_only = {"ViTamin-L-384", "ViTamin-L2-384"}
    missing = {m for m in P._PRETRAINED if m not in known} - hub_only
    assert not missing, f"catalog models without configs: {sorted(missing)}"


def test_hf_hub_export(tmp_path):
    """save_for_hf materializes the open_clip hub folder (weights loadable
    by torch, config with model_cfg+preprocess_cfg, model-card README);
    push raises with the prepared folder in zero-egress envs (reference
    push_to_hf_hub.py:40-260)."""
    import jax
    import torch

    from xclip_tpu.models.factory import create_model
    from xclip_tpu.utils import hf_hub

    model, params, state = create_model("RN50")
    out = tmp_path / "hub"
    hf_hub.save_for_hf(model, params, state, "RN50", str(out),
                       model_card={"description": "test card",
                                   "details": {"Dataset": "LAION-2B"}})
    sd = torch.load(out / hf_hub.HF_WEIGHTS_NAME, map_location="cpu",
                    weights_only=False)
    assert "visual.conv1.weight" in sd and "logit_scale" in sd
    cfg = json.loads((out / hf_hub.HF_CONFIG_NAME).read_text())
    assert cfg["model_cfg"]["embed_dim"] == 1024
    assert len(cfg["preprocess_cfg"]["mean"]) == 3
    readme = (out / "README.md").read_text()
    assert readme.startswith("---\n")
    assert "library_name: open_clip" in readme
    assert "datasets:\n- laion-2b" in readme
    assert "# Model card for RN50" in readme

    # zero-egress push: clear error naming the prepared folder
    try:
        import huggingface_hub  # noqa: F401
        has_hub = True
    except ImportError:
        has_hub = False
    if not has_hub:
        with pytest.raises(RuntimeError, match="upload it"):
            hf_hub.push_to_hf_hub(model, params, state, "RN50", "org/repo",
                                  folder=str(tmp_path / "hub2"))

    # SigLIP preprocess constants flow into the config
    cfg_path = tmp_path / "siglip.json"
    hf_hub.save_config_for_hf("ViT-B-16-SigLIP", str(cfg_path),
                              pretrained_tag="webli")
    sl = json.loads(cfg_path.read_text())
    assert sl["preprocess_cfg"]["mean"] == [0.5, 0.5, 0.5]
    assert sl["preprocess_cfg"]["resize_mode"] == "squash"
