"""Checkpoint IO: torch ``.pt`` bridge + native npz checkpoints.

The reference stores open_clip checkpoints as torch state dicts
(``{'epoch','name','state_dict'[,'optimizer','scaler']}`` — reference:
deps/open_clip/src/training/main.py:450-483), with a bare-state-dict load
path and ``module.`` prefix stripping (main.py:342-353,
xclip/open_clip/model.py:42-43). This module loads those files directly into
the JAX param/state pytrees, handling the layout differences:

- torch Linear weight ``(out, in)``    -> JAX kernel ``(in, out)``
- torch Conv2d weight OIHW             -> JAX kernel HWIO
- packed MultiheadAttention ``in_proj_weight`` -> separate q/k/v kernels
- BatchNorm ``running_mean/var``       -> state pytree leaves
- fp16-stored weights                  -> upcast to fp32
- ``_logit_scale``/``logit_scale`` aliasing (xclip/clip/model.py:516-517)

Native checkpoints are a single ``.npz`` with flattened pytree keys plus a
JSON header — no torch dependency at load time. ``save_open_clip_checkpoint``
exports back to the reference's torch format so reference tooling can consume
models trained here.
"""

from __future__ import annotations

import io
import json
import os
import zipfile
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

SEP = "/"


# ---------------------------------------------------------------------------
# pytree <-> flat dict


def flatten_pytree(tree, prefix: str = "") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}

    def rec(node, path):
        if isinstance(node, dict):
            for k, v in node.items():
                rec(v, f"{path}{SEP}{k}" if path else str(k))
        elif isinstance(node, (list, tuple)):
            for i, v in enumerate(node):
                rec(v, f"{path}{SEP}{i}" if path else str(i))
        else:
            out[path] = np.asarray(node)

    rec(tree, prefix)
    return out


def opt_state_to_flat(opt_state) -> Dict[str, np.ndarray]:
    """Flatten an optax optimizer state (arbitrary NamedTuple nesting) to
    index-keyed numpy leaves. The structure itself is NOT stored: restore
    requires a template from ``tx.init(params)`` with matching treedef, which
    is how the reference restores ``optimizer.state_dict()``
    (deps/open_clip/src/training/main.py:355-360)."""
    leaves = jax.tree_util.tree_leaves(opt_state)
    return {str(i): np.asarray(jax.device_get(leaf)) for i, leaf in enumerate(leaves)}


def flat_to_opt_state(template_opt_state, flat: Dict[str, np.ndarray]):
    """Rebuild an optimizer state from :func:`opt_state_to_flat` output using
    a freshly initialized state as the structure template. Restores Adam
    moments AND schedule/step counts so --resume does not restart warmup."""
    leaves, treedef = jax.tree_util.tree_flatten(template_opt_state)
    if len(flat) != len(leaves):
        raise ValueError(
            f"optimizer state leaf count mismatch: checkpoint {len(flat)} vs model {len(leaves)} "
            "(optimizer config changed since the checkpoint was written?)"
        )
    new_leaves = []
    for i, leaf in enumerate(leaves):
        val = np.asarray(flat[str(i)])
        ref = jnp.asarray(leaf)
        if tuple(val.shape) != tuple(ref.shape):
            if val.size != ref.size:
                raise ValueError(f"optimizer state leaf {i}: ckpt {val.shape} vs model {ref.shape}")
            val = val.reshape(ref.shape)  # torch round-trip turns 0-d into (1,)
        new_leaves.append(jnp.asarray(val, dtype=ref.dtype))
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def unflatten_into(tree, flat: Dict[str, np.ndarray]):
    """Replace leaves of ``tree`` by values from ``flat`` (same structure)."""

    def rec(node, path):
        if isinstance(node, dict):
            return {k: rec(v, f"{path}{SEP}{k}" if path else str(k)) for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            seq = [rec(v, f"{path}{SEP}{i}" if path else str(i)) for i, v in enumerate(node)]
            return type(node)(seq) if isinstance(node, tuple) else seq
        if path not in flat:
            raise KeyError(f"checkpoint missing key {path}")
        val = np.asarray(flat[path])
        expected = np.shape(node)
        if tuple(val.shape) != tuple(expected):
            raise ValueError(f"shape mismatch for {path}: ckpt {val.shape} vs model {expected}")
        return jnp.asarray(val, dtype=jnp.asarray(node).dtype)

    return rec(tree, "")


# ---------------------------------------------------------------------------
# torch .pt reading (zip/pickle format, no torch required)


def _load_torch_ckpt(path: str) -> dict:
    """Read a full torch checkpoint dict ({'epoch','state_dict'[,'optimizer']}
    or a bare state dict) with tensors left as torch tensors (torch path) or
    numpy arrays (fallback zip reader)."""
    try:
        import torch

        ckpt = torch.load(path, map_location="cpu", weights_only=False)
        if not isinstance(ckpt, dict):  # jit-scripted archive
            ckpt = {"state_dict": ckpt.state_dict()}
        return ckpt
    except ImportError:
        obj = _read_torch_zip(path)
        return obj if isinstance(obj, dict) and "state_dict" in obj else {"state_dict": obj}


def _tensor_dict_to_numpy(sd, upcast_fp32: bool = True) -> Dict[str, np.ndarray]:
    out = {}
    for k, v in sd.items():
        if hasattr(v, "detach"):
            import torch

            if v.dtype.is_floating_point and (upcast_fp32 or v.dtype == torch.bfloat16):
                v = v.to(torch.float32)  # numpy cannot represent bf16
            out[k] = v.detach().cpu().numpy()
        else:
            out[k] = np.asarray(v)
    return out


def _load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Read a torch checkpoint's model state dict into fp32 numpy arrays.

    Uses torch when importable (robust path); otherwise a minimal reader for
    the standard zip serialization format.
    """
    ckpt = _load_torch_ckpt(path)
    sd = ckpt["state_dict"] if "state_dict" in ckpt else ckpt
    return _tensor_dict_to_numpy(sd, upcast_fp32=True)


def _read_torch_zip(path: str) -> Dict[str, np.ndarray]:  # pragma: no cover - torch present in CI
    """Minimal torch-zip reader (pickle protocol with persistent ids)."""
    import pickle

    dtype_map = {
        "FloatStorage": np.float32,
        "HalfStorage": np.float16,
        "BFloat16Storage": None,  # handled specially below
        "DoubleStorage": np.float64,
        "LongStorage": np.int64,
        "IntStorage": np.int32,
        "BoolStorage": np.bool_,
        "ByteStorage": np.uint8,
    }

    with zipfile.ZipFile(path) as zf:
        names = zf.namelist()
        pkl_name = next(n for n in names if n.endswith("data.pkl"))
        root = pkl_name[: -len("data.pkl")]

        storages: Dict[str, Tuple[str, bytes]] = {}

        class Unpickler(pickle.Unpickler):
            def find_class(self, module, name):
                if module.startswith("torch") or module == "collections":
                    if name == "OrderedDict":
                        return dict
                    return lambda *a, **k: (module, name, a)
                return super().find_class(module, name)

            def persistent_load(self, pid):
                _, storage_type, key, _loc, numel = pid
                return ("storage", storage_type, key, numel)

        def rebuild(storage, offset, size, stride, *rest):
            _, storage_type, key, _numel = storage
            if key not in storages:
                data = zf.read(f"{root}data/{key}")
                storages[key] = (storage_type[1] if isinstance(storage_type, tuple) else storage_type, data)
            st_name, data = storages[key]
            np_dtype = dtype_map.get(st_name)
            if st_name == "BFloat16Storage":
                raw = np.frombuffer(data, dtype=np.uint16)
                arr = (raw.astype(np.uint32) << 16).view(np.float32)
            else:
                arr = np.frombuffer(data, dtype=np_dtype)
            arr = arr[offset : offset + int(np.prod(size)) if size else offset + 1]
            if size:
                arr = np.lib.stride_tricks.as_strided(
                    arr, shape=size, strides=[s * arr.itemsize for s in stride]
                ).copy()
            return arr

        up = Unpickler(io.BytesIO(zf.read(pkl_name)))
        obj = up.load()

    def resolve(node):
        if isinstance(node, tuple) and len(node) == 3 and node[0] == "torch._utils":
            if node[1] == "_rebuild_tensor_v2":
                return rebuild(*node[2])
        if isinstance(node, dict):
            return {k: resolve(v) for k, v in node.items()}
        return node

    return resolve(obj)


# ---------------------------------------------------------------------------
# open_clip state dict -> pytree mapping


def _strip_prefix(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    if any(k.startswith("module.") for k in sd):
        sd = {k[len("module.") :] if k.startswith("module.") else k: v for k, v in sd.items()}
    if "_logit_scale" in sd and "logit_scale" not in sd:
        sd["logit_scale"] = sd.pop("_logit_scale")
    return sd


def _conv(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))  # OIHW -> HWIO


def _lin(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (1, 0))  # (out,in) -> (in,out)


def _map_bn(flat, sd, base_out: str, base_in: str) -> None:
    flat[f"{base_out}{SEP}scale"] = sd[f"{base_in}.weight"]
    flat[f"{base_out}{SEP}bias"] = sd[f"{base_in}.bias"]


def _map_bn_state(flat, sd, base_out: str, base_in: str) -> None:
    flat[f"{base_out}{SEP}mean"] = sd[f"{base_in}.running_mean"]
    flat[f"{base_out}{SEP}var"] = sd[f"{base_in}.running_var"]


def _resize_vit_pos_embed(pe: np.ndarray, target_seq_len: int) -> np.ndarray:
    """Bicubic-resize the ViT positional-embedding grid (cls token kept as
    is) when loading a checkpoint at a different image size — the
    reference's resize_pos_embed (open_clip/model.py:523-553), triggered by
    --force-image-size."""
    pe = np.asarray(pe)
    if pe.shape[0] == target_seq_len:
        return pe
    import math as _math

    import jax

    tok, grid = pe[:1], pe[1:]
    old = int(_math.sqrt(grid.shape[0]))
    new = int(_math.sqrt(target_seq_len - 1))
    if old * old != grid.shape[0] or new * new != target_seq_len - 1:
        raise ValueError(
            f"cannot resize pos embed {pe.shape[0]} -> {target_seq_len}: non-square grid"
        )
    resized = jax.image.resize(
        grid.reshape(old, old, -1).astype(np.float32), (new, new, grid.shape[-1]), method="bicubic"
    )
    return np.concatenate([tok, np.asarray(resized).reshape(new * new, -1)]).astype(pe.dtype)


def _map_attn_pooler(flat, sd, d: int) -> None:
    """visual.attn_pool.* (AttentionalPooler, reference transformer.py:471-500)
    -> visual/attn_pool pytree. torch MHA packs in_proj only when q/k/v dims
    match; otherwise separate q/k/v projection weights exist."""
    ap = f"visual{SEP}attn_pool"
    flat[f"{ap}{SEP}query"] = sd["visual.attn_pool.query"]
    b = sd["visual.attn_pool.attn.in_proj_bias"]
    if "visual.attn_pool.attn.q_proj_weight" in sd:
        qw = sd["visual.attn_pool.attn.q_proj_weight"]
        kw = sd["visual.attn_pool.attn.k_proj_weight"]
        vw = sd["visual.attn_pool.attn.v_proj_weight"]
    else:
        w = sd["visual.attn_pool.attn.in_proj_weight"]
        qw, kw, vw = w[:d], w[d : 2 * d], w[2 * d :]
    qb, kb, vb = np.split(b, 3)
    for name, wv, bv in (("q", qw, qb), ("k", kw, kb), ("v", vw, vb)):
        flat[f"{ap}{SEP}attn{SEP}{name}{SEP}kernel"] = _lin(wv)
        flat[f"{ap}{SEP}attn{SEP}{name}{SEP}bias"] = bv
    _map_linear(flat, sd, f"{ap}{SEP}attn{SEP}out", "visual.attn_pool.attn.out_proj")
    _map_ln(flat, sd, f"{ap}{SEP}ln_q", "visual.attn_pool.ln_q")
    _map_ln(flat, sd, f"{ap}{SEP}ln_k", "visual.attn_pool.ln_k")


def _map_linear(flat, sd, base_out: str, base_in: str) -> None:
    flat[f"{base_out}{SEP}kernel"] = _lin(sd[f"{base_in}.weight"])
    if f"{base_in}.bias" in sd:
        flat[f"{base_out}{SEP}bias"] = sd[f"{base_in}.bias"]


def _map_ln(flat, sd, base_out: str, base_in: str) -> None:
    flat[f"{base_out}{SEP}scale"] = sd[f"{base_in}.weight"]
    flat[f"{base_out}{SEP}bias"] = sd[f"{base_in}.bias"]


def _map_packed_mha(flat, sd, base_out: str, base_in: str, dim: int) -> None:
    """torch nn.MultiheadAttention (packed qkv) -> q/k/v/out linears."""
    w = sd[f"{base_in}.in_proj_weight"]
    b = sd.get(f"{base_in}.in_proj_bias")
    for i, name in enumerate(("q", "k", "v")):
        flat[f"{base_out}{SEP}{name}{SEP}kernel"] = _lin(w[i * dim : (i + 1) * dim])
        if b is not None:
            flat[f"{base_out}{SEP}{name}{SEP}bias"] = b[i * dim : (i + 1) * dim]
    _map_linear(flat, sd, f"{base_out}{SEP}out", f"{base_in}.out_proj")


def _map_block(flat, sd, base_out: str, base_in: str, dim: int) -> None:
    _map_ln(flat, sd, f"{base_out}{SEP}ln_1", f"{base_in}.ln_1")
    _map_packed_mha(flat, sd, f"{base_out}{SEP}attn", f"{base_in}.attn", dim)
    _map_ln(flat, sd, f"{base_out}{SEP}ln_2", f"{base_in}.ln_2")
    _map_linear(flat, sd, f"{base_out}{SEP}mlp{SEP}c_fc", f"{base_in}.mlp.c_fc")
    _map_linear(flat, sd, f"{base_out}{SEP}mlp{SEP}c_proj", f"{base_in}.mlp.c_proj")
    for ls in ("ls_1", "ls_2"):  # LayerScale gamma (reference transformer.py:89-99)
        if f"{base_in}.{ls}.gamma" in sd:
            flat[f"{base_out}{SEP}{ls}"] = sd[f"{base_in}.{ls}.gamma"]


def infer_clip_cfg_from_state_dict(sd: Dict[str, np.ndarray]):
    """Infer the architecture from state-dict shapes (the reference
    build_model path, deps/open_clip/src/open_clip/model.py:448-504 and
    xclip/clip/model.py:468) -> CLIPCfg dict usable by clip_cfg_from_dict."""
    sd = _strip_prefix(dict(sd))
    vit = "visual.proj" in sd
    if vit:
        vision_width = sd["visual.conv1.weight"].shape[0]
        vision_layers = len(
            [k for k in sd if k.startswith("visual.") and k.endswith(".attn.in_proj_weight")]
        )
        vision_patch_size = sd["visual.conv1.weight"].shape[-1]
        grid = round((sd["visual.positional_embedding"].shape[0] - 1) ** 0.5)
        vision_cfg = {
            "image_size": vision_patch_size * grid,
            "layers": vision_layers,
            "width": vision_width,
            "patch_size": vision_patch_size,
        }
    else:
        counts = [
            len({k.split(".")[2] for k in sd if k.startswith(f"visual.layer{b}")})
            for b in (1, 2, 3, 4)
        ]
        vision_width = sd["visual.layer1.0.conv1.weight"].shape[0]
        output_width = round((sd["visual.attnpool.positional_embedding"].shape[0] - 1) ** 0.5)
        vision_cfg = {
            "image_size": output_width * 32,
            "layers": counts,
            "width": vision_width,
            "patch_size": None,
        }
    embed_dim = sd["text_projection"].shape[1]
    text_cfg = {
        "context_length": sd["positional_embedding"].shape[0],
        "vocab_size": sd["token_embedding.weight"].shape[0],
        "width": sd["ln_final.weight"].shape[0],
        "heads": sd["ln_final.weight"].shape[0] // 64,
        "layers": len({k.split(".")[2] for k in sd if k.startswith("transformer.resblocks")}),
    }
    return {"embed_dim": int(embed_dim), "vision_cfg": vision_cfg, "text_cfg": text_cfg}


def build_model_from_state_dict(path_or_sd, quick_gelu: bool = True):
    """Load an arbitrary OpenAI/open_clip checkpoint without naming a config
    (shape inference). Returns (model, params, state)."""
    from xclip_tpu.models.clip import CLIPModel, clip_cfg_from_dict

    sd = path_or_sd if isinstance(path_or_sd, dict) else _load_torch_state_dict(path_or_sd)
    cfg = infer_clip_cfg_from_state_dict(sd)
    model = CLIPModel(clip_cfg_from_dict(cfg, quick_gelu=quick_gelu))
    params, state = open_clip_state_dict_to_pytrees(sd, model)
    return model, params, state


def _resize_text_pos_embed(pe: np.ndarray, target_len: int) -> np.ndarray:
    """Linear-resample the text positional embedding along the position axis
    when the model's context_length differs from the checkpoint's — e.g.
    loading a 77-token checkpoint into a context-32 CLIPA config. Matches the
    reference's resize_text_pos_embed (open_clip/model.py:557-586):
    F.interpolate(mode='linear', align_corners=False)."""
    old = pe.shape[0]
    if old == target_len:
        return pe
    scale = old / target_len
    coords = np.clip((np.arange(target_len) + 0.5) * scale - 0.5, 0, old - 1)
    lo = np.floor(coords).astype(np.int64)
    hi = np.minimum(lo + 1, old - 1)
    frac = (coords - lo).astype(np.float32)[:, None]
    out = pe[lo].astype(np.float32) * (1.0 - frac) + pe[hi].astype(np.float32) * frac
    return out.astype(pe.dtype)


def _map_clip_text(pflat, sd, cfg) -> None:
    # CustomTextCLIP checkpoints (reference model.py:318, e.g. SigLIP
    # configs) carry "text."-prefixed keys; plain CLIP keys are inline
    tp = "text." if "text.token_embedding.weight" in sd else ""
    pflat["text" + SEP + "token_embedding"] = sd[f"{tp}token_embedding.weight"]
    pflat["text" + SEP + "positional_embedding"] = _resize_text_pos_embed(
        sd[f"{tp}positional_embedding"], cfg.text.context_length
    )
    if f"{tp}text_projection.weight" in sd:
        # proj_bias=True: torch nn.Linear (out,in) -> our (in,out) kernel
        pflat[f"text{SEP}text_projection{SEP}kernel"] = sd[f"{tp}text_projection.weight"].T
        pflat[f"text{SEP}text_projection{SEP}bias"] = sd[f"{tp}text_projection.bias"]
    else:
        pflat["text" + SEP + "text_projection"] = sd[f"{tp}text_projection"]
    _map_ln(pflat, sd, "text" + SEP + "ln_final", f"{tp}ln_final")
    for i in range(cfg.text.layers):
        _map_block(pflat, sd, f"text{SEP}blocks{SEP}{i}", f"{tp}transformer.resblocks.{i}", cfg.text.width)


def open_clip_state_dict_to_pytrees(sd: Dict[str, np.ndarray], model) -> Tuple[Dict, Dict]:
    """Map an open_clip/OpenAI CLIP state dict onto ``model``'s param/state
    pytrees. ``model`` is a :class:`~xclip_tpu.models.clip.CLIPModel`."""
    sd = _strip_prefix(dict(sd))
    cfg = model.cfg
    pflat: Dict[str, np.ndarray] = {}
    sflat: Dict[str, np.ndarray] = {}

    # HF-text models use the CustomTextCLIP "text.*" layout instead — their
    # tower params are converted torch->flax and merged after unflatten
    hf_text = getattr(cfg, "is_hf_text", False)
    if not hf_text:
        # --- text tower (inline keys, reference CLIP layout) ---
        _map_clip_text(pflat, sd, cfg)

    pflat["logit_scale"] = np.asarray(sd["logit_scale"], np.float32).reshape(())
    if "logit_bias" in sd:
        pflat["logit_bias"] = np.asarray(sd["logit_bias"], np.float32).reshape(())

    # --- vision tower ---
    timm_visual = timm_vstate = None
    if getattr(cfg, "is_native_timm", False):
        # timm-layout tower (visual.trunk.* / visual.head.*): converted
        # wholesale by the family's bridge and merged after unflatten
        from xclip_tpu.models import native_timm

        timm_visual, timm_vstate = native_timm.state_dict_to_pytrees(
            {k[len("visual."):]: v for k, v in sd.items() if k.startswith("visual.")},
            cfg.vision,
        )
    elif cfg.is_resnet:
        v = "visual"
        for i in (1, 2, 3):
            pflat[f"{v}{SEP}stem{SEP}conv{i}{SEP}kernel"] = _conv(sd[f"visual.conv{i}.weight"])
            _map_bn(pflat, sd, f"{v}{SEP}stem{SEP}bn{i}", f"visual.bn{i}")
            _map_bn_state(sflat, sd, f"{v}{SEP}stem{SEP}bn{i}", f"visual.bn{i}")
        for li, blocks in enumerate(cfg.vision.layers):
            for b in range(blocks):
                src = f"visual.layer{li + 1}.{b}"
                dst = f"{v}{SEP}layer{li + 1}{SEP}{b}"
                for ci in (1, 2, 3):
                    pflat[f"{dst}{SEP}conv{ci}{SEP}kernel"] = _conv(sd[f"{src}.conv{ci}.weight"])
                    _map_bn(pflat, sd, f"{dst}{SEP}bn{ci}", f"{src}.bn{ci}")
                    _map_bn_state(sflat, sd, f"{dst}{SEP}bn{ci}", f"{src}.bn{ci}")
                if f"{src}.downsample.0.weight" in sd:
                    pflat[f"{dst}{SEP}downsample{SEP}conv{SEP}kernel"] = _conv(sd[f"{src}.downsample.0.weight"])
                    _map_bn(pflat, sd, f"{dst}{SEP}downsample{SEP}bn", f"{src}.downsample.1")
                    _map_bn_state(sflat, sd, f"{dst}{SEP}downsample_bn", f"{src}.downsample.1")
        ap_src, ap_dst = "visual.attnpool", f"{v}{SEP}attnpool"
        pflat[f"{ap_dst}{SEP}positional_embedding"] = sd[f"{ap_src}.positional_embedding"]
        for name, src_name in (("q", "q_proj"), ("k", "k_proj"), ("v", "v_proj"), ("out", "c_proj")):
            _map_linear(pflat, sd, f"{ap_dst}{SEP}{name}", f"{ap_src}.{src_name}")
    else:
        v = "visual"
        pflat[f"{v}{SEP}conv1{SEP}kernel"] = _conv(sd["visual.conv1.weight"])
        pflat[f"{v}{SEP}class_embedding"] = sd["visual.class_embedding"]
        pflat[f"{v}{SEP}positional_embedding"] = _resize_vit_pos_embed(
            sd["visual.positional_embedding"], cfg.vision.seq_len
        )
        pflat[f"{v}{SEP}proj"] = sd["visual.proj"]
        if "visual.ln_pre.weight" in sd:  # absent for no_ln_pre (CLIPA) towers
            _map_ln(pflat, sd, f"{v}{SEP}ln_pre", "visual.ln_pre")
        _map_ln(pflat, sd, f"{v}{SEP}ln_post", "visual.ln_post")
        for i in range(cfg.vision.layers):
            _map_block(pflat, sd, f"{v}{SEP}blocks{SEP}{i}", f"visual.transformer.resblocks.{i}", cfg.vision.width)
        if "visual.attn_pool.query" in sd:
            _map_attn_pooler(pflat, sd, cfg.embed_dim)

    params0, state0 = model.init(jax.random.PRNGKey(0))
    wholesale = {}  # subtrees converted outside the flat mapping
    if hf_text:
        for k in list(pflat):
            if k.startswith("text" + SEP):
                del pflat[k]
        from xclip_tpu.models.clip import _hf_tower
        from xclip_tpu.models.hf_text import hf_text_state_dict_to_params

        wholesale["text"] = hf_text_state_dict_to_params(_hf_tower(cfg.text), sd)
    if timm_visual is not None:
        wholesale["visual"] = timm_visual
    if wholesale:
        params = unflatten_into(
            {k: v for k, v in params0.items() if k not in wholesale}, pflat)
        params.update(wholesale)
    else:
        params = unflatten_into(params0, pflat)
    if timm_vstate is not None and timm_vstate:
        state = dict(state0)
        state["visual"] = timm_vstate
    else:
        state = unflatten_into(state0, sflat) if sflat else state0
    return params, state


def pytrees_to_open_clip_state_dict(model, params, state) -> Dict[str, np.ndarray]:
    """Inverse mapping: export params/state to an open_clip-format state dict
    (numpy values) so reference tooling can consume checkpoints trained here."""
    from xclip_tpu.models.coca import CoCaModel, coca_params_to_state_dict

    if isinstance(model, CoCaModel):
        return coca_params_to_state_dict(model, params)
    cfg = model.cfg
    hf_text = getattr(cfg, "is_hf_text", False)
    nested = jax.device_get(params)
    p = flatten_pytree({k: v for k, v in nested.items() if not (hf_text and k == "text")})
    s = flatten_pytree(jax.device_get(state))
    sd: Dict[str, np.ndarray] = {}

    def put_lin(dst, src):
        sd[f"{dst}.weight"] = _lin(p[f"{src}{SEP}kernel"])
        if f"{src}{SEP}bias" in p:
            sd[f"{dst}.bias"] = p[f"{src}{SEP}bias"]

    def put_ln(dst, src):
        sd[f"{dst}.weight"] = p[f"{src}{SEP}scale"]
        sd[f"{dst}.bias"] = p[f"{src}{SEP}bias"]

    def put_bn(dst, src_p, src_s):
        sd[f"{dst}.weight"] = p[f"{src_p}{SEP}scale"]
        sd[f"{dst}.bias"] = p[f"{src_p}{SEP}bias"]
        sd[f"{dst}.running_mean"] = s[f"{src_s}{SEP}mean"]
        sd[f"{dst}.running_var"] = s[f"{src_s}{SEP}var"]
        sd[f"{dst}.num_batches_tracked"] = np.asarray(0, np.int64)

    def put_block(dst, src, dim):
        put_ln(f"{dst}.ln_1", f"{src}{SEP}ln_1")
        qkv_w = np.concatenate(
            [_lin(p[f"{src}{SEP}attn{SEP}{n}{SEP}kernel"]) for n in ("q", "k", "v")], axis=0
        )
        qkv_b = np.concatenate([p[f"{src}{SEP}attn{SEP}{n}{SEP}bias"] for n in ("q", "k", "v")])
        sd[f"{dst}.attn.in_proj_weight"] = qkv_w
        sd[f"{dst}.attn.in_proj_bias"] = qkv_b
        put_lin(f"{dst}.attn.out_proj", f"{src}{SEP}attn{SEP}out")
        put_ln(f"{dst}.ln_2", f"{src}{SEP}ln_2")
        put_lin(f"{dst}.mlp.c_fc", f"{src}{SEP}mlp{SEP}c_fc")
        put_lin(f"{dst}.mlp.c_proj", f"{src}{SEP}mlp{SEP}c_proj")
        for ls in ("ls_1", "ls_2"):
            if f"{src}{SEP}{ls}" in p:
                sd[f"{dst}.{ls}.gamma"] = p[f"{src}{SEP}{ls}"]

    if hf_text:
        # CustomTextCLIP layout: "text.transformer.*" via the flax->torch
        # conversion + "text.proj[.N].weight" (hf bridge)
        from xclip_tpu.models.clip import _hf_tower
        from xclip_tpu.models.hf_text import hf_text_params_to_state_dict

        sd.update(hf_text_params_to_state_dict(_hf_tower(cfg.text), nested["text"]))
    else:
        # CustomTextCLIP configs export the reference's "text."-prefixed
        # layout so their checkpoints load into the reference model as-is
        tp = "text." if getattr(cfg, "custom_text", False) else ""
        sd[f"{tp}token_embedding.weight"] = p[f"text{SEP}token_embedding"]
        sd[f"{tp}positional_embedding"] = p[f"text{SEP}positional_embedding"]
        if f"text{SEP}text_projection{SEP}kernel" in p:
            sd[f"{tp}text_projection.weight"] = _lin(p[f"text{SEP}text_projection{SEP}kernel"])
            sd[f"{tp}text_projection.bias"] = p[f"text{SEP}text_projection{SEP}bias"]
        else:
            sd[f"{tp}text_projection"] = p[f"text{SEP}text_projection"]
        put_ln(f"{tp}ln_final", f"text{SEP}ln_final")
        for i in range(cfg.text.layers):
            put_block(f"{tp}transformer.resblocks.{i}", f"text{SEP}blocks{SEP}{i}", cfg.text.width)
    sd["logit_scale"] = p["logit_scale"].reshape(())
    if "logit_bias" in p:
        sd["logit_bias"] = p["logit_bias"].reshape(())

    if getattr(cfg, "is_native_timm", False):
        from xclip_tpu.models import native_timm

        vstate = jax.device_get(state).get("visual", {})
        sd.update({f"visual.{k}": v for k, v in
                   native_timm.pytrees_to_state_dict(
                       nested["visual"], vstate, cfg.vision).items()})
    elif cfg.is_resnet:
        for i in (1, 2, 3):
            sd[f"visual.conv{i}.weight"] = np.transpose(p[f"visual{SEP}stem{SEP}conv{i}{SEP}kernel"], (3, 2, 0, 1))
            put_bn(f"visual.bn{i}", f"visual{SEP}stem{SEP}bn{i}", f"visual{SEP}stem{SEP}bn{i}")
        for li, blocks in enumerate(cfg.vision.layers):
            for b in range(blocks):
                src = f"visual{SEP}layer{li + 1}{SEP}{b}"
                dst = f"visual.layer{li + 1}.{b}"
                for ci in (1, 2, 3):
                    sd[f"{dst}.conv{ci}.weight"] = np.transpose(p[f"{src}{SEP}conv{ci}{SEP}kernel"], (3, 2, 0, 1))
                    put_bn(f"{dst}.bn{ci}", f"{src}{SEP}bn{ci}", f"{src}{SEP}bn{ci}")
                if f"{src}{SEP}downsample{SEP}conv{SEP}kernel" in p:
                    sd[f"{dst}.downsample.0.weight"] = np.transpose(
                        p[f"{src}{SEP}downsample{SEP}conv{SEP}kernel"], (3, 2, 0, 1)
                    )
                    put_bn(f"{dst}.downsample.1", f"{src}{SEP}downsample{SEP}bn", f"{src}{SEP}downsample_bn")
        sd["visual.attnpool.positional_embedding"] = p[f"visual{SEP}attnpool{SEP}positional_embedding"]
        for name, dst_name in (("q", "q_proj"), ("k", "k_proj"), ("v", "v_proj"), ("out", "c_proj")):
            put_lin(f"visual.attnpool.{dst_name}", f"visual{SEP}attnpool{SEP}{name}")
    else:
        sd["visual.conv1.weight"] = np.transpose(p[f"visual{SEP}conv1{SEP}kernel"], (3, 2, 0, 1))
        sd["visual.class_embedding"] = p[f"visual{SEP}class_embedding"]
        sd["visual.positional_embedding"] = p[f"visual{SEP}positional_embedding"]
        sd["visual.proj"] = p[f"visual{SEP}proj"]
        if f"visual{SEP}ln_pre{SEP}scale" in p:  # absent for no_ln_pre towers
            put_ln("visual.ln_pre", f"visual{SEP}ln_pre")
        put_ln("visual.ln_post", f"visual{SEP}ln_post")
        for i in range(cfg.vision.layers):
            put_block(f"visual.transformer.resblocks.{i}", f"visual{SEP}blocks{SEP}{i}", cfg.vision.width)
        ap = f"visual{SEP}attn_pool"
        if f"{ap}{SEP}query" in p:
            sd["visual.attn_pool.query"] = p[f"{ap}{SEP}query"]
            qw = p[f"{ap}{SEP}attn{SEP}q{SEP}kernel"].T
            kw = p[f"{ap}{SEP}attn{SEP}k{SEP}kernel"].T
            vw = p[f"{ap}{SEP}attn{SEP}v{SEP}kernel"].T
            if qw.shape == kw.shape == vw.shape:
                sd["visual.attn_pool.attn.in_proj_weight"] = np.concatenate([qw, kw, vw])
            else:  # torch MHA keeps separate weights when kdim/vdim differ
                sd["visual.attn_pool.attn.q_proj_weight"] = qw
                sd["visual.attn_pool.attn.k_proj_weight"] = kw
                sd["visual.attn_pool.attn.v_proj_weight"] = vw
            sd["visual.attn_pool.attn.in_proj_bias"] = np.concatenate(
                [p[f"{ap}{SEP}attn{SEP}{n}{SEP}bias"] for n in ("q", "k", "v")]
            )
            put_lin("visual.attn_pool.attn.out_proj", f"{ap}{SEP}attn{SEP}out")
            put_ln("visual.attn_pool.ln_q", f"{ap}{SEP}ln_q")
            put_ln("visual.attn_pool.ln_k", f"{ap}{SEP}ln_k")
    return sd


# ---------------------------------------------------------------------------
# native checkpoint format (.npz + JSON extras)


def save_native(path: str, params, state, extras: Optional[dict] = None, opt_state=None) -> None:
    """Atomic save of param/state pytrees (and optionally the optimizer
    state) to a single .npz file."""
    flat = {"params" + SEP + k: v for k, v in flatten_pytree(jax.device_get(params)).items()}
    flat.update({"state" + SEP + k: v for k, v in flatten_pytree(jax.device_get(state)).items()})
    if opt_state is not None:
        flat.update({"opt" + SEP + k: v for k, v in opt_state_to_flat(opt_state).items()})
    header = json.dumps(extras or {})
    tmp = path + ".tmp"
    with open(tmp, "wb") as fh:
        np.savez(fh, __extras__=np.frombuffer(header.encode(), dtype=np.uint8), **flat)
    os.replace(tmp, path)


def load_native(path: str, model=None, params=None, state=None):
    """Load a native checkpoint. With (model, params, state) given, returns
    pytrees matching the model structure; otherwise returns flat dicts."""
    with np.load(path) as npz:
        flat = {k: npz[k] for k in npz.files}
    extras = {}
    if "__extras__" in flat:
        extras = json.loads(flat.pop("__extras__").tobytes().decode())
    pflat = {k[len("params") + 1 :]: v for k, v in flat.items() if k.startswith("params" + SEP)}
    sflat = {k[len("state") + 1 :]: v for k, v in flat.items() if k.startswith("state" + SEP)}
    oflat = {k[len("opt") + 1 :]: v for k, v in flat.items() if k.startswith("opt" + SEP)}
    if oflat:
        extras = dict(extras)
        extras["opt_flat"] = oflat
    if params is not None:
        params = unflatten_into(params, pflat)
        state = unflatten_into(state, sflat) if sflat else state
        return params, state, extras
    return pflat, sflat, extras


class AsyncSaveHandle:
    """Pending async orbax save. ``wait_until_finished()`` blocks until the
    checkpoint directory is finalized, then writes the extras.json sidecar
    (it cannot be written earlier: orbax stages into a tmp dir and renames
    on finish)."""

    def __init__(self, ckptr, path: str, extras: Optional[dict]):
        self._ckptr = ckptr
        self._path = path
        self._extras = extras
        self._done = False

    def wait_until_finished(self) -> None:
        if self._done:
            return
        self._ckptr.wait_until_finished()
        with open(os.path.join(self._path, "extras.json"), "w") as fh:
            json.dump(self._extras or {}, fh)
        self._done = True


def save_orbax(
    path: str, params, state, extras: Optional[dict] = None, *, async_save: bool = False
) -> Optional[AsyncSaveHandle]:
    """Orbax checkpoint (sharding-aware) for very large runs. With
    ``async_save=True`` the save overlaps training: device arrays are staged
    to host and the returned handle's ``wait_until_finished()`` must be
    called before the checkpoint is read (or another save starts)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), {"params": params, "state": state}, force=True)
    handle = AsyncSaveHandle(ckptr, path, extras)
    if async_save:
        return handle
    handle.wait_until_finished()
    return None


def load_orbax(path: str, params, state):
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(os.path.abspath(path), {"params": params, "state": state})
    extras = {}
    extras_path = os.path.join(path, "extras.json")
    if os.path.exists(extras_path):
        with open(extras_path) as fh:
            extras = json.load(fh)
    return restored["params"], restored["state"], extras


def load_checkpoint(path: str, model, params, state) -> Tuple[Dict, Dict]:
    """Dispatch on file type: torch .pt / native .npz / orbax directory."""
    params, state, _, _ = load_checkpoint_full(path, model, params, state)
    return params, state


def load_checkpoint_full(path: str, model, params, state, opt_state=None):
    """Full resume load: returns ``(params, state, opt_state, extras)``.

    ``opt_state`` is a template from ``tx.init(params)``; it is returned
    restored when the checkpoint carries optimizer state, unchanged
    otherwise. ``extras`` carries the stored ``epoch``/``name`` when present
    (the reference resumes from checkpoint["epoch"]/["optimizer"]:
    deps/open_clip/src/training/main.py:342-360)."""
    if os.path.isdir(path):
        params, state, extras = load_orbax(path, params, state)
        oflat = extras.pop("opt_flat", None) if isinstance(extras, dict) else None
        if oflat and opt_state is not None:
            opt_state = flat_to_opt_state(opt_state, oflat)
        return params, state, opt_state, extras or {}
    if path.endswith(".npz"):
        # the reference routes .npz through the big_vision SigLIP converter
        # (open_clip factory.py:148-151); native checkpoints from this stack
        # are also .npz — disambiguate on the params/t key
        from xclip_tpu.core.convert import is_big_vision_npz, load_big_vision_weights

        with np.load(path) as probe:
            bv = is_big_vision_npz(probe.files)
        if bv:
            sd = load_big_vision_weights(path)
            params, state = open_clip_state_dict_to_pytrees(sd, model)
            return params, state, opt_state, {}
        params, state, extras = load_native(path, model, params, state)
        oflat = extras.pop("opt_flat", None)
        if oflat and opt_state is not None:
            opt_state = flat_to_opt_state(opt_state, oflat)
        return params, state, opt_state, extras
    ckpt = _load_torch_ckpt(path)
    bare = "state_dict" not in ckpt
    sd = _tensor_dict_to_numpy(ckpt if bare else ckpt["state_dict"], upcast_fp32=True)
    from xclip_tpu.core.convert import convert_state_dict

    sd = convert_state_dict(sd)  # 3rd-party detection (reference factory.py:157)
    params, state = open_clip_state_dict_to_pytrees(sd, model)
    extras = {} if bare else {k: ckpt[k] for k in ("epoch", "name") if k in ckpt}
    if not bare and "optimizer" in ckpt and opt_state is not None:
        oflat = _tensor_dict_to_numpy(ckpt["optimizer"], upcast_fp32=False)
        opt_state = flat_to_opt_state(opt_state, oflat)
    return params, state, opt_state, extras


def save_open_clip_checkpoint(
    path: str, model, params, state, *, epoch: int = 0, name: str = "", opt_state=None
) -> None:
    """Export to the reference torch checkpoint format (requires torch).
    ``opt_state`` is stored under "optimizer" (index-keyed leaves) like the
    reference stores optimizer.state_dict() (training/main.py:450-460)."""
    import torch

    sd = pytrees_to_open_clip_state_dict(model, params, state)
    ckpt = {
        "epoch": epoch,
        "name": name,
        "state_dict": {k: torch.from_numpy(np.ascontiguousarray(v).copy()) for k, v in sd.items()},
    }
    if opt_state is not None:
        ckpt["optimizer"] = {
            k: torch.from_numpy(np.ascontiguousarray(v).copy())
            for k, v in opt_state_to_flat(opt_state).items()
        }
    tmp = path + ".tmp"
    torch.save(ckpt, tmp)
    os.replace(tmp, path)
