"""3rd-party checkpoint converters (reference: deps/open_clip/src/open_clip/convert.py).

Two live formats in the reference's ``load_checkpoint`` path (factory.py:
143-157):

- **big_vision ``.npz``** (official Google SigLIP releases): JAX param trees
  with ``params/img/...`` + ``params/txt/...`` names. The reference's
  ``load_big_vision_weights`` (convert.py:13-140) copies them into a torch
  CustomTextCLIP with a timm trunk; here the same mapping emits an
  open_clip-layout state dict (``visual.trunk.*`` / ``text.*``) that the
  existing checkpoint bridge loads into the native timm-ViT tower. The
  inverse direction (:func:`state_dict_to_big_vision`) is also provided —
  models trained here can be exported to the big_vision layout — and pins
  the mapping via an exact round-trip test.

- **Apple MobileCLIP state dicts** (``image_encoder.*`` / ``text_encoder.*``
  names): the text-side rename table is fully specified in the reference
  (convert_mobile_clip_state_dict, convert.py:142-180) and implemented in
  :func:`convert_mobile_clip_text_state_dict`. The image side delegates to
  timm's ``checkpoint_filter_fn`` in the reference; timm is absent from this
  environment, so the image-trunk conversion raises a documented error
  (same env-blocked class as timm AugMix/`--pretrained-image`).

All transposes follow the reference's ``_n2p`` conventions exactly
(convert.py:21-30): 4D HWIO->OIHW, 3D (a,b,c)->(c,a,b), 2D transpose.
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np

__all__ = [
    "is_big_vision_npz",
    "load_big_vision_weights",
    "state_dict_to_big_vision",
    "convert_mobile_clip_text_state_dict",
    "convert_state_dict",
]


def _n2p(w: np.ndarray, t: bool = True) -> np.ndarray:
    """Reference convert.py:21-30, minus the torch wrapper."""
    w = np.asarray(w)
    if w.ndim == 4 and w.shape[0] == w.shape[1] == w.shape[2] == 1:
        w = w.reshape(-1)
    if t:
        if w.ndim == 4:
            w = w.transpose(3, 2, 0, 1)
        elif w.ndim == 3:
            w = w.transpose(2, 0, 1)
        elif w.ndim == 2:
            w = w.transpose(1, 0)
    return np.ascontiguousarray(w)


def is_big_vision_npz(names) -> bool:
    """Distinguish a big_vision checkpoint from this stack's native .npz
    (native files carry an ``__extras__`` header and pytree-path keys)."""
    names = set(names)
    return "params/t" in names and any(n.startswith("params/img/") for n in names)


def _qkv_weight(w: Mapping, mha: str) -> np.ndarray:
    # (D, H, Dh) per projection -> flatten(1) -> transpose -> rows stacked
    # q,k,v (reference convert.py:71-74)
    return np.concatenate([
        _n2p(w[f"{mha}{n}/kernel"], t=False).reshape(
            w[f"{mha}{n}/kernel"].shape[0], -1).T
        for n in ("query", "key", "value")
    ], axis=0)


def _qkv_bias(w: Mapping, mha: str) -> np.ndarray:
    return np.concatenate([
        _n2p(w[f"{mha}{n}/bias"], t=False).reshape(-1)
        for n in ("query", "key", "value")
    ])


def _out_weight(w: Mapping, mha: str) -> np.ndarray:
    # (H, Dh, D) -t-> (D, H, Dh) -> flatten(1) (reference convert.py:75)
    o = _n2p(w[f"{mha}out/kernel"])
    return o.reshape(o.shape[0], -1)


def load_big_vision_weights(npz) -> Dict[str, np.ndarray]:
    """big_vision SigLIP ``.npz`` (path, NpzFile or mapping) -> open_clip
    CustomTextCLIP state dict (``visual.trunk.*`` timm layout + ``text.*``).

    Mapping is the reference's load_big_vision_weights (convert.py:13-140)
    re-targeted at a state dict instead of torch module mutation. Patch/pos
    embedding resampling for mismatched grids is NOT applied here — load at
    the checkpoint's native image size (the factory's --force-image-size
    resize runs downstream on the converted dict).
    """
    if isinstance(npz, str):
        npz = np.load(npz)
    w = npz  # mapping: name -> array
    names = set(getattr(npz, "files", None) or npz.keys())
    sd: Dict[str, np.ndarray] = {}

    # ---- image trunk (params/img/ -> visual.trunk.*), convert.py:37-104
    ip = "params/img/"
    sd["visual.trunk.patch_embed.proj.weight"] = _n2p(w[f"{ip}embedding/kernel"])
    sd["visual.trunk.patch_embed.proj.bias"] = _n2p(w[f"{ip}embedding/bias"])
    if f"{ip}cls" in names:
        sd["visual.trunk.cls_token"] = np.asarray(w[f"{ip}cls"])
    sd["visual.trunk.pos_embed"] = np.asarray(w[f"{ip}pos_embedding"])
    i = 0
    while f"{ip}Transformer/encoderblock_{i}/LayerNorm_0/scale" in names:
        bp = f"{ip}Transformer/encoderblock_{i}/"
        mha = bp + "MultiHeadDotProductAttention_0/"
        base = f"visual.trunk.blocks.{i}"
        sd[f"{base}.norm1.weight"] = _n2p(w[f"{bp}LayerNorm_0/scale"])
        sd[f"{base}.norm1.bias"] = _n2p(w[f"{bp}LayerNorm_0/bias"])
        sd[f"{base}.attn.qkv.weight"] = _qkv_weight(w, mha)
        sd[f"{base}.attn.qkv.bias"] = _qkv_bias(w, mha)
        sd[f"{base}.attn.proj.weight"] = _out_weight(w, mha)
        sd[f"{base}.attn.proj.bias"] = _n2p(w[f"{mha}out/bias"])
        sd[f"{base}.norm2.weight"] = _n2p(w[f"{bp}LayerNorm_1/scale"])
        sd[f"{base}.norm2.bias"] = _n2p(w[f"{bp}LayerNorm_1/bias"])
        for r in (0, 1):
            sd[f"{base}.mlp.fc{r + 1}.weight"] = _n2p(w[f"{bp}MlpBlock_0/Dense_{r}/kernel"])
            sd[f"{base}.mlp.fc{r + 1}.bias"] = _n2p(w[f"{bp}MlpBlock_0/Dense_{r}/bias"])
        i += 1
    sd["visual.trunk.norm.weight"] = _n2p(w[f"{ip}Transformer/encoder_norm/scale"])
    sd["visual.trunk.norm.bias"] = _n2p(w[f"{ip}Transformer/encoder_norm/bias"])
    if f"{ip}MAPHead_0/probe" in names:  # convert.py:89-104
        bp = f"{ip}MAPHead_0/"
        mha = bp + "MultiHeadDotProductAttention_0/"
        ap = "visual.trunk.attn_pool"
        sd[f"{ap}.latent"] = np.asarray(w[f"{bp}probe"])
        qk = _n2p(w[f"{mha}query/kernel"], t=False)
        sd[f"{ap}.q.weight"] = qk.reshape(qk.shape[0], -1).T
        sd[f"{ap}.q.bias"] = _n2p(w[f"{mha}query/bias"], t=False).reshape(-1)
        sd[f"{ap}.kv.weight"] = np.concatenate([
            _n2p(w[f"{mha}{n}/kernel"], t=False).reshape(
                w[f"{mha}{n}/kernel"].shape[0], -1).T
            for n in ("key", "value")
        ], axis=0)
        sd[f"{ap}.kv.bias"] = np.concatenate([
            _n2p(w[f"{mha}{n}/bias"], t=False).reshape(-1) for n in ("key", "value")
        ])
        sd[f"{ap}.proj.weight"] = _out_weight(w, mha)
        sd[f"{ap}.proj.bias"] = _n2p(w[f"{mha}out/bias"])
        sd[f"{ap}.norm.weight"] = _n2p(w[f"{bp}LayerNorm_0/scale"])
        sd[f"{ap}.norm.bias"] = _n2p(w[f"{bp}LayerNorm_0/bias"])
        for r in (0, 1):
            sd[f"{ap}.mlp.fc{r + 1}.weight"] = _n2p(w[f"{bp}MlpBlock_0/Dense_{r}/kernel"])
            sd[f"{ap}.mlp.fc{r + 1}.bias"] = _n2p(w[f"{bp}MlpBlock_0/Dense_{r}/bias"])

    # ---- text tower (params/txt/ -> text.*), convert.py:106-139
    tp = "params/txt/"
    sd["text.token_embedding.weight"] = _n2p(w[f"{tp}Embed_0/embedding"], t=False)
    sd["text.positional_embedding"] = _n2p(w[f"{tp}pos_embedding"], t=False)[0]
    i = 0
    while f"{tp}Encoder_0/encoderblock_{i}/LayerNorm_0/scale" in names:
        bp = f"{tp}Encoder_0/encoderblock_{i}/"
        mha = bp + "MultiHeadDotProductAttention_0/"
        base = f"text.transformer.resblocks.{i}"
        sd[f"{base}.ln_1.weight"] = _n2p(w[f"{bp}LayerNorm_0/scale"])
        sd[f"{base}.ln_1.bias"] = _n2p(w[f"{bp}LayerNorm_0/bias"])
        sd[f"{base}.attn.in_proj_weight"] = _qkv_weight(w, mha)
        sd[f"{base}.attn.in_proj_bias"] = _qkv_bias(w, mha)
        sd[f"{base}.attn.out_proj.weight"] = _out_weight(w, mha)
        sd[f"{base}.attn.out_proj.bias"] = _n2p(w[f"{mha}out/bias"])
        sd[f"{base}.ln_2.weight"] = _n2p(w[f"{bp}LayerNorm_1/scale"])
        sd[f"{base}.ln_2.bias"] = _n2p(w[f"{bp}LayerNorm_1/bias"])
        sd[f"{base}.mlp.c_fc.weight"] = _n2p(w[f"{bp}MlpBlock_0/Dense_0/kernel"])
        sd[f"{base}.mlp.c_fc.bias"] = _n2p(w[f"{bp}MlpBlock_0/Dense_0/bias"])
        sd[f"{base}.mlp.c_proj.weight"] = _n2p(w[f"{bp}MlpBlock_0/Dense_1/kernel"])
        sd[f"{base}.mlp.c_proj.bias"] = _n2p(w[f"{bp}MlpBlock_0/Dense_1/bias"])
        i += 1
    sd["text.ln_final.weight"] = _n2p(w[f"{tp}Encoder_0/encoder_norm/scale"])
    sd["text.ln_final.bias"] = _n2p(w[f"{tp}Encoder_0/encoder_norm/bias"])
    sd["text.text_projection.weight"] = _n2p(w[f"{tp}head/kernel"])
    sd["text.text_projection.bias"] = _n2p(w[f"{tp}head/bias"])

    sd["logit_bias"] = np.asarray(w["params/b"]).reshape(-1)[0]
    sd["logit_scale"] = np.asarray(w["params/t"]).reshape(-1)[0]
    return sd


def _split_qkv(weight: np.ndarray, bias: np.ndarray, heads: int):
    """Inverse of _qkv_weight/_qkv_bias -> per-projection (D,H,Dh) kernels
    and (H,Dh) biases in big_vision layout."""
    d3, d_in = weight.shape
    d = d3 // 3
    dh = d // heads
    outs = []
    for j in range(3):
        k = weight[j * d:(j + 1) * d].T.reshape(d_in, heads, dh)
        b = bias[j * d:(j + 1) * d].reshape(heads, dh)
        outs.append((k, b))
    return outs


def _out_inverse(weight: np.ndarray, heads: int) -> np.ndarray:
    # (D, H*Dh) -> (D, H, Dh) -> (H, Dh, D)
    d, hd = weight.shape
    return weight.reshape(d, heads, hd // heads).transpose(1, 2, 0)


def state_dict_to_big_vision(sd: Mapping[str, np.ndarray], *, img_heads: int,
                             txt_heads: int) -> Dict[str, np.ndarray]:
    """Inverse of :func:`load_big_vision_weights`: open_clip CustomTextCLIP
    state dict (timm trunk layout) -> big_vision npz name/array dict. Head
    counts are needed to refold the fused qkv matrices into the per-head
    (D, H, Dh) big_vision kernels."""
    w: Dict[str, np.ndarray] = {}
    g = lambda k: np.asarray(sd[k])

    ip = "params/img/"
    w[f"{ip}embedding/kernel"] = g("visual.trunk.patch_embed.proj.weight").transpose(2, 3, 1, 0)
    w[f"{ip}embedding/bias"] = g("visual.trunk.patch_embed.proj.bias")
    if "visual.trunk.cls_token" in sd:
        w[f"{ip}cls"] = g("visual.trunk.cls_token")
    w[f"{ip}pos_embedding"] = g("visual.trunk.pos_embed")
    i = 0
    while f"visual.trunk.blocks.{i}.norm1.weight" in sd:
        base = f"visual.trunk.blocks.{i}"
        bp = f"{ip}Transformer/encoderblock_{i}/"
        mha = bp + "MultiHeadDotProductAttention_0/"
        w[f"{bp}LayerNorm_0/scale"] = g(f"{base}.norm1.weight")
        w[f"{bp}LayerNorm_0/bias"] = g(f"{base}.norm1.bias")
        for (kk, bb), n in zip(
            _split_qkv(g(f"{base}.attn.qkv.weight"), g(f"{base}.attn.qkv.bias"), img_heads),
            ("query", "key", "value"),
        ):
            w[f"{mha}{n}/kernel"], w[f"{mha}{n}/bias"] = kk, bb
        w[f"{mha}out/kernel"] = _out_inverse(g(f"{base}.attn.proj.weight"), img_heads)
        w[f"{mha}out/bias"] = g(f"{base}.attn.proj.bias")
        w[f"{bp}LayerNorm_1/scale"] = g(f"{base}.norm2.weight")
        w[f"{bp}LayerNorm_1/bias"] = g(f"{base}.norm2.bias")
        for r in (0, 1):
            w[f"{bp}MlpBlock_0/Dense_{r}/kernel"] = g(f"{base}.mlp.fc{r + 1}.weight").T
            w[f"{bp}MlpBlock_0/Dense_{r}/bias"] = g(f"{base}.mlp.fc{r + 1}.bias")
        i += 1
    w[f"{ip}Transformer/encoder_norm/scale"] = g("visual.trunk.norm.weight")
    w[f"{ip}Transformer/encoder_norm/bias"] = g("visual.trunk.norm.bias")
    if "visual.trunk.attn_pool.latent" in sd:
        ap = "visual.trunk.attn_pool"
        bp = f"{ip}MAPHead_0/"
        mha = bp + "MultiHeadDotProductAttention_0/"
        w[f"{bp}probe"] = g(f"{ap}.latent")
        d = g(f"{ap}.q.weight").shape[0]
        dh = d // img_heads
        w[f"{mha}query/kernel"] = g(f"{ap}.q.weight").T.reshape(d, img_heads, dh)
        w[f"{mha}query/bias"] = g(f"{ap}.q.bias").reshape(img_heads, dh)
        kvw, kvb = g(f"{ap}.kv.weight"), g(f"{ap}.kv.bias")
        for j, n in enumerate(("key", "value")):
            w[f"{mha}{n}/kernel"] = kvw[j * d:(j + 1) * d].T.reshape(d, img_heads, dh)
            w[f"{mha}{n}/bias"] = kvb[j * d:(j + 1) * d].reshape(img_heads, dh)
        w[f"{mha}out/kernel"] = _out_inverse(g(f"{ap}.proj.weight"), img_heads)
        w[f"{mha}out/bias"] = g(f"{ap}.proj.bias")
        w[f"{bp}LayerNorm_0/scale"] = g(f"{ap}.norm.weight")
        w[f"{bp}LayerNorm_0/bias"] = g(f"{ap}.norm.bias")
        for r in (0, 1):
            w[f"{bp}MlpBlock_0/Dense_{r}/kernel"] = g(f"{ap}.mlp.fc{r + 1}.weight").T
            w[f"{bp}MlpBlock_0/Dense_{r}/bias"] = g(f"{ap}.mlp.fc{r + 1}.bias")

    tp = "params/txt/"
    w[f"{tp}Embed_0/embedding"] = g("text.token_embedding.weight")
    w[f"{tp}pos_embedding"] = g("text.positional_embedding")[None]
    i = 0
    while f"text.transformer.resblocks.{i}.ln_1.weight" in sd:
        base = f"text.transformer.resblocks.{i}"
        bp = f"{tp}Encoder_0/encoderblock_{i}/"
        mha = bp + "MultiHeadDotProductAttention_0/"
        w[f"{bp}LayerNorm_0/scale"] = g(f"{base}.ln_1.weight")
        w[f"{bp}LayerNorm_0/bias"] = g(f"{base}.ln_1.bias")
        for (kk, bb), n in zip(
            _split_qkv(g(f"{base}.attn.in_proj_weight"),
                       g(f"{base}.attn.in_proj_bias"), txt_heads),
            ("query", "key", "value"),
        ):
            w[f"{mha}{n}/kernel"], w[f"{mha}{n}/bias"] = kk, bb
        w[f"{mha}out/kernel"] = _out_inverse(g(f"{base}.attn.out_proj.weight"), txt_heads)
        w[f"{mha}out/bias"] = g(f"{base}.attn.out_proj.bias")
        w[f"{bp}LayerNorm_1/scale"] = g(f"{base}.ln_2.weight")
        w[f"{bp}LayerNorm_1/bias"] = g(f"{base}.ln_2.bias")
        w[f"{bp}MlpBlock_0/Dense_0/kernel"] = g(f"{base}.mlp.c_fc.weight").T
        w[f"{bp}MlpBlock_0/Dense_0/bias"] = g(f"{base}.mlp.c_fc.bias")
        w[f"{bp}MlpBlock_0/Dense_1/kernel"] = g(f"{base}.mlp.c_proj.weight").T
        w[f"{bp}MlpBlock_0/Dense_1/bias"] = g(f"{base}.mlp.c_proj.bias")
        i += 1
    w[f"{tp}Encoder_0/encoder_norm/scale"] = g("text.ln_final.weight")
    w[f"{tp}Encoder_0/encoder_norm/bias"] = g("text.ln_final.bias")
    w[f"{tp}head/kernel"] = g("text.text_projection.weight").T
    w[f"{tp}head/bias"] = g("text.text_projection.bias")

    w["params/b"] = np.asarray(sd["logit_bias"], np.float32).reshape(1)
    w["params/t"] = np.asarray(sd["logit_scale"], np.float32).reshape(1)
    return w


# ---------------------------------------------------------------------------
# Apple MobileCLIP state dicts (reference convert.py:142-180)

_APPLE_S_KEY = "image_encoder.model.patch_embed.0.rbr_conv.0.conv.weight"
_APPLE_B_KEY = "image_encoder.model.patch_emb.0.block.conv.weight"


def convert_mobile_clip_text_state_dict(
    sd: Mapping[str, np.ndarray], prefix: str = "text_encoder."
) -> Dict[str, np.ndarray]:
    """Apple MobileCLIP text-encoder names -> open_clip ``text.*`` names.
    Exact rename table from the reference (convert.py:153-180)."""
    out: Dict[str, np.ndarray] = {}
    for k, v in sd.items():
        if not k.startswith(prefix):
            continue
        k = k[len(prefix):]
        k = k.replace("projection_layer", "text_projection")
        k = k.replace("embedding_layer", "token_embedding")
        if k.startswith("positional_embedding.pos_embed.pos_embed"):
            k = k.replace("positional_embedding.pos_embed.pos_embed",
                          "positional_embedding")
            v = np.asarray(v).squeeze()
        k = k.replace("final_layer_norm", "ln_final")
        k = k.replace("pre_norm_mha.0", "ln_1")
        k = k.replace("pre_norm_mha.1", "attn")
        k = k.replace("pre_norm_ffn.0", "ln_2")
        k = k.replace("pre_norm_ffn.1", "mlp.c_fc")
        k = k.replace("pre_norm_ffn.4", "mlp.c_proj")
        k = k.replace("qkv_proj.weight", "in_proj_weight")
        k = k.replace("qkv_proj.bias", "in_proj_bias")
        k = k.replace("transformer.", "transformer.resblocks.")
        out["text." + k] = v
    return out


def convert_state_dict(sd: Mapping[str, np.ndarray]) -> Mapping[str, np.ndarray]:
    """Detect & convert 3rd-party state dicts (reference convert.py:183-191).

    Apple MobileCLIP image trunks need timm's ``checkpoint_filter_fn`` rename
    table, which the reference imports from timm — absent in this
    environment, so the detection raises with a precise pointer instead of
    silently mis-loading.
    """
    if _APPLE_S_KEY in sd or _APPLE_B_KEY in sd:
        raise NotImplementedError(
            "Apple MobileCLIP image-trunk conversion requires timm's "
            "checkpoint_filter_fn rename table (reference convert.py:144-151); "
            "timm is absent in this environment. The text-encoder half is "
            "available via core.convert.convert_mobile_clip_text_state_dict."
        )
    return sd
