"""Native JAX M2M100 encoder — the text tower behind the nllb-clip configs.

The reference wraps torch ``M2M100Model.encoder`` through HFTextEncoder
(deps/open_clip/src/open_clip/hf_model.py:118-127 takes ``model.encoder``;
hf_configs.py m2m_100 entry: cls_pooler, width=d_model). transformers ships
no Flax M2M100 class, so this is a from-scratch functional encoder matching
torch ``M2M100Encoder`` semantics exactly:

- scaled word embeddings (``sqrt(d_model)`` when ``scale_embedding``)
- fairseq-style sinusoidal positions: position ids are
  ``cumsum(mask)*mask + padding_idx`` (pads keep the zeroed padding row),
  table offset 2, half sin / half cos (modeling_m2m_100.py
  ``M2M100SinusoidalPositionalEmbedding`` / ``create_position_ids_from_input_ids``)
- pre-LN encoder layers: ln -> MHA(bias) -> residual, ln -> fc1 -> act ->
  fc2 -> residual (``M2M100EncoderLayer.forward``)
- final ``layer_norm`` after the stack

The torch ``M2M100Model`` in this image is the golden-parity oracle
(tests/test_hf_text.py::test_m2m100_encoder_parity).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from xclip_tpu.models import layers as L


@dataclasses.dataclass(frozen=True)
class M2M100EncoderCfg:
    vocab_size: int
    d_model: int
    layers: int
    heads: int
    ffn_dim: int
    max_positions: int = 1024
    pad_token_id: int = 1
    scale_embedding: bool = True
    activation: str = "relu"


def cfg_from_hf_config(config) -> M2M100EncoderCfg:
    return M2M100EncoderCfg(
        vocab_size=config.vocab_size,
        d_model=config.d_model,
        layers=config.encoder_layers,
        heads=config.encoder_attention_heads,
        ffn_dim=config.encoder_ffn_dim,
        max_positions=config.max_position_embeddings,
        pad_token_id=config.pad_token_id,
        scale_embedding=bool(getattr(config, "scale_embedding", True)),
        activation=getattr(config, "activation_function", "relu"),
    )


def sinusoidal_table(num_positions: int, dim: int, padding_idx: int) -> np.ndarray:
    """fairseq/tensor2tensor sinusoidal embedding table, row padding_idx
    zeroed (M2M100SinusoidalPositionalEmbedding.get_embedding)."""
    half = dim // 2
    freq = np.exp(np.arange(half, dtype=np.float64) * -(math.log(10000.0) / (half - 1)))
    ang = np.arange(num_positions, dtype=np.float64)[:, None] * freq[None, :]
    emb = np.concatenate([np.sin(ang), np.cos(ang)], axis=1)
    if dim % 2 == 1:
        emb = np.concatenate([emb, np.zeros((num_positions, 1))], axis=1)
    emb[padding_idx] = 0.0
    return emb.astype(np.float32)


def m2m100_encoder_init(rng, cfg: M2M100EncoderCfg) -> Dict:
    keys = jax.random.split(rng, cfg.layers + 1)
    params: Dict = {
        "embed_tokens": 0.02 * jax.random.normal(
            keys[0], (cfg.vocab_size, cfg.d_model), jnp.float32),
        "layers": [],
        "layer_norm": L.layernorm_init(cfg.d_model),
    }
    for i in range(cfg.layers):
        k = jax.random.split(keys[i + 1], 6)
        params["layers"].append({
            "self_attn_layer_norm": L.layernorm_init(cfg.d_model),
            "attn": {
                "q": L.linear_init(k[0], cfg.d_model, cfg.d_model),
                "k": L.linear_init(k[1], cfg.d_model, cfg.d_model),
                "v": L.linear_init(k[2], cfg.d_model, cfg.d_model),
                "out": L.linear_init(k[3], cfg.d_model, cfg.d_model),
            },
            "final_layer_norm": L.layernorm_init(cfg.d_model),
            "fc1": L.linear_init(k[4], cfg.d_model, cfg.ffn_dim),
            "fc2": L.linear_init(k[5], cfg.ffn_dim, cfg.d_model),
        })
    # the torch module zeroes the padding row of the word embedding
    params["embed_tokens"] = params["embed_tokens"].at[cfg.pad_token_id].set(0.0)
    return params


def m2m100_encoder_apply(params, ids, cfg: M2M100EncoderCfg, *, dtype=None) -> jnp.ndarray:
    """ids (B, L) int32 -> last hidden states (B, L, d_model), fp32."""
    ids = jnp.asarray(ids)
    mask = (ids != cfg.pad_token_id).astype(jnp.int32)
    scale = math.sqrt(cfg.d_model) if cfg.scale_embedding else 1.0

    x = params["embed_tokens"][ids] * scale
    # fairseq position ids: non-pads count 1..n shifted by padding_idx,
    # pads land on the zeroed padding row
    pos_ids = jnp.cumsum(mask, axis=1) * mask + cfg.pad_token_id
    table = jnp.asarray(sinusoidal_table(
        cfg.max_positions + 2, cfg.d_model, cfg.pad_token_id))
    x = x + table[pos_ids]
    if dtype is not None:
        x = x.astype(dtype)

    # additive key-padding mask (B, 1, 1, L)
    neg = jnp.where(mask[:, None, None, :] == 0, -jnp.inf, 0.0)
    act = L.ACT_FNS[cfg.activation] if cfg.activation in L.ACT_FNS else jax.nn.relu

    for lp in params["layers"]:
        residual = x
        h = L.layernorm_apply(lp["self_attn_layer_norm"], x)
        q = L.linear_apply(lp["attn"]["q"], h, dtype=dtype)
        k = L.linear_apply(lp["attn"]["k"], h, dtype=dtype)
        v = L.linear_apply(lp["attn"]["v"], h, dtype=dtype)
        o = L.attention(q, k, v, num_heads=cfg.heads, mask=neg)
        x = residual + L.linear_apply(lp["attn"]["out"], o, dtype=dtype)
        residual = x
        h = L.layernorm_apply(lp["final_layer_norm"], x)
        h = L.linear_apply(lp["fc1"], h, dtype=dtype)
        h = act(h)
        x = residual + L.linear_apply(lp["fc2"], h, dtype=dtype)

    x = L.layernorm_apply(params["layer_norm"], x)
    return x.astype(jnp.float32)


# ---------------------------------------------------------------------------
# torch state-dict bridge (M2M100Encoder naming: embed_tokens.weight,
# layers.N.self_attn.{q,k,v,out}_proj.*, layers.N.{self_attn,final}_layer_norm.*,
# layers.N.fc{1,2}.*, layer_norm.*)


def m2m100_torch_sd_to_params(sd: Dict[str, np.ndarray], cfg: M2M100EncoderCfg) -> Dict:
    def lin(prefix):
        p = {"kernel": jnp.asarray(np.asarray(sd[f"{prefix}.weight"]).T)}
        if f"{prefix}.bias" in sd:
            p["bias"] = jnp.asarray(np.asarray(sd[f"{prefix}.bias"]))
        return p

    def ln(prefix):
        return {"scale": jnp.asarray(np.asarray(sd[f"{prefix}.weight"])),
                "bias": jnp.asarray(np.asarray(sd[f"{prefix}.bias"]))}

    params: Dict = {
        "embed_tokens": jnp.asarray(np.asarray(sd["embed_tokens.weight"])),
        "layers": [],
        "layer_norm": ln("layer_norm"),
    }
    for i in range(cfg.layers):
        pre = f"layers.{i}"
        params["layers"].append({
            "self_attn_layer_norm": ln(f"{pre}.self_attn_layer_norm"),
            "attn": {
                "q": lin(f"{pre}.self_attn.q_proj"),
                "k": lin(f"{pre}.self_attn.k_proj"),
                "v": lin(f"{pre}.self_attn.v_proj"),
                "out": lin(f"{pre}.self_attn.out_proj"),
            },
            "final_layer_norm": ln(f"{pre}.final_layer_norm"),
            "fc1": lin(f"{pre}.fc1"),
            "fc2": lin(f"{pre}.fc2"),
        })
    return params


def m2m100_params_to_torch_sd(params: Dict) -> Dict[str, np.ndarray]:
    def put_lin(sd, prefix, p):
        sd[f"{prefix}.weight"] = np.asarray(p["kernel"]).T
        if "bias" in p:
            sd[f"{prefix}.bias"] = np.asarray(p["bias"])

    def put_ln(sd, prefix, p):
        sd[f"{prefix}.weight"] = np.asarray(p["scale"])
        sd[f"{prefix}.bias"] = np.asarray(p["bias"])

    sd: Dict[str, np.ndarray] = {"embed_tokens.weight": np.asarray(params["embed_tokens"])}
    for i, lp in enumerate(params["layers"]):
        pre = f"layers.{i}"
        put_ln(sd, f"{pre}.self_attn_layer_norm", lp["self_attn_layer_norm"])
        put_lin(sd, f"{pre}.self_attn.q_proj", lp["attn"]["q"])
        put_lin(sd, f"{pre}.self_attn.k_proj", lp["attn"]["k"])
        put_lin(sd, f"{pre}.self_attn.v_proj", lp["attn"]["v"])
        put_lin(sd, f"{pre}.self_attn.out_proj", lp["attn"]["out"])
        put_ln(sd, f"{pre}.final_layer_norm", lp["final_layer_norm"])
        put_lin(sd, f"{pre}.fc1", lp["fc1"])
        put_lin(sd, f"{pre}.fc2", lp["fc2"])
    put_ln(sd, "layer_norm", params["layer_norm"])
    return sd


def load_encoder_from_local_dir(path: str, cfg: M2M100EncoderCfg) -> Optional[Dict]:
    """Load encoder weights from a local HF M2M100 checkpoint directory
    (torch bin or safetensors); returns params or None if no weights file."""
    import os

    enc_sd: Dict[str, np.ndarray] = {}
    st_path = os.path.join(path, "model.safetensors")
    pt_path = os.path.join(path, "pytorch_model.bin")
    if os.path.exists(st_path):
        from safetensors.numpy import load_file

        raw = load_file(st_path)
    elif os.path.exists(pt_path):
        import torch

        raw = {k: v.numpy() for k, v in torch.load(pt_path, map_location="cpu",
                                                   weights_only=True).items()}
    else:
        return None
    shared = None
    for k, v in raw.items():
        k = k[len("model."):] if k.startswith("model.") else k
        if k.startswith("encoder."):
            enc_sd[k[len("encoder."):]] = np.asarray(v)
        elif k == "shared.weight":
            shared = np.asarray(v)
    if "embed_tokens.weight" not in enc_sd and shared is not None:
        # tied embeddings are deduplicated in safetensors saves
        enc_sd["embed_tokens.weight"] = shared
    return m2m100_torch_sd_to_params(enc_sd, cfg)
