"""CoCa: contrastive captioner (vision tower + cls-token text tower +
multimodal text decoder).

Reference behaviour: deps/open_clip/src/open_clip/coca_model.py:79-473 and
transformer.py — AttentionalPooler (:187-207, 256-query pooler whose output
feeds both the contrastive head and the decoder's cross attention),
TextTransformer with ``embed_cls`` (cls token appended at the end, pad
positions masked, 'last' pooling with ln_final after pooling,
transformer.py:759-801), MultimodalTransformer (self-attn + cross-attn block
pairs, :805-898), CoCa forward with teacher-forcing labels (coca_model.py:
158-190) and CoCaLoss (loss.py:134-177).

Generation is a host loop over a jitted single-step decoder (greedy / top-k /
top-p); sequences are right-padded so one compiled program serves all steps.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from xclip_tpu.models import layers as L
from xclip_tpu.models import transformer as T


@dataclasses.dataclass(frozen=True)
class MultimodalCfg:
    context_length: int = 76
    width: int = 512
    heads: int = 8
    layers: int = 12
    mlp_ratio: float = 4.0
    output_dim: int = 512  # vocab projection handled by text_projection
    act: str = "gelu"


@dataclasses.dataclass(frozen=True)
class CoCaCfg:
    embed_dim: int
    vision: T.VisionTransformerCfg
    text: object  # T.TextTransformerCfg or hf_text.HFTextCfg
    multimodal: MultimodalCfg
    attn_pooler_queries: int = 256
    attn_pooler_heads: int = 8
    pad_id: int = 0
    init_logit_scale: float = math.log(1 / 0.07)
    # the decoder's vocab projection size — the reference passes
    # text_cfg.vocab_size (default 49408, even for HF towers) as the
    # MultimodalTransformer output_dim (coca_model.py:105-121)
    decoder_vocab_size: int = 49408

    @property
    def image_size(self) -> int:
        return self.vision.image_size

    @property
    def context_length(self) -> int:
        # reference CoCa exposes the MULTIMODAL context length
        # (coca_model.py:134: self.context_length = multimodal_cfg.context_length)
        return self.multimodal.context_length

    @property
    def is_hf_text(self) -> bool:
        return getattr(self.text, "is_hf", False)


def coca_cfg_from_dict(d: dict, quick_gelu: bool = False) -> CoCaCfg:
    act = "quick_gelu" if quick_gelu else "gelu"
    v, t, m = d["vision_cfg"], d["text_cfg"], d["multimodal_cfg"]
    vision = T.VisionTransformerCfg(
        image_size=v.get("image_size", 224), patch_size=v["patch_size"], width=v["width"],
        layers=v["layers"], heads=v["width"] // v.get("head_width", 64),
        output_dim=d["embed_dim"], act=act,
        # coca_base has no attentional pool: cls-tok pooling + ln_post over
        # the full sequence feeds the decoder (transformer.py:636-639)
        attentional_pool=bool(v.get("attentional_pool", False)),
        attn_pooler_heads=v.get("attn_pooler_heads", 8),
        attn_pooler_queries=v.get("attn_pooler_queries", 256),
    )
    if "hf_model_name" in t:
        from xclip_tpu.models.hf_text import hf_text_cfg_from_dict

        text = hf_text_cfg_from_dict(t, d["embed_dim"])
    else:
        text = T.TextTransformerCfg(
            context_length=t.get("context_length", 76), vocab_size=t.get("vocab_size", 49408),
            width=t["width"], heads=t["heads"], layers=t["layers"], output_dim=d["embed_dim"], act=act,
        )
    multimodal = MultimodalCfg(
        context_length=m.get("context_length", 76), width=m["width"], heads=m["heads"],
        layers=m["layers"], mlp_ratio=m.get("mlp_ratio", 4.0), act=act,
    )
    return CoCaCfg(
        embed_dim=d["embed_dim"], vision=vision, text=text, multimodal=multimodal,
        attn_pooler_heads=v.get("attn_pooler_heads", 8),
        attn_pooler_queries=v.get("attn_pooler_queries", 256),
        decoder_vocab_size=t.get("vocab_size", 49408),
    )


# ---------------------------------------------------------------------------
# attentional pooler (transformer.py:187-207)


def attn_pooler_init(rng, d_model: int, context_dim: int, n_queries: int):
    keys = jax.random.split(rng, 5)
    return {
        "query": jax.random.normal(keys[0], (n_queries, d_model), jnp.float32),
        "attn": {
            "q": L.linear_init(keys[1], d_model, d_model),
            "k": L.linear_init(keys[2], context_dim, d_model),
            "v": L.linear_init(keys[3], context_dim, d_model),
            "out": L.linear_init(keys[4], d_model, d_model),
        },
        "ln_q": L.layernorm_init(d_model),
        "ln_k": L.layernorm_init(context_dim),
    }


def attn_pooler_apply(params, x, *, heads: int, dtype=None):
    """x: (B, L, context_dim) -> (B, n_queries, d_model)."""
    b = x.shape[0]
    keys = L.layernorm_apply(params["ln_k"], x)
    q_in = L.layernorm_apply(params["ln_q"], params["query"].astype(x.dtype))
    q_in = jnp.broadcast_to(q_in[None], (b, *q_in.shape))
    q = L.linear_apply(params["attn"]["q"], q_in, dtype=dtype)
    k = L.linear_apply(params["attn"]["k"], keys, dtype=dtype)
    v = L.linear_apply(params["attn"]["v"], keys, dtype=dtype)
    o = L.attention(q, k, v, num_heads=heads)
    return L.linear_apply(params["attn"]["out"], o, dtype=dtype)


# ---------------------------------------------------------------------------
# cross-attention residual block (ResidualAttentionBlock(is_cross_attention))


def cross_block_init(rng, width: int, heads: int, mlp_ratio: float, layers_for_init: int):
    params = T.block_init(rng, width, heads, mlp_ratio, layers_for_init=layers_for_init)
    params["ln_1_kv"] = L.layernorm_init(width)
    return params


def cross_block_apply(params, x, kv, *, heads: int, act: str, dtype=None):
    act_fn = L.ACT_FNS[act]
    q_in = L.layernorm_apply(params["ln_1"], x)
    kv_in = L.layernorm_apply(params["ln_1_kv"], kv)
    q = L.linear_apply(params["attn"]["q"], q_in, dtype=dtype)
    k = L.linear_apply(params["attn"]["k"], kv_in, dtype=dtype)
    v = L.linear_apply(params["attn"]["v"], kv_in, dtype=dtype)
    o = L.attention(q, k, v, num_heads=heads)
    x = x + L.linear_apply(params["attn"]["out"], o, dtype=dtype)
    y = L.layernorm_apply(params["ln_2"], x)
    y = L.linear_apply(params["mlp"]["c_fc"], y, dtype=dtype)
    y = act_fn(y)
    y = L.linear_apply(params["mlp"]["c_proj"], y, dtype=dtype)
    return x + y


# ---------------------------------------------------------------------------
# CoCa model


class CoCaModel:
    def __init__(self, cfg: CoCaCfg):
        self.cfg = cfg

    # -- init -----------------------------------------------------------------
    def init(self, rng) -> Dict:
        kv, kt, kd, kp, kp2, kc = jax.random.split(rng, 6)
        cfg = self.cfg
        visual = T.vit_init(kv, cfg.vision)
        if cfg.vision.attentional_pool:
            # attentional pooling replaces ln_post+tok pooling for the pooled
            # path: pool_dim = output_dim (model.py:494-530); re-init here so
            # the pooler shares the CoCa key schedule
            visual["attn_pool"] = attn_pooler_init(
                kp, cfg.embed_dim, cfg.vision.width, cfg.attn_pooler_queries
            )
            visual["ln_post"] = L.layernorm_init(cfg.embed_dim)
            visual["proj"] = (cfg.embed_dim**-0.5) * jax.random.normal(
                kp2, (cfg.embed_dim, cfg.embed_dim), jnp.float32
            )
        # else: vit_init already made width-sized ln_post + (width, embed_dim)
        # proj — the coca_base layout (transformer.py:636-639)

        if cfg.is_hf_text:
            from xclip_tpu.models.clip import _hf_tower

            text = _hf_tower(cfg.text).init(kt)
        else:
            text = T.text_init(kt, cfg.text)
            # embed_cls: one extra position + cls embedding (transformer.py:694-700)
            text["cls_emb"] = 0.01 * jax.random.normal(kc, (cfg.text.width,), jnp.float32)
            text["positional_embedding"] = 0.01 * jax.random.normal(
                jax.random.fold_in(kt, 7), (cfg.text.context_length + 1, cfg.text.width), jnp.float32
            )

        mm = cfg.multimodal
        decoder: Dict = {"blocks": [], "cross_blocks": []}
        for _ in range(mm.layers):
            kd, k1, k2 = jax.random.split(kd, 3)
            decoder["blocks"].append(T.block_init(k1, mm.width, mm.heads, mm.mlp_ratio, layers_for_init=mm.layers))
            decoder["cross_blocks"].append(cross_block_init(k2, mm.width, mm.heads, mm.mlp_ratio, mm.layers))
        decoder["ln_final"] = L.layernorm_init(mm.width)
        decoder["text_projection"] = (mm.width**-0.5) * jax.random.normal(
            jax.random.fold_in(kd, 9), (mm.width, cfg.decoder_vocab_size), jnp.float32
        )

        return {
            "visual": visual,
            "text": text,
            "text_decoder": decoder,
            "logit_scale": jnp.asarray(cfg.init_logit_scale, jnp.float32),
        }

    # -- towers -----------------------------------------------------------------
    def encode_image_with_tokens(self, params, images, *, dtype=None,
                                 normalize: bool = True) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """-> (latent (B, E), token embs for the decoder's cross attention).

        With attn_pool (transformer.py:615-629): x = attn_pool(transformer
        out); ln_post; pooled = x[:,0], tokens = x[:,1:]; latent = pooled @
        proj. Without (coca_base, transformer.py:636-639): x = ln_post(out);
        pooled = x[:,0] @ proj, tokens = x[:,1:] (vision-width tokens).
        """
        cfg = self.cfg
        tokens, _ = T.vit_apply(
            params["visual"], images, cfg.vision, dtype=dtype,
            stop=cfg.vision.layers + 1,  # stop before the default pooling stage
        )
        if cfg.vision.attentional_pool:
            pooled_all = attn_pooler_apply(
                params["visual"]["attn_pool"], tokens, heads=cfg.attn_pooler_heads, dtype=dtype
            )
            pooled_all = L.layernorm_apply(params["visual"]["ln_post"], pooled_all)
        else:
            pooled_all = L.layernorm_apply(params["visual"]["ln_post"], tokens)
        pooled, tok_embs = pooled_all[:, 0], pooled_all[:, 1:]
        latent = jnp.dot(pooled.astype(jnp.float32), params["visual"]["proj"].astype(jnp.float32))
        if normalize:
            latent = latent / jnp.maximum(jnp.linalg.norm(latent, axis=-1, keepdims=True), 1e-12)
        return latent, tok_embs

    def encode_text_with_tokens(self, params, text_ids, *, dtype=None,
                                normalize: bool = True) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """cls-token text tower (transformer.py:768-802): append cls emb,
        causal mask + pad cls-mask, 'last' pooling, ln_final after pooling.
        HF towers (coca_roberta) return (projected latent, hidden-state
        tokens) per hf_model.py:155-169."""
        if self.cfg.is_hf_text:
            from xclip_tpu.models.clip import _hf_tower

            latent, tokens = _hf_tower(self.cfg.text).apply_with_tokens(
                params["text"], text_ids, dtype=dtype
            )
            latent = latent.astype(jnp.float32)
            if normalize:
                latent = latent / jnp.maximum(
                    jnp.linalg.norm(latent, axis=-1, keepdims=True), 1e-12)
            return latent, tokens
        cfg = self.cfg.text
        p = params["text"]
        emb_dtype = dtype or p["token_embedding"].dtype
        x = p["token_embedding"][text_ids].astype(emb_dtype)
        b, seq = x.shape[0], x.shape[1] + 1
        cls = jnp.broadcast_to(p["cls_emb"].astype(emb_dtype), (b, 1, cfg.width))
        x = jnp.concatenate([x, cls], axis=1)
        x = x + p["positional_embedding"][:seq].astype(emb_dtype)

        causal = L.causal_mask(seq)
        # reference build_cls_mask (transformer.py:759-766): the key-visibility
        # row is [True, text != pad] — i.e. shifted one right, with the first
        # key always visible (exact reference semantics, quirks included).
        pad_mask = jnp.concatenate([jnp.ones((b, 1), bool), text_ids != self.cfg.pad_id], axis=1)
        additive = jnp.where(pad_mask[:, None, None, :], 0.0, -jnp.inf)
        mask = causal + additive  # (B,1,L,L)

        for blk in p["blocks"]:
            x = T.block_apply(blk, x, heads=cfg.heads, act=cfg.act, mask=mask, dtype=dtype)
        pooled, tokens = x[:, -1], x[:, :-1]
        pooled = L.layernorm_apply(p["ln_final"], pooled)
        latent = jnp.dot(pooled.astype(jnp.float32), p["text_projection"].astype(jnp.float32))
        if normalize:
            latent = latent / jnp.maximum(jnp.linalg.norm(latent, axis=-1, keepdims=True), 1e-12)
        return latent, tokens

    def decode(self, params, image_embs, token_embs, *, dtype=None) -> jnp.ndarray:
        """Multimodal decoder -> vocab logits (B, L, V)."""
        mm = self.cfg.multimodal
        d = params["text_decoder"]
        seq = token_embs.shape[1]
        mask = L.causal_mask(seq)
        x = token_embs
        for blk, xblk in zip(d["blocks"], d["cross_blocks"]):
            x = T.block_apply(blk, x, heads=mm.heads, act=mm.act, mask=mask, dtype=dtype)
            x = cross_block_apply(xblk, x, image_embs, heads=mm.heads, act=mm.act, dtype=dtype)
        x = L.layernorm_apply(d["ln_final"], x)
        return jnp.dot(x.astype(jnp.float32), d["text_projection"].astype(jnp.float32))

    # -- joint forward -----------------------------------------------------------
    def forward(self, params, images, text_ids, *, dtype=None, output_labels: bool = True) -> Dict:
        image_latent, image_embs = self.encode_image_with_tokens(params, images, dtype=dtype)
        text_latent, token_embs = self.encode_text_with_tokens(params, text_ids, dtype=dtype)
        labels = text_ids[:, 1:] if output_labels else None
        if output_labels:
            token_embs = token_embs[:, :-1]
        logits = self.decode(params, image_embs, token_embs, dtype=dtype)
        out = {
            "image_features": image_latent,
            "text_features": text_latent,
            "logits": logits,
            "logit_scale": jnp.exp(params["logit_scale"]),
        }
        if labels is not None:
            out["labels"] = labels
        return out

    # CLIPModel-compatible encoder facades (evaluators and the bench drive
    # models through this triple/tuple interface)
    def encode_image(self, params, images, *, state=None, normalize: bool = True,
                     dtype=None, train: bool = False, rng=None, capture=None, remat=False):
        del state, train, rng, capture, remat  # stateless towers
        latent, _ = self.encode_image_with_tokens(params, images, dtype=dtype,
                                                  normalize=normalize)
        return latent, {}, {}

    def encode_text(self, params, text_ids, *, normalize: bool = True, dtype=None):
        latent, _ = self.encode_text_with_tokens(params, text_ids, dtype=dtype,
                                                 normalize=normalize)
        return latent, {}

    # -- generation ---------------------------------------------------------------
    def generate(
        self,
        params,
        images,
        *,
        seq_len: int = 30,
        sot_token_id: int = 49406,
        eos_token_id: int = 49407,
        pad_token_id: int = 0,
        generation_type: str = "top_k",
        top_k: int = 1,
        top_p: float = 0.1,
        temperature: float = 1.0,
        min_seq_len: int = 5,
        num_beams: int = 6,
        num_beam_groups: int = 3,
        seed: int = 0,
    ) -> np.ndarray:
        """Autoregressive captioning (reference generate:192-305, top_k/top_p
        paths; greedy == top_k=1). One jitted step serves every position."""
        b = images.shape[0]
        image_latent, image_embs = self.encode_image_with_tokens(params, images)

        @jax.jit
        def step_logits(p, img_embs, tokens):
            _, token_embs = self.encode_text_with_tokens(p, tokens)
            return self.decode(p, img_embs, token_embs)

        if generation_type == "beam_search":
            return self._generate_beamsearch(
                params, image_embs, b, seq_len=seq_len, sot_token_id=sot_token_id,
                eos_token_id=eos_token_id, pad_token_id=pad_token_id,
                min_seq_len=min_seq_len, num_beams=num_beams,
                num_beam_groups=num_beam_groups,
            )

        rng = np.random.RandomState(seed)
        out = np.full((b, seq_len), pad_token_id, np.int32)
        out[:, 0] = sot_token_id
        done = np.zeros(b, bool)
        for pos in range(1, seq_len):
            logits = np.asarray(step_logits(params, image_embs, jnp.asarray(out)))[:, pos - 1]
            logits = logits / max(temperature, 1e-6)
            if pos < min_seq_len:
                logits[:, eos_token_id] = -1e30
            if generation_type == "top_k":
                kth = np.partition(logits, -top_k, axis=-1)[:, -top_k, None]
                logits = np.where(logits < kth, -1e30, logits)
            elif generation_type == "top_p":
                sorted_idx = np.argsort(-logits, axis=-1)
                sorted_logits = np.take_along_axis(logits, sorted_idx, axis=-1)
                probs = np.exp(sorted_logits - sorted_logits.max(-1, keepdims=True))
                probs /= probs.sum(-1, keepdims=True)
                cum = np.cumsum(probs, axis=-1)
                cutoff = cum > (1 - top_p)
                cutoff[:, 0] = False
                for row in range(b):
                    logits[row, sorted_idx[row, cutoff[row]]] = -1e30
            probs = np.exp(logits - logits.max(-1, keepdims=True))
            probs /= probs.sum(-1, keepdims=True)
            if top_k == 1 and generation_type == "top_k":
                nxt = probs.argmax(-1)
            else:
                nxt = np.array([rng.choice(len(pr), p=pr) for pr in probs])
            nxt = np.where(done, pad_token_id, nxt)
            out[:, pos] = nxt
            done |= nxt == eos_token_id
            if done.all():
                break
        return out

    def _generate_beamsearch(
        self,
        params,
        image_embs,
        batch: int,
        *,
        seq_len: int,
        sot_token_id: int,
        eos_token_id: int,
        pad_token_id: int,
        min_seq_len: int,
        num_beams: int = 6,
        num_beam_groups: int = 3,
        length_penalty: float = 1.0,
    ) -> np.ndarray:
        """Grouped beam search (the reference's default generation path,
        coca_model.py:323-473 with HF BeamSearchScorer semantics:
        ``num_beams`` split into ``num_beam_groups`` groups of sub-beams, top
        2*group_size candidates per group per step, finished hypotheses move
        to a per-group pool scored sum_logp / len**length_penalty, and the
        overall best pooled hypothesis per image is returned). All beams of
        all groups decode in ONE jitted step per position."""
        import jax as _jax

        if num_beams % num_beam_groups != 0:
            raise ValueError(f"num_beams={num_beams} must be divisible by num_beam_groups={num_beam_groups}")
        sub = num_beams // num_beam_groups

        @_jax.jit
        def step_logits(p, img_embs, tokens):
            _, token_embs = self.encode_text_with_tokens(p, tokens)
            return self.decode(p, img_embs, token_embs)

        # expand image embs per beam: (B*num_beams, Q, E); flat beam row
        # layout is bi*num_beams + gi*sub + k
        img = np.repeat(np.asarray(image_embs), num_beams, axis=0)
        tokens = np.full((batch * num_beams, seq_len), pad_token_id, np.int32)
        tokens[:, 0] = sot_token_id
        # first sub-beam of each group live, the rest suppressed
        # (reference coca_model.py:368-372)
        beam_scores = np.full((batch, num_beam_groups, sub), -1e9)
        beam_scores[:, :, 0] = 0.0
        # per (image, group) pool of finished hypotheses: list of (score, ids)
        hyps = [[[] for _ in range(num_beam_groups)] for _ in range(batch)]
        group_done = np.zeros((batch, num_beam_groups), bool)
        cur_len = 1

        for pos in range(1, seq_len):
            logits = np.array(step_logits(params, jnp.asarray(img), jnp.asarray(tokens)))[:, pos - 1]
            if pos < min_seq_len:
                logits[:, eos_token_id] = -1e30
            logp = logits - logits.max(-1, keepdims=True)
            logp = logp - np.log(np.exp(logp).sum(-1, keepdims=True))
            vocab = logp.shape[-1]
            logp = logp.reshape(batch, num_beam_groups, sub, vocab)

            for bi in range(batch):
                for gi in range(num_beam_groups):
                    if group_done[bi, gi]:
                        continue
                    base = bi * num_beams + gi * sub
                    cand = (beam_scores[bi, gi][:, None] + logp[bi, gi]).reshape(-1)
                    top = np.argsort(-cand)[: 2 * sub]
                    rows, live = tokens[base : base + sub].copy(), 0
                    new_scores = np.full(sub, -1e9)
                    for rank, t in enumerate(top):
                        src, tok = t // vocab, int(t % vocab)
                        if tok == eos_token_id:
                            # only candidates ranked within the top sub may
                            # finish (HF BeamSearchScorer.process)
                            if rank < sub:
                                seq = rows[src, :pos].copy()
                                hyps[bi][gi].append((cand[t] / (pos ** length_penalty), seq))
                            continue
                        tokens[base + live] = rows[src]
                        tokens[base + live, pos] = tok
                        new_scores[live] = cand[t]
                        live += 1
                        if live == sub:
                            break
                    beam_scores[bi, gi] = new_scores
                    # is_done (early_stopping=False): no live continuation can
                    # beat the worst kept hypothesis
                    if len(hyps[bi][gi]) >= sub:
                        worst = sorted(h[0] for h in hyps[bi][gi])[-sub]
                        best_possible = new_scores.max() / ((pos + 1) ** length_penalty)
                        if worst >= best_possible:
                            group_done[bi, gi] = True
            cur_len = pos + 1
            if group_done.all():
                break

        # finalize: unfinished groups contribute their live beams
        out = np.full((batch, seq_len), pad_token_id, np.int32)
        for bi in range(batch):
            pool = []
            for gi in range(num_beam_groups):
                pool.extend(hyps[bi][gi])
                if not group_done[bi, gi]:
                    base = bi * num_beams + gi * sub
                    for k in range(sub):
                        if beam_scores[bi, gi, k] > -1e8:
                            pool.append(
                                (beam_scores[bi, gi, k] / (cur_len ** length_penalty),
                                 tokens[base + k, :cur_len].copy())
                            )
            best = max(pool, key=lambda h: h[0])[1]
            out[bi, : len(best)] = best
            if len(best) < seq_len:
                out[bi, len(best)] = eos_token_id
        return out


def coca_loss(
    out: Dict,
    *,
    caption_loss_weight: float = 2.0,
    clip_loss_weight: float = 1.0,
    pad_id: int = 0,
    axis_name: Optional[str] = None,
) -> Tuple[jnp.ndarray, Dict]:
    """CoCaLoss (reference loss.py:134-177): weighted contrastive + caption
    CE ignoring pad tokens."""
    from xclip_tpu.train.loss import clip_loss

    contrastive = 0.0
    if clip_loss_weight:
        contrastive = clip_loss_weight * clip_loss(
            out["image_features"], out["text_features"], out["logit_scale"], axis_name=axis_name
        )
    logits, labels = out["logits"], out["labels"]
    logz = jax.scipy.special.logsumexp(logits, axis=-1)
    picked = jnp.take_along_axis(logits, labels[..., None], axis=-1)[..., 0]
    mask = (labels != pad_id).astype(jnp.float32)
    caption = caption_loss_weight * jnp.sum((logz - picked) * mask) / jnp.maximum(mask.sum(), 1.0)
    return contrastive + caption, {"contrastive_loss": contrastive, "caption_loss": caption}


# ---------------------------------------------------------------------------
# torch checkpoint bridge (open_clip CoCa state dicts)


def coca_params_to_state_dict(model: CoCaModel, params: Dict) -> Dict[str, np.ndarray]:
    """Inverse bridge: CoCa params -> open_clip CoCa state dict (numpy
    values), so reference tooling can consume CoCa checkpoints trained here.
    Mirrors :func:`coca_state_dict_to_params` key-for-key."""
    from xclip_tpu.core.checkpoint import SEP, _lin, flatten_pytree

    p = flatten_pytree(jax.device_get(params))
    cfg = model.cfg
    sd: Dict[str, np.ndarray] = {}

    def put_lin(dst, src):
        sd[f"{dst}.weight"] = _lin(p[f"{src}{SEP}kernel"])
        if f"{src}{SEP}bias" in p:
            sd[f"{dst}.bias"] = p[f"{src}{SEP}bias"]

    def put_ln(dst, src):
        sd[f"{dst}.weight"] = p[f"{src}{SEP}scale"]
        sd[f"{dst}.bias"] = p[f"{src}{SEP}bias"]

    def put_block(dst, src):
        put_ln(f"{dst}.ln_1", f"{src}{SEP}ln_1")
        sd[f"{dst}.attn.in_proj_weight"] = np.concatenate(
            [_lin(p[f"{src}{SEP}attn{SEP}{n}{SEP}kernel"]) for n in ("q", "k", "v")], axis=0
        )
        sd[f"{dst}.attn.in_proj_bias"] = np.concatenate(
            [p[f"{src}{SEP}attn{SEP}{n}{SEP}bias"] for n in ("q", "k", "v")]
        )
        put_lin(f"{dst}.attn.out_proj", f"{src}{SEP}attn{SEP}out")
        put_ln(f"{dst}.ln_2", f"{src}{SEP}ln_2")
        put_lin(f"{dst}.mlp.c_fc", f"{src}{SEP}mlp{SEP}c_fc")
        put_lin(f"{dst}.mlp.c_proj", f"{src}{SEP}mlp{SEP}c_proj")

    # visual ViT core
    sd["visual.conv1.weight"] = np.transpose(p[f"visual{SEP}conv1{SEP}kernel"], (3, 2, 0, 1))
    sd["visual.class_embedding"] = p[f"visual{SEP}class_embedding"]
    sd["visual.positional_embedding"] = p[f"visual{SEP}positional_embedding"]
    put_ln("visual.ln_pre", f"visual{SEP}ln_pre")
    for i in range(cfg.vision.layers):
        put_block(f"visual.transformer.resblocks.{i}", f"visual{SEP}blocks{SEP}{i}")
    put_ln("visual.ln_post", f"visual{SEP}ln_post")
    sd["visual.proj"] = p[f"visual{SEP}proj"]
    if cfg.vision.attentional_pool:
        # attentional pooler (q and kv dims match in CoCa towers -> packed MHA)
        ap = f"visual{SEP}attn_pool"
        sd["visual.attn_pool.query"] = p[f"{ap}{SEP}query"]
        qw = _lin(p[f"{ap}{SEP}attn{SEP}q{SEP}kernel"])
        kw = _lin(p[f"{ap}{SEP}attn{SEP}k{SEP}kernel"])
        vw = _lin(p[f"{ap}{SEP}attn{SEP}v{SEP}kernel"])
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

    if cfg.is_hf_text:
        # HF tower: text.transformer.* via the flax->torch converter
        from xclip_tpu.models.clip import _hf_tower
        from xclip_tpu.models.hf_text import hf_text_params_to_state_dict

        sd.update(hf_text_params_to_state_dict(_hf_tower(cfg.text), params["text"]))
    else:
        # text tower (custom-text layout)
        sd["text.token_embedding.weight"] = p[f"text{SEP}token_embedding"]
        sd["text.positional_embedding"] = p[f"text{SEP}positional_embedding"]
        sd["text.cls_emb"] = p[f"text{SEP}cls_emb"]
        sd["text.text_projection"] = p[f"text{SEP}text_projection"]
        put_ln("text.ln_final", f"text{SEP}ln_final")
        for i in range(cfg.text.layers):
            put_block(f"text.transformer.resblocks.{i}", f"text{SEP}blocks{SEP}{i}")

    # multimodal decoder
    for i in range(cfg.multimodal.layers):
        put_block(f"text_decoder.resblocks.{i}", f"text_decoder{SEP}blocks{SEP}{i}")
        put_block(f"text_decoder.cross_attn.{i}", f"text_decoder{SEP}cross_blocks{SEP}{i}")
        put_ln(f"text_decoder.cross_attn.{i}.ln_1_kv",
               f"text_decoder{SEP}cross_blocks{SEP}{i}{SEP}ln_1_kv")
    put_ln("text_decoder.ln_final", f"text_decoder{SEP}ln_final")
    sd["text_decoder.text_projection"] = p[f"text_decoder{SEP}text_projection"]
    sd["logit_scale"] = np.asarray(p["logit_scale"], np.float32).reshape(())
    return sd


def coca_state_dict_to_params(sd: Dict[str, np.ndarray], model: CoCaModel) -> Dict:
    from xclip_tpu.core.checkpoint import (
        SEP,
        _lin,
        _map_attn_pooler,
        _map_block,
        _map_linear,
        _map_ln,
        _strip_prefix,
        unflatten_into,
    )

    sd = _strip_prefix(dict(sd))
    cfg = model.cfg
    flat: Dict[str, np.ndarray] = {}

    # visual ViT core
    flat[f"visual{SEP}conv1{SEP}kernel"] = np.transpose(sd["visual.conv1.weight"], (2, 3, 1, 0))
    flat[f"visual{SEP}class_embedding"] = sd["visual.class_embedding"]
    flat[f"visual{SEP}positional_embedding"] = sd["visual.positional_embedding"]
    _map_ln(flat, sd, f"visual{SEP}ln_pre", "visual.ln_pre")
    for i in range(cfg.vision.layers):
        _map_block(flat, sd, f"visual{SEP}blocks{SEP}{i}", f"visual.transformer.resblocks.{i}", cfg.vision.width)
    _map_ln(flat, sd, f"visual{SEP}ln_post", "visual.ln_post")
    flat[f"visual{SEP}proj"] = sd["visual.proj"]
    if cfg.vision.attentional_pool:
        # attentional pooler (shared mapper; handles packed vs separate q/k/v)
        _map_attn_pooler(flat, sd, cfg.embed_dim)

    hf_text_params = None
    if cfg.is_hf_text:
        from xclip_tpu.models.clip import _hf_tower
        from xclip_tpu.models.hf_text import hf_text_state_dict_to_params

        hf_text_params = hf_text_state_dict_to_params(
            _hf_tower(cfg.text), {k: v for k, v in sd.items() if k.startswith("text.")}
        )
    else:
        # text tower (custom-text layout: text.*)
        flat[f"text{SEP}token_embedding"] = sd["text.token_embedding.weight"]
        flat[f"text{SEP}positional_embedding"] = sd["text.positional_embedding"]
        flat[f"text{SEP}cls_emb"] = sd["text.cls_emb"]
        flat[f"text{SEP}text_projection"] = sd["text.text_projection"]
        _map_ln(flat, sd, f"text{SEP}ln_final", "text.ln_final")
        for i in range(cfg.text.layers):
            _map_block(flat, sd, f"text{SEP}blocks{SEP}{i}", f"text.transformer.resblocks.{i}", cfg.text.width)

    # multimodal decoder
    for i in range(cfg.multimodal.layers):
        _map_block(flat, sd, f"text_decoder{SEP}blocks{SEP}{i}", f"text_decoder.resblocks.{i}", cfg.multimodal.width)
        _map_block(flat, sd, f"text_decoder{SEP}cross_blocks{SEP}{i}", f"text_decoder.cross_attn.{i}", cfg.multimodal.width)
        _map_ln(flat, sd, f"text_decoder{SEP}cross_blocks{SEP}{i}{SEP}ln_1_kv", f"text_decoder.cross_attn.{i}.ln_1_kv")
    _map_ln(flat, sd, f"text_decoder{SEP}ln_final", "text_decoder.ln_final")
    flat[f"text_decoder{SEP}text_projection"] = sd["text_decoder.text_projection"]
    flat["logit_scale"] = np.asarray(sd["logit_scale"], np.float32).reshape(())

    params0 = model.init(jax.random.PRNGKey(0))
    if hf_text_params is not None:
        # the HF subtree was converted wholesale above; unflatten the rest
        rest = unflatten_into({k: v for k, v in params0.items() if k != "text"}, flat)
        return dict(rest, text=hf_text_params)
    return unflatten_into(params0, flat)
