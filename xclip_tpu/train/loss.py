"""Contrastive losses with ICI collectives.

Reference behaviour: deps/open_clip/src/open_clip/loss.py —
``gather_features`` (:19-63, differentiable all_gather), ``ClipLoss``
(:66-131, local-loss B x WB row-block vs global WB x WB, symmetric CE) and
``SigLipLoss`` (:307-414, ring neighbour exchange).

TPU design: inside shard_map, features are exchanged with one in-jit
``lax.all_gather`` over the ICI ring (tiny payload: B x embed_dim).
``jax.lax.all_gather`` is differentiable — its transpose is a
``psum_scatter`` of the cotangent — which *is* the reference's
``--gather-with-grad``; local-loss means each chip only materialises its
(B_local, WB) row block of the logit matrix, never the full WB x WB.
The SigLIP loss uses ``lax.ppermute`` — the XLA ring equivalent of the
reference's isend/irecv neighbour exchange.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _cross_entropy(logits, labels):
    """Mean CE over rows; logits fp32."""
    logits = logits.astype(jnp.float32)
    logz = jax.scipy.special.logsumexp(logits, axis=-1)
    picked = jnp.take_along_axis(logits, labels[:, None], axis=-1)[:, 0]
    return jnp.mean(logz - picked)


def clip_loss(
    image_features: jnp.ndarray,
    text_features: jnp.ndarray,
    logit_scale: jnp.ndarray,
    *,
    axis_name: Optional[str] = None,
    local_loss: bool = True,
    gather_with_grad: bool = True,
) -> jnp.ndarray:
    """Symmetric InfoNCE loss.

    Without ``axis_name``: single-device global loss over the given batch.
    With ``axis_name`` (inside shard_map/pmap): features are the local shard;
    the global batch is assembled via all_gather and each device computes its
    local row block (reference --local-loss --gather-with-grad layout).
    ``gather_with_grad=False`` reproduces the reference default (loss.py:
    40-53): gathered features carry no gradient except the local block,
    which is reinjected — each feature only backprops through its owner's
    loss rows. On TPU the differentiable gather (transpose = psum_scatter)
    costs the same, so True is this framework's default.
    """
    b = image_features.shape[0]
    if axis_name is None:
        logits_per_image = logit_scale * image_features @ text_features.T
        labels = jnp.arange(b)
        return (_cross_entropy(logits_per_image, labels) + _cross_entropy(logits_per_image.T, labels)) / 2

    all_img = jax.lax.all_gather(image_features, axis_name, tiled=True)  # (WB, E)
    all_txt = jax.lax.all_gather(text_features, axis_name, tiled=True)
    rank = jax.lax.axis_index(axis_name)
    if not gather_with_grad:
        all_img = jax.lax.dynamic_update_slice_in_dim(
            jax.lax.stop_gradient(all_img), image_features, rank * b, 0
        )
        all_txt = jax.lax.dynamic_update_slice_in_dim(
            jax.lax.stop_gradient(all_txt), text_features, rank * b, 0
        )
    labels = jnp.arange(b) + rank * b
    if local_loss:
        logits_per_image = logit_scale * image_features @ all_txt.T  # (B, WB)
        logits_per_text = logit_scale * text_features @ all_img.T
        return (_cross_entropy(logits_per_image, labels) + _cross_entropy(logits_per_text, labels)) / 2
    # global layout: full WB x WB on every chip (reference local_loss=False)
    logits_per_image = logit_scale * all_img @ all_txt.T
    wlabels = jnp.arange(all_img.shape[0])
    return (_cross_entropy(logits_per_image, wlabels) + _cross_entropy(logits_per_image.T, wlabels)) / 2


def distill_clip_loss(
    image_features: jnp.ndarray,
    text_features: jnp.ndarray,
    logit_scale: jnp.ndarray,
    dist_image_features: jnp.ndarray,
    dist_text_features: jnp.ndarray,
    dist_logit_scale: jnp.ndarray,
    *,
    axis_name: Optional[str] = None,
    local_loss: bool = True,
):
    """Contrastive + distillation loss (reference DistillClipLoss,
    loss.py:180-216): CE to ground truth plus soft cross-entropy to the
    teacher's logit distribution, both over the gathered global batch."""

    def get_logits(img, txt, scale):
        if axis_name is None:
            return scale * img @ txt.T, scale * txt @ img.T
        all_img = jax.lax.all_gather(img, axis_name, tiled=True)
        all_txt = jax.lax.all_gather(txt, axis_name, tiled=True)
        if local_loss:
            return scale * img @ all_txt.T, scale * txt @ all_img.T
        lpi = scale * all_img @ all_txt.T
        return lpi, lpi.T

    def dist_loss(teacher_logits, student_logits):
        t = jax.nn.softmax(teacher_logits.astype(jnp.float32), axis=1)
        s = jax.nn.log_softmax(student_logits.astype(jnp.float32), axis=1)
        return -jnp.mean(jnp.sum(t * s, axis=1))

    lpi, lpt = get_logits(image_features, text_features, logit_scale)
    dlpi, dlpt = get_logits(
        jax.lax.stop_gradient(dist_image_features),
        jax.lax.stop_gradient(dist_text_features),
        jax.lax.stop_gradient(dist_logit_scale),
    )
    b = lpi.shape[0]
    if axis_name is not None and local_loss:
        labels = jnp.arange(b) + jax.lax.axis_index(axis_name) * b
    else:
        labels = jnp.arange(b)
    contrastive = (_cross_entropy(lpi, labels) + _cross_entropy(lpt, labels)) / 2
    distill = (dist_loss(dlpi, lpi) + dist_loss(dlpt, lpt)) / 2
    return contrastive, distill


def siglip_loss(
    image_features: jnp.ndarray,
    text_features: jnp.ndarray,
    logit_scale: jnp.ndarray,
    logit_bias: jnp.ndarray,
    *,
    axis_name: Optional[str] = None,
) -> jnp.ndarray:
    """Sigmoid pairwise loss (SigLIP) with a ppermute ring over text features.

    Each of the world_size-1 ring steps rotates the text-feature block one
    hop and accumulates the negative-pair loss, so no chip ever holds the
    full global batch — the reference's neighbour-exchange algorithm
    (loss.py:219-414) expressed as an XLA collective.
    """

    def pair_loss(img, txt, positive: bool):
        logits = logit_scale * img @ txt.T + logit_bias
        if positive:
            eye = jnp.eye(img.shape[0], txt.shape[0], dtype=logits.dtype)
            z = 2.0 * eye - 1.0  # +1 diag, -1 off-diag
        else:
            z = -jnp.ones_like(logits)  # every rotated pair is a negative
        return -jnp.sum(jax.nn.log_sigmoid(z * logits)) / img.shape[0]

    loss = pair_loss(image_features, text_features, positive=True)
    if axis_name is None:
        return loss

    n = jax.lax.axis_size(axis_name)
    perm = [(i, (i + 1) % n) for i in range(n)]
    txt = text_features
    for _ in range(n - 1):
        txt = jax.lax.ppermute(txt, axis_name, perm)
        loss = loss + pair_loss(image_features, txt, positive=False)
    return loss
