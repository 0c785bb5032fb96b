"""Training-stack tests: loss parity vs reference, sharded==global loss,
schedule parity, wd masking, and an end-to-end smoke train step on an
8-virtual-device CPU mesh (the reference's synthetic-data smoke pattern,
deps/open_clip/tests/test_training_simple.py)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from xclip_tpu.models.clip import CLIPModel, clip_cfg_from_dict
from xclip_tpu.parallel.mesh import DATA_AXIS, create_mesh
from xclip_tpu.train import optim, schedule
from xclip_tpu.train.loss import clip_loss, siglip_loss
from xclip_tpu.train.step import TrainStepCfg, make_train_step

HAS_REFERENCE = os.path.exists("/root/reference")

TINY_VIT = {
    "embed_dim": 32,
    "vision_cfg": {"image_size": 32, "layers": 2, "width": 32, "patch_size": 16, "head_width": 8},
    "text_cfg": {"context_length": 16, "vocab_size": 512, "width": 32, "heads": 4, "layers": 2},
}
TINY_RN = {
    "embed_dim": 32,
    "vision_cfg": {"image_size": 32, "layers": [1, 1, 1, 1], "width": 8, "patch_size": None},
    "text_cfg": {"context_length": 16, "vocab_size": 512, "width": 32, "heads": 4, "layers": 2},
}


def _rand_features(b=16, e=32, seed=0):
    rng = np.random.RandomState(seed)
    img = rng.randn(b, e).astype(np.float32)
    txt = rng.randn(b, e).astype(np.float32)
    img /= np.linalg.norm(img, axis=-1, keepdims=True)
    txt /= np.linalg.norm(txt, axis=-1, keepdims=True)
    return img, txt


def test_clip_loss_matches_manual():
    img, txt = _rand_features()
    scale = 42.0
    loss = clip_loss(jnp.asarray(img), jnp.asarray(txt), scale)
    logits = scale * img @ txt.T
    # manual softmax CE
    def ce(lg):
        lg = lg - lg.max(-1, keepdims=True)
        p = np.exp(lg) / np.exp(lg).sum(-1, keepdims=True)
        return -np.mean(np.log(p[np.arange(len(lg)), np.arange(len(lg))]))
    expected = (ce(logits) + ce(logits.T)) / 2
    np.testing.assert_allclose(float(loss), expected, rtol=1e-5)


@pytest.mark.skipif(not HAS_REFERENCE, reason="reference tree not mounted")
def test_clip_loss_matches_reference_torch():
    from ref_compat import import_reference_open_clip

    open_clip = import_reference_open_clip()
    import torch

    img, txt = _rand_features(b=12)
    scale = 30.0
    ref = open_clip.ClipLoss()(torch.from_numpy(img), torch.from_numpy(txt), torch.tensor(scale))
    got = clip_loss(jnp.asarray(img), jnp.asarray(txt), scale)
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-5)


@pytest.mark.skipif(not HAS_REFERENCE, reason="reference tree not mounted")
def test_siglip_loss_matches_reference_torch():
    """siglip_loss (dense, world_size=1 path) == the reference SigLipLoss
    (loss.py:307-361): -logsigmoid(z*logits).sum()/B with +1 diag / -1
    off-diag labels and the additive logit bias."""
    from ref_compat import import_reference_open_clip

    open_clip = import_reference_open_clip()
    import torch
    from open_clip.loss import SigLipLoss

    img, txt = _rand_features(b=12)
    scale, bias = 17.3, -8.1
    ref = SigLipLoss()(torch.from_numpy(img), torch.from_numpy(txt),
                       torch.tensor(scale), torch.tensor(bias))
    got = siglip_loss(jnp.asarray(img), jnp.asarray(txt),
                      jnp.asarray(scale), jnp.asarray(bias))
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-5)
    assert open_clip is not None


@pytest.mark.skipif(not HAS_REFERENCE, reason="reference tree not mounted")
def test_coca_loss_matches_reference_torch():
    """coca_loss parts == the reference CoCaLoss (loss.py:134-177):
    weighted contrastive + caption CE with ignore_index=pad_id."""
    from ref_compat import import_reference_open_clip

    open_clip = import_reference_open_clip()
    import torch
    from open_clip.loss import CoCaLoss

    from xclip_tpu.models.coca import coca_loss

    rng = np.random.RandomState(3)
    img, txt = _rand_features(b=10, seed=3)
    vocab, seq, pad_id = 64, 7, 0
    logits = rng.randn(10, seq, vocab).astype(np.float32)
    labels = rng.randint(0, vocab, size=(10, seq)).astype(np.int64)
    labels[:, -2:] = pad_id  # exercise the ignore mask
    scale = 55.0

    ref_clip, ref_cap = CoCaLoss(caption_loss_weight=2.0, clip_loss_weight=1.0, pad_id=pad_id)(
        torch.from_numpy(img), torch.from_numpy(txt),
        torch.from_numpy(logits), torch.from_numpy(labels), torch.tensor(scale))
    total, parts = coca_loss(
        {"image_features": jnp.asarray(img), "text_features": jnp.asarray(txt),
         "logits": jnp.asarray(logits), "labels": jnp.asarray(labels.astype(np.int32)),
         "logit_scale": jnp.asarray(scale)},
        caption_loss_weight=2.0, clip_loss_weight=1.0, pad_id=pad_id)
    np.testing.assert_allclose(float(parts["contrastive_loss"]), float(ref_clip), rtol=1e-5)
    np.testing.assert_allclose(float(parts["caption_loss"]), float(ref_cap), rtol=1e-5)
    np.testing.assert_allclose(float(total), float(ref_clip) + float(ref_cap), rtol=1e-5)
    assert open_clip is not None


@pytest.mark.skipif(not HAS_REFERENCE, reason="reference tree not mounted")
def test_distill_loss_matches_reference_torch():
    """distill_clip_loss == the reference DistillClipLoss (loss.py:180-216):
    CE to ground truth + soft CE to the teacher's logit distribution."""
    from ref_compat import import_reference_open_clip

    open_clip = import_reference_open_clip()
    import torch
    from open_clip.loss import DistillClipLoss

    from xclip_tpu.train.loss import distill_clip_loss

    img, txt = _rand_features(b=12, seed=1)
    t_img, t_txt = _rand_features(b=12, seed=2)
    scale, t_scale = 30.0, 100.0
    ref_con, ref_dist = DistillClipLoss()(
        torch.from_numpy(img), torch.from_numpy(txt), torch.tensor(scale),
        torch.from_numpy(t_img), torch.from_numpy(t_txt), torch.tensor(t_scale))
    got_con, got_dist = distill_clip_loss(
        jnp.asarray(img), jnp.asarray(txt), jnp.asarray(scale),
        jnp.asarray(t_img), jnp.asarray(t_txt), jnp.asarray(t_scale))
    np.testing.assert_allclose(float(got_con), float(ref_con), rtol=1e-5)
    np.testing.assert_allclose(float(got_dist), float(ref_dist), rtol=1e-5)
    assert open_clip is not None


def test_sharded_local_loss_equals_global():
    """8-way sharded local-loss (all_gather row blocks) == single-device
    global loss, and its gradient too (gather-with-grad semantics)."""
    from jax import shard_map

    mesh = create_mesh()
    img, txt = _rand_features(b=16)

    def global_loss(i, t):
        return clip_loss(i, t, 42.0)

    def local_fn(i, t):
        return jax.lax.pmean(clip_loss(i, t, 42.0, axis_name=DATA_AXIS, local_loss=True), DATA_AXIS)

    sharded = shard_map(local_fn, mesh=mesh, in_specs=(P(DATA_AXIS), P(DATA_AXIS)), out_specs=P())

    np.testing.assert_allclose(float(sharded(img, txt)), float(global_loss(img, txt)), rtol=1e-5)

    g_global = jax.grad(lambda i: global_loss(i, jnp.asarray(txt)))(jnp.asarray(img))
    g_sharded = jax.grad(lambda i: sharded(i, jnp.asarray(txt)))(jnp.asarray(img))
    np.testing.assert_allclose(np.asarray(g_sharded), np.asarray(g_global), atol=1e-6)


def test_siglip_ring_equals_dense():
    from jax import shard_map

    mesh = create_mesh()
    img, txt = _rand_features(b=16)
    dense = siglip_loss(jnp.asarray(img), jnp.asarray(txt), 10.0, -10.0)

    def local_fn(i, t):
        return jax.lax.pmean(siglip_loss(i, t, 10.0, -10.0, axis_name=DATA_AXIS), DATA_AXIS)

    ring = shard_map(local_fn, mesh=mesh, in_specs=(P(DATA_AXIS), P(DATA_AXIS)), out_specs=P())
    # per-rank mean + pmean (DDP grad averaging) == dense global mean
    np.testing.assert_allclose(float(ring(img, txt)), float(dense), rtol=1e-4)


@pytest.mark.skipif(not HAS_REFERENCE, reason="reference tree not mounted")
def test_schedule_parity():
    from ref_compat import import_reference_module

    ref = import_reference_module(
        "ref_sched", "/root/reference/deps/open_clip/src/training/scheduler.py"
    )

    class FakeOpt:
        param_groups = [{"lr": 0.0}]

    for name, mine in [
        ("cosine", schedule.cosine_lr(1e-3, 50, 1000)),
        ("const", schedule.const_lr(1e-3, 50, 1000)),
    ]:
        opt = FakeOpt()
        ref_fn = {"cosine": ref.cosine_lr, "const": ref.const_lr}[name](opt, 1e-3, 50, 1000)
        for step in [0, 1, 49, 50, 51, 500, 999]:
            ref_fn(step)
            np.testing.assert_allclose(float(mine(step)), opt.param_groups[0]["lr"], rtol=1e-4, atol=1e-9, err_msg=f"{name}@{step}")

    opt = FakeOpt()
    ref_fn = ref.const_lr_cooldown(opt, 1e-3, 50, 1000, 200, 1.0, 0.0)
    mine = schedule.const_lr_cooldown(1e-3, 50, 1000, 200, 1.0, 0.0)
    for step in [0, 49, 400, 800, 850, 999]:
        ref_fn(step)
        np.testing.assert_allclose(float(mine(step)), opt.param_groups[0]["lr"], rtol=1e-4, atol=1e-9)


def test_adamw_mu_dtype_bf16():
    """mu_dtype='bfloat16' stores the first moment in bf16 (the HBM-traffic
    A/B knob; default None keeps fp32 reference parity) and the first-step
    update matches fp32 within bf16 rounding."""
    params = {"w": jnp.ones((4, 4)) * 0.5, "bias": jnp.zeros((4,))}
    grads = {"w": jnp.ones((4, 4)) * 0.1, "bias": jnp.ones((4,)) * 0.2}

    tx32 = optim.adamw(1e-2, weight_decay=0.1)
    txbf = optim.adamw(1e-2, weight_decay=0.1, mu_dtype="bfloat16")
    s32, sbf = tx32.init(params), txbf.init(params)
    assert any(l.dtype == jnp.bfloat16 for l in jax.tree_util.tree_leaves(sbf))
    # the default (mu_dtype=None) must keep every moment fp32 (reference parity)
    assert not any(l.dtype == jnp.bfloat16 for l in jax.tree_util.tree_leaves(s32))
    u32, _ = tx32.update(grads, s32, params)
    ubf, _ = txbf.update(grads, sbf, params)
    np.testing.assert_allclose(np.asarray(ubf["w"]), np.asarray(u32["w"]),
                               rtol=1e-2, atol=1e-6)


def test_wd_mask_rule():
    model = CLIPModel(clip_cfg_from_dict(TINY_RN))
    params, _ = model.init(jax.random.PRNGKey(0))
    mask = optim.wd_mask(params)
    assert mask["logit_scale"] is False
    assert mask["visual"]["stem"]["conv1"]["kernel"] is True
    assert mask["visual"]["stem"]["bn1"]["scale"] is False
    assert mask["text"]["blocks"][0]["attn"]["q"]["kernel"] is True
    assert mask["text"]["blocks"][0]["attn"]["q"]["bias"] is False
    assert mask["text"]["blocks"][0]["ln_1"]["scale"] is False


def _smoke_train(cfg_dict, accum, steps=3, grad_ckpt=False):
    model = CLIPModel(clip_cfg_from_dict(cfg_dict))
    params, state = model.init(jax.random.PRNGKey(0))
    mesh = create_mesh()
    tx = optim.adamw(schedule.cosine_lr(1e-3, 2, 100), weight_decay=0.1, grad_clip_norm=1.0)
    opt_state = tx.init(params)
    step = make_train_step(
        model, tx, mesh,
        TrainStepCfg(precision="fp32", accum_freq=accum, grad_checkpointing=grad_ckpt),
    )
    rng = np.random.RandomState(0)
    size = cfg_dict["vision_cfg"]["image_size"]
    ctx = cfg_dict["text_cfg"]["context_length"]
    losses = []
    for _ in range(steps):
        batch = {
            "images": rng.randn(16, size, size, 3).astype(np.float32),
            "texts": rng.randint(1, 400, size=(16, ctx)).astype(np.int32),
        }
        params, state, opt_state, metrics = step(params, state, opt_state, batch)
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses)), losses
    return losses


def test_train_step_vit_smoke():
    losses = _smoke_train(TINY_VIT, accum=1, steps=5)
    assert losses[-1] < losses[0] + 3.0  # finite and not exploding


def test_train_step_resnet_smoke():
    _smoke_train(TINY_RN, accum=1)


def test_train_step_accum_smoke():
    _smoke_train(TINY_VIT, accum=2)


def test_train_step_remat_smoke():
    _smoke_train(TINY_VIT, accum=1, grad_ckpt=True)


def test_siglip_train_step_smoke():
    """SigLIP model (logit_bias param) + sigmoid ring loss trains."""
    import xclip_tpu.models.factory as F

    cfg = {
        "embed_dim": 32, "init_logit_scale": 2.302585, "init_logit_bias": -10.0,
        "vision_cfg": {"image_size": 32, "layers": 2, "width": 32, "patch_size": 16, "head_width": 8},
        "text_cfg": {"context_length": 16, "vocab_size": 512, "width": 32, "heads": 4,
                     "layers": 2, "no_causal_mask": True, "pool_type": "last"},
    }
    model = CLIPModel(clip_cfg_from_dict(cfg))
    params, state = model.init(jax.random.PRNGKey(0))
    assert "logit_bias" in params
    mesh = create_mesh()
    tx = optim.adamw(schedule.cosine_lr(1e-3, 2, 100), weight_decay=0.1)
    opt_state = tx.init(params)
    step = make_train_step(model, tx, mesh, TrainStepCfg(precision="fp32", siglip=True))
    rng = np.random.RandomState(0)
    losses = []
    for _ in range(3):
        batch = {
            "images": rng.randn(16, 32, 32, 3).astype(np.float32),
            "texts": rng.randint(1, 400, size=(16, 16)).astype(np.int32),
        }
        params, state, opt_state, metrics = step(params, state, opt_state, batch)
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses))


def test_siglip_accum_uses_sigmoid_loss():
    """--siglip --accum-freq 2 must train the sigmoid pairwise loss, not
    InfoNCE (ADVICE r1): at identical params the cached-negatives loss equals
    the accum=1 siglip loss, and logit_bias receives a gradient."""
    cfg = {
        "embed_dim": 32, "init_logit_scale": 2.302585, "init_logit_bias": -10.0,
        "vision_cfg": {"image_size": 32, "layers": 2, "width": 32, "patch_size": 16, "head_width": 8},
        "text_cfg": {"context_length": 16, "vocab_size": 512, "width": 32, "heads": 4, "layers": 2},
    }
    model = CLIPModel(clip_cfg_from_dict(cfg))
    params, state = model.init(jax.random.PRNGKey(0))
    mesh = create_mesh()
    tx = optim.adamw(schedule.cosine_lr(1e-3, 2, 100), weight_decay=0.0)
    rng = np.random.RandomState(0)
    batch = {
        "images": rng.randn(16, 32, 32, 3).astype(np.float32),
        "texts": rng.randint(1, 400, size=(16, 16)).astype(np.int32),
    }
    losses, biases = [], []
    for accum in (1, 2):
        p = jax.tree_util.tree_map(jnp.copy, params)
        s = jax.tree_util.tree_map(jnp.copy, state)
        step = make_train_step(
            model, tx, mesh, TrainStepCfg(precision="fp32", siglip=True, accum_freq=accum)
        )
        p, s, _, metrics = step(p, s, tx.init(p), dict(batch))
        losses.append(float(metrics["loss"]))
        biases.append(float(p["logit_bias"]))
    np.testing.assert_allclose(losses[0], losses[1], rtol=1e-5)
    assert biases[1] != -10.0, "logit_bias got no gradient through the accum path"


def test_patch_dropout_rng_threaded_through_train_step():
    """--force-patch-dropout is NOT a silent no-op (ADVICE r1): the step
    demands a per-step rng seed, dropout varies with it, and the bare
    forward fails loudly in train mode without an rng."""
    cfg = {
        "embed_dim": 32,
        "vision_cfg": {"image_size": 32, "layers": 2, "width": 32, "patch_size": 8,
                       "head_width": 8, "patch_dropout": 0.5},
        "text_cfg": {"context_length": 16, "vocab_size": 512, "width": 32, "heads": 4, "layers": 2},
    }
    model = CLIPModel(clip_cfg_from_dict(cfg))
    params, state = model.init(jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="patch_dropout"):
        model.forward(params, np.zeros((2, 32, 32, 3), np.float32),
                      np.zeros((2, 16), np.int32), state=state, train=True)

    mesh = create_mesh()
    tx = optim.adamw(schedule.cosine_lr(1e-3, 2, 100))
    step = make_train_step(model, tx, mesh, TrainStepCfg(precision="fp32"))
    assert step.needs_rng
    rng = np.random.RandomState(0)
    batch = {
        "images": rng.randn(16, 32, 32, 3).astype(np.float32),
        "texts": rng.randint(1, 400, size=(16, 16)).astype(np.int32),
    }
    with pytest.raises(ValueError, match="batch\\['step'\\]"):
        step(params, state, tx.init(params), dict(batch))
    losses = {}
    for step_idx in (0, 1):
        p = jax.tree_util.tree_map(jnp.copy, params)
        s = jax.tree_util.tree_map(jnp.copy, state)
        _, _, _, metrics = step(p, s, tx.init(p), {**batch, "step": np.int32(step_idx)})
        losses[step_idx] = float(metrics["loss"])
    assert losses[0] != losses[1], "patch-dropout selection did not vary with the step rng"


def test_pjit_zero_sharded_step():
    """pjit global-math step with ZeRO param sharding trains and matches the
    shard_map step's loss on the first step (ViT: no BN, so the two layouts
    compute identical math)."""
    from xclip_tpu.train.step_pjit import make_train_step_pjit, zero_sharding

    model = CLIPModel(clip_cfg_from_dict(TINY_VIT))
    params, state = model.init(jax.random.PRNGKey(0))
    mesh = create_mesh()
    tx = optim.adamw(schedule.cosine_lr(1e-3, 2, 100), weight_decay=0.1)
    opt_state = tx.init(params)

    rng = np.random.RandomState(0)
    batch = {
        "images": rng.randn(16, 32, 32, 3).astype(np.float32),
        "texts": rng.randint(1, 400, size=(16, 16)).astype(np.int32),
    }

    # shard_map reference loss on the same batch
    ref_step = make_train_step(model, tx, mesh, TrainStepCfg(precision="fp32"))
    _, _, _, ref_metrics = ref_step(
        jax.tree_util.tree_map(lambda x: x.copy(), params), state, tx.init(params), dict(batch)
    )

    params_sh = jax.device_put(params, zero_sharding(mesh, params))
    opt_sh = jax.device_put(opt_state, zero_sharding(mesh, opt_state))
    step = make_train_step_pjit(
        model, tx, mesh, TrainStepCfg(precision="fp32"),
        shard_params=True, example_params=params, example_opt_state=opt_state,
    )
    params2, state2, opt2, metrics = step(params_sh, state, opt_sh, batch)
    np.testing.assert_allclose(float(metrics["loss"]), float(ref_metrics["loss"]), rtol=1e-4)
    # params actually sharded: at least one leaf has a non-trivial sharding
    shardings = [x.sharding for x in jax.tree_util.tree_leaves(params2)]
    assert any(not s.is_fully_replicated for s in shardings)
    # second step runs on the sharded outputs
    params2, state2, opt2, metrics = step(params2, state2, opt2, batch)
    assert np.isfinite(float(metrics["loss"]))


def test_distill_train_step_smoke():
    from xclip_tpu.train.step import make_distill_train_step

    student = CLIPModel(clip_cfg_from_dict(TINY_VIT))
    teacher = CLIPModel(clip_cfg_from_dict(TINY_VIT))
    s_params, s_state = student.init(jax.random.PRNGKey(0))
    t_params, t_state = teacher.init(jax.random.PRNGKey(1))
    mesh = create_mesh()
    tx = optim.adamw(schedule.cosine_lr(1e-3, 2, 100), weight_decay=0.1)
    opt_state = tx.init(s_params)
    step = make_distill_train_step(student, teacher, tx, mesh, TrainStepCfg(precision="fp32"))
    rng = np.random.RandomState(0)
    batch = {
        "images": rng.randn(16, 32, 32, 3).astype(np.float32),
        "texts": rng.randint(1, 400, size=(16, 16)).astype(np.int32),
    }
    s_params, s_state, opt_state, metrics = step(s_params, s_state, opt_state, t_params, t_state, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["distill_loss"]) > 0


def test_get_clip_metrics_retrieval():
    from xclip_tpu.train.evaluate import accuracy_topk, get_clip_metrics

    rng = np.random.RandomState(0)
    feats = rng.randn(12, 8).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=1, keepdims=True)
    # identical image/text features -> perfect retrieval
    m = get_clip_metrics(feats, feats, 100.0)
    assert m["image_to_text_R@1"] == 1.0
    assert m["text_to_image_R@5"] == 1.0
    assert m["image_to_text_mean_rank"] == 1.0
    # shuffled -> imperfect
    m2 = get_clip_metrics(feats, np.roll(feats, 1, axis=0), 100.0)
    assert m2["image_to_text_R@1"] == 0.0

    logits = np.array([[0.1, 0.9], [0.8, 0.2]])
    a1, a2 = accuracy_topk(logits, np.array([1, 0]), topk=(1, 2))
    assert a1 == 1.0 and a2 == 1.0


def test_zero_shot_eval_in_training(tmp_path):
    """In-training ImageNet zero-shot eval (reference training/zero_shot.py)."""
    import argparse

    from xclip_tpu.train.evaluate import zero_shot_eval

    model = CLIPModel(clip_cfg_from_dict({
        "embed_dim": 32,
        "vision_cfg": {"image_size": 32, "layers": 2, "width": 32, "patch_size": 16, "head_width": 8},
        "text_cfg": {"context_length": 77, "vocab_size": 49408, "width": 32, "heads": 4, "layers": 2},
    }))
    params, state = model.init(jax.random.PRNGKey(0))

    # monkeypatch the label space small for CPU speed
    import xclip_tpu.train.evaluate as ev

    orig_names, orig_tpl = ev.IMAGENET_CLASSNAMES, ev.OPENAI_IMAGENET_TEMPLATES
    ev.IMAGENET_CLASSNAMES = ["cat", "dog", "fish", "bird", "cow", "horse"]
    ev.OPENAI_IMAGENET_TEMPLATES = ["a photo of a {}."]
    try:
        rng = np.random.RandomState(0)
        batches = [
            (rng.randn(4, 32, 32, 3).astype(np.float32), rng.randint(0, 6, 4))
            for _ in range(2)
        ]
        args = argparse.Namespace(zeroshot_frequency=1, epochs=1)
        from xclip_tpu.tokenizer import get_tokenizer

        res = ev.zero_shot_eval(model, params, state, {"imagenet-val": batches}, 1, args,
                                get_tokenizer("x"))
        assert "imagenet-zeroshot-val-top1" in res
        assert 0.0 <= res["imagenet-zeroshot-val-top1"] <= 1.0
        assert res["imagenet-zeroshot-val-top5"] >= res["imagenet-zeroshot-val-top1"]
    finally:
        ev.IMAGENET_CLASSNAMES, ev.OPENAI_IMAGENET_TEMPLATES = orig_names, orig_tpl


class TestTowerLocking:
    """LiT-style --lock-image/--lock-text (reference main.py:268-276,
    transformer.py lock groups, modified_resnet.py all-or-nothing)."""

    def _vit_params(self):
        from xclip_tpu.models.factory import create_model

        return create_model("ViT-S-32")

    def test_vit_group_mask(self):
        from xclip_tpu.train.optim import lock_mask

        model, params, state = self._vit_params()
        n = len(params["visual"]["blocks"])
        # fully locked image tower
        m = lock_mask(params, lock_image=True)
        assert not m["visual"]["conv1"]["kernel"]
        assert not m["visual"]["proj"]
        assert m["text"]["token_embedding"] and m["logit_scale"]
        # last group = proj only
        m = lock_mask(params, lock_image=True, lock_image_unlocked_groups=1)
        assert m["visual"]["proj"]
        assert not m["visual"]["ln_post"]["scale"]
        # two groups: proj + (last block + ln_post)
        m = lock_mask(params, lock_image=True, lock_image_unlocked_groups=2)
        assert m["visual"]["ln_post"]["scale"]
        assert m["visual"]["blocks"][n - 1]["attn"]["q"]["kernel"]
        assert not m["visual"]["blocks"][n - 2]["attn"]["q"]["kernel"]

    def test_text_lock_and_rn_all_or_nothing(self):
        from xclip_tpu.models.factory import create_model
        from xclip_tpu.train.optim import lock_mask

        model, params, state = self._vit_params()
        n = len(params["text"]["blocks"])
        m = lock_mask(params, lock_text=True, lock_text_unlocked_layers=1,
                      lock_text_freeze_layer_norm=True)
        assert not m["text"]["token_embedding"]
        assert m["text"]["blocks"][n - 1]["mlp"]["c_fc"]["kernel"]
        assert not m["text"]["blocks"][n - 1]["ln_1"]["scale"]  # LN stays frozen
        assert not m["text"]["blocks"][0]["mlp"]["c_fc"]["kernel"]

        _, rn_params, _ = create_model("RN50")
        m = lock_mask(rn_params, lock_image=True)
        assert not m["visual"]["stem"]["conv1"]["kernel"]
        with pytest.raises(ValueError, match="partial locking"):
            lock_mask(rn_params, lock_image=True, lock_image_unlocked_groups=1)

    def test_frozen_params_do_not_move(self):
        import optax

        from xclip_tpu.parallel.mesh import create_mesh, shard_batch
        from xclip_tpu.train.optim import adamw, lock_mask, with_frozen
        from xclip_tpu.train.step import TrainStepCfg, make_train_step

        model, params, state = self._vit_params()
        mask = lock_mask(params, lock_image=True, lock_image_unlocked_groups=1)
        tx = with_frozen(adamw(1e-2, weight_decay=0.1), mask)
        mesh = create_mesh()
        step = make_train_step(model, tx, mesh, TrainStepCfg(precision="fp32"))
        opt_state = tx.init(params)
        rng = np.random.RandomState(0)
        batch = shard_batch(mesh, {
            "images": rng.randn(8, model.cfg.image_size, model.cfg.image_size, 3).astype(np.float32),
            "texts": rng.randint(1, 1000, size=(8, 77)).astype(np.int32),
        })
        p0 = jax.tree_util.tree_map(np.asarray, params)
        params2, *_ = step(params, state, opt_state, batch)
        np.testing.assert_array_equal(np.asarray(params2["visual"]["conv1"]["kernel"]),
                                      p0["visual"]["conv1"]["kernel"])
        assert not np.array_equal(np.asarray(params2["visual"]["proj"]), p0["visual"]["proj"])
        assert not np.array_equal(np.asarray(params2["text"]["token_embedding"]),
                                  p0["text"]["token_embedding"])
        del optax


def test_gather_without_grad_semantics():
    """gather_with_grad=False (the reference default, loss.py:40-53): the
    loss VALUE equals the differentiable-gather loss, but gradients only
    flow through each feature's owner rank. Verified against a single-device
    emulation with per-rank stop_gradient masking."""
    from jax import shard_map

    mesh = create_mesh()
    n_dev = len(jax.devices())
    img, txt = _rand_features(b=16)
    bl = 16 // n_dev

    def local_fn(i, t):
        return jax.lax.pmean(
            clip_loss(i, t, 42.0, axis_name=DATA_AXIS, local_loss=True, gather_with_grad=False),
            DATA_AXIS,
        )

    sharded = shard_map(local_fn, mesh=mesh, in_specs=(P(DATA_AXIS), P(DATA_AXIS)), out_specs=P())
    # value identical to the with-grad variant
    np.testing.assert_allclose(float(sharded(img, txt)), float(clip_loss(img, txt, 42.0)), rtol=1e-5)

    def emulated(i):
        # mean over ranks of rank-k local losses where only shard k carries grad
        t = jnp.asarray(txt)
        total = 0.0
        for k in range(n_dev):
            mask = jnp.zeros((16, 1)).at[k * bl : (k + 1) * bl].set(1.0)
            i_k = jax.lax.stop_gradient(i) * (1 - mask) + i * mask
            logits = 42.0 * i_k[k * bl : (k + 1) * bl] @ jax.lax.stop_gradient(t).T
            labels = jnp.arange(bl) + k * bl
            li = -jnp.mean(jax.nn.log_softmax(logits, -1)[jnp.arange(bl), labels])
            # text-side: rows are this rank's texts vs ALL images (i_k grads)
            logits_t = 42.0 * jax.lax.stop_gradient(t)[k * bl : (k + 1) * bl] @ i_k.T
            lt = -jnp.mean(jax.nn.log_softmax(logits_t, -1)[jnp.arange(bl), labels])
            total = total + (li + lt) / 2
        return total / n_dev

    g_sharded = jax.grad(lambda i: sharded(i, jnp.asarray(txt)))(jnp.asarray(img))
    g_emu = jax.grad(emulated)(jnp.asarray(img))
    np.testing.assert_allclose(np.asarray(g_sharded), np.asarray(g_emu), atol=1e-6)
    # and it differs from the with-grad gradient (cross-rank terms removed)
    def with_grad_fn(i, t):
        return jax.lax.pmean(clip_loss(i, t, 42.0, axis_name=DATA_AXIS, local_loss=True), DATA_AXIS)
    wg = shard_map(with_grad_fn, mesh=mesh, in_specs=(P(DATA_AXIS), P(DATA_AXIS)), out_specs=P())
    g_wg = jax.grad(lambda i: wg(i, jnp.asarray(txt)))(jnp.asarray(img))
    assert np.abs(np.asarray(g_wg) - np.asarray(g_sharded)).max() > 1e-6


def test_uint8_batch_normalizes_on_device():
    """A uint8 image batch produces the same loss as the equivalently
    normalized fp32 batch (on-device normalize path)."""
    from xclip_tpu.data.transforms import OPENAI_DATASET_MEAN, OPENAI_DATASET_STD
    from xclip_tpu.parallel.mesh import create_mesh, shard_batch
    from xclip_tpu.train import optim, schedule
    from xclip_tpu.train.step import TrainStepCfg, make_train_step

    model = CLIPModel(clip_cfg_from_dict(TINY_VIT))
    params, state = model.init(jax.random.PRNGKey(0))
    mesh = create_mesh()
    tx = optim.adamw(schedule.cosine_lr(1e-3, 2, 10), weight_decay=0.0)
    step = make_train_step(model, tx, mesh, TrainStepCfg(precision="fp32"))

    rng = np.random.RandomState(0)
    n = jax.device_count()
    size = model.cfg.image_size
    u8 = rng.randint(0, 255, (2 * n, size, size, 3)).astype(np.uint8)
    texts = rng.randint(1, 100, size=(2 * n, model.cfg.context_length)).astype(np.int32)
    mean = np.asarray(OPENAI_DATASET_MEAN, np.float32)
    std = np.asarray(OPENAI_DATASET_STD, np.float32)
    f32 = (u8.astype(np.float32) / 255.0 - mean) / std

    # the step donates its inputs; fresh pytrees per call
    b1 = shard_batch(mesh, {"images": u8, "texts": texts})
    _, _, _, m1 = step(params, state, tx.init(params), b1)
    l1 = float(m1["loss"])
    params, state = model.init(jax.random.PRNGKey(0))
    b2 = shard_batch(mesh, {"images": f32, "texts": texts})
    _, _, _, m2 = step(params, state, tx.init(params), b2)
    np.testing.assert_allclose(l1, float(m2["loss"]), rtol=1e-5, atol=1e-5)


def test_pjit_accum_matches_shard_map_accum():
    """The pjit-family cached-negatives accumulation (step_pjit.accum_grads)
    matches the shard_map accum step from the same init — the reference's
    --accum-freq semantics under ZeRO/TP/PP/SP-style steps."""
    from xclip_tpu.train.step_pjit import make_train_step_pjit

    import optax

    model = CLIPModel(clip_cfg_from_dict(TINY_VIT))
    params, state = model.init(jax.random.PRNGKey(0))
    mesh = create_mesh()
    # SGD so post-step param diffs are proportional to GRAD diffs (Adam's
    # normalized update flips sign on near-zero-grad elements, amplifying
    # fp ordering noise to the lr scale)
    tx = optax.sgd(0.1)
    cfg = TrainStepCfg(precision="fp32", accum_freq=2)

    rng = np.random.RandomState(0)
    batch = {
        "images": rng.randn(16, 32, 32, 3).astype(np.float32),
        "texts": rng.randint(1, 400, size=(16, 16)).astype(np.int32),
    }

    ref_step = make_train_step(model, tx, mesh, cfg)
    p1, _, _, m1 = ref_step(
        jax.tree_util.tree_map(lambda x: x.copy(), params), state, tx.init(params), dict(batch)
    )

    step = make_train_step_pjit(model, tx, mesh, cfg,
                                example_params=params, example_opt_state=tx.init(params))
    p2, _, _, m2 = step(params, state, tx.init(params), batch)
    np.testing.assert_allclose(float(m2["loss"]), float(m1["loss"]), rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-5)


def test_pjit_siglip_matches_shard_map():
    """SigLIP in global math (full-matrix sigmoid loss) equals the shard_map
    ppermute-ring step: same loss and same grads (SGD, see accum test)."""
    import optax

    from xclip_tpu.train.step_pjit import make_train_step_pjit

    cfg_d = dict(TINY_VIT)
    cfg_d["init_logit_bias"] = -10
    model = CLIPModel(clip_cfg_from_dict(cfg_d))
    params, state = model.init(jax.random.PRNGKey(0))
    mesh = create_mesh()
    tx = optax.sgd(0.1)
    cfg = TrainStepCfg(precision="fp32", siglip=True)

    rng = np.random.RandomState(0)
    batch = {
        "images": rng.randn(16, 32, 32, 3).astype(np.float32),
        "texts": rng.randint(1, 400, size=(16, 16)).astype(np.int32),
    }

    ref_step = make_train_step(model, tx, mesh, cfg)
    p1, _, _, m1 = ref_step(
        jax.tree_util.tree_map(lambda x: x.copy(), params), state, tx.init(params), dict(batch)
    )

    step = make_train_step_pjit(model, tx, mesh, cfg,
                                example_params=params, example_opt_state=tx.init(params))
    p2, _, _, m2 = step(params, state, tx.init(params), batch)
    np.testing.assert_allclose(float(m2["loss"]), float(m1["loss"]), rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-5)


def test_pjit_distill_matches_shard_map():
    """Distillation in global pjit math (make_distill_train_step_pjit)
    matches the shard_map distill step: same loss parts, same post-step
    params (SGD, see the pjit accum test for why not Adam). Unlocks
    --distill-* under --parallelism zero."""
    import optax

    from xclip_tpu.train.step import make_distill_train_step
    from xclip_tpu.train.step_pjit import make_distill_train_step_pjit

    student = CLIPModel(clip_cfg_from_dict(TINY_VIT))
    teacher = CLIPModel(clip_cfg_from_dict(TINY_VIT))
    s_params, s_state = student.init(jax.random.PRNGKey(0))
    t_params, t_state = teacher.init(jax.random.PRNGKey(1))
    mesh = create_mesh()
    tx = optax.sgd(0.1)
    cfg = TrainStepCfg(precision="fp32")

    rng = np.random.RandomState(0)
    batch = {
        "images": rng.randn(16, 32, 32, 3).astype(np.float32),
        "texts": rng.randint(1, 400, size=(16, 16)).astype(np.int32),
    }

    ref_step = make_distill_train_step(student, teacher, tx, mesh, cfg)
    p1, _, _, m1 = ref_step(
        jax.tree_util.tree_map(lambda x: np.asarray(x).copy(), s_params),
        s_state, tx.init(s_params), t_params, t_state, dict(batch))

    step = make_distill_train_step_pjit(student, teacher, tx, mesh, cfg)
    p2, _, _, m2 = step(s_params, s_state, tx.init(s_params), t_params, t_state, batch)
    np.testing.assert_allclose(float(m2["loss"]), float(m1["loss"]), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(m2["distill_loss"]), float(m1["distill_loss"]),
                               rtol=1e-5, atol=1e-6)
    assert float(m2["distill_loss"]) > 0
    for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-5)


def test_train_one_epoch_deferred_sync_meters(tmp_path, caplog):
    """The deferred-sync epoch loop (train/main.py): per-step losses are
    fetched in ONE device_get per log window yet the loss meter still sees
    EVERY step (reference train.py:193-199 updates losses_m each step), the
    log line reports the last synced logit scale, and the prefetcher path
    (place_batch set) feeds the step device-resident batches."""
    import logging
    import types

    from xclip_tpu.parallel.mesh import create_mesh, shard_batch
    from xclip_tpu.train.main import train_one_epoch
    from xclip_tpu.parallel.mesh import DistInfo

    n_batches = 7
    losses = [float(i + 1) for i in range(n_batches)]

    class FakeLoader:
        num_batches = n_batches
        num_samples = n_batches * 8

        def set_epoch(self, e):
            self.epoch = e

        def __iter__(self):
            for i in range(n_batches):
                yield {"images": np.full((8, 2), i, np.float32),
                       "texts": np.full((8, 3), i, np.int32)}

    calls = {"n": 0, "device_batches": 0}

    def step_fn(params, state, opt_state, batch):
        import jax

        if isinstance(batch["images"], jax.Array):
            calls["device_batches"] += 1
        i = calls["n"]
        calls["n"] += 1
        metrics = {"loss": jnp.asarray(losses[i]),
                   "logit_scale": jnp.asarray(100.0 + i)}
        return params, state, opt_state, metrics

    args = types.SimpleNamespace(
        batch_size=8, accum_freq=1, log_every_n_steps=3, lock_image=False,
        lock_image_freeze_bn_stats=False, save_logs=False, save_log_step=0,
        next_log_ckpt_step=0, profile_steps=0, batch_prefetch=2,
        checkpoint_path=str(tmp_path),
    )
    mesh = create_mesh()
    data = {"train": FakeLoader()}
    with caplog.at_level(logging.INFO):
        train_one_epoch(None, step_fn, {}, {}, {}, data, 0, args,
                        DistInfo.current(), place_batch=lambda b: shard_batch(mesh, b))

    assert calls["n"] == n_batches
    assert calls["device_batches"] == n_batches  # prefetcher placed them all
    lines = [r.message for r in caplog.records if "Train Epoch" in r.message]
    assert len(lines) == 3  # steps 3, 6, and the final (7th) batch
    # meter saw every step: avg over all 7 losses on the final line
    import re

    m = re.search(r"Loss: ([\d.]+) \(([\d.]+)\)", lines[-1])
    assert float(m.group(1)) == losses[-1]
    assert abs(float(m.group(2)) - np.mean(losses)) < 1e-3
    # Scale on each log line is the last SYNCED step's logit_scale
    assert "Scale: 102.000" in lines[0]
    assert "Scale: 105.000" in lines[1]
    assert "Scale: 106.000" in lines[2]
