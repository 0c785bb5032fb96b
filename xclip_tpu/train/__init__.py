from xclip_tpu.train.loss import clip_loss, distill_clip_loss, siglip_loss  # noqa: F401
from xclip_tpu.train.step import TrainStepCfg, make_distill_train_step, make_train_step  # noqa: F401
