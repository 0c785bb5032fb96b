"""xclip_tpu — a TPU-native (JAX/XLA/Pallas/pjit) CLIP-OOD research framework.

A ground-up rebuild of the capabilities of lmb-freiburg/understanding-clip-ood
(ICML 2025, "When and How Does CLIP Enable Domain and Compositional
Generalization?") designed for TPU hardware:

- Functional model library (param pytrees, NHWC convs, bf16 MXU matmuls) with
  first-class intermediate activations — one mechanism serves training, SAE
  feature caching, CKA hooks and feature circuits.
- Contrastive training as a single pjit-compiled step over a device mesh, with
  the global-batch loss computed via an in-jit `lax.all_gather` over ICI
  (local-loss block layout), gradient accumulation with full-batch negatives,
  and `jax.checkpoint` rematerialisation.
- Zero-shot evaluation (OpenAI 86-template prompt ensemble, DomainNet-LSO
  protocol), supervised baselines, SAE training with dead-neuron resampling,
  and the interpretability suite (feature sharing, CKA, integrated-gradients
  feature circuits) as jitted XLA programs.
- A torch `.pt` checkpoint bridge: reference open_clip checkpoints load
  directly into the JAX encoders.

Reference parity map: see SURVEY.md at the repo root.
"""

__version__ = "0.1.0"

from xclip_tpu.models.factory import (  # noqa: F401
    create_model,
    create_model_and_transforms,
    get_model_config,
    list_models,
)
from xclip_tpu.tokenizer import SimpleTokenizer, get_tokenizer, tokenize  # noqa: F401
