"""Mixed-precision policy for TPU.

TPUs natively compute bf16 on the MXU with fp32 accumulation; there is no
GradScaler/fp16-AMP machinery (reference behaviour replaced:
deps/open_clip/src/training/precision.py:5-12 and the GradScaler plumbing in
training/main.py). A :class:`Policy` simply states which dtype parameters are
stored in and which dtype matmul/conv inputs are cast to. Norm layers always
compute in fp32.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Policy:
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.float32
    # dtype used for the final contrastive features / logits accumulation
    output_dtype: jnp.dtype = jnp.float32

    def cast_to_compute(self, x):
        return jnp.asarray(x, self.compute_dtype)

    def cast_to_output(self, x):
        return jnp.asarray(x, self.output_dtype)


_POLICIES = {
    "fp32": Policy(),
    "bf16": Policy(param_dtype=jnp.float32, compute_dtype=jnp.bfloat16),
    "pure_bf16": Policy(param_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16),
    # aliases matching reference --precision flags (amp == bf16 autocast on TPU)
    "amp": Policy(param_dtype=jnp.float32, compute_dtype=jnp.bfloat16),
    "amp_bf16": Policy(param_dtype=jnp.float32, compute_dtype=jnp.bfloat16),
    "amp_bfloat16": Policy(param_dtype=jnp.float32, compute_dtype=jnp.bfloat16),
    "fp16": Policy(param_dtype=jnp.float32, compute_dtype=jnp.bfloat16),
    # true IEEE half compute: the reference evaluates with .half() encoders
    # (evaluate_domainnet_lso_openai.py:30); TPU stores fp16 and upconverts on
    # the MXU, so this reproduces fp16 storage rounding at bf16-like speed.
    "float16": Policy(param_dtype=jnp.float32, compute_dtype=jnp.float16,
                      output_dtype=jnp.float16),
}


def get_policy(precision: Optional[str]) -> Policy:
    if precision is None:
        return _POLICIES["fp32"]
    try:
        return _POLICIES[precision]
    except KeyError:
        raise ValueError(f"unknown precision {precision!r}; options: {sorted(_POLICIES)}")
