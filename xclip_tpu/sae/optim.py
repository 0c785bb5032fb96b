"""Adam with per-neuron moment reset (the AdamWithReset equivalent).

Reference behaviour: deps/sparse_autoencoder/sparse_autoencoder/optimizer/
adam_with_reset.py:18-240 — plain Adam whose exp_avg/exp_avg_sq slices are
zeroed for resampled neurons. In optax the moments live in
ScaleByAdamState(mu, nu); resetting is a functional index-update on the
optimizer-state pytree.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import optax


def adam(learning_rate: float = 1e-4, b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8):
    return optax.adam(learning_rate, b1=b1, b2=b2, eps=eps)


def _zero_axis(arr, indices, axis: int):
    idx = [slice(None)] * arr.ndim
    idx[axis] = jnp.asarray(indices)
    return arr.at[tuple(idx)].set(0.0)


def reset_neuron_moments(opt_state, dead_indices: np.ndarray, *, has_components: bool = False,
                         component_idx: int = 0):
    """Zero Adam mu/nu for the resampled neurons on encoder weight/bias
    (learnt-feature axis 0) and decoder weight (learnt-feature axis 1),
    mirroring reset_optimizer_parameter_details (autoencoder/model.py:158-173).
    """
    if len(dead_indices) == 0:
        return opt_state
    dead = jnp.asarray(np.asarray(dead_indices))

    def fix_moments(moments):
        # moments is a params-shaped pytree {tied_bias, encoder{weight,bias}, decoder{weight}}
        off = 1 if has_components else 0

        def patch(tree):
            tree = dict(tree)
            enc = dict(tree["encoder"])
            enc["weight"] = _zero_axis(enc["weight"], dead, axis=0 + off)
            enc["bias"] = _zero_axis(enc["bias"], dead, axis=0 + off)
            dec = {"weight": _zero_axis(tree["decoder"]["weight"], dead, axis=1 + off)}
            tree["encoder"], tree["decoder"] = enc, dec
            return tree

        return patch(moments)

    new_state = []
    for part in opt_state:
        if isinstance(part, optax.ScaleByAdamState):
            part = part._replace(mu=fix_moments(part.mu), nu=fix_moments(part.nu))
        new_state.append(part)
    return type(opt_state)(new_state) if isinstance(opt_state, list) else tuple(new_state)
