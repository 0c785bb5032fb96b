"""SparseAct: vector in an SAE feature basis + the SAE error term.

Reference behaviour: xclip/feature_circuits/activation_utils.py:8-186 — a
(act, res | resc) pair with full operator overloading where ``@`` multiplies
the act parts elementwise and contracts only the residual.

Registered as a JAX pytree so SparseActs flow through jit/grad/vmap.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.tree_util.register_pytree_node_class
class SparseAct:
    def __init__(self, act=None, res=None, resc=None):
        self.act = act
        self.res = res
        self.resc = resc

    # -- pytree protocol ----------------------------------------------------
    def tree_flatten(self):
        fields = [("act", self.act), ("res", self.res), ("resc", self.resc)]
        keys = tuple(k for k, v in fields if v is not None)
        vals = tuple(v for _, v in fields if v is not None)
        return vals, keys

    @classmethod
    def tree_unflatten(cls, keys, vals):
        return cls(**dict(zip(keys, vals)))

    # -- helpers ------------------------------------------------------------
    def _map(self, f, aux=None) -> "SparseAct":
        kwargs = {}
        for attr in ("act", "res", "resc"):
            mine = getattr(self, attr)
            if mine is None:
                continue
            if isinstance(aux, SparseAct):
                other = getattr(aux, attr)
                if other is None:
                    continue
                kwargs[attr] = f(mine, other)
            else:
                kwargs[attr] = f(mine, aux)
        return SparseAct(**kwargs)

    # -- operators ----------------------------------------------------------
    def __mul__(self, other):
        return self._map(lambda x, y: x * y, other)

    __rmul__ = __mul__

    def __add__(self, other):
        return self._map(lambda x, y: x + y, other)

    __radd__ = __add__

    def __sub__(self, other):
        return self._map(lambda x, y: x - y, other)

    def __truediv__(self, other):
        return self._map(lambda x, y: x / y, other)

    def __neg__(self):
        return self._map(lambda x, _: -x)

    def __matmul__(self, other: "SparseAct") -> "SparseAct":
        """Elementwise on act, contraction on res (reference :46-49)."""
        assert self.res is not None and other.res is not None
        return SparseAct(
            act=self.act * other.act,
            resc=jnp.sum(self.res * other.res, axis=-1, keepdims=True),
        )

    def __getitem__(self, index):
        return self.act[index]

    def sum(self, axis=None):
        return self._map(lambda x, _: jnp.sum(x, axis=axis))

    def mean(self, axis=None):
        return self._map(lambda x, _: jnp.mean(x, axis=axis))

    def abs(self):
        return self._map(lambda x, _: jnp.abs(x))

    def detach(self):
        return self._map(lambda x, _: jax.lax.stop_gradient(x))

    def zeros_like(self):
        return self._map(lambda x, _: jnp.zeros_like(x))

    def ones_like(self):
        return self._map(lambda x, _: jnp.ones_like(x))

    def to_tensor(self):
        if self.resc is None:
            assert self.res is not None
            return jnp.concatenate([self.act, self.res], axis=-1)
        assert self.res is None
        return jnp.concatenate([self.act, self.resc], axis=-1)

    def __repr__(self):
        return f"SparseAct(act={self.act!r}, res={self.res!r}, resc={self.resc!r})"
