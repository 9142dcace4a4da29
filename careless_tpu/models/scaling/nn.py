"""MLP scaling model: metadata -> Normal distribution over scale factors.

Reference behavior: /root/reference/careless/models/scaling/nn.py. Key
optimization-dynamics details preserved exactly (SURVEY.md §7 hard part 4):
identity kernel initialization for every dense layer (nn.py:66), LeakyReLU
(0.01), final linear layer to (loc, scale-pre-bijector), softplus-or-exp
scale bijector shifted by epsilon, optional additive scale_multiplier shift
of the output distribution (istd, manager.py:476-489 — note the reference's
"multiplier" is implemented as a Shift bijector; we match the code).

TPU notes: the MLP is the main MXU workload of the ELBO step — a stack of
(N, w) x (w, w) matmuls. Parameters are plain pytrees; `apply` is pure.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.distributions import Normal
from ..base import Inputs


def _identity_kernel(d_in: int, d_out: int) -> np.ndarray:
    return np.eye(d_in, d_out, dtype=np.float32)


@dataclass(frozen=True)
class MLPScaler:
    """Static config; parameters live in the pytree returned by init()."""

    n_layers: int
    width: int
    leakiness: float = 0.01
    epsilon: float = 1e-7
    scale_bijector: str = "softplus"  # 'softplus' | 'exp'
    scale_multiplier: Optional[float] = None

    def init(self, key, metadata_dim: int) -> dict:
        del key  # deterministic identity init, matching the reference
        layers = []
        d = metadata_dim
        for _ in range(self.n_layers):
            layers.append({
                "w": jnp.asarray(_identity_kernel(d, self.width)),
                "b": jnp.zeros(self.width, jnp.float32),
            })
            d = self.width
        out = {"w": jnp.asarray(_identity_kernel(d, 2)),
               "b": jnp.zeros(2, jnp.float32)}
        return {"layers": layers, "out": out}

    def _biject_scale(self, raw):
        if self.scale_bijector == "softplus":
            return jax.nn.softplus(raw) + self.epsilon
        if self.scale_bijector == "exp":
            return jnp.exp(raw) + self.epsilon
        raise ValueError(f"Unsupported scale bijector type, {self.scale_bijector}")

    def network(self, params: dict, x):
        for layer in params["layers"]:
            x = jnp.dot(x, layer["w"], preferred_element_type=jnp.float32)
            x = jax.nn.leaky_relu(x + layer["b"], self.leakiness)
        return x

    def head(self, params: dict, x) -> Normal:
        y = jnp.dot(x, params["out"]["w"],
                    preferred_element_type=jnp.float32) + params["out"]["b"]
        loc, raw_scale = y[..., 0], y[..., 1]
        scale = self._biject_scale(raw_scale)
        if self.scale_multiplier is not None:
            loc = loc + self.scale_multiplier
        return Normal(loc, scale)

    def apply(self, params: dict, inputs: Inputs) -> Normal:
        return self.head(params, self.network(params, inputs.metadata))
