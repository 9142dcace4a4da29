"""Image-conditioned scaling models.

Reference behavior: /root/reference/careless/models/scaling/image.py.
- ImageScaler: one scalar per image, first pegged to 1 (image.py:9-42).
- HybridImageScaler: MLP Normal scaled per-image via a Scale bijector
  (image.py:44-63) -> Normal(a*loc, |a|*scale).
- ImageLayer / NeuralImageScaler: per-image dense weight banks gathered by
  image_id with identity-eye init (image.py:66-125).

TPU notes: the per-image weight gather produces a (N, units, in_dim) batch
of small matrices contracted against (N, in_dim) activations — expressed as
an einsum so XLA maps it onto the MXU as a batched matmul.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.distributions import Normal
from ...ops.plan_gather import plan_gather
from ..base import Inputs
from .nn import MLPScaler


@dataclass(frozen=True)
class ImageScaler:
    """Per-image linear scale, first image pegged to 1."""

    max_images: int

    def init(self, key) -> dict:
        del key
        return {"scales": jnp.ones(self.max_images - 1, jnp.float32)}

    def scales(self, params: dict):
        return jnp.concatenate([jnp.ones(1, jnp.float32), params["scales"]])

    def apply(self, params: dict, inputs: Inputs):
        return plan_gather(self.scales(params), inputs.image_id,
                           inputs.plans.image if inputs.plans else None)


@dataclass(frozen=True)
class HybridImageScaler:
    """MLP Normal x per-image scale (TransformedDistribution w/ Scale)."""

    mlp: MLPScaler
    image: ImageScaler

    def init(self, key, metadata_dim: int) -> dict:
        k1, k2 = jax.random.split(key)
        return {"mlp": self.mlp.init(k1, metadata_dim),
                "image": self.image.init(k2)}

    def apply(self, params: dict, inputs: Inputs) -> Normal:
        q = self.mlp.apply(params["mlp"], inputs)
        a = self.image.apply(params["image"], inputs)
        return Normal(a * q.loc, jnp.abs(a) * q.scale)


@dataclass(frozen=True)
class NeuralImageScaler:
    """Image-conditioned MLP: per-image dense weight banks after the shared
    metadata network, then the Normal head."""

    image_layers: int
    max_images: int
    mlp: MLPScaler

    def init(self, key, metadata_dim: int) -> dict:
        del key
        w = self.mlp.width
        eye = np.broadcast_to(np.eye(w, dtype=np.float32),
                              (self.max_images, w, w)).copy()
        layers = [{"w": jnp.asarray(eye),
                   "b": jnp.zeros((self.max_images, w), jnp.float32)}
                  for _ in range(self.image_layers)]
        return {"mlp": self.mlp.init(None, metadata_dim),
                "image_layers": layers}

    def apply(self, params: dict, inputs: Inputs) -> Normal:
        packed = inputs.plans.meta if inputs.plans is not None else None
        x = self.mlp.network(params["mlp"], inputs.metadata, packed=packed)
        img = inputs.image_id
        for layer in params["image_layers"]:
            w = layer["w"][img]          # (N, units, in_dim)
            b = layer["b"][img]          # (N, units)
            x = jnp.einsum("nui,ni->nu", w, x) + b
            x = jax.nn.leaky_relu(x, self.mlp.leakiness)
        return self.mlp.head(params["mlp"], x)
