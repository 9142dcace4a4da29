"""Surrogate posteriors over structure factor amplitudes.

Reference behavior: /root/reference/careless/models/merging/surrogate_posteriors.py.
The learnable q(F): one truncated normal per unique Miller index, loc through
an Exp bijector and scale through Shift(epsilon) o Exp (from_loc_and_scale,
surrogate_posteriors.py:104-131). Initialization from prior moments with
centric low=0 / acentric low=1e-32 happens in the DataManager
(manager.py:432-436).

Functional design: static config holds the (non-trainable) truncation bounds;
trainable raw parameters live in the params pytree.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Union

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.distributions import RiceWoolfson, TruncatedNormal

Array = jax.Array


@dataclass(frozen=True, eq=False)
class TruncatedNormalPosterior:
    low: Union[Array, float] = 0.0
    high: Union[Array, float] = 1e10
    scale_shift: float = 1e-7

    def init(self, loc, scale) -> dict:
        """Raw (unconstrained) parameters such that the constrained values
        equal the given loc/scale."""
        loc = np.asarray(loc, np.float32)
        scale = np.asarray(scale, np.float32)
        return {
            "loc_raw": jnp.asarray(np.log(loc)),
            "scale_raw": jnp.asarray(
                np.log(np.maximum(scale - self.scale_shift, 1e-30))),
        }

    def distribution(self, params: dict) -> TruncatedNormal:
        return TruncatedNormal(
            loc=jnp.exp(params["loc_raw"]),
            scale=jnp.exp(params["scale_raw"]) + self.scale_shift,
            low=self.low,
            high=self.high,
        )

    @property
    def n_refl(self) -> int:
        return np.shape(self.low)[0] if np.ndim(self.low) else None


@dataclass(frozen=True, eq=False)
class RiceWoolfsonPosterior:
    """Hybrid FoldedNormal/Rice posterior (surrogate_posteriors.py:133-172)."""

    centric: Array = field(default=None)
    scale_shift: float = 1e-7

    def init(self, loc, scale) -> dict:
        loc = np.asarray(loc, np.float32)
        scale = np.asarray(scale, np.float32)
        return {
            "loc_raw": jnp.asarray(np.log(loc)),
            "scale_raw": jnp.asarray(
                np.log(np.maximum(scale - self.scale_shift, 1e-30))),
        }

    def distribution(self, params: dict) -> RiceWoolfson:
        return RiceWoolfson(
            loc=jnp.exp(params["loc_raw"]),
            scale=jnp.exp(params["scale_raw"]) + self.scale_shift,
            centric=self.centric,
        )
