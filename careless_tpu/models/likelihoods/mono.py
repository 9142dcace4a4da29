"""Likelihoods for monochromatic data.

Reference behavior: /root/reference/careless/models/likelihoods/mono.py.
Normal / Laplace(scale/sqrt2) / StudentT(dof) on observed intensities, plus
the Ev11 (SCALA/Aimless error model) variants with trainable Sdfac/Sdadd/SdB
through softplus: corrected sigma = Sdfac * sqrt(sig^2 + SdB*softplus(I) +
Sdadd*softplus(I)^2) (mono.py:39-73).

Functional design: each likelihood is a static dataclass; trainable Ev11
parameters live in the params pytree (init/build).
"""
from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.distributions import Laplace, Normal, StudentT
from ..base import Inputs

_SOFTPLUS_INV_1 = float(np.log(np.expm1(1.0)))  # softplus(x) = 1


@dataclass(frozen=True)
class NormalLikelihood:
    def init(self) -> dict:
        return {}

    def build(self, params: dict, inputs: Inputs):
        return Normal(inputs.intensities, inputs.uncertainties)


@dataclass(frozen=True)
class LaplaceLikelihood:
    def init(self) -> dict:
        return {}

    def build(self, params: dict, inputs: Inputs):
        return Laplace(inputs.intensities,
                       inputs.uncertainties / math.sqrt(2.0))


@dataclass(frozen=True)
class StudentTLikelihood:
    dof: float

    def init(self) -> dict:
        return {}

    def build(self, params: dict, inputs: Inputs):
        return StudentT(self.dof, inputs.intensities, inputs.uncertainties)


class _Ev11Dist:
    """Distribution-like object whose scale depends on the prediction."""

    def __init__(self, loc, scale, sdfac, sdadd, sdb, dof=None):
        self.loc, self.scale = loc, scale
        self.sdfac, self.sdadd, self.sdb = sdfac, sdadd, sdb
        self.dof = dof

    def corrected_sigiobs(self, ipred):
        ip = jax.nn.softplus(ipred)
        return self.sdfac * jnp.sqrt(
            jnp.square(self.scale) + self.sdb * ip + self.sdadd * jnp.square(ip))

    def log_prob(self, ipred):
        scale = self.corrected_sigiobs(ipred)
        if self.dof is None:
            return Normal(self.loc, scale).log_prob(ipred)
        return StudentT(self.dof, self.loc, scale).log_prob(ipred)

    def mean(self):
        return self.loc

    def stddev(self):
        return self.scale


@dataclass(frozen=True)
class NormalEv11Likelihood:
    def init(self) -> dict:
        return {"sdfac_raw": jnp.float32(_SOFTPLUS_INV_1),
                "sdadd_raw": jnp.float32(_SOFTPLUS_INV_1),
                "sdb_raw": jnp.float32(_SOFTPLUS_INV_1)}

    def build(self, params: dict, inputs: Inputs):
        return _Ev11Dist(
            inputs.intensities, inputs.uncertainties,
            jax.nn.softplus(params["sdfac_raw"]),
            jax.nn.softplus(params["sdadd_raw"]),
            jax.nn.softplus(params["sdb_raw"]))


@dataclass(frozen=True)
class StudentTEv11Likelihood:
    dof: float

    def init(self) -> dict:
        return NormalEv11Likelihood().init()

    def build(self, params: dict, inputs: Inputs):
        return _Ev11Dist(
            inputs.intensities, inputs.uncertainties,
            jax.nn.softplus(params["sdfac_raw"]),
            jax.nn.softplus(params["sdadd_raw"]),
            jax.nn.softplus(params["sdb_raw"]),
            dof=self.dof)


@dataclass(frozen=True)
class NeuralNormalLikelihood:
    """MLP correction on (I, sigI) -> sigma, mean-normalized
    (reference mono.py:75-110; library-level, not CLI-wired)."""

    mlp_layers: int
    mlp_width: int
    leakiness: float = 0.3  # keras LeakyReLU default alpha

    def init(self, key=None) -> dict:
        keys = (jax.random.split(key, self.mlp_layers + 1)
                if key is not None else [None] * (self.mlp_layers + 1))
        layers = []
        d = 2
        for i in range(self.mlp_layers):
            if keys[i] is None:
                w = jnp.asarray(np.eye(d, self.mlp_width, dtype=np.float32))
            else:
                w = jax.random.normal(keys[i], (d, self.mlp_width)) / np.sqrt(d)
            layers.append({"w": w, "b": jnp.zeros(self.mlp_width, jnp.float32)})
            d = self.mlp_width
        out = {"w": jnp.asarray(np.eye(d, 1, dtype=np.float32)),
               "b": jnp.zeros(1, jnp.float32)}
        return {"layers": layers, "out": out}

    def build(self, params: dict, inputs: Inputs):
        x = jnp.stack([inputs.intensities, inputs.uncertainties], axis=-1)
        for layer in params["layers"]:
            x = jax.nn.leaky_relu(jnp.dot(x, layer["w"]) + layer["b"],
                                  self.leakiness)
        delta = jax.nn.softplus(
            jnp.dot(x, params["out"]["w"]) + params["out"]["b"])[..., 0]
        sigpred = inputs.uncertainties * delta / jnp.mean(delta)
        return Normal(inputs.intensities, sigpred)
