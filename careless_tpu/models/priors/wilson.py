"""Wilson priors on structure factor amplitudes.

Reference behavior: /root/reference/careless/models/priors/wilson.py:13-80.
Centric reflections: HalfNormal(sqrt(eps*Sigma)); acentric: Weibull(2,
sqrt(eps*Sigma)) (a Rayleigh). Elementwise mixture selected by the centric
flag. Functional pytree design; the analytic Stacy form is exposed for fast
KL (the reference's intended fast path, SURVEY.md §2.1 note).
"""
from __future__ import annotations

from typing import NamedTuple, Union

import jax
import jax.numpy as jnp

from ...ops.distributions import HalfNormal, Stacy, Weibull

Array = jax.Array
Numeric = Union[Array, float]


class WilsonPrior(NamedTuple):
    centric: Array   # (n_refl,) bool
    epsilon: Array   # (n_refl,) f32
    sigma: Numeric = 1.0  # Σ: mean intensity (scalar or per-reflection)

    def _parts(self):
        eps = jnp.asarray(self.epsilon, jnp.float32)
        sig = jnp.asarray(self.sigma, jnp.float32)
        return (HalfNormal(jnp.sqrt(eps * sig)),
                Weibull(2.0, jnp.sqrt(eps * sig)))

    def log_prob(self, x):
        pc, pa = self._parts()
        return jnp.where(self.centric, pc.log_prob(x), pa.log_prob(x))

    def prob(self, x):
        return jnp.exp(self.log_prob(x))

    def mean(self):
        pc, pa = self._parts()
        return jnp.where(self.centric, pc.mean(), pa.mean())

    def stddev(self):
        pc, pa = self._parts()
        return jnp.where(self.centric, pc.stddev(), pa.stddev())

    def sample(self, key, sample_shape=()):
        pc, pa = self._parts()
        k1, k2 = jax.random.split(key)
        return jnp.where(self.centric, pc.sample(k1, sample_shape),
                         pa.sample(k2, sample_shape))

    def as_stacy(self) -> Stacy:
        """Equivalent Stacy parameterization (enables analytic KL)."""
        return Stacy.wilson_prior(
            jnp.asarray(self.centric, jnp.float32), self.epsilon, self.sigma)
