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

    def expected_log_prob(self, q, z_samples) -> Array:
        """E_q[log p(z)] with every analytically-available expectation taken
        in closed form (Rao-Blackwellized KL fast path; the reference always
        falls back to full-MC KL, variational.py:123-128).

        centric HalfNormal(l):   log p = 0.5*log(2/pi) - log l - z^2/(2 l^2)
                                 -> fully analytic via E_q[z^2]
        acentric Weibull(2, l):  log p = log 2 - 2 log l + log z - (z/l)^2
                                 -> analytic except E_q[log z], which uses
                                    the MC samples already drawn for the
                                    likelihood term

        q must expose moment_2(); z_samples has an optional leading MC axis.
        """
        eps = jnp.asarray(self.epsilon, jnp.float32)
        lam2 = eps * jnp.asarray(self.sigma, jnp.float32)  # l^2 = eps*Sigma
        log_lam2 = jnp.log(lam2)
        ez2 = q.moment_2()
        centric_elp = (0.5 * jnp.log(2.0 / jnp.pi) - 0.5 * log_lam2
                       - 0.5 * ez2 / lam2)
        z = jnp.asarray(z_samples)
        e_log_z = (jnp.mean(jnp.log(jnp.maximum(z, 1e-30)), axis=0)
                   if z.ndim > jnp.ndim(ez2) else
                   jnp.log(jnp.maximum(z, 1e-30)))
        acentric_elp = (jnp.log(2.0) - log_lam2 + e_log_z - ez2 / lam2)
        return jnp.where(self.centric, centric_elp, acentric_elp)
