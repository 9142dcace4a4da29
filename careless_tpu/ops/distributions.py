"""Probability distributions as JAX pytrees (NamedTuples of arrays + methods).

TPU-native, purely functional replacement for the TFP distribution objects the
reference builds on (/root/reference/careless/utils/distributions.py,
models/merging/surrogate_posteriors.py). Every distribution is a NamedTuple —
hence a valid JAX pytree that can cross jit/vmap/pjit boundaries — with
`sample(key, shape)`, `log_prob(x)`, and moment methods as pure functions of
its fields. Special math (ndtr/ndtri/log_ndtr, i0e/i1e, gammaln, digamma)
comes from jax.scipy — no C++ special-math dependency like TFP's.

All math is float32-stable for TPU; f64 is never required.
"""
from __future__ import annotations

from typing import NamedTuple, Union

import jax
import jax.numpy as jnp
from jax.scipy.special import digamma, gammaln, i0e, i1e, log_ndtr, ndtr

Array = jax.Array
Numeric = Union[Array, float]

_LOG_2PI = float(jnp.log(2.0 * jnp.pi))
_SQRT_2_OVER_PI = 0.7978845608028654


def _bcast(*xs):
    return jnp.broadcast_arrays(*[jnp.asarray(x, dtype=jnp.float32) for x in xs])


# ---------------------------------------------------------------------------
class Normal(NamedTuple):
    loc: Numeric
    scale: Numeric

    def sample(self, key, sample_shape=()):
        loc, scale = _bcast(self.loc, self.scale)
        shape = tuple(sample_shape) + loc.shape
        return loc + scale * jax.random.normal(key, shape, dtype=loc.dtype)

    def log_prob(self, x):
        z = (x - self.loc) / self.scale
        return -0.5 * z * z - jnp.log(self.scale) - 0.5 * _LOG_2PI

    def mean(self):
        return jnp.asarray(self.loc)

    def stddev(self):
        return jnp.asarray(self.scale)

    def variance(self):
        return jnp.square(self.scale)

    def kl_divergence(self, other: "Normal"):
        """KL(self || other), analytic."""
        var_ratio = jnp.square(self.scale / other.scale)
        t1 = jnp.square((self.loc - other.loc) / other.scale)
        return 0.5 * (var_ratio + t1 - 1.0 - jnp.log(var_ratio))


class Laplace(NamedTuple):
    loc: Numeric
    scale: Numeric

    def sample(self, key, sample_shape=()):
        loc, scale = _bcast(self.loc, self.scale)
        shape = tuple(sample_shape) + loc.shape
        return loc + scale * jax.random.laplace(key, shape, dtype=loc.dtype)

    def log_prob(self, x):
        return -jnp.abs(x - self.loc) / self.scale - jnp.log(2.0 * self.scale)

    def mean(self):
        return jnp.asarray(self.loc)

    def stddev(self):
        return jnp.sqrt(2.0) * jnp.asarray(self.scale)


class StudentT(NamedTuple):
    df: Numeric
    loc: Numeric
    scale: Numeric

    def sample(self, key, sample_shape=()):
        df, loc, scale = _bcast(self.df, self.loc, self.scale)
        shape = tuple(sample_shape) + loc.shape
        return loc + scale * jax.random.t(key, df, shape, dtype=loc.dtype)

    def log_prob(self, x):
        df = jnp.asarray(self.df, dtype=jnp.float32)
        z = (x - self.loc) / self.scale
        lognorm = (gammaln(0.5 * (df + 1.0)) - gammaln(0.5 * df)
                   - 0.5 * jnp.log(df * jnp.pi) - jnp.log(self.scale))
        return lognorm - 0.5 * (df + 1.0) * jnp.log1p(z * z / df)

    def mean(self):
        return jnp.asarray(self.loc)


class HalfNormal(NamedTuple):
    scale: Numeric

    def sample(self, key, sample_shape=()):
        (scale,) = _bcast(self.scale)
        shape = tuple(sample_shape) + scale.shape
        return scale * jnp.abs(jax.random.normal(key, shape, dtype=scale.dtype))

    def log_prob(self, x):
        z = x / self.scale
        return (0.5 * jnp.log(2.0 / jnp.pi) - jnp.log(self.scale)
                - 0.5 * z * z)

    def mean(self):
        return jnp.asarray(self.scale) * _SQRT_2_OVER_PI

    def stddev(self):
        return jnp.asarray(self.scale) * jnp.sqrt(1.0 - 2.0 / jnp.pi)

    def variance(self):
        return jnp.square(self.scale) * (1.0 - 2.0 / jnp.pi)


class Weibull(NamedTuple):
    concentration: Numeric  # k
    scale: Numeric  # lambda

    def sample(self, key, sample_shape=()):
        k, lam = _bcast(self.concentration, self.scale)
        shape = tuple(sample_shape) + lam.shape
        u = jax.random.uniform(key, shape, dtype=lam.dtype,
                               minval=jnp.finfo(lam.dtype).tiny, maxval=1.0)
        return lam * jnp.power(-jnp.log(u), 1.0 / k)

    def log_prob(self, x):
        k = jnp.asarray(self.concentration, dtype=jnp.float32)
        lam = jnp.asarray(self.scale, dtype=jnp.float32)
        logx = jnp.log(x)
        return (jnp.log(k) - jnp.log(lam) + (k - 1.0) * (logx - jnp.log(lam))
                - jnp.exp(k * (logx - jnp.log(lam))))

    def mean(self):
        k, lam = self.concentration, self.scale
        return lam * jnp.exp(gammaln(1.0 + 1.0 / k))

    def variance(self):
        k, lam = self.concentration, self.scale
        return jnp.square(lam) * (jnp.exp(gammaln(1.0 + 2.0 / k))
                                  - jnp.exp(2.0 * gammaln(1.0 + 1.0 / k)))

    def stddev(self):
        return jnp.sqrt(self.variance())


class Gamma(NamedTuple):
    concentration: Numeric
    rate: Numeric = 1.0

    def sample(self, key, sample_shape=()):
        conc, rate = _bcast(self.concentration, self.rate)
        shape = tuple(sample_shape) + conc.shape
        return jax.random.gamma(key, conc, shape, dtype=conc.dtype) / rate

    def log_prob(self, x):
        conc = jnp.asarray(self.concentration, dtype=jnp.float32)
        rate = jnp.asarray(self.rate, dtype=jnp.float32)
        return (conc * jnp.log(rate) + (conc - 1.0) * jnp.log(x)
                - rate * x - gammaln(conc))


class Exponential(NamedTuple):
    rate: Numeric

    def sample(self, key, sample_shape=()):
        (rate,) = _bcast(self.rate)
        shape = tuple(sample_shape) + rate.shape
        return jax.random.exponential(key, shape, dtype=rate.dtype) / rate

    def log_prob(self, x):
        return jnp.log(self.rate) - self.rate * x


# ---------------------------------------------------------------------------
class TruncatedNormal(NamedTuple):
    """Normal truncated to [low, high] — the surrogate posterior over |F|.

    Reference: careless/models/merging/surrogate_posteriors.py:45-102. The
    reference clamps samples to `low` to work around TFP's rejection-sampler
    bug; JAX's inverse-CDF sampler has no such bug, but we keep the clamp for
    exact parity of the support edge.
    """

    loc: Numeric
    scale: Numeric
    low: Numeric = 0.0
    high: Numeric = 1e10

    def _alpha_beta(self):
        loc, scale, low, high = _bcast(self.loc, self.scale, self.low, self.high)
        return (low - loc) / scale, (high - loc) / scale

    def _log_z(self):
        """log( ndtr(beta) - ndtr(alpha) ), float32-stable in both tails."""
        alpha, beta = self._alpha_beta()
        # stable: logZ = log_ndtr(beta) + log1p(-exp(log_ndtr(alpha)-log_ndtr(beta)))
        la, lb = log_ndtr(alpha), log_ndtr(beta)
        return lb + jnp.log1p(-jnp.exp(jnp.minimum(la - lb, -1e-20)))

    def sample(self, key, sample_shape=()):
        loc, scale, low, _ = _bcast(self.loc, self.scale, self.low, self.high)
        alpha, beta = self._alpha_beta()
        shape = tuple(sample_shape) + loc.shape
        s = jax.random.truncated_normal(key, alpha, beta, shape, dtype=loc.dtype)
        return jnp.maximum(low, loc + scale * s)

    def log_prob(self, x):
        loc, scale, low, high = _bcast(self.loc, self.scale, self.low, self.high)
        z = (x - loc) / scale
        lp = (-0.5 * z * z - 0.5 * _LOG_2PI - jnp.log(scale) - self._log_z())
        return jnp.where((x < low) | (x > high), -jnp.inf, lp)

    def _phi_terms(self):
        alpha, beta = self._alpha_beta()
        phi_a = jnp.exp(-0.5 * alpha * alpha - 0.5 * _LOG_2PI)
        phi_b = jnp.where(jnp.isinf(beta), 0.0,
                          jnp.exp(-0.5 * jnp.minimum(beta, 1e30) ** 2 - 0.5 * _LOG_2PI))
        z = jnp.exp(self._log_z())
        return alpha, beta, phi_a, phi_b, z

    def mean(self):
        loc, scale, *_ = _bcast(self.loc, self.scale, self.low, self.high)
        _, _, phi_a, phi_b, z = self._phi_terms()
        return loc + scale * (phi_a - phi_b) / z

    def variance(self):
        loc, scale, *_ = _bcast(self.loc, self.scale, self.low, self.high)
        alpha, beta, phi_a, phi_b, z = self._phi_terms()
        bterm = jnp.where(jnp.isinf(beta), 0.0, jnp.where(phi_b > 0, beta, 0.0) * phi_b)
        aterm = alpha * phi_a
        frac = (aterm - bterm) / z
        tail = (phi_a - phi_b) / z
        return jnp.square(scale) * (1.0 + frac - tail * tail)

    def stddev(self):
        return jnp.sqrt(self.variance())

    def entropy(self):
        """Differential entropy, closed form:
        H = log(sqrt(2*pi*e) * sigma * Z) + (alpha*phi(alpha) - beta*phi(beta)) / (2Z).
        inf-safe for high=inf. Enables the Rao-Blackwellized KL fast path
        (E_q[log q] exactly, instead of by MC) the reference never shipped."""
        _, scale, *_ = _bcast(self.loc, self.scale, self.low, self.high)
        alpha, beta, phi_a, phi_b, z = self._phi_terms()
        bterm = jnp.where(jnp.isinf(beta), 0.0,
                          jnp.where(phi_b > 0, beta, 0.0) * phi_b)
        return (0.5 * (_LOG_2PI + 1.0) + jnp.log(scale) + self._log_z()
                + (alpha * phi_a - bterm) / (2.0 * z))

    def moment_2(self):
        """Second raw moment E[X^2]."""
        return self.variance() + jnp.square(self.mean())

    def moment_4(self):
        """Fourth raw moment E[X^4]; analytic (Orjebin's recurrence, the same
        formula as the reference's _tf_moment_4, surrogate_posteriors.py:55-73),
        inf-safe for high=inf."""
        loc, scale, low, high = _bcast(self.loc, self.scale, self.low, self.high)
        alpha, beta, phi_a, phi_b, z = self._phi_terms()
        a, b, mu, sig = low, high, loc, scale
        aterm = (a * a * a + a * a * mu + a * mu * mu
                 + sig * sig * (3 * a + 5 * mu) + mu * mu * mu) * phi_a
        b_safe = jnp.where(jnp.isinf(b), 0.0, b)
        bterm = jnp.where(
            jnp.isinf(b), 0.0,
            (b_safe ** 3 + b_safe ** 2 * mu + b_safe * mu * mu
             + sig * sig * (3 * b_safe + 5 * mu) + mu ** 3) * phi_b)
        num = bterm - aterm
        return (mu ** 4 + 6 * mu ** 2 * sig ** 2 + 3 * sig ** 4
                - sig * num / z)


class FoldedNormal(NamedTuple):
    """|X| for X ~ Normal(loc, scale) (reference distributions.py:300-348)."""

    loc: Numeric
    scale: Numeric

    def sample(self, key, sample_shape=()):
        loc, scale = _bcast(self.loc, self.scale)
        shape = tuple(sample_shape) + loc.shape
        return jnp.abs(loc + scale * jax.random.normal(key, shape, dtype=loc.dtype))

    def log_prob(self, x):
        loc, scale = self.loc, self.scale
        z1 = (x - loc) / scale
        z2 = (x + loc) / scale
        # log(phi(z1) + phi(z2)) stable via logaddexp
        lp = jnp.logaddexp(-0.5 * z1 * z1, -0.5 * z2 * z2)
        lp = lp - 0.5 * _LOG_2PI - jnp.log(scale)
        return jnp.where(x < 0, jnp.nan, lp)

    def prob(self, x):
        return jnp.where(x < 0, 0.0, jnp.exp(self.log_prob(jnp.maximum(x, 0.0))))

    def mean(self):
        u, s = _bcast(self.loc, self.scale)
        return (s * _SQRT_2_OVER_PI * jnp.exp(-0.5 * (u / s) ** 2)
                + u * (1.0 - 2.0 * ndtr(-u / s)))

    def variance(self):
        u, s = _bcast(self.loc, self.scale)
        return u * u + s * s - jnp.square(self.mean())

    def stddev(self):
        return jnp.sqrt(self.variance())


class Rice(NamedTuple):
    """Rice distribution with log-space Bessel evaluation and a normal
    crossover at nu/sigma > 40 (reference distributions.py:228-298)."""

    nu: Numeric
    sigma: Numeric

    _NORMAL_CROSSOVER = 40.0

    @staticmethod
    def _log_i0(x):
        return jnp.log(i0e(x)) + jnp.abs(x)

    @staticmethod
    def _log_i1(x):
        return jnp.log(i1e(x)) + jnp.abs(x)

    def _laguerre_half(self, x):
        """L_{1/2}(x) for x <= 0, via exponentially-scaled Bessels."""
        return ((1.0 - x) * jnp.exp(x / 2.0 + jnp.log(i0e(-0.5 * x)) + jnp.abs(0.5 * x))
                - x * jnp.exp(x / 2.0 + jnp.log(i1e(-0.5 * x)) + jnp.abs(0.5 * x)))

    def sample(self, key, sample_shape=()):
        nu, sigma = _bcast(self.nu, self.sigma)
        shape = tuple(sample_shape) + nu.shape
        k1, k2 = jax.random.split(key)
        s1 = sigma * jax.random.normal(k1, shape, dtype=nu.dtype)
        s2 = sigma * jax.random.normal(k2, shape, dtype=nu.dtype)
        return jnp.sqrt(s1 * s1 + jnp.square(s2 + nu))

    def log_prob(self, x):
        nu, sigma = self.nu, self.sigma
        return (jnp.log(x) - 2.0 * jnp.log(sigma)
                - (x * x + nu * nu) / (2.0 * sigma * sigma)
                + self._log_i0(x * nu / (sigma * sigma)))

    def mean(self):
        nu, sigma = _bcast(self.nu, self.sigma)
        snr = nu / sigma
        m = sigma * jnp.sqrt(jnp.pi / 2.0) * self._laguerre_half(-0.5 * snr * snr)
        return jnp.where(snr > self._NORMAL_CROSSOVER, nu, m)

    def variance(self):
        nu, sigma = _bcast(self.nu, self.sigma)
        snr = nu / sigma
        lag = self._laguerre_half(-0.5 * snr * snr)
        v = 2.0 * sigma * sigma + nu * nu - 0.5 * jnp.pi * sigma * sigma * lag * lag
        return jnp.where(snr > self._NORMAL_CROSSOVER, sigma * sigma, v)

    def stddev(self):
        return jnp.sqrt(self.variance())


class Amoroso(NamedTuple):
    """Amoroso (generalized gamma) distribution, Crooks parameterization
    (reference distributions.py:10-109)."""

    a: Numeric
    theta: Numeric
    alpha: Numeric
    beta: Numeric

    def log_prob(self, x):
        a, theta, alpha, beta = _bcast(self.a, self.theta, self.alpha, self.beta)
        z = (x - a) / theta
        return (jnp.log(jnp.abs(beta / theta)) - gammaln(alpha)
                + (alpha * beta - 1.0) * jnp.log(z) - jnp.power(z, beta))

    def sample(self, key, sample_shape=()):
        a, theta, alpha, beta = _bcast(self.a, self.theta, self.alpha, self.beta)
        shape = tuple(sample_shape) + alpha.shape
        g = jax.random.gamma(key, alpha, shape, dtype=alpha.dtype)
        return a + theta * jnp.power(g, 1.0 / beta)

    def mean(self):
        a, theta, alpha, beta = _bcast(self.a, self.theta, self.alpha, self.beta)
        return a + jnp.exp(jnp.log(theta) + gammaln(alpha + 1.0 / beta)
                           - gammaln(alpha))

    def variance(self):
        _, theta, alpha, beta = _bcast(self.a, self.theta, self.alpha, self.beta)
        return jnp.square(theta) * (
            jnp.exp(gammaln(alpha + 2.0 / beta) - gammaln(alpha))
            - jnp.exp(2.0 * gammaln(alpha + 1.0 / beta) - 2.0 * gammaln(alpha)))

    def stddev(self):
        return jnp.sqrt(self.variance())


class Stacy(NamedTuple):
    """Stacy (Amoroso with a=0), with the Bauckhage 2014 analytic KL
    (reference distributions.py:133-225)."""

    theta: Numeric
    alpha: Numeric
    beta: Numeric

    def _amoroso(self):
        return Amoroso(0.0, self.theta, self.alpha, self.beta)

    def log_prob(self, x):
        return self._amoroso().log_prob(x)

    def sample(self, key, sample_shape=()):
        return self._amoroso().sample(key, sample_shape)

    def mean(self):
        return self._amoroso().mean()

    def variance(self):
        return self._amoroso().variance()

    def stddev(self):
        return self._amoroso().stddev()

    @classmethod
    def wilson_prior(cls, centric, epsilon, sigma=1.0) -> "Stacy":
        """Wilson prior as a Stacy distribution (distributions.py:133-158):
        centric HalfNormal(sqrt(eps*Sigma)) = Stacy(sqrt(2 eps Sigma), 1/2, 2);
        acentric Rayleigh = Stacy(sqrt(eps Sigma), 1, 2)."""
        centric = jnp.asarray(centric, dtype=jnp.float32)
        epsilon = jnp.asarray(epsilon, dtype=jnp.float32)
        sigma = jnp.asarray(sigma, dtype=jnp.float32)
        theta = (centric * jnp.sqrt(2.0 * epsilon * sigma)
                 + (1.0 - centric) * jnp.sqrt(epsilon * sigma))
        alpha = centric * 0.5 + (1.0 - centric)
        beta = jnp.full_like(theta, 2.0)
        return cls(theta, alpha, beta)

    @staticmethod
    def from_half_normal(scale) -> "Stacy":
        return Stacy(jnp.sqrt(2.0) * jnp.asarray(scale, jnp.float32), 0.5, 2.0)

    @staticmethod
    def from_weibull(concentration, scale) -> "Stacy":
        return Stacy(jnp.asarray(scale, jnp.float32), 1.0,
                     jnp.asarray(concentration, jnp.float32))

    def _bauckhage(self):
        theta, alpha, beta = _bcast(self.theta, self.alpha, self.beta)
        return theta, alpha * beta, beta

    def kl_divergence(self, other: "Stacy"):
        """KL(self || other), Bauckhage 2014 (arXiv:1401.6853)."""
        a1, d1, p1 = self._bauckhage()
        a2, d2, p2 = other._bauckhage()
        ln = jnp.log
        return (ln(p1) + d2 * ln(a2) + gammaln(d2 / p2)
                - ln(p2) - d1 * ln(a1) - gammaln(d1 / p1)
                + (digamma(d1 / p1) / p1 + ln(a1)) * (d1 - d2)
                + jnp.exp(gammaln((d1 + p2) / p1) - gammaln(d1 / p1)
                          + p2 * (ln(a1) - ln(a2)))
                - d1 / p1)


class RiceWoolfson(NamedTuple):
    """Hybrid posterior: FoldedNormal (Woolfson) for centrics, Rice for
    acentrics (reference surrogate_posteriors.py:133-172)."""

    loc: Numeric
    scale: Numeric
    centric: Numeric  # bool array

    def _parts(self):
        return (FoldedNormal(self.loc, self.scale), Rice(self.loc, self.scale))

    def sample(self, key, sample_shape=()):
        w, r = self._parts()
        eps = jnp.finfo(jnp.float32).eps
        return jnp.where(self.centric, w.sample(key, sample_shape) + eps,
                         r.sample(key, sample_shape))

    def log_prob(self, x):
        w, r = self._parts()
        return jnp.where(self.centric, w.log_prob(x), r.log_prob(x))

    def mean(self):
        w, r = self._parts()
        return jnp.where(self.centric, w.mean(), r.mean())

    def variance(self):
        w, r = self._parts()
        return jnp.where(self.centric, w.variance(), r.variance())

    def stddev(self):
        return jnp.sqrt(self.variance())
