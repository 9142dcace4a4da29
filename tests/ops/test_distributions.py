"""Analytic-oracle tests for the JAX distribution library vs scipy.

Mirrors the reference strategy (SURVEY.md §4): every distribution is checked
against scipy closed forms (reference tests/utils/test_distributions.py,
tests/models/merging/test_truncated_normal.py).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.stats as sps

from careless_tpu.ops.distributions import (
    Amoroso, FoldedNormal, Gamma, HalfNormal, Laplace, Normal, Rice,
    RiceWoolfson, Stacy, StudentT, TruncatedNormal, Weibull,
)

key = jax.random.PRNGKey(0)
X = np.linspace(0.1, 10.0, 50).astype(np.float32)


def assert_close(a, b, rtol=1e-3, atol=1e-4):  # f32 tolerances
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=rtol, atol=atol)


def test_normal_vs_scipy():
    d = Normal(1.5, 2.0)
    assert_close(d.log_prob(X), sps.norm.logpdf(X, 1.5, 2.0))
    assert_close(d.kl_divergence(Normal(0.0, 1.0)),
                 0.5 * (4.0 + 2.25 - 1 - np.log(4.0)))


def test_laplace_vs_scipy():
    d = Laplace(1.0, 0.5)
    assert_close(d.log_prob(X), sps.laplace.logpdf(X, 1.0, 0.5))


def test_studentt_vs_scipy():
    d = StudentT(4.0, 1.0, 2.0)
    assert_close(d.log_prob(X), sps.t.logpdf(X, 4.0, 1.0, 2.0), rtol=1e-3)


def test_halfnormal_vs_scipy():
    d = HalfNormal(2.5)
    assert_close(d.log_prob(X), sps.halfnorm.logpdf(X, scale=2.5))
    assert_close(d.mean(), sps.halfnorm.mean(scale=2.5))
    assert_close(d.stddev(), sps.halfnorm.std(scale=2.5))


def test_weibull_vs_scipy():
    d = Weibull(2.0, 3.0)
    assert_close(d.log_prob(X), sps.weibull_min.logpdf(X, 2.0, scale=3.0),
                 rtol=1e-3)
    assert_close(d.mean(), sps.weibull_min.mean(2.0, scale=3.0))
    assert_close(d.stddev(), sps.weibull_min.std(2.0, scale=3.0), rtol=1e-3)


def test_gamma_vs_scipy():
    d = Gamma(3.0, 2.0)
    assert_close(d.log_prob(X), sps.gamma.logpdf(X, 3.0, scale=0.5))


@pytest.mark.parametrize("loc,scale,low,high", [
    (2.0, 1.0, 0.0, np.inf),
    (0.5, 2.0, 0.0, np.inf),
    (-1.0, 1.0, 0.0, np.inf),
    (1.0, 0.5, 0.0, 4.0),
    (10.0, 3.0, 1.0, 20.0),
])
def test_truncated_normal_vs_scipy(loc, scale, low, high):
    a, b = (low - loc) / scale, (high - loc) / scale
    d = TruncatedNormal(loc, scale, low, high)
    xs = np.linspace(low + 1e-3, min(high, loc + 4 * scale), 40).astype(np.float32)
    assert_close(d.log_prob(xs), sps.truncnorm.logpdf(xs, a, b, loc, scale),
                 rtol=1e-3, atol=1e-4)
    assert_close(d.mean(), sps.truncnorm.mean(a, b, loc, scale), rtol=1e-3)
    assert_close(d.stddev(), sps.truncnorm.std(a, b, loc, scale), rtol=1e-3)
    # 4th moment — the reference validates vs scipy.truncnorm.moment
    # (tests/models/merging/test_truncated_normal.py:29-42)
    mom4 = sps.truncnorm.moment(4, a, b, loc, scale)
    assert_close(d.moment_4(), mom4, rtol=2e-3)


@pytest.mark.parametrize("loc,scale,low,high", [
    (2.0, 1.0, 0.0, np.inf),
    (0.5, 2.0, 0.0, np.inf),
    (-1.0, 1.0, 0.0, np.inf),
    (1.0, 0.5, 0.0, 4.0),
    (10.0, 3.0, 1.0, 20.0),
])
def test_truncated_normal_entropy_vs_scipy(loc, scale, low, high):
    a, b = (low - loc) / scale, (high - loc) / scale
    d = TruncatedNormal(loc, scale, low, high)
    # scipy's own entropy is NaN at b=inf (inf*0 in its D term); a bound 30
    # sigma out is the same distribution to double precision
    b_oracle = min(b, 30.0)
    assert_close(d.entropy(), sps.truncnorm.entropy(a, b_oracle, loc, scale),
                 rtol=1e-3, atol=1e-4)
    m2 = sps.truncnorm.moment(2, a, b, loc, scale)
    assert_close(d.moment_2(), m2, rtol=1e-3)


def test_truncated_normal_sampling_moments():
    d = TruncatedNormal(jnp.full(1000, 1.0), jnp.full(1000, 0.8), 0.0, 1e10)
    s = d.sample(jax.random.PRNGKey(3), (100,))
    assert (s >= 0).all()
    assert_close(s.mean(), d.mean().mean(), rtol=2e-2)
    assert_close(s.std(), float(d.stddev()[0]), rtol=5e-2)


def test_folded_normal_vs_scipy():
    loc, scale = 1.5, 1.0
    d = FoldedNormal(loc, scale)
    assert_close(d.log_prob(X), sps.foldnorm.logpdf(X, loc / scale, scale=scale),
                 rtol=1e-3, atol=1e-4)
    assert_close(d.mean(), sps.foldnorm.mean(loc / scale, scale=scale), rtol=1e-4)
    assert_close(d.stddev(), sps.foldnorm.std(loc / scale, scale=scale), rtol=1e-3)
    s = d.sample(key, (200000,))
    assert_close(s.mean(), d.mean(), rtol=1e-2)


def test_rice_vs_scipy():
    nu, sigma = 2.0, 1.5
    d = Rice(nu, sigma)
    assert_close(d.log_prob(X), sps.rice.logpdf(X, nu / sigma, scale=sigma),
                 rtol=1e-3, atol=1e-4)
    assert_close(d.mean(), sps.rice.mean(nu / sigma, scale=sigma), rtol=1e-3)
    assert_close(d.stddev(), sps.rice.std(nu / sigma, scale=sigma), rtol=1e-3)


def test_rice_normal_crossover():
    # far above crossover the moments must be the normal limit
    d = Rice(500.0, 1.0)
    assert_close(d.mean(), 500.0)
    assert_close(d.stddev(), 1.0)
    assert np.isfinite(d.log_prob(np.float32(500.0)))


def test_amoroso_stacy_vs_gengamma():
    # Stacy(theta, alpha, beta) == gengamma(a=alpha, c=beta, scale=theta)
    theta, alpha, beta = 2.0, 1.5, 2.0
    d = Stacy(theta, alpha, beta)
    assert_close(d.log_prob(X), sps.gengamma.logpdf(X, alpha, beta, scale=theta),
                 rtol=1e-3, atol=1e-4)
    assert_close(d.mean(), sps.gengamma.mean(alpha, beta, scale=theta), rtol=1e-3)
    assert_close(d.stddev(), sps.gengamma.std(alpha, beta, scale=theta), rtol=1e-3)


def test_stacy_wilson_prior_matches_halfnormal_weibull():
    eps = np.array([1.0, 2.0, 3.0, 6.0], dtype=np.float32)
    centric = Stacy.wilson_prior(np.ones(4), eps)
    hn = HalfNormal(np.sqrt(eps))
    assert_close(centric.log_prob(X[:, None]), hn.log_prob(X[:, None]), rtol=1e-3)
    acentric = Stacy.wilson_prior(np.zeros(4), eps)
    wb = Weibull(2.0, np.sqrt(eps))
    assert_close(acentric.log_prob(X[:, None]), wb.log_prob(X[:, None]), rtol=1e-3)


def test_stacy_kl_self_is_zero():
    d = Stacy(2.0, 1.5, 2.0)
    assert_close(d.kl_divergence(d), 0.0, atol=1e-5)


def test_stacy_kl_vs_monte_carlo():
    p = Stacy(1.0, 1.0, 2.0)
    q = Stacy(2.0, 0.5, 2.0)
    analytic = p.kl_divergence(q)
    s = p.sample(jax.random.PRNGKey(7), (400000,))
    mc = (p.log_prob(s) - q.log_prob(s)).mean()
    assert_close(analytic, mc, rtol=3e-2)


def test_ricewoolfson_switches():
    loc = np.full(4, 2.0, dtype=np.float32)
    scale = np.full(4, 1.0, dtype=np.float32)
    centric = np.array([True, False, True, False])
    d = RiceWoolfson(loc, scale, centric)
    w, r = FoldedNormal(loc, scale), Rice(loc, scale)
    x = np.float32(1.7)
    lp = d.log_prob(x)
    assert_close(lp[0], w.log_prob(x)[0] if np.ndim(w.log_prob(x)) else w.log_prob(x))
    assert_close(lp[1], r.log_prob(x)[1] if np.ndim(r.log_prob(x)) else r.log_prob(x))


def test_gradients_finite():
    """Gradient-finiteness through sampling + log_prob (reference
    tests/models/priors/test_wilson.py:42-59 pattern)."""
    def loss(params):
        loc, scale = params
        d = TruncatedNormal(jnp.exp(loc), jnp.exp(scale) + 1e-7, 0.0, 1e10)
        s = d.sample(jax.random.PRNGKey(0), (4,))
        prior = Stacy.wilson_prior(np.array([1.0, 0.0]), np.array([1.0, 1.0]))
        return jnp.sum(d.log_prob(s)) - jnp.sum(prior.log_prob(s))

    g = jax.grad(loss)((jnp.zeros(2), jnp.zeros(2)))
    assert all(np.isfinite(x).all() for x in jax.tree.leaves(g))
