"""Analytic-oracle tests for priors and likelihoods (reference
tests/models/priors/test_wilson.py, tests/models/likelihoods/test_mono.py,
tests/models/priors/test_empirical.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.stats as sps

from careless_tpu.models.base import Inputs
from careless_tpu.models.likelihoods import mono
from careless_tpu.models.priors.empirical import ReferencePrior
from careless_tpu.models.priors.wilson import WilsonPrior

X = np.linspace(0.1, 6.0, 40).astype(np.float32)


def test_wilson_prior_closed_forms():
    eps = np.array([1.0, 2.0, 3.0], np.float32)
    centric = WilsonPrior(np.ones(3, bool), eps)
    for j in range(3):
        np.testing.assert_allclose(
            np.asarray(centric.log_prob(X[:, None]))[:, j],
            sps.halfnorm.logpdf(X, scale=np.sqrt(eps[j])), rtol=1e-3,
            atol=1e-4)
    acentric = WilsonPrior(np.zeros(3, bool), eps)
    for j in range(3):
        # Rayleigh == Weibull(2, sqrt(eps))
        np.testing.assert_allclose(
            np.asarray(acentric.log_prob(X[:, None]))[:, j],
            sps.weibull_min.logpdf(X, 2.0, scale=np.sqrt(eps[j])), rtol=1e-3,
            atol=1e-4)


def test_wilson_prior_moments_and_sampling(rng):
    eps = np.ones(1000, np.float32)
    centric = rng.random(1000) < 0.5
    prior = WilsonPrior(centric, eps, sigma=2.0)
    s = np.asarray(prior.sample(jax.random.PRNGKey(0), (2000,)))
    assert (s >= 0).all()
    m = s.mean(0)
    expected = np.asarray(prior.mean())
    np.testing.assert_allclose(m[centric].mean(), expected[centric][0],
                               rtol=5e-3)
    np.testing.assert_allclose(m[~centric].mean(), expected[~centric][0],
                               rtol=5e-3)


def test_wilson_prior_gradients_finite():
    prior = WilsonPrior(np.array([True, False]), np.ones(2, np.float32))

    def f(x):
        return jnp.sum(prior.log_prob(jnp.abs(x) + 0.1))

    g = jax.grad(f)(jnp.array([1.0, 2.0]))
    assert np.isfinite(np.asarray(g)).all()


def _inputs(n=30, rng=None):
    rng = rng or np.random.default_rng(0)
    return Inputs.from_arrays(
        np.zeros(n), np.zeros(n), np.zeros(n),
        rng.normal(size=(n, 2)),
        rng.normal(10, 2, n), 0.5 + rng.random(n))


def test_normal_likelihood_matches_scipy():
    inputs = _inputs()
    lik = mono.NormalLikelihood().build({}, inputs)
    x = np.linspace(5, 15, 30).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(lik.log_prob(x)),
        sps.norm.logpdf(x, np.asarray(inputs.intensities),
                        np.asarray(inputs.uncertainties)), rtol=1e-4,
        atol=1e-4)


def test_laplace_likelihood_scale_convention():
    inputs = _inputs()
    lik = mono.LaplaceLikelihood().build({}, inputs)
    x = np.asarray(inputs.intensities)
    # reference divides sigma by sqrt(2) (mono.py:20-23)
    np.testing.assert_allclose(
        np.asarray(lik.log_prob(x)),
        sps.laplace.logpdf(x, x, np.asarray(inputs.uncertainties) / np.sqrt(2)),
        rtol=1e-4)


def test_studentt_likelihood_matches_scipy():
    inputs = _inputs()
    lik = mono.StudentTLikelihood(5.0).build({}, inputs)
    x = np.linspace(5, 15, 30).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(lik.log_prob(x)),
        sps.t.logpdf(x, 5.0, np.asarray(inputs.intensities),
                     np.asarray(inputs.uncertainties)), rtol=1e-3, atol=1e-4)


def test_ev11_likelihood_initial_identity():
    """At init Sdfac=Sdadd=SdB=1: sigma' = sqrt(sig^2 + sp(I) + sp(I)^2)."""
    inputs = _inputs()
    cfg = mono.NormalEv11Likelihood()
    params = cfg.init()
    lik = cfg.build(params, inputs)
    ipred = np.asarray(inputs.intensities)
    sp = np.log1p(np.exp(ipred))
    expected = np.sqrt(np.asarray(inputs.uncertainties) ** 2 + sp + sp ** 2)
    np.testing.assert_allclose(np.asarray(lik.corrected_sigiobs(ipred)),
                               expected, rtol=1e-3)


def test_neural_likelihood_runs_and_differentiates():
    inputs = _inputs()
    cfg = mono.NeuralNormalLikelihood(3, 6)
    params = cfg.init()

    def loss(p):
        return -jnp.sum(cfg.build(p, inputs).log_prob(inputs.intensities))

    g = jax.grad(loss)(params)
    assert all(np.isfinite(x).all() for x in jax.tree.leaves(g))


@pytest.mark.parametrize("kind", ["normal", "laplace", "studentt",
                                  "ricewoolfson"])
def test_reference_priors(kind, rng):
    n = 50
    observed = rng.random(n) < 0.6
    loc = np.abs(rng.normal(2, 0.5, n)).astype(np.float32)
    scale = (0.1 + rng.random(n)).astype(np.float32)
    prior = ReferencePrior(observed, loc, scale, kind=kind,
                           dof=4.0 if kind == "studentt" else None,
                           centric=(rng.random(n) < 0.3
                                    if kind == "ricewoolfson" else None))
    x = np.abs(rng.normal(2, 0.5, n)).astype(np.float32) + 0.1
    lp = np.asarray(prior.log_prob(x))
    # unobserved entries contribute exactly zero
    np.testing.assert_array_equal(lp[~observed], 0.0)
    assert np.isfinite(lp).all()

    def f(z):
        return jnp.sum(prior.log_prob(jnp.abs(z) + 0.1))

    g = jax.grad(f)(jnp.asarray(x))
    assert np.isfinite(np.asarray(g)).all()


def test_identity_init_mlp_preserves_metadata():
    """The identity kernel init matters for optimization dynamics
    (reference nn.py:66, SURVEY §7 hard part 4): at init the network output
    is LeakyReLU-passed metadata."""
    from careless_tpu.models.scaling.nn import MLPScaler
    rng = np.random.default_rng(0)
    x = np.abs(rng.normal(size=(20, 4))).astype(np.float32)  # positive
    inputs = Inputs.from_arrays(np.zeros(20), np.zeros(20), np.zeros(20),
                                x, np.ones(20), np.ones(20))
    m = MLPScaler(3, 4)
    params = m.init(None, 4)
    d = m.apply(params, inputs)
    # positive inputs pass through LeakyReLU identically; loc = first column
    np.testing.assert_allclose(np.asarray(d.loc), x[:, 0], rtol=1e-5)
