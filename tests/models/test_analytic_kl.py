"""Rao-Blackwellized KL fast path (--analytic-kl): same expectation as the
full-MC estimator (reference variational.py:123-128), lower variance."""
import jax
import jax.numpy as jnp
import numpy as np

from careless_tpu.models.likelihoods.mono import NormalLikelihood
from careless_tpu.models.priors.wilson import WilsonPrior
from careless_tpu.ops.distributions import TruncatedNormal

from tests.models.test_variational import make_model, synthetic_inputs


def _setup(n_refl=200, seed=0):
    rng = np.random.default_rng(seed)
    centric = rng.random(n_refl) < 0.4
    eps = rng.choice([1.0, 2.0, 3.0], n_refl).astype(np.float32)
    prior = WilsonPrior(jnp.asarray(centric), jnp.asarray(eps))
    q = TruncatedNormal(
        loc=jnp.asarray(np.abs(rng.normal(1.2, 0.4, n_refl)), jnp.float32),
        scale=jnp.asarray(0.05 + 0.2 * rng.random(n_refl), jnp.float32),
        low=jnp.asarray((1e-32 * ~centric), jnp.float32),
        high=1e10)
    return q, prior


def _mc_kl(q, prior, key, s):
    z = q.sample(key, (s,))
    return np.asarray(jnp.mean(q.log_prob(z) - prior.log_prob(z), axis=0))


def _rb_kl(q, prior, key, s):
    z = q.sample(key, (s,))
    return np.asarray(-q.entropy() - prior.expected_log_prob(q, z))


def test_rb_kl_matches_mc_kl_in_expectation():
    q, prior = _setup()
    # one large batch: per-element MC error ~ std/sqrt(50k)
    mc = _mc_kl(q, prior, jax.random.PRNGKey(1), 50000)
    rb = _rb_kl(q, prior, jax.random.PRNGKey(2), 50000)
    np.testing.assert_allclose(rb, mc, rtol=0.05, atol=0.02)


def test_rb_kl_has_lower_variance():
    q, prior = _setup()
    keys = [jax.random.PRNGKey(i) for i in range(64)]
    mc = np.stack([_mc_kl(q, prior, k, 1) for k in keys])
    rb = np.stack([_rb_kl(q, prior, k, 1) for k in keys])
    var_mc = mc.var(axis=0).mean()
    var_rb = rb.var(axis=0).mean()
    assert var_rb < 0.5 * var_mc, (var_rb, var_mc)
    # centric reflections are FULLY analytic -> exactly zero variance
    centric = np.asarray(prior.centric)
    assert rb.var(axis=0)[centric].max() < 1e-10


def test_rb_kl_exact_for_centric_halfnormal():
    """For a centric-only prior the RB estimator is deterministic; check it
    against a high-sample MC estimate."""
    q, prior = _setup()
    centric = np.asarray(prior.centric)
    big = _mc_kl(q, prior, jax.random.PRNGKey(99), 20000)
    rb = _rb_kl(q, prior, jax.random.PRNGKey(0), 1)
    np.testing.assert_allclose(rb[centric], big[centric], rtol=0.05, atol=0.02)


def test_model_elbo_analytic_kl_trains(rng):
    inputs, n_refl, n_images = synthetic_inputs(rng)
    model, params = make_model(inputs, n_refl, n_images, NormalLikelihood())
    akl_model = model.__class__(**{**model.__dict__, "analytic_kl": True})
    (loss, metrics), grads = jax.value_and_grad(akl_model.elbo, has_aux=True)(
        params, jax.random.PRNGKey(1), inputs)
    assert np.isfinite(loss)
    assert all(np.isfinite(g).all() for g in jax.tree.leaves(grads))
    # both elbo KL metrics estimate the same big-sample ground truth; with
    # mc_samples=1 each single draw is noisy, so average over many keys and
    # compare against a 100k-sample direct estimate with a 3-sigma band
    q = model.posterior.distribution(params["posterior"])
    z_big = q.sample(jax.random.PRNGKey(123), (100000,))
    kl_true = float(jnp.sum(jnp.mean(
        q.log_prob(z_big) - model.prior.log_prob(z_big), axis=0)))
    n_keys = 200
    draws_rb = [float(akl_model.elbo(params, jax.random.PRNGKey(i),
                                     inputs)[1]["F KLDiv"])
                for i in range(n_keys)]
    se = np.std(draws_rb) / np.sqrt(n_keys)
    assert abs(np.mean(draws_rb) - kl_true) < 3 * se + 0.02, (
        np.mean(draws_rb), kl_true, se)
