"""Fused Pallas ELBO kernel: parity vs the pure-XLA path (interpret mode on
the CPU mesh, externally supplied noise so both paths see identical eps)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from careless_tpu.models.base import Inputs
from careless_tpu.ops.fused_elbo import fused_likelihood_sum

from tests.models.test_variational import make_model, synthetic_inputs
from careless_tpu.models.likelihoods.mono import NormalLikelihood


def reference_ll_sum(loc, scale, a_tab, z_f, refl_id, image_id, iobs, sig,
                     mask, noise):
    a = a_tab[image_id]
    z = a * loc + jnp.abs(a) * scale * noise
    F = z_f[refl_id]
    ipred = z * F * F
    resid = (iobs - ipred) / sig
    ll = -0.5 * resid ** 2 - jnp.log(sig) - 0.5 * jnp.log(2 * jnp.pi)
    return jnp.sum(mask * ll)


@pytest.fixture(scope="module")
def problem(rng):
    n, n_refl, n_img = 700, 90, 7
    loc = rng.normal(size=n).astype(np.float32)
    scale = (0.1 + rng.random(n)).astype(np.float32)
    a_tab = (0.5 + rng.random(n_img)).astype(np.float32)
    z_f = (0.1 + rng.random(n_refl)).astype(np.float32) * 3
    refl_id = rng.integers(0, n_refl, n).astype(np.int32)
    image_id = rng.integers(0, n_img, n).astype(np.int32)
    iobs = rng.normal(2.0, 1.0, n).astype(np.float32)
    sig = (0.2 + rng.random(n)).astype(np.float32)
    mask = (rng.random(n) > 0.1).astype(np.float32)
    noise = rng.normal(size=n).astype(np.float32)
    return (loc, scale, a_tab, z_f, refl_id, image_id, iobs, sig, mask, noise)


def test_forward_parity(problem):
    loc, scale, a_tab, z_f, refl_id, image_id, iobs, sig, mask, noise = problem
    fused = fused_likelihood_sum(loc, scale, a_tab, z_f, refl_id, image_id,
                                 iobs, sig, mask, seed=0, noise=noise)
    ref = reference_ll_sum(*[jnp.asarray(x) for x in problem])
    np.testing.assert_allclose(float(fused), float(ref), rtol=1e-5)


def test_gradient_parity(problem):
    loc, scale, a_tab, z_f, refl_id, image_id, iobs, sig, mask, noise = problem

    def f_fused(loc, scale, a_tab, z_f):
        return fused_likelihood_sum(loc, scale, a_tab, z_f, refl_id,
                                    image_id, iobs, sig, mask, seed=0,
                                    noise=noise)

    def f_ref(loc, scale, a_tab, z_f):
        return reference_ll_sum(loc, scale, a_tab, z_f, refl_id, image_id,
                                iobs, sig, mask, noise)

    g_fused = jax.grad(f_fused, argnums=(0, 1, 2, 3))(loc, scale, a_tab, z_f)
    g_ref = jax.grad(f_ref, argnums=(0, 1, 2, 3))(
        *[jnp.asarray(x) for x in (loc, scale, a_tab, z_f)])
    for a, b, name in zip(g_fused, g_ref, ["dloc", "dscale", "da", "dzf"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4, err_msg=name)


def test_fused_elbo_matches_xla_path(rng):
    """Full model: fused vs XLA elbo with identical supplied noise."""
    inputs, n_refl, n_images = synthetic_inputs(rng, n_obs=300)
    model, params = make_model(inputs, n_refl, n_images, NormalLikelihood(),
                               scaler_kind="hybrid")
    fused_model = model.__class__(**{**model.__dict__, "fused_kernel": True})

    key = jax.random.PRNGKey(0)
    noise = rng.normal(size=inputs.n_obs).astype(np.float32)

    loss_fused, m_fused = fused_model._elbo_fused(params, key, inputs,
                                                  noise=jnp.asarray(noise))

    # reference path with the same z_f sample and the same eps
    k_f, k_s = jax.random.split(key)
    q = model.posterior.distribution(params["posterior"])
    z_f = q.sample(k_f, (1,))[0]
    mlp_dist = model.scaler.mlp.apply(params["scaler"]["mlp"], inputs)
    a = model.scaler.image.scales(params["scaler"]["image"])[inputs.image_id]
    z = a * mlp_dist.loc + jnp.abs(a) * mlp_dist.scale * noise
    ipred = z * jnp.square(z_f[inputs.refl_id])
    lik = model.likelihood.build({}, inputs)
    ll = lik.log_prob(ipred)
    nll = -jnp.sum(ll)
    kl = jnp.sum(q.log_prob(z_f) - model.prior.log_prob(z_f))
    np.testing.assert_allclose(float(loss_fused), float(nll + kl), rtol=1e-5)
    np.testing.assert_allclose(float(m_fused["NLL"]), float(nll), rtol=1e-5)


def test_fused_elbo_multi_sample_matches_manual(rng):
    """mc_samples > 1: the fused path averages S kernel invocations; with a
    shared supplied eps it must equal the manual per-sample XLA average."""
    inputs, n_refl, n_images = synthetic_inputs(rng, n_obs=300)
    model, params = make_model(inputs, n_refl, n_images, NormalLikelihood(),
                               scaler_kind="hybrid", mc_samples=3)
    fused_model = model.__class__(**{**model.__dict__, "fused_kernel": True})
    inputs_p = inputs.with_plans(n_refl, n_images)
    assert fused_model._fused_eligible(inputs_p)

    key = jax.random.PRNGKey(5)
    noise = jnp.asarray(rng.normal(size=inputs.n_obs).astype(np.float32))
    loss_fused, m = fused_model._elbo_fused(params, key, inputs_p,
                                            noise=noise)

    k_f, k_s = jax.random.split(key)
    q = model.posterior.distribution(params["posterior"])
    z_f = q.sample(k_f, (3,))
    mlp_dist = model.scaler.mlp.apply(params["scaler"]["mlp"], inputs)
    a = model.scaler.image.scales(params["scaler"]["image"])[inputs.image_id]
    z = a * mlp_dist.loc + jnp.abs(a) * mlp_dist.scale * noise
    lik = model.likelihood.build({}, inputs)
    ll = 0.0
    for s in range(3):
        ll = ll + jnp.sum(lik.log_prob(z * jnp.square(z_f[s][inputs.refl_id])))
    ll = ll / 3
    kl = jnp.sum(q.log_prob(z_f) - model.prior.log_prob(z_f)) / 3
    np.testing.assert_allclose(float(loss_fused), float(-ll + kl), rtol=1e-5)


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="pltpu.prng_random_bits has no interpret-mode "
                           "implementation; exercised on TPU by bench.py")
def test_fused_elbo_prng_statistics(rng):
    """With in-kernel PRNG the loss must be statistically consistent with
    the XLA path (same magnitude, finite)."""
    inputs, n_refl, n_images = synthetic_inputs(rng, n_obs=500)
    model, params = make_model(inputs, n_refl, n_images, NormalLikelihood())
    fused_model = model.__class__(**{**model.__dict__, "fused_kernel": True})
    inputs = inputs.with_plans(n_refl, n_images)
    assert fused_model._fused_eligible(inputs)
    losses_f = [float(fused_model.elbo(params, jax.random.PRNGKey(i),
                                       inputs)[0]) for i in range(6)]
    losses_x = [float(model.elbo(params, jax.random.PRNGKey(i),
                                 inputs)[0]) for i in range(6)]
    assert np.isfinite(losses_f).all()
    mf, mx = np.mean(losses_f), np.mean(losses_x)
    assert abs(mf - mx) / abs(mx) < 0.2, (mf, mx)


def test_fused_fallback_for_laue(rng):
    inputs, n_refl, n_images = synthetic_inputs(rng, laue=True)
    from careless_tpu.models.likelihoods import laue as laue_lik
    model, params = make_model(inputs, n_refl, n_images,
                               laue_lik.NormalLikelihood())
    fused_model = model.__class__(**{**model.__dict__, "fused_kernel": True})
    assert not fused_model._fused_eligible(inputs)
    loss, _ = fused_model.elbo(params, jax.random.PRNGKey(0), inputs)
    assert np.isfinite(float(loss))


# ---------------------------------------------------------------------------
# StudentT pointwise chain (fused eligibility extension, BASELINE config 2)
# ---------------------------------------------------------------------------
def reference_studentt_ll_sum(loc, scale, a_tab, z_f, refl_id, image_id,
                              iobs, sig, mask, noise, dof):
    import jax.scipy.stats as jstats
    a = a_tab[image_id]
    z = a * loc + jnp.abs(a) * scale * noise
    F = z_f[refl_id]
    ipred = z * F * F
    ll = jstats.t.logpdf(ipred, dof, loc=iobs, scale=sig)
    return jnp.sum(mask * ll)


@pytest.mark.parametrize("dof", [4.0, 16.0])
def test_studentt_forward_parity(problem, dof):
    loc, scale, a_tab, z_f, refl_id, image_id, iobs, sig, mask, noise = problem
    fused = fused_likelihood_sum(loc, scale, a_tab, z_f, refl_id, image_id,
                                 iobs, sig, mask, seed=0, noise=noise,
                                 kind="studentt", dof=dof)
    ref = reference_studentt_ll_sum(*[jnp.asarray(x) for x in problem], dof)
    np.testing.assert_allclose(float(fused), float(ref), rtol=1e-5)


def test_studentt_gradient_parity(problem):
    loc, scale, a_tab, z_f, refl_id, image_id, iobs, sig, mask, noise = problem
    dof = 4.0

    def f_fused(loc, scale, a_tab, z_f):
        return fused_likelihood_sum(loc, scale, a_tab, z_f, refl_id,
                                    image_id, iobs, sig, mask, seed=0,
                                    noise=noise, kind="studentt", dof=dof)

    def f_ref(loc, scale, a_tab, z_f):
        return reference_studentt_ll_sum(loc, scale, a_tab, z_f, refl_id,
                                         image_id, iobs, sig, mask, noise,
                                         dof)

    g_fused = jax.grad(f_fused, argnums=(0, 1, 2, 3))(loc, scale, a_tab, z_f)
    g_ref = jax.grad(f_ref, argnums=(0, 1, 2, 3))(
        *[jnp.asarray(x) for x in (loc, scale, a_tab, z_f)])
    for a, b, name in zip(g_fused, g_ref, ["dloc", "dscale", "da", "dzf"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4, err_msg=name)


def test_studentt_fused_elbo_matches_xla_path(rng):
    from careless_tpu.models.likelihoods.mono import StudentTLikelihood
    inputs, n_refl, n_images = synthetic_inputs(rng, n_obs=300)
    inputs = inputs.sorted_by_refl().with_plans(n_refl, n_images)
    model, params = make_model(inputs, n_refl, n_images,
                               StudentTLikelihood(4.0),
                               scaler_kind="hybrid")
    fused_model = model.__class__(**{**model.__dict__, "fused_kernel": True})
    assert fused_model._fused_eligible(inputs)

    key = jax.random.PRNGKey(0)
    noise = rng.normal(size=inputs.n_obs).astype(np.float32)
    loss_fused, m_fused = fused_model._elbo_fused(params, key, inputs,
                                                  noise=jnp.asarray(noise))

    # reference path with the same z_f sample and the same eps
    k_f, k_s = jax.random.split(key)
    q = model.posterior.distribution(params["posterior"])
    z_f = q.sample(k_f, (1,))[0]
    mlp_dist = model.scaler.mlp.apply(params["scaler"]["mlp"], inputs)
    a = model.scaler.image.scales(params["scaler"]["image"])[inputs.image_id]
    z = a * mlp_dist.loc + jnp.abs(a) * mlp_dist.scale * noise
    ipred = z * jnp.square(z_f[inputs.refl_id])
    lik = model.likelihood.build({}, inputs)
    ll = lik.log_prob(ipred)
    nll = -jnp.sum(ll)
    kl = jnp.sum(q.log_prob(z_f) - model.prior.log_prob(z_f))
    np.testing.assert_allclose(float(loss_fused), float(nll + kl), rtol=1e-5)


# ---------------------------------------------------------------------------
# Laplace + Ev11 pointwise chains (fused eligibility extension — the
# reference's --refine-uncertainties production flag, mono.py:20-23,39-73)
# ---------------------------------------------------------------------------
def reference_laplace_ll_sum(loc, scale, a_tab, z_f, refl_id, image_id,
                             iobs, sig, mask, noise):
    a = a_tab[image_id]
    z = a * loc + jnp.abs(a) * scale * noise
    ipred = z * z_f[refl_id] ** 2
    b = sig / jnp.sqrt(2.0)
    ll = -jnp.log(2 * b) - jnp.abs(iobs - ipred) / b
    return jnp.sum(mask * ll)


def test_laplace_parity(problem):
    loc, scale, a_tab, z_f, refl_id, image_id, iobs, sig, mask, noise = problem

    def f_fused(loc, scale, a_tab, z_f):
        return fused_likelihood_sum(loc, scale, a_tab, z_f, refl_id,
                                    image_id, iobs, sig, mask, seed=0,
                                    noise=noise, kind="laplace")

    def f_ref(loc, scale, a_tab, z_f):
        return reference_laplace_ll_sum(loc, scale, a_tab, z_f, refl_id,
                                        image_id, iobs, sig, mask, noise)

    np.testing.assert_allclose(float(f_fused(loc, scale, a_tab, z_f)),
                               float(f_ref(*[jnp.asarray(x) for x in
                                             (loc, scale, a_tab, z_f)])),
                               rtol=1e-5)
    g_fused = jax.grad(f_fused, argnums=(0, 1, 2, 3))(loc, scale, a_tab, z_f)
    g_ref = jax.grad(f_ref, argnums=(0, 1, 2, 3))(
        *[jnp.asarray(x) for x in (loc, scale, a_tab, z_f)])
    for a, b, name in zip(g_fused, g_ref, ["dloc", "dscale", "da", "dzf"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4, err_msg=name)


def reference_ev11_ll_sum(loc, scale, a_tab, z_f, refl_id, image_id, iobs,
                          sig, mask, noise, ev, dof=None):
    sdfac, sdadd, sdb = ev
    a = a_tab[image_id]
    z = a * loc + jnp.abs(a) * scale * noise
    ipred = z * z_f[refl_id] ** 2
    sp = jax.nn.softplus(ipred)
    s = sdfac * jnp.sqrt(sig ** 2 + sdb * sp + sdadd * sp ** 2)
    if dof is None:
        ll = (-0.5 * ((iobs - ipred) / s) ** 2 - jnp.log(s)
              - 0.5 * jnp.log(2 * jnp.pi))
    else:
        import jax.scipy.stats as jstats
        ll = jstats.t.logpdf(ipred, dof, loc=iobs, scale=s)
    return jnp.sum(mask * ll)


@pytest.mark.parametrize("kind,dof", [("normal_ev11", 0.0),
                                      ("studentt_ev11", 5.0)])
def test_ev11_parity(problem, kind, dof):
    loc, scale, a_tab, z_f, refl_id, image_id, iobs, sig, mask, noise = problem
    ev = (jnp.float32(1.3), jnp.float32(0.2), jnp.float32(0.7))

    def f_fused(loc, scale, a_tab, z_f, ev):
        return fused_likelihood_sum(loc, scale, a_tab, z_f, refl_id,
                                    image_id, iobs, sig, mask, seed=0,
                                    noise=noise, kind=kind, dof=dof, ev11=ev)

    def f_ref(loc, scale, a_tab, z_f, ev):
        return reference_ev11_ll_sum(
            loc, scale, a_tab, z_f, refl_id, image_id, iobs, sig, mask,
            noise, ev, dof=None if kind == "normal_ev11" else dof)

    args = [jnp.asarray(x) for x in (loc, scale, a_tab, z_f)] + [ev]
    np.testing.assert_allclose(float(f_fused(loc, scale, a_tab, z_f, ev)),
                               float(f_ref(*args)), rtol=1e-5)
    g_fused = jax.grad(f_fused, argnums=(0, 1, 2, 3, 4))(
        loc, scale, a_tab, z_f, ev)
    g_ref = jax.grad(f_ref, argnums=(0, 1, 2, 3, 4))(*args)
    names = ["dloc", "dscale", "da", "dzf", "dev11"]
    for a, b, name in zip(g_fused, g_ref, names):
        for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       rtol=3e-4, atol=3e-4, err_msg=name)


def test_ev11_fused_elbo_matches_xla_path(rng):
    """Full model with NormalEv11Likelihood: fused vs XLA elbo with shared
    noise — the --refine-uncertainties production configuration."""
    from careless_tpu.models.likelihoods.mono import NormalEv11Likelihood
    inputs, n_refl, n_images = synthetic_inputs(rng, n_obs=300)
    inputs = inputs.sorted_by_refl().with_plans(n_refl, n_images)
    model, params = make_model(inputs, n_refl, n_images,
                               NormalEv11Likelihood(),
                               scaler_kind="hybrid")
    fused_model = model.__class__(**{**model.__dict__, "fused_kernel": True})
    assert fused_model._fused_eligible(inputs)

    key = jax.random.PRNGKey(0)
    noise = rng.normal(size=inputs.n_obs).astype(np.float32)
    loss_fused, m_fused = fused_model._elbo_fused(params, key, inputs,
                                                  noise=jnp.asarray(noise))
    loss_xla, m_xla = model.elbo(params, key, inputs)
    # same z_f (same key) but the XLA path samples its own eps; compare the
    # exact path instead: rebuild XLA ll with the shared noise
    k_f, _ = jax.random.split(key)
    q = model.posterior.distribution(params["posterior"])
    z_f = q.sample(k_f, (1,))[0]
    mlp_dist = model.scaler.mlp.apply(params["scaler"]["mlp"], inputs)
    a = model.scaler.image.scales(params["scaler"]["image"])[inputs.image_id]
    z = a * mlp_dist.loc + jnp.abs(a) * mlp_dist.scale * noise
    ipred = z * jnp.square(z_f[inputs.refl_id])
    lik = model.likelihood.build(params["likelihood"], inputs)
    nll = -jnp.sum(lik.log_prob(ipred))
    kl = jnp.sum(q.log_prob(z_f) - model.prior.log_prob(z_f))
    np.testing.assert_allclose(float(loss_fused), float(nll + kl), rtol=1e-5)

    # gradients w.r.t. the Ev11 raw params flow through the kernel
    def loss_of(p):
        return fused_model._elbo_fused(p, key, inputs,
                                       noise=jnp.asarray(noise))[0]

    g = jax.grad(loss_of)(params)["likelihood"]
    assert all(np.isfinite(np.asarray(v)).all() and float(np.abs(v)) > 0
               for v in g.values()), g
