"""Combinatorial smoke tests of the variational merging model.

Mirrors the reference grid strategy (tests/models/merging/test_variational_mono.py:
{likelihoods x priors x scalers x mc_samples} asserting finite forward/grads)
plus a short optimization run asserting the ELBO improves.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from careless_tpu.models.base import Inputs
from careless_tpu.models.likelihoods import laue as laue_lik
from careless_tpu.models.likelihoods import mono as mono_lik
from careless_tpu.models.merging.surrogate import TruncatedNormalPosterior
from careless_tpu.models.merging.variational import Trainer, VariationalMergingModel
from careless_tpu.models.priors.wilson import WilsonPrior
from careless_tpu.models.scaling.image import (HybridImageScaler, ImageScaler,
                                               NeuralImageScaler)
from careless_tpu.models.scaling.nn import MLPScaler


def synthetic_inputs(rng, n_obs=200, n_refl=40, n_images=5, d_meta=4, laue=False):
    refl_id = rng.integers(0, n_refl, n_obs)
    image_id = rng.integers(0, n_images, n_obs)
    metadata = rng.normal(size=(n_obs, d_meta))
    f_true = np.abs(rng.normal(2.0, 1.0, n_refl)) + 0.1
    scale_true = np.exp(0.1 * metadata[:, 0])
    iobs = scale_true * f_true[refl_id] ** 2
    iobs = iobs + rng.normal(0, 0.1, n_obs) * np.abs(iobs) ** 0.5
    sig = np.full(n_obs, 0.5)
    kwargs = {}
    if laue:
        # every pair of consecutive observations shares a harmonic group
        harmonic_id = np.arange(n_obs) // 2
        kwargs = dict(wavelength=np.ones(n_obs),
                      harmonic_id=harmonic_id)
        grouped = np.zeros(n_obs)
        np.add.at(grouped, harmonic_id, iobs)
        iobs = np.concatenate([grouped[: n_obs // 2], np.ones(n_obs - n_obs // 2)])
    return Inputs.from_arrays(refl_id, image_id, np.zeros(n_obs), metadata,
                              iobs, sig, **kwargs), n_refl, n_images


def make_model(inputs, n_refl, n_images, likelihood, scaler_kind="mlp",
               mc_samples=1, kl_weight=None):
    rng = np.random.default_rng(0)
    centric = rng.random(n_refl) < 0.3
    epsilon = np.ones(n_refl, np.float32)
    prior = WilsonPrior(jnp.asarray(centric), jnp.asarray(epsilon))
    low = (1e-32 * ~centric).astype(np.float32)
    posterior = TruncatedNormalPosterior(low=jnp.asarray(low))
    mlp = MLPScaler(n_layers=2, width=4)
    if scaler_kind == "mlp":
        scaler = mlp
    elif scaler_kind == "hybrid":
        scaler = HybridImageScaler(mlp, ImageScaler(n_images))
    elif scaler_kind == "neural_image":
        scaler = NeuralImageScaler(2, n_images, mlp)
    model = VariationalMergingModel(posterior, prior, likelihood, scaler,
                                    mc_samples=mc_samples, kl_weight=kl_weight)
    loc = np.asarray(prior.mean())
    scale = np.asarray(prior.stddev())
    params = model.init(jax.random.PRNGKey(0), inputs, (loc, scale))
    return model, params


LIKELIHOODS = [
    mono_lik.NormalLikelihood(),
    mono_lik.LaplaceLikelihood(),
    mono_lik.StudentTLikelihood(4.0),
    mono_lik.NormalEv11Likelihood(),
    mono_lik.StudentTEv11Likelihood(4.0),
]


@pytest.mark.parametrize("likelihood", LIKELIHOODS,
                         ids=lambda l: type(l).__name__)
@pytest.mark.parametrize("scaler_kind", ["mlp", "hybrid", "neural_image"])
@pytest.mark.parametrize("mc", [1, 3])
def test_elbo_finite_and_differentiable(likelihood, scaler_kind, mc, rng):
    inputs, n_refl, n_images = synthetic_inputs(rng)
    model, params = make_model(inputs, n_refl, n_images, likelihood,
                               scaler_kind, mc_samples=mc)
    (loss, metrics), grads = jax.value_and_grad(model.elbo, has_aux=True)(
        params, jax.random.PRNGKey(1), inputs)
    assert np.isfinite(loss)
    assert all(np.isfinite(v) for v in metrics.values())
    assert all(np.isfinite(g).all() for g in jax.tree.leaves(grads))


@pytest.mark.parametrize("likelihood", [
    laue_lik.NormalLikelihood(),
    laue_lik.StudentTLikelihood(4.0),
    laue_lik.NormalEv11Likelihood(),
], ids=lambda l: type(l).__name__)
def test_laue_elbo_finite(likelihood, rng):
    inputs, n_refl, n_images = synthetic_inputs(rng, laue=True)
    model, params = make_model(inputs, n_refl, n_images, likelihood)
    (loss, _), grads = jax.value_and_grad(model.elbo, has_aux=True)(
        params, jax.random.PRNGKey(1), inputs)
    assert np.isfinite(loss)
    assert all(np.isfinite(g).all() for g in jax.tree.leaves(grads))


def test_laue_convolution_matches_manual(rng):
    inputs, n_refl, n_images = synthetic_inputs(rng, n_obs=20, laue=True)
    lik = laue_lik.NormalLikelihood().build({}, inputs)
    v = np.arange(20, dtype=np.float32)
    conv = np.asarray(lik.convolve(v))
    expected = np.zeros(20, np.float32)
    np.add.at(expected, np.asarray(inputs.harmonic_id), v)
    np.testing.assert_allclose(conv, expected, rtol=1e-6)
    # batched
    v2 = np.stack([v, 2 * v])
    conv2 = np.asarray(lik.convolve(v2))
    np.testing.assert_allclose(conv2[1], 2 * expected, rtol=1e-6)


def test_training_improves_elbo(rng):
    inputs, n_refl, n_images = synthetic_inputs(rng, n_obs=400)
    model, params = make_model(inputs, n_refl, n_images,
                               mono_lik.NormalLikelihood())
    trainer = Trainer(model, learning_rate=0.01)
    params2, history = trainer.train(params, jax.random.PRNGKey(2), inputs,
                                     steps=300, progress=False)
    assert len(history["loss"]) == 300
    first = np.mean(history["loss"][:20])
    last = np.mean(history["loss"][-20:])
    assert last < first
    assert np.isfinite(history["Grad Norm"]).all()


def test_training_with_validation(rng):
    inputs, n_refl, n_images = synthetic_inputs(rng, n_obs=300)
    val = inputs.select(np.arange(0, 300, 3))
    train = inputs.select(np.setdiff1d(np.arange(300), np.arange(0, 300, 3)))
    model, params = make_model(train, n_refl, n_images,
                               mono_lik.NormalLikelihood())
    trainer = Trainer(model)
    params2, history = trainer.train(params, jax.random.PRNGKey(2), train,
                                     steps=40, validation_data=val,
                                     validation_frequency=10, progress=False)
    assert len(history["NLL_val"]) == 40
    assert np.isfinite(history["NLL_val"]).all()


def test_freeze_subtree(rng):
    inputs, n_refl, n_images = synthetic_inputs(rng)
    model, params = make_model(inputs, n_refl, n_images,
                               mono_lik.NormalLikelihood())
    trainer = Trainer(model, freeze=("scaler",))
    params2, _ = trainer.train(params, jax.random.PRNGKey(2), inputs,
                               steps=20, progress=False)
    for a, b in zip(jax.tree.leaves(params["scaler"]),
                    jax.tree.leaves(params2["scaler"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert not np.allclose(np.asarray(params["posterior"]["loc_raw"]),
                           np.asarray(params2["posterior"]["loc_raw"]))


def test_subset_plans_use_global_table_sizes(rng):
    """Round-1 regression: an image-split half lacks the top image ids, but
    the ImageScaler table is global-sized. Gather plans attached to the
    subset must be built with the GLOBAL (n_refl, n_images) so the planned
    gather's transpose emits a full-table gradient (main.py xval path)."""
    inputs, n_refl, n_images = synthetic_inputs(rng, n_obs=300, n_images=10)
    model, params = make_model(inputs, n_refl, n_images,
                               mono_lik.NormalLikelihood(),
                               scaler_kind="hybrid")
    # drop every observation from the two highest image ids, as an
    # image-split half would
    keep = np.asarray(inputs.image_id) < n_images - 2
    half = inputs.select(keep).with_plans(n_refl, n_images)
    (loss, _), grads = jax.value_and_grad(model.elbo, has_aux=True)(
        params, jax.random.PRNGKey(3), half)
    assert np.isfinite(loss)
    for g, p in zip(jax.tree.leaves(grads), jax.tree.leaves(params)):
        assert np.shape(g) == np.shape(p)
        assert np.isfinite(g).all()


def test_posterior_moments_and_predictions(rng):
    inputs, n_refl, n_images = synthetic_inputs(rng)
    model, params = make_model(inputs, n_refl, n_images,
                               mono_lik.NormalLikelihood())
    iexp, istd = model.prediction_mean_stddev(params, inputs)
    assert iexp.shape == (inputs.n_obs,)
    assert np.isfinite(np.asarray(iexp)).all()
    assert (np.asarray(istd) > 0).all()
    mean, stddev = model.scale_mean_stddev(params, inputs)
    assert np.isfinite(np.asarray(mean)).all()


def test_laue_planned_path_matches_unplanned():
    """The Laue perf layer (sorted_by_harmonic + harmonic/refl plans,
    main._shard_inputs) must be a pure layout change: identical loss and
    parameter gradients vs the plain XLA path on unsorted rows.

    Uses a LOCAL generator, not the session-scoped rng fixture: the two
    paths differ by float associativity right at the assert tolerance, and
    the shared fixture makes the drawn data depend on which tests ran
    before (observed order-dependent flake)."""
    rng = np.random.default_rng(11)
    inputs, n_refl, n_images = synthetic_inputs(rng, n_obs=300, laue=True)
    # scramble row order so the sort actually does something
    order = np.random.default_rng(3).permutation(300)
    scrambled = inputs._replace(
        refl_id=np.asarray(inputs.refl_id)[order],
        image_id=np.asarray(inputs.image_id)[order],
        file_id=np.asarray(inputs.file_id)[order],
        metadata=np.asarray(inputs.metadata)[order],
        wavelength=np.asarray(inputs.wavelength)[order],
        harmonic_id=np.asarray(inputs.harmonic_id)[order],
    )
    model, params = make_model(scrambled, n_refl, n_images,
                               laue_lik.NormalLikelihood(), "hybrid")
    # baseline and planned share row order (per-row MC noise is assigned by
    # row index, so only the plans may differ for an exact comparison);
    # sorted-vs-scrambled math equality is covered by the convolve parity
    # tests and test_sorted_by_harmonic_preserves_group_packing
    base = scrambled.sorted_by_harmonic()
    planned = base.with_plans(n_refl, n_images)
    assert planned.plans is not None and planned.plans.harmonic is not None
    key = jax.random.PRNGKey(7)

    (l0, m0), g0 = jax.value_and_grad(model.elbo, has_aux=True)(
        params, key, base)
    (l1, m1), g1 = jax.value_and_grad(model.elbo, has_aux=True)(
        params, key, planned)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-5)
    for (k, a), (_, b) in zip(jax.tree_util.tree_leaves_with_path(g0),
                              jax.tree_util.tree_leaves_with_path(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4, err_msg=str(k))


def test_sorted_by_harmonic_preserves_group_packing(rng):
    inputs, _, _ = synthetic_inputs(rng, n_obs=40, laue=True)
    order = np.random.default_rng(5).permutation(40)
    scrambled = inputs._replace(
        refl_id=np.asarray(inputs.refl_id)[order],
        image_id=np.asarray(inputs.image_id)[order],
        file_id=np.asarray(inputs.file_id)[order],
        metadata=np.asarray(inputs.metadata)[order],
        wavelength=np.asarray(inputs.wavelength)[order],
        harmonic_id=np.asarray(inputs.harmonic_id)[order],
    )
    s = scrambled.sorted_by_harmonic()
    hid = np.asarray(s.harmonic_id)
    assert (hid[1:] >= hid[:-1]).all()
    # group-indexed fields must NOT be row-reordered
    np.testing.assert_array_equal(np.asarray(s.intensities),
                                  np.asarray(scrambled.intensities))
    np.testing.assert_array_equal(np.asarray(s.uncertainties),
                                  np.asarray(scrambled.uncertainties))
    # per-row fields travel with their row
    np.testing.assert_array_equal(
        np.sort(np.asarray(s.refl_id)), np.sort(np.asarray(scrambled.refl_id)))


def test_laue_planned_path_mc_samples_matches_unplanned():
    """mc_samples > 1 on the planned Laue path: the one-hot MXU gather
    unrolls per sample over the batched z_f table and the run-aligned ll
    sums over the sample axis — must equal the plain XLA path exactly."""
    rng = np.random.default_rng(23)
    inputs, n_refl, n_images = synthetic_inputs(rng, n_obs=300, laue=True)
    model, params = make_model(inputs, n_refl, n_images,
                               laue_lik.NormalLikelihood(), "hybrid",
                               mc_samples=3)
    base = inputs.sorted_by_harmonic()
    planned = base.with_plans(n_refl, n_images)
    assert planned.plans.harmonic_run is not None
    key = jax.random.PRNGKey(11)
    (l0, _), g0 = jax.value_and_grad(model.elbo, has_aux=True)(
        params, key, base)
    (l1, _), g1 = jax.value_and_grad(model.elbo, has_aux=True)(
        params, key, planned)
    np.testing.assert_allclose(float(l0), float(l1), rtol=2e-5)
    for (k, a), (_, b) in zip(jax.tree_util.tree_leaves_with_path(g0),
                              jax.tree_util.tree_leaves_with_path(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4, err_msg=str(k))
